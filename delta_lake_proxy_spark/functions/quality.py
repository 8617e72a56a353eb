"""Corpus-quality filters beyond per-document stats (charter X4 depth):
intra-document repetition metrics in the style of the published
Gopher/RefinedWeb rules, and cross-corpus contamination scoring against a
benchmark set. All declarative DataFrame ops — explode + per-doc
aggregation, broadcast semi-joins — no Python in the hot path, and every
metric is reproducible in ANSI SQL.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import WORD_RE


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Intra-document repetition metrics (the Gopher-rule family):

    - ``dup_line_frac``: fraction of lines that are duplicates of an
      earlier line (empty lines ignored);
    - ``dup_line_char_frac``: fraction of non-empty-line characters living
      in duplicated lines;
    - ``top_bigram_frac``: fraction of word-characters covered by the most
      frequent word bigram (boilerplate/templating signal).

    One explode + per-doc aggregation per metric family (two shuffles on
    ``id_col``); joins are per-document metadata-sized. Documents with no
    lines/bigrams score 0.
    """
    t = F.col(text_col)
    lines = docs.select(
        F.col(id_col),
        F.explode(F.split(t, "\n")).alias("line"),
    ).filter(F.length(F.trim(F.col("line"))) > 0)
    per_line = lines.groupBy(id_col, "line").agg(F.count(F.lit(1)).alias("n"))
    line_stats = per_line.groupBy(id_col).agg(
        F.round(
            (F.sum("n") - F.count(F.lit(1))).cast("double")
            / F.greatest(F.sum("n"), F.lit(1)),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.sum(F.when(F.col("n") > 1, F.col("n") * F.length("line")).otherwise(0))
            .cast("double")
            / F.greatest(F.sum(F.col("n") * F.length("line")), F.lit(1)),
            6,
        ).alias("dup_line_char_frac"),
    )
    words = docs.select(
        F.col(id_col),
        F.length(t).alias("_n_chars"),
        F.regexp_extract_all(F.lower(t), F.lit(WORD_RE), 0).alias("_w"),
    )
    bigrams = words.select(
        F.col(id_col),
        F.col("_n_chars"),
        F.explode(_word_ngrams(F.col("_w"), 2)).alias("bg"),
    )
    top_bigram = (
        bigrams.groupBy(id_col, "_n_chars", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy(id_col, "_n_chars")
        .agg(F.max(F.struct(F.col("n"), F.length("bg").alias("l"))).alias("m"))
        .select(
            F.col(id_col),
            F.round(
                (F.col("m.n") * F.col("m.l")).cast("double")
                / F.greatest(F.col("_n_chars"), F.lit(1)),
                6,
            ).alias("top_bigram_frac"),
        )
    )
    base = docs.select(F.col(id_col))
    out = (
        base.join(line_stats, id_col, "left")
        .join(top_bigram, id_col, "left")
        .fillna(
            {"dup_line_frac": 0.0, "dup_line_char_frac": 0.0, "top_bigram_frac": 0.0}
        )
    )
    return out


def contamination_scores(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination score per training document: the fraction of
    its distinct ``n``-word shingle hashes that also occur anywhere in the
    benchmark corpus (the standard n-gram-overlap decontamination check).

    The benchmark's distinct shingle-hash set is usually tiny relative to
    the corpus and BROADCASTS; the train side is one explode + distinct +
    semi-probe + per-doc aggregation — the corpus is scanned once, the
    shuffle carries (doc, hash) pairs. Documents shorter than ``n`` words
    score 0 (no shingles to leak). Companion to
    ``text.ngram_contamination``, which attributes the overlap to
    specific eval documents as (train_id, eval_id, shared_ngrams) pairs."""

    def shingle_hashes(df: DataFrame, keep_id: bool):
        words = df.select(
            *([F.col(id_col)] if keep_id else []),
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0).alias("_w"),
        )
        sh = words.select(
            *([F.col(id_col)] if keep_id else []),
            F.explode(
                _word_ngrams(F.col("_w"), n, mapper=lambda g, i: F.xxhash64(g))
            ).alias("h"),
        )
        return sh.dropDuplicates(([id_col] if keep_id else []) + ["h"])

    train_sh = shingle_hashes(train, keep_id=True)
    bench_sh = F.broadcast(shingle_hashes(benchmark, keep_id=False))
    hits = train_sh.join(bench_sh, "h", "left_semi").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_hit")
    )
    totals = train_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_tot"))
    return (
        train.select(F.col(id_col))
        .join(totals, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.round(
                F.coalesce(F.col("_hit"), F.lit(0)).cast("double")
                / F.greatest(F.coalesce(F.col("_tot"), F.lit(0)), F.lit(1)),
                6,
            ).alias("contamination"),
        )
    )


# The eight "required" stop words of the published Gopher quality rules
# (Rae et al. 2021, appendix A1.1): a document must contain at least two.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
# Line-start characters treated as bullets and line-end ellipsis forms.
_BULLET_PREFIXES = ["•", "‣", "▪", "◦", "-", "*"]
_ELLIPSIS_SUFFIXES = ["...", "…"]
# Unicode-aware whitespace (Java (?U) flag): NBSP and friends delimit words
# and trim lines, matching Python's default-unicode \s / str.strip used by
# the test oracles. Plain \s in Java is ASCII-only and would glue
# NBSP-joined words together on real web text.
_UWS_SPLIT = "(?U)\\s+"
_UWS_TRIM = "(?U)(^\\s+|\\s+$)"


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The Gopher document-quality rules (Rae et al. 2021, appendix A1.1;
    the same rule set RefinedWeb and Dolma reuse), one row per document
    with each raw metric, a boolean per rule, and the conjunction
    ``gopher_pass``. Defaults are the published thresholds.

    Rules, on Unicode-whitespace-delimited words:
      1. ``min_words <= n_words <= max_words``;
      2. ``min_mean_word_len <= mean_word_len <= max_mean_word_len``;
      3. hash-to-word ratio AND ellipsis-to-word ratio each
         ``<= max_symbol_word_ratio`` (the paper applies the threshold to
         either symbol separately, not to their sum);
      4. fraction of non-empty lines starting with a bullet character
         ``<= max_bullet_line_frac``;
      5. fraction of non-empty lines ending with an ellipsis
         ``<= max_ellipsis_line_frac``;
      6. fraction of words containing an alphabetic character
         ``>= min_alpha_word_frac``;
      7. at least ``min_stopword_hits`` DISTINCT words from
         :data:`GOPHER_STOPWORDS` occur — the paper's "contain at least
         two of the following English words" read as word types; note
         DataTrove/Dolma count total occurrences instead, so a doc
         repeating only "the" passes there but fails here.

    Flags compare the ROUNDED (6-decimal) reported metrics, so a user
    recomputing ``metric <= threshold`` from the output always agrees
    with the flag. Lines are trimmed of Unicode whitespace (CRLF corpora:
    the trailing ``\r`` would otherwise hide every ellipsis ending).

    Single-projection pure codegen (split + array ``filter``/``aggregate``
    — no explode, no shuffle, no Python), so the filter runs map-side at
    corpus scale and composes with :func:`gopher_repetition_flags` (the
    repetition half of the published rules) by a per-document join.
    Empty documents fail rules 1, 2, 6 and 7.

    Reference analog: the proxy exposes no curation ops; charter X4 depth
    (training-data pipeline quality filtering).
    """
    if not 0 <= min_stopword_hits <= len(GOPHER_STOPWORDS):
        raise ValueError(
            f"min_stopword_hits must be in [0, {len(GOPHER_STOPWORDS)}] "
            f"(distinct required words), got {min_stopword_hits}"
        )
    t = F.col(text_col)
    words = F.filter(F.split(t, _UWS_SPLIT), lambda w: F.length(w) > 0)
    n_words = F.size(words)
    words_f = n_words.cast("double")
    mean_word_len = F.round(
        F.aggregate(words, F.lit(0.0), lambda acc, w: acc + F.length(w))
        / F.greatest(words_f, F.lit(1.0)),
        6,
    )
    n_ellipsis = sum(
        (F.regexp_count(t, F.lit("\\u2026" if s == "…" else "\\.\\.\\."))
         for s in _ELLIPSIS_SUFFIXES[1:]),
        F.regexp_count(t, F.lit("\\.\\.\\.")),
    )
    hash_word_ratio = F.round(
        F.regexp_count(t, F.lit("#")).cast("double") / F.greatest(words_f, F.lit(1.0)), 6
    )
    ellipsis_word_ratio = F.round(
        n_ellipsis.cast("double") / F.greatest(words_f, F.lit(1.0)), 6
    )
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda l: F.regexp_replace(l, _UWS_TRIM, "")),
        lambda l: F.length(l) > 0,
    )
    lines_f = F.size(lines).cast("double")

    def _frac(pred) -> Column:
        return F.round(
            F.size(F.filter(lines, pred)).cast("double")
            / F.greatest(lines_f, F.lit(1.0)),
            6,
        )

    bullet_line_frac = _frac(
        lambda l: reduce(or_, (l.startswith(p) for p in _BULLET_PREFIXES))
    )
    ellipsis_line_frac = _frac(
        lambda l: reduce(or_, (l.endswith(s) for s in _ELLIPSIS_SUFFIXES))
    )
    alpha_word_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))).cast("double")
        / F.greatest(words_f, F.lit(1.0)),
        6,
    )
    lowered = F.lower(t)
    stopword_hits = sum(
        (
            F.when(lowered.rlike("\\b" + w + "\\b"), 1).otherwise(0)
            for w in GOPHER_STOPWORDS[1:]
        ),
        F.when(lowered.rlike("\\b" + GOPHER_STOPWORDS[0] + "\\b"), 1).otherwise(0),
    )

    metrics = {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "hash_word_ratio": hash_word_ratio,
        "ellipsis_word_ratio": ellipsis_word_ratio,
        "bullet_line_frac": bullet_line_frac,
        "ellipsis_line_frac": ellipsis_line_frac,
        "alpha_word_frac": alpha_word_frac,
        "stopword_hits": stopword_hits,
    }
    # flags read the rounded metrics above, never a second unrounded copy
    flags = {
        "pass_word_count": (n_words >= min_words) & (n_words <= max_words),
        "pass_mean_word_len": (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len),
        "pass_symbol_ratio": (hash_word_ratio <= max_symbol_word_ratio)
        & (ellipsis_word_ratio <= max_symbol_word_ratio),
        "pass_bullet_lines": bullet_line_frac <= max_bullet_line_frac,
        "pass_ellipsis_lines": ellipsis_line_frac <= max_ellipsis_line_frac,
        "pass_alpha_words": alpha_word_frac >= min_alpha_word_frac,
        "pass_stopwords": stopword_hits >= min_stopword_hits,
    }
    gopher_pass: Column = F.lit(True)
    for c in flags.values():
        gopher_pass = gopher_pass & c
    return docs.select(
        F.col(id_col),
        *[v.alias(k) for k, v in metrics.items()],
        *[v.alias(k) for k, v in flags.items()],
        gopher_pass.alias("gopher_pass"),
    )


def _word_ngrams(words: Column, n: int, mapper=None, slice_mapper=None) -> Column:
    """Array of word ``n``-grams over an already-tokenized word array:
    ``transform(sequence(0, size-n), i -> mapper(space-joined gram, i))``,
    empty when the doc has fewer than ``n`` words. The ONE shared
    construction for every n-gram consumer in this module (and the model
    for ``text.ngram_contamination``'s hashed variant) so the
    empty-array guard and slice arithmetic can never drift apart.
    ``mapper(gram, i)`` defaults to the gram string itself; it is called
    by this function (arity is ours, not PySpark's lambda-parameter
    sniffing). ``slice_mapper(word_slice, i)`` instead receives the RAW
    word-array slice — consumers that only need a fingerprint
    (``xxhash64`` hashes arrays directly) skip materializing the joined
    gram string entirely, the dominant cost when every n in 2..10
    explodes per word position."""

    def gram(i: Column) -> Column:
        if slice_mapper is not None:
            return slice_mapper(F.slice(words, i + 1, n), i)
        g = F.concat_ws(" ", F.slice(words, i + 1, n))
        return mapper(g, i) if mapper is not None else g

    return F.when(
        F.size(words) >= n,
        F.transform(F.sequence(F.lit(0), F.size(words) - n), gram),
    ).otherwise(F.array())


# Published Gopher repetition-rule thresholds (Rae et al. 2021, A1.1):
# max fraction of characters in the TOP n-gram, n = 2..4, and in ALL
# duplicated n-grams, n = 5..10.
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def repetition_ngram_stats(
    docs: DataFrame,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The n-gram half of the Gopher repetition rules, one row per doc:

    - ``top_{n}gram_frac`` for each ``n`` in ``top_ns``: fraction of
      word-characters covered by occurrences of the single most frequent
      word ``n``-gram — count x the gram's word-chars over total
      word-chars, count ties broken toward the longer gram (the
      :func:`repetition_stats` ``top_bigram_frac`` convention, so the
      scalar is deterministic);
    - ``dup_{n}gram_frac`` for each ``n`` in ``dup_ns``: fraction of
      word-characters inside ANY occurrence of a duplicated ``n``-gram
      (one occurring >1 time in the doc), overlap counted ONCE — the
      union of covered word positions, the paper's "without double
      counting" clause.

    Word-characters (the concatenated ``WORD_RE`` word lengths) are the
    denominator, so separators/punctuation never dilute the signal and
    the metric is exactly reproducible.

    Shape at scale: the corpus is scanned and TOKENIZED exactly once —
    the word-array projection is materialized (eager persist, retired
    FIFO through the shared persist cache) and every n-gram size is
    built in one flattened ``transform`` over it, exploded once into a
    unified (doc, n, start, ghash, wc) relation. Grams are FINGERPRINTS,
    never strings (r15): ``xxhash64`` hashes the word-array slice
    directly and the gram's word-chars fold from the per-word length
    array — with n = 2..10 every word position explodes ~9 gram rows,
    so the count shuffle and the dup join carry 8-byte keys instead of
    up-to-10-word strings. (An interleaved A/B at the bench SF measured
    this neutral — 14.0 vs 14.9 s min-of-3 — because at 5k docs the
    cost is fixed stage machinery, the r11 minhash finding again; the
    byte reduction is the part that scales with the corpus.) Counting
    is a partial-combined hash aggregation on (doc, n, ghash); the
    dup-coverage union is a distinct on (doc, n, pos) — interval
    merging without a skew-prone per-doc window. No Python anywhere.

    Documents with fewer than ``n`` words score 0 for that ``n``.
    Companion to :func:`repetition_stats` (lines/top-bigram);
    :func:`gopher_repetition_flags` applies the published thresholds to
    both.
    """
    ns = sorted(set(top_ns) | set(dup_ns))
    if not ns:
        raise ValueError("at least one n required")
    if any(n < 1 for n in ns):
        raise ValueError(f"n must be >= 1, got {ns}")
    from ._persist_cache import cache_persisted

    t = F.col(text_col)
    base = docs.select(
        F.col(id_col),
        F.regexp_extract_all(F.lower(t), F.lit(WORD_RE), 0).alias("_w"),
    ).select(
        F.col(id_col),
        F.col("_w"),
        # per-word lengths once: gram word-chars fold from this instead
        # of measuring a materialized gram string
        F.transform(F.col("_w"), F.length).alias("_wl"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    base.count()  # materialize: several branches below re-read the words
    cache_persisted(base)
    words = base.select(
        F.col(id_col),
        F.expr("posexplode(_wl)").alias("pos", "wlen"),
    )
    totals = words.groupBy(id_col).agg(F.sum("wlen").alias("_tot"))

    def _tagged(n: int) -> Column:
        # fingerprint + word-chars per position — the gram string itself
        # is never built (xxhash64 hashes the slice array directly)
        return _word_ngrams(
            F.col("_w"),
            n,
            slice_mapper=lambda s, i, n=n: F.struct(
                F.lit(n).alias("n"),
                i.alias("start"),
                F.xxhash64(s).alias("ghash"),
                F.aggregate(
                    F.slice(F.col("_wl"), i + 1, n),
                    F.lit(0),
                    lambda acc, x: acc + x,
                ).alias("wc"),
            ),
        )

    # every n in ONE projection + ONE explode over the cached words
    grams = base.select(
        F.col(id_col),
        F.explode(F.flatten(F.array(*[_tagged(n) for n in ns]))).alias("g"),
    ).select(
        F.col(id_col),
        F.col("g.n").alias("n"),
        F.col("g.start").alias("start"),
        F.col("g.ghash").alias("ghash"),
        F.col("g.wc").alias("wc"),
    )
    counts = grams.groupBy(id_col, "n", "ghash").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("wc").alias("wc"),  # constant per (doc, n, ghash)
    )
    # id list from the cached projection too — zero raw-source rescans
    out = base.select(F.col(id_col)).join(totals, id_col, "left")
    if top_ns:
        # the most frequent gram, count ties toward the longer one
        pick = F.struct(F.col("cnt"), F.col("wc"))
        top = (
            counts.filter(F.col("n").isin(*[int(x) for x in top_ns]))
            .groupBy(id_col)
            .agg(
                *[
                    F.max(F.when(F.col("n") == n, pick)).alias(f"_m{n}")
                    for n in top_ns
                ]
            )
            .select(
                F.col(id_col),
                *[
                    (F.col(f"_m{n}.cnt") * F.col(f"_m{n}.wc")).alias(f"_top{n}")
                    for n in top_ns
                ],
            )
        )
        out = out.join(top, id_col, "left")
    if dup_ns:
        dup_pos = (
            grams.join(
                counts.filter(
                    (F.col("cnt") > 1) & F.col("n").isin(*[int(x) for x in dup_ns])
                ),
                [id_col, "n", "ghash"],
            )
            .select(
                F.col(id_col),
                "n",
                F.explode(
                    F.sequence(F.col("start"), F.col("start") + F.col("n") - 1)
                ).alias("pos"),
            )
            .distinct()
        )
        dup_cov = (
            dup_pos.join(words, [id_col, "pos"])
            .groupBy(id_col)
            .agg(
                *[
                    F.sum(F.when(F.col("n") == n, F.col("wlen"))).alias(f"_dup{n}")
                    for n in dup_ns
                ]
            )
        )
        out = out.join(dup_cov, id_col, "left")
    safe_tot = F.greatest(F.col("_tot"), F.lit(1)).cast("double")
    return out.select(
        F.col(id_col),
        *[
            F.round(F.coalesce(F.col(f"_top{n}"), F.lit(0)).cast("double") / safe_tot, 6).alias(
                f"top_{n}gram_frac"
            )
            for n in top_ns
        ],
        *[
            F.round(F.coalesce(F.col(f"_dup{n}"), F.lit(0)).cast("double") / safe_tot, 6).alias(
                f"dup_{n}gram_frac"
            )
            for n in dup_ns
        ],
    )


def gopher_repetition_flags(
    docs: DataFrame,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    top_ngram_max: dict[int, float] | None = None,
    dup_ngram_max: dict[int, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The full Gopher repetition-rule verdict per document: the line
    metrics of :func:`repetition_stats` plus the n-gram metrics of
    :func:`repetition_ngram_stats`, each compared against the published
    thresholds (defaults: dup-line 0.30, dup-line-chars 0.20,
    :data:`GOPHER_TOP_NGRAM_MAX`, :data:`GOPHER_DUP_NGRAM_MAX`), with
    the conjunction ``repetition_pass``. Flags compare the ROUNDED
    reported metrics (both stat relations round to 6 decimals), the
    same convention as :func:`gopher_quality_flags`. One per-document
    join between the two metric relations; compose with
    :func:`gopher_quality_flags` for the complete published filter."""
    top_ngram_max = GOPHER_TOP_NGRAM_MAX if top_ngram_max is None else top_ngram_max
    dup_ngram_max = GOPHER_DUP_NGRAM_MAX if dup_ngram_max is None else dup_ngram_max
    line = repetition_stats(docs, text_col=text_col, id_col=id_col)
    ngram = repetition_ngram_stats(
        docs,
        top_ns=tuple(sorted(top_ngram_max)),
        dup_ns=tuple(sorted(dup_ngram_max)),
        text_col=text_col,
        id_col=id_col,
    )
    joined = line.join(ngram, id_col)
    flags = {
        "pass_dup_lines": F.col("dup_line_frac") <= max_dup_line_frac,
        "pass_dup_line_chars": F.col("dup_line_char_frac") <= max_dup_line_char_frac,
        **{
            f"pass_top_{n}gram": F.col(f"top_{n}gram_frac") <= thr
            for n, thr in sorted(top_ngram_max.items())
        },
        **{
            f"pass_dup_{n}gram": F.col(f"dup_{n}gram_frac") <= thr
            for n, thr in sorted(dup_ngram_max.items())
        },
    }
    rep_pass: Column = F.lit(True)
    for c in flags.values():
        rep_pass = rep_pass & c
    return joined.select(
        F.col(id_col),
        *[c for c in joined.columns if c != id_col],
        *[v.alias(k) for k, v in flags.items()],
        rep_pass.alias("repetition_pass"),
    )


def top_repeated_ngrams(
    docs: DataFrame,
    n: int = 3,
    k: int = 20,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide boilerplate mining: the ``k`` most frequent word
    ``n``-grams that occur in at least ``min_docs`` distinct documents,
    with total occurrence and document-frequency counts. The triage
    companion to :func:`~delta_lake_proxy_spark.functions.dedup.
    dedupe_repeated_lines` — run this to SEE the templating/boilerplate a
    corpus carries before deciding what to strip.

    Shape at scale: one explode of word n-grams, then a partial-combined
    two-level aggregation — per-(ngram, doc) first (so a million repeats
    inside one spam document combine map-side and count once toward
    ``n_docs``), then per-ngram — followed by a TakeOrdered top-k. No
    window over a global ordering, no Python; hot n-grams are exactly the
    partial-aggregation-friendly case (the long tail of unique grams
    shuffles once, the classic word-count shape). Ordering ties break on
    the n-gram string so the result is deterministic.
    """
    if n < 1 or k < 1:
        raise ValueError(f"n and k must be >= 1, got n={n} k={k}")
    t = F.col(text_col)
    words = docs.select(
        F.col(id_col),
        F.regexp_extract_all(F.lower(t), F.lit(WORD_RE), 0).alias("_w"),
    )
    grams = words.select(
        F.col(id_col),
        F.explode(_word_ngrams(F.col("_w"), n)).alias("ngram"),
    )
    per_doc = grams.groupBy("ngram", id_col).agg(F.count(F.lit(1)).alias("_n"))
    per_gram = per_doc.groupBy("ngram").agg(
        F.sum("_n").alias("n_occurrences"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return (
        per_gram.filter(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(k)
    )


def char_entropy_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_entropy: float = 2.0,
    max_entropy: float = 5.2,
    min_chars: int = 20,
) -> DataFrame:
    """Per-document Shannon character entropy (bits/char) with a pass
    flag: the cheap detector for content no word-level rule sees —
    base64 / hex-dump blobs pasted into text score HIGH (random base64
    sits at 5.5-6.0 bits, bounded by log2 64 = 6; English and other
    alphabetic prose near 4), and single-character / whitespace-run junk
    scores LOW. The default max of 5.2 sits between prose and base64 —
    deliberately BELOW the log2(64) ceiling, which an inclusive bound of
    6 could never catch. CJK corpora legitimately exceed it (thousands
    of distinct chars); raise ``max_entropy`` there.

    Sample entropy is bounded by log2(n_chars), so a short document
    cannot reach the low bound no matter its content; documents under
    ``min_chars`` therefore PASS (insufficient evidence is not junk)
    rather than being conflated with repeated-char garbage.

    Shape at scale: one explode of characters + a per-(doc, char)
    count + per-doc entropy aggregation — the same two-shuffle shape as
    :func:`repetition_stats`, partial-combined map-side (a document has
    at most |alphabet| distinct chars after the first combine). Pure
    codegen. Empty documents report entropy 0 and pass (under
    ``min_chars``).
    """
    t = F.col(text_col)
    chars = docs.select(
        F.col(id_col),
        F.explode(F.split(t, "")).alias("ch"),
    ).filter(F.length("ch") > 0)
    per_char = chars.groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("n"))
    ent = per_char.groupBy(id_col).agg(
        F.sum("n").cast("long").alias("_tot"),
        # H = log2(N) - sum(n*log2(n))/N  (exact regrouping of -sum p log2 p)
        F.sum(F.col("n") * F.log2("n")).alias("_nlogn"),
    )
    entropy = F.round(
        F.log2(F.col("_tot")) - F.col("_nlogn") / F.col("_tot"), 6
    )
    base = docs.select(F.col(id_col))
    out = base.join(ent, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("_tot"), F.lit(0)).alias("n_chars"),
        F.coalesce(entropy, F.lit(0.0)).alias("char_entropy"),
    )
    return out.select(
        "*",
        (
            (F.col("n_chars") < min_chars)
            | (
                (F.col("char_entropy") >= min_entropy)
                & (F.col("char_entropy") <= max_entropy)
            )
        ).alias("pass_entropy"),
    )
