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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import WORD_RE


def _arr_sum(arr: Column, init: Column | None = None) -> Column:
    """``aggregate(arr, 0, +)`` — the shared array-sum fold."""
    return F.aggregate(arr, F.lit(0) if init is None else init, lambda a, x: a + x)


def _adjacent_dup_flags(srt: Column, eq) -> Column:
    """Per-element "is part of a duplicated run" flags for an already
    SORTED array: element j is a duplicate iff it equals its left or right
    neighbor. Built from one ``zip_with`` of the array against its own
    shift (no ``element_at`` indexing, which would be an ANSI out-of-bounds
    hazard at the boundaries). ``eq(a, b)`` compares two elements."""
    m1 = F.greatest(F.size(srt) - 1, F.lit(0))
    en = F.zip_with(F.slice(srt, 1, m1), F.slice(srt, 2, m1), eq)
    fb = F.array(F.lit(False))
    return F.zip_with(
        F.concat(fb, en), F.concat(en, fb), lambda a, b: a | b
    )


def _run_best(srt: Column, weight) -> Column:
    """Max ``(run_length, weight)`` product over equal-key runs of a SORTED
    struct array — one O(m) fold: the accumulator tracks the current run
    length and the lexicographic best ``(count, weight)`` seen, exactly the
    ``max(struct(cnt, w))`` the old grouped aggregation computed.
    ``weight(x)`` extracts the tie-break weight from an element; runs are
    keyed on the ``h`` field. Returns ``best_count * best_weight`` (0 for
    an empty array)."""
    init = F.struct(
        F.lit(None).cast("bigint").alias("ph"),
        F.lit(0).alias("run"),
        F.lit(0).alias("bc"),
        F.lit(0).alias("bw"),
    )

    def step(acc: Column, x: Column) -> Column:
        run2 = F.when(x["h"] == acc["ph"], acc["run"] + 1).otherwise(F.lit(1))
        w = weight(x)
        better = (run2 > acc["bc"]) | ((run2 == acc["bc"]) & (w > acc["bw"]))
        return F.struct(
            x["h"].alias("ph"),
            run2.alias("run"),
            F.when(better, run2).otherwise(acc["bc"]).alias("bc"),
            F.when(better, w).otherwise(acc["bw"]).alias("bw"),
        )

    fin = F.aggregate(srt, init, step)
    return fin["bc"] * fin["bw"]


_GRAM_STRUCT = "array<struct<h:bigint,s:int,wc:int>>"


def _gram_structs(words: Column, wlens: Column, n: int) -> Column:
    """Per-document word ``n``-gram fingerprints without an explode: one
    ``(h, s, wc)`` struct per position — ``xxhash64`` of the word-array
    slice (grams are never materialized as strings, the r15 finding) plus
    the start offset and the gram's word-chars folded from the per-word
    lengths. Empty when the doc has fewer than ``n`` words."""
    return (
        F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.struct(
                    F.xxhash64(F.slice(words, i + 1, n)).alias("h"),
                    i.alias("s"),
                    _arr_sum(F.slice(wlens, i + 1, n)).alias("wc"),
                ),
            ),
        )
        .otherwise(F.array())
        .cast(_GRAM_STRUCT)
    )


def _dup_coverage(srt: Column, wlens: Column, n: int) -> Column:
    """Word-chars inside ANY occurrence of a duplicated ``n``-gram,
    overlap counted once — per-document, no shuffle: the duplicated
    occurrences' start offsets (adjacent-equal runs of the SORTED
    fingerprint array) are re-sorted by position and folded left to right
    merging the fixed-length intervals; each step adds only the
    non-overlapped slice of the per-word length array, so total slice
    work is O(words) per document."""
    starts = F.when(
        F.size(srt) >= 2,
        F.array_sort(
            F.filter(
                F.zip_with(
                    srt,
                    _adjacent_dup_flags(srt, lambda a, b: a["h"] == b["h"]),
                    lambda x, d: F.when(d, x["s"]),
                ),
                lambda v: v.isNotNull(),
            )
        ),
    ).otherwise(F.array().cast("array<int>"))
    init = F.struct(F.lit(0).alias("cov"), F.lit(0).alias("pend"))

    def step(acc: Column, st: Column) -> Column:
        gs = F.greatest(st, acc["pend"])
        return F.struct(
            (acc["cov"] + _arr_sum(F.slice(wlens, gs + 1, st + F.lit(n) - gs))).alias(
                "cov"
            ),
            (st + F.lit(n)).alias("pend"),
        )

    return F.aggregate(starts, init, step)["cov"]


def _line_bigram_stage(frame: DataFrame, keep: list[str]) -> DataFrame:
    """Append the STAGED line/bigram intermediates to a frame that carries
    ``_t`` (raw text) and ``_w`` (word array): ``_nl`` (non-empty lines),
    ``_srtl`` (sorted lines), ``_enl`` (adjacent-equal flags of the sorted
    lines), ``_srtb`` (sorted bigram strings). Each intermediate lives in
    its OWN projection and is referenced at least twice downstream, so
    CollapseProject cannot inline (and thereby duplicate) the underlying
    split/sort per consumer — the reason these are columns, not nested
    expressions."""
    nl = F.filter(
        F.split(F.coalesce(F.col("_t"), F.lit("")), "\n"),
        lambda l: F.length(F.trim(l)) > 0,
    )
    bgs = (
        F.when(
            F.size(F.col("_w")) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(F.col("_w")) - 2),
                lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i + 1, 2)),
            ),
        )
        .otherwise(F.array())
        .cast("array<string>")
    )
    s1 = frame.select(*keep, "_t", "_w", nl.alias("_nl"), bgs.alias("_srtb_raw"))
    s2 = s1.select(
        *keep,
        "_t",
        "_nl",
        F.array_sort(F.col("_nl")).alias("_srtl"),
        F.array_sort(F.col("_srtb_raw")).alias("_srtb"),
    )
    m1 = F.greatest(F.size(F.col("_srtl")) - 1, F.lit(0))
    en = F.zip_with(
        F.slice(F.col("_srtl"), 1, m1),
        F.slice(F.col("_srtl"), 2, m1),
        lambda a, b: a == b,
    )
    return s2.select(*keep, "_t", "_nl", "_srtl", "_srtb", en.alias("_enl"))


def _line_metric_cols() -> dict[str, Column]:
    """The per-document line metrics of :func:`repetition_stats` as
    Column expressions over the staged ``_nl``/``_srtl``/``_enl``
    attributes (:func:`_line_bigram_stage`): duplicate occurrences =
    adjacent-equal pairs of the sorted lines, duplicated chars =
    per-element sum over flagged elements. No explode, no shuffle."""
    srtl, nl, en = F.col("_srtl"), F.col("_nl"), F.col("_enl")
    n_extra = F.size(F.filter(en, lambda x: x))
    fb = F.array(F.lit(False))
    dupflags = F.zip_with(F.concat(fb, en), F.concat(en, fb), lambda a, b: a | b)
    dup_chars = _arr_sum(
        F.zip_with(srtl, dupflags, lambda l, d: F.when(d, F.length(l)).otherwise(0))
    )
    tot_chars = _arr_sum(F.transform(nl, F.length))
    return {
        "dup_line_frac": F.round(
            n_extra.cast("double") / F.greatest(F.size(srtl), F.lit(1)), 6
        ),
        "dup_line_char_frac": F.round(
            dup_chars.cast("double") / F.greatest(tot_chars, F.lit(1)), 6
        ),
    }


def _top_bigram_col() -> Column:
    """``top_bigram_frac`` over the staged ``_srtb``/``_t`` attributes:
    most frequent word bigram STRING (sorted-run count, ties toward the
    longer string — the exact ``max(struct(cnt, length))`` of the old
    grouped form), over total text chars."""
    init = F.struct(
        F.lit(None).cast("string").alias("pb"),
        F.lit(0).alias("run"),
        F.lit(0).alias("bc"),
        F.lit(0).alias("bl"),
    )

    def step(acc: Column, x: Column) -> Column:
        run2 = F.when(x == acc["pb"], acc["run"] + 1).otherwise(F.lit(1))
        ln = F.length(x)
        better = (run2 > acc["bc"]) | ((run2 == acc["bc"]) & (ln > acc["bl"]))
        return F.struct(
            x.alias("pb"),
            run2.alias("run"),
            F.when(better, run2).otherwise(acc["bc"]).alias("bc"),
            F.when(better, ln).otherwise(acc["bl"]).alias("bl"),
        )

    fin = F.aggregate(F.col("_srtb"), init, step)
    return F.round(
        (fin["bc"] * fin["bl"]).cast("double")
        / F.greatest(F.length(F.col("_t")), F.lit(1)),
        6,
    )


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

    Wholly per-document (r17): every metric is a sorted-array fold inside
    ONE projection chain — no explode, no shuffle, no join, one corpus
    scan — so the operator is embarrassingly parallel at 100 TB (the old
    shape paid two explodes, four shuffles and two per-doc joins for
    document-local arithmetic). Documents with no lines/bigrams score 0.
    """
    t = F.col(text_col)
    base = docs.select(
        F.col(id_col),
        t.alias("_t"),
        F.regexp_extract_all(F.lower(F.coalesce(t, F.lit(""))), F.lit(WORD_RE), 0).alias(
            "_w"
        ),
    )
    staged = _line_bigram_stage(base, [id_col])
    line_cols = _line_metric_cols()
    return staged.select(
        F.col(id_col),
        *[v.alias(k) for k, v in line_cols.items()],
        _top_bigram_col().alias("top_bigram_frac"),
    )


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
    staged = _quality_stage(
        docs.select(F.col(id_col), F.col(text_col).alias("_t"))
    )
    metrics, flags, gopher_pass = _quality_cols(
        F.col("_t"),
        min_words,
        max_words,
        min_mean_word_len,
        max_mean_word_len,
        max_symbol_word_ratio,
        max_bullet_line_frac,
        max_ellipsis_line_frac,
        min_alpha_word_frac,
        min_stopword_hits,
    )
    with_metrics = staged.select(
        F.col(id_col), *[v.alias(k) for k, v in metrics.items()]
    )
    return with_metrics.select(
        F.col(id_col),
        *metrics.keys(),
        *[v.alias(k) for k, v in flags.items()],
        gopher_pass.alias("gopher_pass"),
    )


def _quality_stage(frame: DataFrame) -> DataFrame:
    """Append the STAGED heavy intermediates of the quality rules to a
    frame carrying ``_t``: ``_qw`` (Unicode-whitespace words), ``_ql``
    (trimmed non-empty lines), ``_qlow`` (lowered text). Staged as
    columns (r17) so each split/lower runs once per row — inlined, the
    words expression re-split the text once per metric referencing it
    (up to 5x) and the flags once more."""
    t = F.col("_t")
    return frame.withColumns(
        {
            "_qw": F.filter(F.split(t, _UWS_SPLIT), lambda w: F.length(w) > 0),
            "_ql": F.filter(
                F.transform(
                    F.split(t, "\n"), lambda l: F.regexp_replace(l, _UWS_TRIM, "")
                ),
                lambda l: F.length(l) > 0,
            ),
            "_qlow": F.lower(t),
        }
    )


def _quality_cols(
    t: Column,
    min_words: int,
    max_words: int,
    min_mean_word_len: float,
    max_mean_word_len: float,
    max_symbol_word_ratio: float,
    max_bullet_line_frac: float,
    max_ellipsis_line_frac: float,
    min_alpha_word_frac: float,
    min_stopword_hits: int,
) -> tuple[dict[str, Column], dict[str, Column], Column]:
    """The :func:`gopher_quality_flags` metric and flag columns over the
    STAGED ``_qw``/``_ql``/``_qlow`` attributes of :func:`_quality_stage`
    (plus the raw ``t``) — factored out (r17) so the full published
    filter (:func:`gopher_filter`) composes quality and repetition rules
    into ONE projection chain instead of a per-document join of two
    scans. Returns ``(metrics, flags, gopher_pass)``."""
    words = F.col("_qw")
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
    lines = F.col("_ql")
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
    lowered = F.col("_qlow")
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
    # flags read the rounded metrics above, never a second unrounded copy —
    # as ATTRIBUTE references (r17): the metrics are aliased in their own
    # projection and each flag reads the aliased column, so a metric's
    # expression runs once per row however many flags consume it
    flags = _quality_flag_cols(
        min_words,
        max_words,
        min_mean_word_len,
        max_mean_word_len,
        max_symbol_word_ratio,
        max_bullet_line_frac,
        max_ellipsis_line_frac,
        min_alpha_word_frac,
        min_stopword_hits,
    )
    gopher_pass: Column = F.lit(True)
    for c in flags.values():
        gopher_pass = gopher_pass & c
    return metrics, flags, gopher_pass


def _quality_flag_cols(
    min_words: int,
    max_words: int,
    min_mean_word_len: float,
    max_mean_word_len: float,
    max_symbol_word_ratio: float,
    max_bullet_line_frac: float,
    max_ellipsis_line_frac: float,
    min_alpha_word_frac: float,
    min_stopword_hits: int,
) -> dict[str, Column]:
    """The quality flags as comparisons of the ALIASED metric columns."""
    return {
        "pass_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "pass_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "pass_symbol_ratio": (F.col("hash_word_ratio") <= max_symbol_word_ratio)
        & (F.col("ellipsis_word_ratio") <= max_symbol_word_ratio),
        "pass_bullet_lines": F.col("bullet_line_frac") <= max_bullet_line_frac,
        "pass_ellipsis_lines": F.col("ellipsis_line_frac") <= max_ellipsis_line_frac,
        "pass_alpha_words": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "pass_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }


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

    Shape at scale (r17): wholly per-document — every metric is a
    sorted-array fold over the doc's own gram fingerprints inside ONE
    projection chain: tokenize once, build each n's ``(h, start, wc)``
    struct array (``xxhash64`` of the word-array slice — grams are
    FINGERPRINTS, never strings, the r15 finding), ``array_sort``, then
    one O(m) pass per metric (run-max for top, adjacent-dup flags +
    interval-merge fold for coverage). No explode, no shuffle, no join,
    no Python: one corpus scan and embarrassingly parallel at 100 TB.
    The old shape exploded ~9 gram rows per word position into a
    (doc, n, start, ghash, wc) relation and paid seven shuffles plus a
    persist for arithmetic that is document-local; the per-doc fold costs
    O(m log m) per document (array_sort), a fine trade for removing every
    exchange — one pathological 100k-word document is one straggler task,
    bounded by the same ``max_words`` rule the filter enforces.

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
    t = F.col(text_col)
    base = docs.select(
        F.col(id_col),
        F.regexp_extract_all(F.lower(F.coalesce(t, F.lit(""))), F.lit(WORD_RE), 0).alias(
            "_w"
        ),
    ).select(
        F.col(id_col),
        F.col("_w"),
        # per-word lengths once: gram word-chars fold from this instead
        # of measuring a materialized gram string
        F.transform(F.col("_w"), F.length).alias("_wl"),
    )
    # each n's sorted fingerprint array in its OWN projection stage so the
    # metric folds below reference it as an attribute (CollapseProject
    # would otherwise duplicate the sort per consumer)
    srt = base.select(
        F.col(id_col),
        F.col("_wl"),
        _arr_sum(F.col("_wl")).alias("_tot"),
        *[
            F.array_sort(_gram_structs(F.col("_w"), F.col("_wl"), n)).alias(f"_srt{n}")
            for n in ns
        ],
    )
    safe_tot = F.greatest(F.col("_tot"), F.lit(1)).cast("double")
    return srt.select(
        F.col(id_col),
        *[
            F.round(
                _run_best(F.col(f"_srt{n}"), lambda x: x["wc"]).cast("double")
                / safe_tot,
                6,
            ).alias(f"top_{n}gram_frac")
            for n in top_ns
        ],
        *[
            F.round(
                _dup_coverage(F.col(f"_srt{n}"), F.col("_wl"), n).cast("double")
                / safe_tot,
                6,
            ).alias(f"dup_{n}gram_frac")
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
    same convention as :func:`gopher_quality_flags`. One projection
    chain, no join (r17): both metric families are per-document
    sorted-array folds, so the whole verdict is map-side — one corpus
    scan, zero shuffles. Compose with :func:`gopher_quality_flags` for
    the complete published filter, or use :func:`gopher_filter` for the
    join-free composition."""
    frame, metric_cols, flag_cols, rep_pass = _repetition_verdict_cols(
        docs, max_dup_line_frac, max_dup_line_char_frac,
        top_ngram_max, dup_ngram_max, text_col, id_col,
    )
    with_metrics = frame.select(
        F.col(id_col), *[v.alias(k) for k, v in metric_cols.items()]
    )
    return with_metrics.select(
        F.col(id_col),
        *metric_cols.keys(),
        *[v.alias(k) for k, v in flag_cols.items()],
        rep_pass.alias("repetition_pass"),
    )


def _repetition_verdict_cols(
    docs: DataFrame,
    max_dup_line_frac: float,
    max_dup_line_char_frac: float,
    top_ngram_max: dict[int, float] | None,
    dup_ngram_max: dict[int, float] | None,
    text_col: str,
    id_col: str,
):
    """Shared builder for :func:`gopher_repetition_flags` and
    :func:`gopher_filter`: a projection chain whose final frame carries
    the raw text (``_t``) plus each n's sorted gram fingerprints, and the
    repetition metric/flag Column dicts over it. Returns
    ``(frame, metrics, flags, repetition_pass)``."""
    top_ngram_max = GOPHER_TOP_NGRAM_MAX if top_ngram_max is None else top_ngram_max
    dup_ngram_max = GOPHER_DUP_NGRAM_MAX if dup_ngram_max is None else dup_ngram_max
    top_ns = tuple(sorted(top_ngram_max))
    dup_ns = tuple(sorted(dup_ngram_max))
    ns = sorted(set(top_ns) | set(dup_ns))
    t = F.col(text_col)
    base = docs.select(
        F.col(id_col),
        t.alias("_t"),
        F.regexp_extract_all(F.lower(F.coalesce(t, F.lit(""))), F.lit(WORD_RE), 0).alias(
            "_w"
        ),
    ).select(F.col(id_col), "_t", "_w", F.transform(F.col("_w"), F.length).alias("_wl"))
    gram_stage = base.select(
        F.col(id_col),
        "_t",
        "_w",
        "_wl",
        _arr_sum(F.col("_wl")).alias("_tot"),
        *[
            F.array_sort(_gram_structs(F.col("_w"), F.col("_wl"), n)).alias(f"_srt{n}")
            for n in ns
        ],
    )
    frame = _line_bigram_stage(
        gram_stage, [id_col, "_wl", "_tot", *[f"_srt{n}" for n in ns]]
    )
    safe_tot = F.greatest(F.col("_tot"), F.lit(1)).cast("double")
    metric_cols: dict[str, Column] = dict(_line_metric_cols())
    metric_cols["top_bigram_frac"] = _top_bigram_col()
    for n in top_ns:
        metric_cols[f"top_{n}gram_frac"] = F.round(
            _run_best(F.col(f"_srt{n}"), lambda x: x["wc"]).cast("double") / safe_tot,
            6,
        )
    for n in dup_ns:
        metric_cols[f"dup_{n}gram_frac"] = F.round(
            _dup_coverage(F.col(f"_srt{n}"), F.col("_wl"), n).cast("double")
            / safe_tot,
            6,
        )
    # flags read the ALIASED metric columns (the metrics are projected in
    # their own stage by both consumers), so each metric fold runs once
    # per row however many flags and passes consume it
    flag_cols = {
        "pass_dup_lines": F.col("dup_line_frac") <= max_dup_line_frac,
        "pass_dup_line_chars": F.col("dup_line_char_frac")
        <= max_dup_line_char_frac,
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
    for c in flag_cols.values():
        rep_pass = rep_pass & c
    return frame, metric_cols, flag_cols, rep_pass


def gopher_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The COMPLETE published Gopher filter (quality rules A1.1 + both
    repetition rule families) as one verdict row per document —
    ``(id, gopher_pass, repetition_pass, keep)`` — in ONE map-side
    projection chain (r17): the quality flags are pure expressions over
    the text and every repetition metric is a per-document sorted-array
    fold, so composing them needs no join. The previous shape
    (``gopher_quality_flags(docs).join(gopher_repetition_flags(docs))``)
    scanned the corpus four times and shuffled it three times for
    document-local arithmetic; this is one scan, zero exchanges — the
    filter runs map-side at 100 TB. Thresholds are the published
    defaults of the two component functions (use those directly for
    custom thresholds or the raw metrics)."""
    frame, rep_metrics, _rep_flags, rep_pass = _repetition_verdict_cols(
        docs, 0.30, 0.20, None, None, text_col, id_col
    )
    q_metrics, _q_flags, gopher_pass = _quality_cols(
        F.col("_t"), 50, 100_000, 3.0, 10.0, 0.1, 0.9, 0.3, 0.8, 2
    )
    with_metrics = _quality_stage(frame).select(
        F.col(id_col),
        *[v.alias(k) for k, v in q_metrics.items()],
        *[v.alias(k) for k, v in rep_metrics.items()],
    )
    passes = with_metrics.select(
        F.col(id_col),
        gopher_pass.alias("gopher_pass"),
        rep_pass.alias("repetition_pass"),
    )
    return passes.select(
        F.col(id_col),
        "gopher_pass",
        "repetition_pass",
        (F.col("gopher_pass") & F.col("repetition_pass")).alias("keep"),
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
