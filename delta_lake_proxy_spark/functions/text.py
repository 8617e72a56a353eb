"""Text-analysis operators for training-data pipelines (charter X4).

All hot-path computation is JVM-side column expressions (``regexp_count``,
``transform``/``aggregate`` over char shingles) — no Python UDFs — so these
run inside whole-stage codegen and scale linearly with document bytes. Each
operator has an exact ANSI-SQL formulation (see ``__spark_entry__.oracle_sql``)
used as its DuckDB correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language heuristic.
# Deterministic and oracle-replicable; priority order breaks score ties.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "que", "pour", "dans"],
    "es": ["el", "la", "los", "que", "es", "para", "con", "una"],
    "zh": ["de", "shi", "le", "bu", "wo", "zai", "you", "he"],
}
LANG_PRIORITY = ["en", "de", "fr", "es", "zh"]

WORD_RE = "[a-z0-9]+"
# BPE-ish tokenization: letter runs, digit runs, single non-space symbols.
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
PUNCT_RE = "[^a-zA-Z0-9\\s]"
EN_STOPWORD_RE = "\\b(" + "|".join(LANG_STOPWORDS["en"]) + ")\\b"


def word_count(text: Column) -> Column:
    return F.regexp_count(F.lower(text), F.lit(WORD_RE))


def token_count(text: Column) -> Column:
    """Whitespace+symbol token count via the BPE-ish regex (charter)."""
    return F.regexp_count(F.lower(text), F.lit(TOKEN_RE))


def text_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[Column, ...] = (),
) -> DataFrame:
    """Per-document stats: chars, words, tokens, punctuation, stopwords,
    average word length, and a deterministic [0,1] quality score.

    ``extra_cols`` lets callers append further per-row columns (e.g. the
    document fingerprint) to the same projection — one scan instead of a
    projection-per-operator self-join.

    Two-stage projection (r17): the raw counts are aliased in their own
    projection and the ratios/quality derive from the ALIASED columns —
    inlining them re-ran each multiply-referenced ``regexp_count`` per
    reference (n_words three times, n_stopwords and n_punct twice; Spark
    does not CSE regex scans, and CollapseProject declines to merge
    projections when it would duplicate non-cheap expressions). Values are
    bit-identical; only the evaluation count changes."""
    t = F.col(text_col)
    # "*" passthrough: extra_cols may reference any caller column (e.g. a
    # pre-lowered text for the fingerprint), not just id/text
    raw = docs.select(
        F.col("*"),
        F.length(t).alias("_n_chars"),
        word_count(t).alias("_n_words"),
        token_count(t).alias("_n_tokens"),
        F.regexp_count(t, F.lit(PUNCT_RE)).alias("_n_punct"),
        F.regexp_count(F.lower(t), F.lit(EN_STOPWORD_RE)).alias("_n_stop"),
        F.regexp_count(t, F.lit("[a-zA-Z]")).alias("_n_alpha"),
    )
    n_chars = F.col("_n_chars")
    n_words = F.col("_n_words")
    n_punct = F.col("_n_punct")
    n_stop = F.col("_n_stop")
    n_alpha = F.col("_n_alpha")
    stop_ratio = n_stop.cast("double") / F.greatest(n_words, F.lit(1))
    alpha_ratio = n_alpha.cast("double") / F.greatest(n_chars, F.lit(1))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    quality = F.round(
        F.lit(0.5) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))),
        6,
    )
    return raw.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.col("_n_tokens").alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        F.round(n_chars.cast("double") / F.greatest(n_words, F.lit(1)), 6).alias(
            "avg_word_len"
        ),
        quality.alias("quality_score"),
        *extra_cols,
    )


def lang_scores(text: Column) -> dict[str, Column]:
    lowered = F.lower(text)
    return {
        lang: F.regexp_count(lowered, F.lit("\\b(" + "|".join(words) + ")\\b"))
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_pred_col(text: Column) -> Column:
    """The language prediction as a single Column expression: the first
    language (in priority order) whose stopword score is >= every later
    language's and > every earlier language's. Composable into any per-row
    projection (e.g. the one-scan ``text_stats`` driver row); the SQL
    oracles replicate the equivalent CASE chain.

    Computed as ``array_max`` over ``(score, -priority_index, lang)``
    structs (r17): the winner is the max score with ties toward the
    smaller priority index — PROVABLY the same language the old nested
    CASE chain selected (the first index attaining the max satisfies
    exactly its >=-later/>-earlier condition, every earlier index fails
    against the max holder), but each of the five stopword ``regexp_count``
    scans now runs ONCE per row instead of once per comparison (the CASE
    chain re-evaluated up to 8 per candidate language, 40 worst-case —
    Spark does not CSE regex scans across CASE branches). NULL text stays
    NULL via the explicit guard (field-wise NULL structs would otherwise
    tie-break to 'en')."""
    scores = lang_scores(text)
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    scores[lang].alias("s"),
                    F.lit(-i).alias("p"),
                    F.lit(lang).alias("l"),
                )
                for i, lang in enumerate(LANG_PRIORITY)
            ]
        )
    )
    return F.when(text.isNull(), F.lit(None).cast("string")).otherwise(best["l"])


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language identification; argmax with fixed priority order
    on ties (en > de > fr > es > zh) so the result is total-order deterministic
    (:func:`lang_pred_col` holds the CASE chain)."""
    scores = lang_scores(F.col(text_col))
    return docs.select(
        F.col(id_col),
        lang_pred_col(F.col(text_col)).alias("pred_lang"),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_PRIORITY],
    )


def fingerprint_col(
    text: Column, shingle_len: int = 8, stride: int = 4, pre_lowered: bool = False
) -> Column:
    """Winnowing-style document fingerprint as a Column: the lexicographic
    minimum of the md5 digests of ``shingle_len``-char shingles sampled every
    ``stride`` chars from the normalized text. Near-identical documents
    collide; computed wholly JVM-side via ``transform`` over a char-offset
    sequence (no explode, no shuffle). The stride trades hash count for
    sensitivity — overlapping shingles (stride < len) still cover every
    byte.

    ``pre_lowered=True`` declares that ``text`` is ALREADY lowercased (an
    attribute from a prior projection). Hot paths should pre-lower: the
    shingle lambda references its input once per element, so an inline
    ``lower(text)`` re-folds the WHOLE document per shingle (~stride'th of
    the doc length times over — measured 2x the fingerprint cost at
    sf0.1); a pre-lowered attribute is a pointer read."""
    norm = text if pre_lowered else F.lower(text)
    n = F.length(norm)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (shingle_len - 1), F.lit(1)), F.lit(stride)),
        lambda i: F.md5(norm.substr(i, F.lit(shingle_len))),
    )
    return F.array_min(shingles)


def fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_len: int = 8,
    stride: int = 4,
) -> DataFrame:
    """Per-document fingerprint table — see :func:`fingerprint_col`."""
    from ..io import spread_if_narrow

    # gated repartition (r17): single-file doc tables need the spread for
    # local parallelism, but this is a pure projection — a well-split
    # corpus must not pay a full shuffle in front of it. The lower() is
    # hoisted to its own projection so the shingle lambda reads an
    # attribute (see fingerprint_col's pre_lowered note).
    return (
        spread_if_narrow(docs, F.col(id_col))
        .select(F.col(id_col), F.lower(F.col(text_col)).alias("_lt"))
        .select(
            F.col(id_col),
            fingerprint_col(
                F.col("_lt"), shingle_len, stride, pre_lowered=True
            ).alias("fingerprint"),
        )
    )


# PII patterns: intersection of Java-regex and RE2 syntax (no lookaround,
# no backrefs) so the DuckDB oracle runs the SAME expressions verbatim.
# Ordered — redaction applies in this order, and counting happens BEFORE
# any replacement so overlapping classes count against the original text.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": ("\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    "ssn": ("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    "phone": ("\\+[0-9][0-9()\\- ]{7,}[0-9]", "<PHONE>"),
}


def pii_scrub(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document PII detection + redaction, wholly JVM-side: one
    ``regexp_count`` per class against the ORIGINAL text, then a
    ``regexp_replace`` chain producing ``redacted``. A corpus-scale scrub
    is therefore a single codegen projection — no shuffle, no Python.
    ``keep`` passes extra columns through the projection (so downstream
    rollups need no self-join).

    Patterns are deliberately RE2-compatible so external engines (and the
    DuckDB oracle) reproduce the exact same matches."""
    t = F.col(text_col)
    counts = {
        name: F.regexp_count(t, F.lit(pat)).alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    }
    red = t
    for name, (pat, repl) in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, repl)
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        *counts.values(),
        red.alias("redacted"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    require_all: bool = False,
) -> DataFrame:
    """Okapi BM25 ranking of documents against ``query_terms`` — the
    classic relevance score, expressed as three declarative aggregations:

    1. tokenize (lower + word regex, explode) -> per-(doc, term) tf and
       per-doc length in ONE pass over the tokens;
    2. document frequency of the QUERY terms only (the token stream is
       filtered to the broadcast-small query set before the df count, so
       the shuffle carries query-term rows, not the whole vocabulary);
    3. score = sum over query terms of idf * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)),
       TakeOrdered top-k.

    All JVM-side; the corpus is scanned once. At 100 TB the dominant cost
    is the tokenize scan — df/avgdl are tiny aggregates. For REPEATED
    queries, materialize the postings once (``bm25_postings`` /
    ``Engine.build_bm25_index``) and rank with
    :func:`bm25_rank_postings` — the probe then reads only the query
    terms' posting rows instead of re-tokenizing the corpus."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
        ).alias("term"),
    )
    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_docs_avgdl = doclen.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    qterms = [t.lower() for t in query_terms]
    qtoks = toks.filter(F.col("term").isin(qterms))
    tf = qtoks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    return bm25_rank_postings(
        tf.join(doclen, id_col),
        query_terms,
        n_docs_avgdl,
        k=k,
        id_col=id_col,
        k1=k1,
        b=b,
        require_all=require_all,
    )


def bm25_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """The materialized-inverted-index relation for Okapi BM25: one row
    per (document, term) carrying the term frequency and the document
    length — ``(id, term, tf, dl[, carry...])`` — from ONE tokenize pass
    (explode -> groupBy tf -> per-doc window sum for dl; the window
    reuses no second scan). This is what ``Engine.build_bm25_index``
    stores: a probe then reads only the query terms' posting rows
    (term-clustered files + footer stats prune the rest) instead of
    re-tokenizing the corpus per query. ``carry_cols`` (the source's
    partition columns) fold through the aggregation keys so a partition
    ACL compiles into a plain row predicate on the stored index —
    the governed-index contract."""
    from pyspark.sql import Window

    carry = list(carry_cols)
    toks = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, *carry, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    return tf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy(id_col))
    )


def _bm25_idf_expr() -> Column:
    """Lucene-style non-negative idf: log((n - df + 0.5)/(df + 0.5) + 1)."""
    return F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )


def _bm25_term_score_expr(k1: float, b: float) -> Column:
    """Per-(doc, term) BM25 contribution over (idf, tf, dl, avgdl) cols."""
    return (
        F.col("idf")
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )


def bm25_rank_postings(
    postings: DataFrame,
    query_terms: list[str],
    n_docs_avgdl: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    require_all: bool = False,
) -> DataFrame:
    """Rank posting rows (:func:`bm25_postings` shape — ``(id, term, tf,
    dl)``) against ``query_terms``: the ONE place the BM25 formula lives
    (``_bm25_idf_expr``/``_bm25_term_score_expr``, shared with the batch
    ranker below), used by the batch scorer (:func:`bm25_topk`) and the
    index probe (``Engine.bm25_probe``), so the paths can never score
    differently. ``n_docs_avgdl`` is a one-row (n, avgdl) DataFrame —
    computed in-plan by the batch scorer, read from pinned
    ``graft.bm25.*`` properties by the probe. Document frequency is
    counted from the query-term slice itself (a posting relation holds
    one row per (doc, term), so the slice's per-term row count IS df).
    ``require_all=True`` switches to CONJUNCTIVE retrieval: only
    documents matching EVERY query term rank (the per-doc DISTINCT
    matched-term count, so the AND is one filter on the same aggregate —
    no extra scan, and robust to a posting relation with duplicate
    (id, term) rows). Output: (id, bm25) descending,
    ties toward the smaller id, limited to ``k``."""
    qterms = sorted({t.lower() for t in query_terms})
    sl = postings.filter(F.col("term").isin(qterms))
    df_ = sl.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # the match count exists only for the conjunctive filter, and it counts
    # DISTINCT terms (advice r16: a caller passing a non-contractual posting
    # relation with duplicate (id, term) rows would otherwise silently drop
    # documents that match every term); computing it only when asked keeps
    # the disjunctive plan free of the distinct-aggregate Expand.
    aggs = [F.round(F.sum("s"), 6).alias("bm25")]
    if require_all:
        aggs.append(F.count_distinct(F.col("term")).alias("_mt"))
    scored = (
        sl.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs_avgdl))
        .withColumn("idf", _bm25_idf_expr())
        .withColumn("s", _bm25_term_score_expr(k1, b))
        .groupBy(id_col)
        .agg(*aggs)
    )
    if require_all:
        scored = scored.filter(F.col("_mt") == len(qterms)).drop("_mt")
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)


def bm25_rank_postings_batch(
    postings: DataFrame,
    query_terms_rel: DataFrame,
    n_docs_avgdl: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    k1: float = 1.2,
    b: float = 0.75,
    require_all: bool = False,
) -> DataFrame:
    """Rank posting rows against a whole BATCH of queries in one plan —
    the N-query form of :func:`bm25_rank_postings` with the same shared
    formula expressions. ``query_terms_rel`` is the exploded
    ``(query_id, term)`` relation (distinct rows — repeated query terms
    score once, matching the single ranker's set semantics); it is
    broadcast twice: once to slice the postings (semi-join — callers
    wanting footer pruning pre-filter with an ``isin`` literal, as
    ``Engine.bm25_probe_batch`` does) and once to fan each matched
    posting out to the queries that asked for its term. Document
    frequency is per TERM (independent of which query asked), so it is
    counted once on the slice and shared by every query.
    ``require_all=True`` keeps only (query, doc) pairs matching every
    one of THAT query's terms (per-query distinct term counts broadcast
    next to the match counts). Output: ``(query_id, id, bm25)``,
    top-``k`` per query by window rank — per query identical to the
    single ranker."""
    from pyspark.sql import Window

    terms = query_terms_rel.select("term").distinct()
    sl = postings.join(F.broadcast(terms), "term", "semi")
    df_ = sl.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # _mt counts DISTINCT matched terms (advice r16): count(*) counted join
    # fan-out rows, so a non-distinct (query_id, term) relation from a
    # direct caller silently dropped documents matching every term (the
    # engine path dedupes first, but the function must be robust on its
    # own). Computed only for the conjunctive path — the disjunctive plan
    # stays free of the distinct-aggregate Expand.
    aggs = [F.round(F.sum("s"), 6).alias("bm25")]
    if require_all:
        aggs.append(F.count_distinct(F.col("term")).alias("_mt"))
    scored = (
        sl.join(F.broadcast(df_), "term")
        .join(F.broadcast(query_terms_rel.select(query_id_col, "term")), "term")
        .crossJoin(F.broadcast(n_docs_avgdl))
        .withColumn("idf", _bm25_idf_expr())
        .withColumn("s", _bm25_term_score_expr(k1, b))
        .groupBy(query_id_col, id_col)
        .agg(*aggs)
    )
    if require_all:
        q_n = query_terms_rel.groupBy(query_id_col).agg(
            F.count_distinct(F.col("term")).alias("_qt")
        )
        scored = (
            scored.join(F.broadcast(q_n), query_id_col)
            .filter(F.col("_mt") == F.col("_qt"))
            .drop("_qt", "_mt")
        )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_chars: int = 1024,
    overlap: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping character windows (the RAG /
    context-window preparation step): one ``posexplode`` over a codegen
    offset sequence — a map-only pass, no shuffle, no Python. Output:
    (id, chunk_idx, chunk, chunk_chars); consecutive chunks share
    ``overlap`` characters, and every character of the source is covered.
    A corpus-scale chunker is therefore exactly one projection wider than
    the scan."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError("require 0 <= overlap < chunk_chars")
    step = chunk_chars - overlap
    t = F.col(text_col)
    offsets = F.sequence(
        F.lit(1), F.greatest(F.length(t) - overlap, F.lit(1)), F.lit(step)
    )
    chunk = t.substr(F.col("_off"), F.lit(chunk_chars))
    return docs.select(
        F.col(id_col), t, F.posexplode(offsets).alias("chunk_idx", "_off")
    ).select(
        F.col(id_col),
        F.col("chunk_idx"),
        chunk.alias("chunk"),
        F.length(chunk).alias("chunk_chars"),
    )


def quality_tier(
    score: Column, high: float = 0.55, mid: float = 0.45
) -> Column:
    """Bucket a [0,1] quality score into 'high'/'mid'/'low' tiers."""
    return (
        F.when(score >= high, F.lit("high"))
        .when(score >= mid, F.lit("mid"))
        .otherwise(F.lit("low"))
    )


def stratified_keep(
    tier: Column, doc_id: Column, keep_mod: dict[str, int]
) -> Column:
    """Deterministic per-stratum sampling flag: a row is kept iff
    ``doc_id % keep_mod[tier] == 0`` (mod 1 keeps everything).

    Modular id sampling rather than rand(): shuffle-free, reproducible
    across engines and runs (the property a training-data pipeline needs
    for auditable mixes), and exactly expressible by an external oracle.
    At scale this is a map-side filter — no shuffle, no state."""
    kept = None
    for t, mod in keep_mod.items():
        cond = (tier == t) & (F.pmod(doc_id, F.lit(mod)) == 0)
        kept = cond if kept is None else (kept | cond)
    return kept if kept is not None else F.lit(True)


def unigram_nll(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LM-based quality scoring (the perplexity filter of CCNet, Wenzek et
    al. 2020) with the language model trained on the corpus itself: an
    add-one-smoothed unigram model ``p(t) = (c_t + 1) / (N + V)``, scoring
    each document by per-token negative log-likelihood and perplexity.
    High-perplexity documents are boilerplate/garbage candidates; the filter
    policy (threshold or head/middle/tail buckets as in CCNet) belongs to
    the caller.

    Determinism contract (external oracles hash the values): each term's
    log-prob is rounded to 9 dp and accumulated as DECIMAL(21,9) — decimal
    sums are exact and order-independent, so any ANSI engine reproduces the
    per-document sums bit-for-bit; floats only enter at the final
    divide/round.

    Plan shape at 100 TB: one tokenize scan -> per-(doc, term) tf (one
    shuffle with map-side partial agg) -> vocab counts roll up FROM tf
    (second shuffle, vocab-sized not corpus-sized) -> tf joins the vocab
    log-probs (AQE broadcasts the vocab side when it fits) -> per-doc agg.
    Pure column expressions throughout — no Python, no driver state.

    Documents with zero word tokens have no likelihood and are omitted
    (exactly the rows a GROUP BY over their empty token stream omits).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf feeds BOTH the vocab model and the per-doc scoring join; without a
    # materialization point Catalyst re-derives each branch from the source
    # (three corpus scans at 100 TB). Lazy localCheckpoint: one scan fills
    # it on first action, both branches reuse, ContextCleaner reclaims it.
    tf = tf.localCheckpoint(eager=False)
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    tot = vocab.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v"))
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(
            F.log(
                (F.col("c") + F.lit(1)).cast("double")
                / (F.col("n") + F.col("v")).cast("double")
            ),
            9,
        )
        .cast("decimal(21,9)")
        .alias("logp"),
    )
    doc = (
        tf.join(lp, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            # decimal(10,0) * decimal(21,9) -> decimal(32,9): exact, and the
            # running sum stays inside Spark's 38-digit ceiling
            F.sum(F.col("tf").cast("decimal(10,0)") * F.col("logp")).alias("_s"),
        )
    )
    nll = F.round((-F.col("_s")).cast("double") / F.col("n_tokens"), 6)
    return doc.select(
        F.col(id_col),
        "n_tokens",
        nll.alias("unigram_nll"),
        F.round(F.exp(nll), 3).alias("unigram_ppl"),
    )


def dsir_importance_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023),
    unigram form: score every RAW document by how target-like it is under
    bag-of-words models of the target vs the raw corpus —
    ``log w(x) = sum_t tf_t * (log p_target(t) - log p_raw(t))`` with
    add-one smoothing on both models. ``is_target`` marks the target rows
    (the high-quality seed set); every row is scored, so the caller can
    resample the raw pool by weight (the paper uses Gumbel top-k; with a
    deterministic key, ``F.rand(seed)`` or a hash works distributed).

    Determinism contract matches :func:`unigram_nll`: per-term log-ratios
    round to 9 dp and accumulate as DECIMAL(21,9) — exact order-independent
    sums; floats only at the final divide/round.

    Plan shape at 100 TB: one tokenize scan -> per-(doc, term) tf -> the
    two vocab models roll up FROM tf in ONE aggregation (conditional sums,
    vocab-sized) -> tf joins the per-term log-ratio (AQE broadcasts when it
    fits) -> per-doc agg. Pure column expressions; the corpus is read once.

    Output: ``(id, n_tokens, log_weight, avg_log_weight)`` — log_weight is
    the document's total log importance ratio, avg the per-token form
    (length-normalized, the usual ranking key). Token-less docs are
    omitted (no likelihood under either model).
    """
    toks = docs.select(
        F.col(id_col),
        is_target.cast("boolean").alias("_tgt"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "_tgt", "term").agg(F.count(F.lit(1)).alias("tf"))
    # shared by the model aggregation and the scoring join — one scan, not
    # three (see unigram_nll)
    tf = tf.localCheckpoint(eager=False)
    # both unigram models from ONE vocab-sized aggregation
    vocab = tf.groupBy("term").agg(
        F.sum(F.when(F.col("_tgt"), F.col("tf")).otherwise(F.lit(0))).alias("ct"),
        F.sum("tf").alias("cr"),  # raw model = the whole corpus
    )
    tot = vocab.agg(
        F.sum("ct").alias("nt"),
        F.sum("cr").alias("nr"),
        F.count(F.lit(1)).alias("v"),
    )
    ratio = vocab.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(
            F.log(
                (F.col("ct") + F.lit(1)).cast("double")
                / (F.col("nt") + F.col("v")).cast("double")
            )
            - F.log(
                (F.col("cr") + F.lit(1)).cast("double")
                / (F.col("nr") + F.col("v")).cast("double")
            ),
            9,
        )
        .cast("decimal(21,9)")
        .alias("logr"),
    )
    doc = (
        tf.join(ratio, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf").cast("decimal(10,0)") * F.col("logr")).alias("_s"),
        )
    )
    return doc.select(
        F.col(id_col),
        "n_tokens",
        F.round(F.col("_s").cast("double"), 6).alias("log_weight"),
        F.round(F.col("_s").cast("double") / F.col("n_tokens"), 6).alias(
            "avg_log_weight"
        ),
    )


def ngram_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark DECONTAMINATION (the GPT-3 appendix-C / Dodge et al.
    procedure): find training documents sharing any word ``n``-gram with
    an evaluation set, so eval leakage can be dropped before training.
    n=13 is the published default — long enough that shared n-grams are
    near-certain copies, short enough to survive light edits.

    Output: ``(train_id, eval_id, shared_ngrams)`` for pairs sharing at
    least ``min_shared`` distinct n-grams — the caller drops/flags the
    ``train_id`` side (an anti-join on the output is the drop step).
    Companion to ``quality.contamination_scores``, which returns the
    per-train-doc leaked-shingle FRACTION without attribution; this one
    says WHICH eval documents leaked (the view needed to retire
    compromised benchmark items, not just drop training docs).

    At 100 TB: the train side is one map-only shingle explode to 8-byte
    xxhash64 gram keys (the text never shuffles), the eval side is tiny by
    construction (benchmarks are MBs), so AQE broadcasts it and the join
    filters map-side — the shuffle carries only matched (train_id,
    eval_id, gram) triples, which decontamination makes rare. Documents
    shorter than ``n`` words cannot carry a full n-gram and are excluded
    on both sides (the standard rule — a short tail shingle would
    manufacture spurious matches). Tokenization is ``WORD_RE`` —
    IDENTICAL to ``quality.contamination_scores`` — so a punctuation
    difference between train and eval never splits a gram the fraction
    score would have matched."""

    def grams(df: DataFrame, out_id: str) -> DataFrame:
        words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
        # the short-doc guard rides the gram array (when -> explode emits
        # no rows below n words, exactly what the old filter(size >= n)
        # kept) instead of a Filter node: predicate pushdown substituted
        # that filter through the projection, so the tokenize regex ran
        # TWICE per row — once in the pushed size() check, once in the
        # gram transform (r17; Spark does not CSE across Filter/Project).
        gram_arr = F.when(
            F.size("_w") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("_w") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i, F.lit(n))),
            ),
        )
        return (
            df.select(F.col(id_col).alias(out_id), words.alias("_w"))
            .select(out_id, F.explode(gram_arr).alias("_g"))
            .select(out_id, F.xxhash64("_g").alias("_gh"))
            .dropDuplicates([out_id, "_gh"])
        )

    t = grams(train, "train_id")
    e = grams(eval_docs, "eval_id")
    return (
        t.join(F.broadcast(e), "_gh")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )


def _ngram_structs(words: Column, n: int, names: tuple[str, ...]) -> Column:
    """Array of word n-gram STRUCTS over a tokenized word array —
    ``transform(sequence(0, size-n), i -> struct(w[i] as names[0], ...))``,
    empty below ``n`` words. The struct-producing sibling of
    ``quality._word_ngrams`` (which emits joined gram strings), shared by
    the bigram and Stupid Backoff scorers so the size-guard and
    element_at arithmetic exist once."""
    assert len(names) == n

    def gram(i: Column) -> Column:
        return F.struct(
            *[F.element_at(words, i + k + 1).alias(names[k]) for k in range(n)]
        )

    return F.when(
        F.size(words) >= n,
        F.transform(F.sequence(F.lit(0), F.size(words) - n), gram),
    ).otherwise(F.array())


def bigram_nll(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram companion to :func:`unigram_nll` (one step toward CCNet's
    5-gram KenLM filter): an add-one-smoothed conditional model
    ``p(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)`` trained on the corpus
    itself, scoring each document by the mean negative log-likelihood of
    its word TRANSITIONS (bigram-vocab V = distinct words appearing in any
    transition; the first word of a doc is not scored — transitions only,
    so documents with fewer than two word tokens are omitted). Catches
    shuffled-word salad that a unigram model scores as fluent.

    Same determinism contract as :func:`unigram_nll`: per-term log-probs
    rounded to 9 dp, accumulated as DECIMAL (exact, order-independent);
    floats only at the final divide.

    Plan shape at 100 TB: one tokenize scan -> per-(doc, bigram) tf (one
    shuffle, map-side combine) materialized once (lazy localCheckpoint) ->
    corpus bigram counts, context counts and V roll up FROM tf
    (bigram-vocab-sized, never corpus-sized) -> tf joins the model
    (AQE broadcasts when it fits) -> per-doc agg. No Python.
    """
    words = docs.select(
        F.col(id_col),
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0).alias("_w"),
    )
    bgs = words.select(
        F.col(id_col),
        F.explode(_ngram_structs(F.col("_w"), 2, ("w1", "w2"))).alias("bg"),
    ).select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    tf = bgs.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.localCheckpoint(eager=False)
    bg_counts = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("c_bg"))
    bg_counts = bg_counts.localCheckpoint(eager=False)
    ctx = bg_counts.groupBy("w1").agg(F.sum("c_bg").alias("c_ctx"))
    vocab = (
        bg_counts.select(F.col("w1").alias("t"))
        .unionByName(bg_counts.select(F.col("w2").alias("t")))
        .agg(F.countDistinct("t").alias("v"))
    )
    lp = (
        bg_counts.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("c_bg") + F.lit(1)).cast("double")
                    / (F.col("c_ctx") + F.col("v")).cast("double")
                ),
                9,
            )
            .cast("decimal(21,9)")
            .alias("logp"),
        )
    )
    doc = (
        tf.join(lp, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_transitions"),
            F.sum(F.col("tf").cast("decimal(10,0)") * F.col("logp")).alias("_s"),
        )
    )
    nll = F.round((-F.col("_s")).cast("double") / F.col("n_transitions"), 6)
    return doc.select(
        F.col(id_col),
        "n_transitions",
        nll.alias("bigram_nll"),
        F.round(F.exp(nll), 3).alias("bigram_ppl"),
    )


def stupid_backoff_nll(
    docs: DataFrame,
    train: DataFrame | None = None,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Trigram Stupid Backoff scoring (Brants et al. 2007, "Large Language
    Models in Machine Translation" — the score designed FOR distributed
    count tables): every token is scored with the LONGEST context whose
    count exists, discounted by ``alpha`` per backoff level:

      S(w3 | w1 w2) = c(w1 w2 w3)/c(w1 w2)        when the trigram is seen
                    = a * c(w2 w3)/c(w2)          else, when the bigram is
                    = a^2 * (c(w3)+1)/(N+V)       else (add-one unigram
                                                   floor, so unseen words
                                                   stay finite)

    with position 0 scored by the unigram floor and position 1 by the
    bigram→unigram chain. ``train`` is the counting corpus (defaults to
    ``docs`` — note self-scoring never backs off at the trigram level
    since every scored trigram was counted; pass a held-out ``train``
    for a real backoff model). Output per doc: ``n_tokens`` scored,
    ``sb_nll`` (mean -log S), ``sb_ppl``.

    Same determinism contract as :func:`unigram_nll` / :func:`bigram_nll`:
    each token's log-score rounds to 9 dp and accumulates as DECIMAL.

    Plan shape at 100 TB: count tables (uni/bi/tri) roll up from ONE
    materialized tokenize pass over ``train``, all vocab-sized; the
    scored corpus explodes once and rolls up to per-doc (w1, w2, w3)
    TERM FREQUENCIES, so the five joins against the count tables (AQE
    broadcasts each that fits) probe distinct trigrams per doc, not
    every token of a repetitive document; one per-doc aggregation.
    No Python.
    """
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    train = docs if train is None else train

    def words_of(df: DataFrame, with_id: bool):
        return df.select(
            *([F.col(id_col)] if with_id else []),
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_RE), 0
            ).alias("_w"),
        )

    tw = words_of(train, with_id=False)
    # the three count tables all derive from this tokenization — without a
    # materialization point each would re-scan and re-tokenize the train
    # corpus (the unigram_nll tf pattern)
    tw = tw.localCheckpoint(eager=False)
    uni = (
        tw.select(F.explode("_w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    uni = uni.localCheckpoint(eager=False)
    tot = uni.agg(F.sum("c1").alias("n"), F.count(F.lit(1)).alias("v"))
    bi = (
        tw.select(F.explode(_ngram_structs(F.col("_w"), 2, ("wa", "wb"))).alias("g"))
        .groupBy(F.col("g.wa").alias("wa"), F.col("g.wb").alias("wb"))
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    bi = bi.localCheckpoint(eager=False)
    tri = (
        tw.select(
            F.explode(_ngram_structs(F.col("_w"), 3, ("wa", "wb", "wc"))).alias("g")
        )
        .groupBy(
            F.col("g.wa").alias("wa"),
            F.col("g.wb").alias("wb"),
            F.col("g.wc").alias("wc"),
        )
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    # scored positions rolled up to per-doc (w1, w2, w3) term frequencies
    # (the unigram_nll tf shape): the position class is recoverable from
    # the null pattern — w2 null <=> pos 0, w1-only null <=> pos 1 — so
    # the five joins probe per-doc DISTINCT trigrams, not every token of a
    # repetitive document
    pos_rel = (
        words_of(docs, with_id=True)
        .select(
            F.col(id_col),
            F.explode(
                F.when(
                    F.size("_w") >= 1,
                    F.transform(
                        F.sequence(F.lit(0), F.size("_w") - 1),
                        lambda i: F.struct(
                            F.when(i >= 2, F.element_at(F.col("_w"), i - 1)).alias("w1"),
                            F.when(i >= 1, F.element_at(F.col("_w"), i)).alias("w2"),
                            F.element_at(F.col("_w"), i + 1).alias("w3"),
                        ),
                    ),
                ).otherwise(F.array())
            ).alias("g"),
        )
        .groupBy(F.col(id_col), "g.w1", "g.w2", "g.w3")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select(F.col(id_col), "w1", "w2", "w3", "tf")
    )
    j = (
        pos_rel.join(
            tri.select(
                F.col("wa").alias("w1"), F.col("wb").alias("w2"),
                F.col("wc").alias("w3"), "c3",
            ),
            ["w1", "w2", "w3"],
            "left",
        )
        .join(
            bi.select(F.col("wa").alias("w1"), F.col("wb").alias("w2"),
                      F.col("c2").alias("c2_den")),
            ["w1", "w2"],
            "left",
        )
        .join(
            bi.select(F.col("wa").alias("w2"), F.col("wb").alias("w3"),
                      F.col("c2").alias("c2_bo")),
            ["w2", "w3"],
            "left",
        )
        .join(uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1_w2")),
              ["w2"], "left")
        .join(uni.select(F.col("w").alias("w3"), F.col("c1").alias("c1_w3")),
              ["w3"], "left")
        .crossJoin(F.broadcast(tot))
    )
    la = F.log(F.lit(float(alpha)))
    # a train corpus with no word tokens cannot score anything: raise at
    # execution instead of silently emitting null sb_nll for every doc
    denom = F.when(
        F.col("v") > 0, (F.col("n") + F.col("v")).cast("double")
    ).otherwise(
        F.raise_error(
            F.lit("stupid_backoff_nll: train corpus has no word tokens")
        ).cast("double")
    )
    log_uni = F.log(
        (F.coalesce(F.col("c1_w3"), F.lit(0)) + F.lit(1)).cast("double") / denom
    )
    log_bi = F.log(F.col("c2_bo").cast("double") / F.col("c1_w2").cast("double"))
    log_tri = F.log(F.col("c3").cast("double") / F.col("c2_den").cast("double"))
    # bigram-or-back chain (used at pos >= 1); one alpha already applied
    # by the CALLER level where appropriate
    bi_or_uni = F.when(F.col("c2_bo").isNotNull(), log_bi).otherwise(la + log_uni)
    log_s = (
        F.when(F.col("w2").isNull(), log_uni)  # pos 0
        .when(F.col("w1").isNull(), bi_or_uni)  # pos 1
        .otherwise(
            F.when(F.col("c3").isNotNull(), log_tri).otherwise(la + bi_or_uni)
        )
    )
    doc = (
        j.select(
            F.col(id_col),
            F.col("tf"),
            F.round(log_s, 9).cast("decimal(21,9)").alias("_lp"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf").cast("decimal(10,0)") * F.col("_lp")).alias("_s"),
        )
    )
    nll = F.round((-F.col("_s")).cast("double") / F.col("n_tokens"), 6)
    return doc.select(
        F.col(id_col),
        "n_tokens",
        nll.alias("sb_nll"),
        F.round(F.exp(nll), 3).alias("sb_ppl"),
    )


def vocab_kl_divergence(
    corpus_p: DataFrame,
    corpus_q: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Distribution drift between two corpora: the unigram KL divergence
    ``KL(P || Q) = sum_w P(w) log(P(w) / Q(w))`` with add-one smoothing
    over the UNION vocabulary (so a term absent from one side stays
    finite), plus the ``top_k`` terms contributing most — the standard
    monitor for "did this crawl snapshot / domain mix drift from the
    last one", and the aggregate DSIR's per-document log-ratios roll up
    to.

    Output: one row per top-|contribution| term (``term``, ``p``, ``q``,
    ``kl_term``) with the corpus-level total repeated in ``kl_total`` —
    a single small result; the corpora are each scanned once into
    vocab-sized count tables, outer-joined on the term, aggregated. The
    top-k is a TakeOrdered, never a global sort. No Python.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(
                F.explode(
                    F.regexp_extract_all(
                        F.lower(F.col(text_col)), F.lit(WORD_RE), 0
                    )
                ).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias(name))
        )

    joined = counts(corpus_p, "cp").join(counts(corpus_q, "cq"), "term", "full").select(
        "term",
        F.coalesce(F.col("cp"), F.lit(0)).alias("cp"),
        F.coalesce(F.col("cq"), F.lit(0)).alias("cq"),
    )
    joined = joined.localCheckpoint(eager=False)
    tot = joined.agg(
        F.sum("cp").alias("np"),
        F.sum("cq").alias("nq"),
        F.count(F.lit(1)).alias("v"),
    )
    probs = joined.crossJoin(F.broadcast(tot)).select(
        "term",
        ((F.col("cp") + 1).cast("double") / (F.col("np") + F.col("v"))).alias("p"),
        ((F.col("cq") + 1).cast("double") / (F.col("nq") + F.col("v"))).alias("q"),
    )
    terms = probs.select(
        "term", "p", "q", (F.col("p") * F.log(F.col("p") / F.col("q"))).alias("kl_term")
    )
    terms = terms.localCheckpoint(eager=False)
    total = terms.agg(F.round(F.sum("kl_term"), 9).alias("kl_total"))
    return (
        terms.crossJoin(F.broadcast(total))
        .orderBy(F.abs(F.col("kl_term")).desc(), F.col("term").asc())
        .limit(top_k)
        .select(
            "term",
            F.round("p", 9).alias("p"),
            F.round("q", 9).alias("q"),
            F.round("kl_term", 9).alias("kl_term"),
            "kl_total",
        )
    )


def hash_embed(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    carry_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Feature-hashing document embedder (the "hashing trick",
    Weinberger et al. 2009, ICML): each token hashes to a bucket in
    ``[0, dim)`` with an independent hash choosing its sign (the
    unbiasing trick from the paper), signed token counts accumulate per
    bucket, and the vector L2-normalizes — a deterministic, model-free
    embedding whose cosine approximates token-multiset similarity.

    Why it belongs in a 100 TB pipeline: the embedding-cosine dedup and
    ANN surfaces (``dedup.embedding_lsh_index``,
    ``Engine.build_embedding_index`` / ``build_ivf_index``) consume an
    embedding column that normally comes from a learned model; this
    gives the same surfaces a zero-dependency vectorizer for cheap
    candidate generation and corpus triage — pure codegen in ONE scan of
    the corpus (explode_outer → two hash-keyed aggregations → map
    lookup; the outer explode keeps token-less docs as a zero-weight row,
    so no second scan / join-back is needed to cover every id — review
    r16), no Python, no model artifact to ship or version, identical on
    every executor and every run.

    Output: ``(id, embedding array<float>[, carry...])`` with unit L2
    norm, every input id exactly once; token-less documents keep the
    zero vector, whose cosine is NULL to everything (``similarity
    .cosine``) — excluded from every ranking and threshold, they match
    nothing. ``carry_cols`` (the source's partition columns) ride the
    aggregation keys so a partition ACL compiles into a plain row
    predicate on a persisted index of these vectors — the
    governed-index contract.

    Reference parity: the reference proxies storage bytes
    (src/main.rs); vectorization is part of this repo's LLM-pipeline
    charter, not a reference operator."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    carry = list(carry_cols)
    toks = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.explode_outer(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
        ).alias("term"),
    )
    bucket = F.coalesce(
        F.pmod(F.xxhash64(F.lit(int(seed)), F.col("term")), F.lit(dim)).cast(
            "int"
        ),
        F.lit(0),
    )
    sign = F.when(F.col("term").isNull(), F.lit(0.0)).when(
        F.pmod(F.xxhash64(F.lit(int(seed) + 1), F.col("term")), F.lit(2)) == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    by_bucket = toks.groupBy(
        F.col(id_col), *[F.col(c) for c in carry], bucket.alias("bucket")
    ).agg(F.sum(sign).alias("w"))
    agg = by_bucket.groupBy(id_col, *carry).agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "w"))).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(int(dim) - 1)),
        lambda d: F.coalesce(F.element_at(F.col("m"), d.cast("int")), F.lit(0.0)),
    )
    nrm = F.sqrt(F.aggregate(dense, F.lit(0.0), lambda a, x: a + x * x))
    # a zero-norm vector (token-less doc, or all signed counts cancelled)
    # divides by 1 and stays zero — a conditional divide would still be
    # evaluated on the zero branch under ANSI codegen and throw
    safe = F.when(nrm > 0, nrm).otherwise(F.lit(1.0))
    unit = F.transform(dense, lambda x: x / safe)
    return agg.select(
        F.col(id_col),
        unit.cast("array<float>").alias("embedding"),
        *[F.col(c) for c in carry],
    )
