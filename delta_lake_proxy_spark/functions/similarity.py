"""Similarity search over embedding columns (charter X3).

Baseline: brute-force cosine top-k — a single scan with the score computed by
JVM-side higher-order functions (``zip_with`` + ``aggregate`` in double
precision), then ``orderBy().limit(k)`` which Spark executes as a distributed
TakeOrdered (per-partition top-k + driver merge, no full sort shuffle).

Scale path: deterministic random-hyperplane LSH — 16 sign bits per vector,
computed from hash-derived hyperplanes (no stored model, identical on any
cluster), bucketed self-join for near-neighbor candidate generation; and an
IVF-style variant that assigns vectors to hash-sampled centroids so queries
probe only a fraction of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two array<float|double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # a zero-norm vector scores NULL to everything rather than killing
    # the whole job with ANSI DIVIDE_BY_ZERO (one token-less doc in a
    # corpus of billions must not fail the query). NULL — not 0 — is the
    # ranking-correct degenerate value: 0 would promote an empty doc
    # above genuinely anti-correlated (negative-cosine) documents in any
    # top-k, while NULL sorts last under the engine's `score DESC`
    # convention and drops out of every `>= threshold` filter. The inner
    # substituted-1 divisor only exists because ANSI codegen evaluates
    # both CASE branches; for every nonzero pair the division is
    # bit-identical to the unguarded form (the value the SQL oracles
    # replicate).
    #
    # PERFORMANCE: this form re-evaluates each norm() aggregate up to
    # three times per call site (outer condition, inner condition, safe
    # branch) — Spark does not CSE across higher-order-function
    # boundaries. Pair scorers must NOT call this per pair: norms are
    # per-vector quantities, so precompute them once per row before the
    # pair join and score with :func:`cosine_from_norms`, which pays one
    # dot() per pair and scalar arithmetic for the guard.
    return cosine_from_norms(dot(a, b), norm(a), norm(b))


def cosine_from_norms(dot_ab: Column, na: Column, nb: Column) -> Column:
    """Guarded cosine from a dot-product column and two PRECOMPUTED norm
    columns. Same NULL-for-zero-norm semantics and bit-identical value as
    :func:`cosine` (``na * nb`` multiplies in the same order as
    ``norm(a) * norm(b)`` did inline), but when ``na``/``nb`` are plain
    column references the thrice-evaluated guard costs three scalar
    multiplies instead of six array aggregates per pair."""
    denom = na * nb
    safe = F.when(denom > 0, denom).otherwise(F.lit(1.0))
    return F.when(denom > 0, dot_ab / safe)


def fold_norm(vals) -> float:
    """Python-side L2 norm with the SAME left-fold order as ``norm()``'s
    Spark ``aggregate()`` — plain ``s += x*x`` in element order, then
    ``sqrt`` — so a literal query vector's norm can be folded at plan time
    and stay bit-identical to what the executor would have computed."""
    import math

    s = 0.0
    for x in vals:
        s += float(x) * float(x)
    return math.sqrt(s)


def _scored_topk_against_query(
    embeddings: DataFrame,
    q: Column,
    qnorm: float,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared literal-query scorer: one dot + one norm aggregate per row
    (the query norm arrives as a plan-time literal; the row norm is
    computed in a separate projection so the guard's three references hit
    a cheap attribute, not three aggregate re-evaluations — Catalyst's
    CollapseProject declines to inline non-cheap aliases used more than
    once). Same TakeOrdered top-k as before."""
    scored = embeddings.select(
        F.col(id_col),
        dot(F.col(vec_col), q).alias("_dot"),
        norm(F.col(vec_col)).alias("_na"),
    ).select(
        F.col(id_col),
        F.round(
            cosine_from_norms(F.col("_dot"), F.col("_na"), F.lit(qnorm)), 6
        ).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    Output: (id, score) with score rounded to 6 decimals; ordering is total
    (score desc, id asc) so the selected set is deterministic.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return _scored_topk_against_query(
        embeddings, q, fold_norm(query_vec), k, id_col, vec_col
    )


def _hyperplane(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane: component d is derived from
    xxhash64(plane, d) mapped to [-0.5, 0.5). Identical on every executor and
    every run — no fitted model to ship."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.pmod(F.xxhash64(F.lit(plane), d), F.lit(100003)).cast("double")
            / F.lit(100003.0)
            - F.lit(0.5)
        ),
    )


def lsh_bucket(
    vec: Column, dim: int, num_planes: int = 16, axis_planes: bool = False
) -> Column:
    """Random-hyperplane signature: ``num_planes`` sign bits packed into a long.

    ``axis_planes=True`` uses the first ``num_planes`` coordinate axes as the
    hyperplanes (sign of component p). For embeddings with no privileged
    axes this is the same random-projection family — and, unlike the
    hash-derived planes, it is reproducible by an external SQL oracle.
    """
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        proj = (
            F.element_at(vec, p + 1).cast("double")
            if axis_planes
            else dot(vec, _hyperplane(p, dim))
        )
        bit = F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def lsh_near_neighbors(
    embeddings: DataFrame,
    dim: int = 64,
    num_planes: int = 12,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    axis_planes: bool = False,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing.

    Vectors sharing the full sign signature land in one bucket; pairs within a
    bucket get exact cosine verification. Recall can be raised by lowering
    ``num_planes`` (coarser buckets) — the classic LSH precision/recall dial.

    Buckets larger than ``max_bucket_size`` are salted into sub-buckets
    (``dedup.salt_oversized_buckets``): one hot bucket — e.g. a mass of
    near-identical embeddings — would otherwise make the self-join quadratic
    in that bucket's size. Pairs split across sub-buckets are missed
    (documented recall trade; ``None`` disables the cap).
    """
    from .dedup import salt_oversized_buckets

    # _norm is computed ONCE PER ROW here (O(rows), and it rides the salt
    # persist) — NOT per pair: the r16 zero-norm guard inlined norm(a)*norm(b)
    # into the pair scorer, and with the threshold filter pushed into the
    # join condition Spark evaluated up to 13 array aggregates per candidate
    # pair. With precomputed norms the join condition pays ONE dot()
    # aggregate per pair and scalar arithmetic for the guard.
    with_bucket = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        lsh_bucket(F.col(vec_col), dim, num_planes, axis_planes).alias("_bucket"),
        norm(F.col(vec_col)).alias("_norm"),
    )
    with_bucket, join_keys = salt_oversized_buckets(
        with_bucket, ["_bucket"], F.xxhash64(F.col("_id")), max_bucket_size
    )
    pairs = (
        with_bucket.alias("a")
        .join(with_bucket.alias("b"), on=join_keys)
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(
                cosine_from_norms(
                    dot(F.col("a._vec"), F.col("b._vec")),
                    F.col("a._norm"),
                    F.col("b._norm"),
                ),
                6,
            ).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold)


def quantize_embeddings(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization:
    ``q[i] = round(x[i] * 127 / max|x|)`` stored as ``array<tinyint>`` plus
    the reconstruction scale ``max|x| / 127`` — 4x smaller than float32
    (8x vs float64), the standard memory lever for billion-vector ANN.

    Cosine is SCALE-INVARIANT, so ranking by cosine over the quantized
    vectors needs no dequantization at all — the only error is rounding
    (recall pytest-bounded). Pure codegen (``transform``/``array_max``),
    no UDF. Zero vectors quantize to zeros with scale 0.
    """
    vec = F.col(vec_col)
    mx = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    safe = F.when(mx > 0, mx).otherwise(F.lit(1.0))
    return embeddings.withColumns(
        {
            out_col: F.transform(
                vec, lambda x: F.round(x.cast("double") / safe * 127).cast("tinyint")
            ),
            scale_col: (mx / F.lit(127.0)).cast("double"),
        }
    )


def quantized_cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact top-k by cosine over int8-QUANTIZED vectors (the query is
    quantized the same way): same TakeOrdered plan as :func:`cosine_topk`,
    reading 1/4 the vector bytes. Approximation = rounding only."""
    mx = max(abs(float(x)) for x in query_vec) or 1.0
    qi = [int(round(float(x) / mx * 127)) for x in query_vec]
    q = F.array(*[F.lit(v).cast("tinyint") for v in qi])
    return _scored_topk_against_query(
        embeddings, q, fold_norm(qi), k, id_col, qvec_col
    )


def rrf_fuse(
    rankings,
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval result lists (Cormack et al.
    2009) — the standard hybrid-search combiner: fuse a lexical ranking
    (``text.bm25_topk``) with a vector ranking (:func:`cosine_topk` /
    ``Engine.ivf_probe``) without score calibration, since only RANKS
    enter: ``rrf(id) = sum_i 1 / (rrf_k + rank_i(id))``, an id missing
    from a list contributing nothing. ``rrf_k=60`` is the published
    constant. Each input needs ``id_col`` plus exactly one score column
    (any name — bm25/score/cosine all work); rank within a list is
    (score desc, id asc), the engine's total-order convention.

    Inputs are ALREADY-REDUCED top-N result lists (the retrieval
    contract), so the per-list ranking window is metadata-sized — this
    deliberately does NOT fuse corpus-scale relations; run retrieval
    first, fuse the shortlists. Output: (id, rrf_score) descending,
    ties toward the smaller id, limited to ``k``."""
    from pyspark.sql import Window

    fused = None
    for r in rankings:
        extra = [c for c in r.columns if c != id_col]
        if id_col not in r.columns or len(extra) != 1:
            raise ValueError(
                f"each ranking needs ({id_col!r}, <one score column>); "
                f"got {r.columns}"
            )
        w = Window.orderBy(F.col(extra[0]).desc(), F.col(id_col).asc())
        contrib = r.select(
            F.col(id_col),
            (
                F.lit(1.0)
                / (F.lit(float(rrf_k)) + F.row_number().over(w))
            ).alias("_c"),
        )
        fused = contrib if fused is None else fused.unionByName(contrib)
    if fused is None:
        raise ValueError("at least one ranking required")
    return (
        fused.groupBy(F.col(id_col))
        .agg(F.round(F.sum(F.col("_c")), 6).alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def rrf_fuse_batch(
    rankings,
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Per-query reciprocal-rank fusion of N BATCHED retrieval results —
    the multi-query form of :func:`rrf_fuse`: each input carries
    ``(query_id, id, <one score column>)`` (exactly the
    ``Engine.bm25_probe_batch`` / ``Engine.ivf_probe_batch`` output
    shapes), ranks are taken WITHIN each query partition (score desc,
    id asc — the engine's total-order convention), contributions sum per
    (query, id), and the output is the top-``k`` per query by window
    rank: ``(query_id, id, rrf_score)`` — per query identical to
    :func:`rrf_fuse` over that query's lists. Inputs are already-reduced
    per-query shortlists (the retrieval contract), so every window
    partition is shortlist-sized."""
    from pyspark.sql import Window

    fused = None
    for r in rankings:
        extra = [c for c in r.columns if c not in (id_col, query_id_col)]
        if (
            id_col not in r.columns
            or query_id_col not in r.columns
            or len(extra) != 1
        ):
            raise ValueError(
                f"each batch ranking needs ({query_id_col!r}, {id_col!r}, "
                f"<one score column>); got {r.columns}"
            )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col(extra[0]).desc(), F.col(id_col).asc()
        )
        contrib = r.select(
            F.col(query_id_col),
            F.col(id_col),
            (
                F.lit(1.0)
                / (F.lit(float(rrf_k)) + F.row_number().over(w))
            ).alias("_c"),
        )
        fused = contrib if fused is None else fused.unionByName(contrib)
    if fused is None:
        raise ValueError("at least one ranking required")
    scored = fused.groupBy(F.col(query_id_col), F.col(id_col)).agg(
        F.round(F.sum(F.col("_c")), 6).alias("rrf_score")
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def mmr_rerank(
    hits: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    score_col: str = "score",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998) of
    per-query candidate shortlists — the standard diversity pass after
    retrieval (RAG context building: near-duplicate passages crowd out
    coverage): greedily pick ``argmax lam * relevance - (1 - lam) *
    max_cosine_to_already_picked``, ties toward the higher relevance
    then the smaller id; the first pick is the plain top-scored row.

    Input: one row per (query, candidate) with the retrieval score and
    the candidate's vector — exactly ``Engine.ivf_probe_batch``'s output
    joined back to its vectors, or any scored shortlist. Shortlists are
    ALREADY-REDUCED top-N sets (the retrieval contract), so the per-query
    group fits a pandas frame and the n^2 similarity matrix is tiny —
    one ``applyInPandas`` over the query grouping, no shuffle beyond the
    groupBy. Zero-norm vectors contribute 0 similarity (they diversify
    nothing). Output: (query_id, id, score, mmr_rank) with ranks 1..k
    per query."""
    import numpy as np

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    qt = hits.schema[query_id_col].dataType.simpleString()
    it = hits.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{query_id_col} {qt}, {id_col} {it}, "
        f"{score_col} double, mmr_rank int"
    )
    kk = int(k)

    def pick(pdf):
        import pandas as pd

        n = len(pdf)
        vecs = np.vstack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        norms = np.linalg.norm(vecs, axis=1)
        safe = np.where(norms == 0.0, 1.0, norms)
        unit = vecs / safe[:, None]
        sim = unit @ unit.T  # (n, n) — shortlist-sized by contract
        scores = pdf[score_col].to_numpy(dtype=np.float64)
        ids = pdf[id_col].to_numpy()
        # deterministic candidate order: relevance desc, id asc — argmax's
        # first-occurrence rule then breaks every tie the same way
        order = np.lexsort((ids, -scores))
        remaining = list(order)
        picked: list[int] = []
        # the published penalty is the RAW max similarity to the picked
        # set (negative similarity is a diversity BONUS) — a zeros init
        # would silently clamp it at 0; before the first pick the term
        # is 0 by convention (pure relevance)
        max_sim = None
        while remaining and len(picked) < kk:
            rem = np.asarray(remaining)
            pen = 0.0 if max_sim is None else max_sim[rem]
            mmr = lam * scores[rem] - (1.0 - lam) * pen
            j = rem[int(np.argmax(mmr))]
            picked.append(int(j))
            remaining.remove(int(j))
            max_sim = (
                sim[:, j].copy()
                if max_sim is None
                else np.maximum(max_sim, sim[:, j])
            )
        out = pdf.iloc[picked][[query_id_col, id_col, score_col]].reset_index(
            drop=True
        )
        out["mmr_rank"] = pd.Series(
            range(1, len(picked) + 1), dtype="int32"
        )
        return out

    return hits.groupBy(F.col(query_id_col)).applyInPandas(pick, out_schema)


def _lit_vec(v) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


# num_centroids x dim above which the IVF machinery abandons the
# literal-expression argmax (codegen tree grows per centroid) and the
# driver-side Lloyd collect for the Arrow path: broadcast centroid matrix +
# mapInPandas argmax, distributed per-(centroid, dim) means, centroids
# written INTO the index as a parquet table. 4096 keeps the default
# 16 x 64 configuration on the exactly-SQL-reproducible small path.
ARROW_CENTROID_CELLS = 4096


def _vec_dim(embeddings: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality, peeked through Arrow (one-row limit job —
    never a Row collect)."""
    tbl = embeddings.select(F.size(F.col(vec_col)).alias("_d")).limit(1).toArrow()
    if tbl.num_rows == 0:
        return 0
    return int(tbl.column("_d")[0].as_py())


def _cents_arrow(df: DataFrame, cid_col: str, vec_col: str):
    """(ids, matrix) from a (cid, vector) DataFrame via the Arrow transport
    — a flat float64 buffer reshape, not num_centroids x dim Row objects.
    Ids come back sorted ascending so a first-occurrence argmax ties toward
    the smallest cid, matching the literal-expression path's tie-break."""
    import numpy as np

    tbl = df.select(
        F.col(cid_col).cast("long").alias("_cid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_cvec"),
    ).toArrow()
    ids = np.asarray(tbl.column("_cid").combine_chunks(), dtype=np.int64)
    lists = tbl.column("_cvec").combine_chunks()
    flat = np.asarray(lists.flatten(), dtype=np.float64)
    mat = flat.reshape(len(ids), -1) if len(ids) else flat.reshape(0, 0)
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order]


def assign_centroids_arrow(
    df: DataFrame,
    cent_ids,
    cent_mat,
    vec_col: str,
    out_col: str = "_cid",
    score_col: str | None = None,
) -> DataFrame:
    """Nearest-centroid assignment for LARGE centroid sets: the centroid
    matrix ships once per executor as a broadcast variable and each Arrow
    batch is scored with one float64 matmul + argmax (``mapInPandas``) —
    constant plan size in num_centroids, unlike the literal ``array_max``
    expression. ``cent_ids`` must be sorted ascending (argmax's
    first-occurrence rule then ties toward the smallest cid, same as the
    codegen path). ``score_col`` additionally emits the winning dot product
    (``semantic_dedup``'s keep-rule needs vector-to-centroid similarity)."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((cent_ids, cent_mat))
    out_fields = list(df.schema.fields) + [StructField(out_col, LongType())]
    if score_col:
        out_fields.append(StructField(score_col, DoubleType()))
    out_schema = StructType(out_fields)

    def score(batches):
        import numpy as np

        ids, mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = np.array([], dtype=np.int64)
                if score_col:
                    pdf[score_col] = np.array([], dtype=np.float64)
                yield pdf
                continue
            vecs = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            scores = vecs @ mat.T
            idx = np.argmax(scores, axis=1)
            pdf[out_col] = ids[idx]
            if score_col:
                pdf[score_col] = scores[np.arange(len(idx)), idx]
            yield pdf

    return df.mapInPandas(score, out_schema)


def rank_centroid_ids(vecs, cent_ids, cent_mat, n: int):
    """Top-``n`` centroid ids per query row — the ONE ranking kernel shared
    by the Arrow batch front end (:func:`rank_centroids_arrow`) and the
    driver-resident fast path (``Engine.ivf_probe_batch``), so both produce
    bit-identical probe sets: float64 matmul scores, STABLE argsort of the
    negated scores over id-ascending columns (score desc, cid asc ties —
    the single probe's lexsort). ``vecs`` is a (B, D) float64 matrix,
    ``cent_ids`` sorted ascending; returns a (B, n) id matrix."""
    import numpy as np

    scores = vecs @ cent_mat.T  # (B, C)
    order = np.argsort(-scores, axis=1, kind="stable")[:, :n]
    return cent_ids[order]


def rank_centroids_arrow(
    df: DataFrame,
    cent_ids,
    cent_mat,
    vec_col: str,
    n_probe: int,
    out_col: str = "_cid",
) -> DataFrame:
    """Top-``n_probe`` centroids PER QUERY ROW by dot-product score (score
    desc, cid asc on ties — the :func:`probe_centroids` ranking,
    vectorized): the centroid matrix ships once per executor as a
    broadcast, each Arrow batch scores with one float64 matmul, and the
    output explodes to one row per (query, probed cid). ``cent_ids`` must
    be sorted ascending so a STABLE argsort of the negated scores breaks
    exact ties toward the smallest cid, matching the single-probe
    lexsort. This is the batch-probe front end: a driver loop calling
    ``probe_centroids`` per query is a job storm; this is one pass over
    the query relation."""
    from pyspark.sql.types import LongType, StructField, StructType

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((cent_ids, cent_mat))
    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, LongType())])
    n_probe = max(1, int(n_probe))

    def rank(batches):
        import numpy as np

        ids, mat = bc.value
        n = min(n_probe, len(ids))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            out = pdf.loc[pdf.index.repeat(n)].reset_index(drop=True)
            out[out_col] = rank_centroid_ids(vecs, ids, mat, n).ravel()
            yield out

    return df.mapInPandas(rank, out_schema)


def adc_distance_batch_col(
    codebook: list[list[list[float]]], qvec_col: str, codes_col: str
) -> Column:
    """The ADC approximate squared-L2 distance for a PER-ROW query vector
    column (the batch-probe analog of :func:`adc_distance_col`, whose
    query is a literal): the codebook inlines once as a literal m x k x
    sub array; each row pays m code lookups + m subvector square-distance
    folds — pure codegen, no Python. The literal carries m*k*sub floats,
    so callers must route through :func:`with_adc_batch_distance`, which
    switches to the broadcast-codebook Arrow scorer past
    ``ARROW_CENTROID_CELLS`` (at the canonical k=256 the inline tree is
    10k+ literals — a codegen-size risk; verdict r14 next #6)."""
    m = len(codebook)
    sub = len(codebook[0][0])
    cb_lit = F.array(
        *[
            F.array(*[F.array(*[F.lit(float(c)) for c in code]) for code in codebook[j]])
            for j in range(m)
        ]
    )
    dist = None
    for j in range(m):
        code_vec = F.element_at(
            F.element_at(cb_lit, j + 1),
            F.element_at(F.col(codes_col), j + 1) + 1,
        )
        term = _sq_l2(F.slice(F.col(qvec_col), j * sub + 1, sub), code_vec)
        dist = term if dist is None else dist + term
    return dist


def adc_distance_batch_arrow(
    df: DataFrame,
    codebook: list[list[list[float]]],
    qvec_col: str,
    codes_col: str,
    out_col: str = "_adc",
) -> DataFrame:
    """ADC distance for LARGE codebooks (the :func:`pq_codes_arrow`
    strategy applied to batch-probe scoring): the (m, k, sub) codebook
    ships once per executor as a broadcast variable and each Arrow batch
    scores with one fancy-indexed gather + squared-difference reduction —
    constant plan size in k, unlike the literal m x k x sub expression
    tree. Appends ``out_col`` (float64 approximate squared L2) to the
    input relation."""
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    cb = np.asarray(codebook, dtype=np.float64)  # (m, k, sub)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(cb)
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def score(batches):
        import numpy as np

        cb = bc.value
        m, _k, sub = cb.shape
        rows = np.arange(m)[None, :]
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = np.array([], dtype=np.float64)
                yield pdf
                continue
            q = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf[qvec_col]]
            ).reshape(len(pdf), m, sub)
            codes = np.vstack(
                [np.asarray(c, dtype=np.int64) for c in pdf[codes_col]]
            )  # (B, m)
            diff = q - cb[rows, codes]  # gather -> (B, m, sub)
            pdf[out_col] = np.einsum("bms,bms->b", diff, diff)
            yield pdf

    return df.mapInPandas(score, out_schema)


def with_adc_batch_distance(
    df: DataFrame,
    codebook: list[list[list[float]]],
    qvec_col: str,
    codes_col: str,
    out_col: str = "_adc",
) -> DataFrame:
    """Attach the per-row-query ADC distance column, picking the scoring
    strategy by codebook size — the :func:`with_pq_codes` dispatch rule:
    below ``ARROW_CENTROID_CELLS`` total cells the codebook inlines as a
    pure-codegen literal (:func:`adc_distance_batch_col`); past it —
    production PQ, e.g. k=256 — the broadcast-codebook Arrow scorer
    (:func:`adc_distance_batch_arrow`) keeps the plan constant-size."""
    if _codebook_cells(codebook) <= ARROW_CENTROID_CELLS:
        return df.withColumn(
            out_col, adc_distance_batch_col(codebook, qvec_col, codes_col)
        )
    return adc_distance_batch_arrow(df, codebook, qvec_col, codes_col, out_col)


def _lloyd_means_df(assigned: DataFrame, vec_col: str) -> DataFrame:
    """One distributed Lloyd step over an assigned corpus: per-(centroid,
    dimension) means via posexplode + hash agg (map-side partial combine —
    the shuffle carries num_centroids x dim x partitions rows), re-assembled
    into per-centroid vectors JVM-side. Nothing reaches the driver."""
    per_dim = (
        assigned.select(
            F.col("_cid"), F.posexplode(F.col(vec_col)).alias("_pos", "_x")
        )
        .groupBy("_cid", "_pos")
        .agg(F.avg(F.col("_x").cast("double")).alias("_m"))
    )
    return per_dim.groupBy("_cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("_pos"), F.col("_m")))),
            lambda s: s["_m"],
        ).alias("_cvec")
    )


def _ivf_centroids_np(
    embeddings: DataFrame,
    num_centroids: int,
    lloyd_iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Arrow-path IVF centroids (``(ids, matrix)`` numpy pair): the same
    deterministic hash-ordered seed sample as :func:`_ivf_centroids`, but
    every Lloyd step keeps the per-(centroid, dim) means DISTRIBUTED
    (:func:`_lloyd_means_df`) and the only driver transit is the centroid
    table itself through Arrow — the minimum needed to broadcast it for the
    next assignment. No ``collect()`` of sums, no literal expressions."""
    import numpy as np

    seeds = (
        embeddings.select(
            F.col(id_col).cast("long").alias("_cid"), F.col(vec_col).alias("_cvec")
        )
        .orderBy(F.pmod(F.xxhash64(F.col("_cid")), F.lit(10**6)), F.col("_cid"))
        .limit(num_centroids)
    )
    ids, mat = _cents_arrow(seeds, "_cid", "_cvec")
    return _lloyd_steps_np(embeddings, ids, mat, lloyd_iters, vec_col)


def _lloyd_steps_np(
    embeddings: DataFrame, ids, mat, lloyd_iters: int, vec_col: str
):
    """``lloyd_iters`` Lloyd steps from GIVEN starting centroids (Arrow
    path): broadcast-matrix assignment + distributed per-(centroid, dim)
    means; only the refreshed centroid table transits the driver. Shared
    by the seeded build (:func:`_ivf_centroids_np`) and the in-place
    retrain (:func:`lloyd_refine`); centroid ids are PRESERVED — an empty
    cluster keeps its previous centroid."""
    import numpy as np

    for _ in range(max(0, lloyd_iters)):
        assigned = assign_centroids_arrow(
            embeddings.select(F.col(vec_col)), ids, mat, vec_col
        )
        new_ids, new_mat = _cents_arrow(_lloyd_means_df(assigned, vec_col), "_cid", "_cvec")
        pos = {int(c): i for i, c in enumerate(new_ids)}
        # empty cluster: keep the previous centroid (same rule as the small path)
        mat = np.vstack(
            [
                new_mat[pos[int(c)]] if int(c) in pos else mat[i]
                for i, c in enumerate(ids)
            ]
        )
    return ids, mat


def lloyd_refine(embeddings: DataFrame, cents, lloyd_iters: int, vec_col: str):
    """Lloyd steps seeded from EXISTING centroids — the retrain primitive
    (verdict r14 next #1): months of maintained ingest assign new vectors
    to build-time centroids, so the lists skew and recall decays;
    refining from the CURRENT centroids over the live index re-centers
    them without a from-scratch rebuild. Accepts and returns either
    centroid representation (the small path's ``list[(cid, vector)]`` or
    the Arrow path's ``(ids, matrix)`` pair); centroid IDS are preserved,
    so a concurrent probe planned against the old manifest still prunes
    to valid ``_cid`` partitions."""
    if isinstance(cents, list):
        return _lloyd_steps_small(embeddings, cents, lloyd_iters, vec_col)
    ids, mat = cents
    return _lloyd_steps_np(embeddings, ids, mat, lloyd_iters, vec_col)


def assigned_sq_dist(
    df: DataFrame,
    cents,
    vec_col: str,
    cid_col: str = "_cid",
    out_col: str = "_dist",
) -> DataFrame:
    """Squared-L2 distance of each row's vector to its ASSIGNED (stored
    ``cid_col``) centroid — the k-means inertia term behind the drift
    metric: rising mean assigned distance means the centroids no longer
    represent the ingested data. Literal map lookup below
    ``ARROW_CENTROID_CELLS``; broadcast matrix + Arrow gather past it.
    One column-pruned scan, no shuffle."""
    if isinstance(cents, list):
        cmap = F.map_from_arrays(
            F.array(*[F.lit(int(cid)).cast("long") for cid, _ in cents]),
            F.array(*[_lit_vec(cv) for _, cv in cents]),
        )
        cvec = F.element_at(cmap, F.col(cid_col).cast("long"))
        return df.withColumn(out_col, _sq_l2(F.col(vec_col), cvec))
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    ids, mat = cents
    bc = df.sparkSession.sparkContext.broadcast((ids, mat))
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def score(batches):
        import numpy as np

        ids, mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = np.array([], dtype=np.float64)
                yield pdf
                continue
            vecs = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            pos = np.searchsorted(ids, pdf[cid_col].to_numpy(dtype=np.int64))
            diff = vecs - mat[pos]
            pdf[out_col] = (diff * diff).sum(axis=1)
            yield pdf

    return df.mapInPandas(score, out_schema)


def _assign_centroid(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid id for a vector column against LITERAL centroids —
    pure codegen, shuffle-free: an array of (score, -cid) structs reduced by
    ``array_max`` (struct compare: max score, ties broken toward the
    SMALLEST cid via the negation). The list is tiny (num_centroids), so the
    expression tree stays constant-size per centroid count."""
    scored = F.array(
        *[
            F.named_struct(
                F.lit("s"), dot(vec, _lit_vec(cv)),
                F.lit("negc"), F.lit(-int(cid)).cast("long"),
            )
            for cid, cv in centroids
        ]
    )
    return -F.array_max(scored)["negc"]


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 1,
) -> DataFrame:
    """IVF-style approximate top-k: centroids are hash-sampled corpus
    vectors (deterministic), refined by ``lloyd_iters`` distributed Lloyd
    (k-means) steps; each vector is assigned to its nearest centroid by a
    codegen literal-argmax (no join, no shuffle); the query probes the
    ``n_probe`` nearest centroids' inverted lists only.

    At 100 TB: seeding is a TakeOrdered (per-partition top-k, no full
    sort); each Lloyd step is one scan with MAP-SIDE partial aggregation of
    per-(centroid, dimension) sums (the shuffle carries only
    num_centroids x dim x partitions rows — the standard distributed
    k-means pass); the final probe SCORES only the probed lists, but this
    ad-hoc form still SCANS the whole corpus to evaluate the assignment
    argmax per row. For repeated queries, :func:`ivf_build` materializes
    the assignment once into a ``_cid``-partitioned index so
    :func:`ivf_probe` reads ~n_probe/num_centroids of the FILES too
    (partition pruning) — an index that rescans the corpus per query is
    not an index. Refinement makes the approximation contract real instead
    of sample-coincidental: recall@k is pytest-bounded (test_llm_ops).

    Past ``ARROW_CENTROID_CELLS`` the centroid machinery switches to the
    Arrow path like :func:`ivf_build` (broadcast matrix + ``mapInPandas``
    argmax, distributed Lloyd means).
    """
    dim = _vec_dim(embeddings, vec_col)
    if num_centroids * dim > ARROW_CENTROID_CELLS:
        import numpy as np

        ids, mat = _ivf_centroids_np(
            embeddings, num_centroids, lloyd_iters, id_col=id_col, vec_col=vec_col
        )
        scores = mat @ np.asarray(query_vec, dtype=np.float64)
        order = np.lexsort((ids, -scores))
        probe_set = {int(c) for c in ids[order[: max(1, n_probe)]]}
        assigned = assign_centroids_arrow(embeddings, ids, mat, vec_col)
        hits = assigned.filter(F.col("_cid").isin(sorted(probe_set)))
    else:
        cents = _ivf_centroids(
            embeddings, num_centroids, lloyd_iters, id_col=id_col, vec_col=vec_col
        )
        probe = sorted(
            cents,
            key=lambda c: (
                -sum(float(a) * float(b) for a, b in zip(query_vec, c[1])),
                c[0],
            ),
        )[: max(1, n_probe)]
        probe_cids = [cid for cid, _ in probe]
        hits = embeddings.filter(
            _assign_centroid(F.col(vec_col), cents).isin(probe_cids)
        )
    return probe_index_df(hits, query_vec, k, id_col, vec_col)


def _ivf_centroids(
    embeddings: DataFrame,
    num_centroids: int,
    lloyd_iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF centroids: hash-ordered seed sample (TakeOrdered —
    per-partition top-k, no full sort) refined by ``lloyd_iters``
    distributed Lloyd steps (map-side partial agg of per-(centroid, dim)
    sums; the shuffle carries num_centroids x dim x partitions rows)."""
    seed_rows = (
        embeddings.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec"))
        .orderBy(F.pmod(F.xxhash64(F.col("_cid")), F.lit(10**6)), F.col("_cid"))
        .limit(num_centroids)
        .collect()
    )
    cents: list[tuple[int, list[float]]] = [
        (int(r["_cid"]), [float(x) for x in r["_cvec"]]) for r in seed_rows
    ]
    return _lloyd_steps_small(embeddings, cents, lloyd_iters, vec_col)


def _lloyd_steps_small(
    embeddings: DataFrame,
    cents: list[tuple[int, list[float]]],
    lloyd_iters: int,
    vec_col: str,
) -> list[tuple[int, list[float]]]:
    """``lloyd_iters`` Lloyd steps from GIVEN starting centroids (literal
    path): literal-expression assignment + a driver collect of the
    per-(centroid, dim) sums (num_centroids x dim rows — metadata-sized).
    Shared by the seeded build (:func:`_ivf_centroids`) and the in-place
    retrain (:func:`lloyd_refine`); centroid ids are PRESERVED — an empty
    cluster keeps its previous centroid."""
    for _ in range(max(0, lloyd_iters)):
        assigned_cid = _assign_centroid(F.col(vec_col), cents)
        sums = (
            embeddings.select(
                assigned_cid.alias("_cid"),
                F.posexplode(F.col(vec_col)).alias("_pos", "_x"),
            )
            .groupBy("_cid", "_pos")
            .agg(
                F.sum(F.col("_x").cast("double")).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()  # num_centroids x dim rows — metadata-sized
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cid.setdefault(int(r["_cid"]), {})[int(r["_pos"])] = (
                float(r["_s"]) / int(r["_n"])
            )
        cents = [
            (
                cid,
                [m[p] for p in sorted(m)] if (m := by_cid.get(cid)) else cv,
            )  # empty cluster: keep the previous centroid
            for cid, cv in cents
        ]
    return cents


def ivf_build(
    embeddings: DataFrame,
    index_path: str,
    num_centroids: int = 16,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Materialize an IVF index: assign every vector to its nearest
    centroid ONCE and write the corpus ``_cid``-PARTITIONED to
    ``index_path`` (one directory per inverted list), with the centroid
    table stored alongside as ``_ivf_centroids.json``. Returns the
    centroids.

    This is the scale path the ad-hoc :func:`ivf_topk` is not: a probe
    against the index (:func:`ivf_probe`) pushes ``_cid IN (...)`` into
    the scan, so partition pruning reads only the ~n_probe/num_centroids
    of the FILES holding the probed lists — per-query IO proportional to
    the probe, not the corpus. Build cost is one assignment scan plus the
    partitioned write (each row moves once; the partitionBy shuffle is the
    index construction).

    Past ``ARROW_CENTROID_CELLS`` (num_centroids x dim) the build switches
    from the literal-expression argmax + driver Lloyd collect to the Arrow
    path: broadcast centroid matrix + ``mapInPandas`` argmax
    (:func:`assign_centroids_arrow`), fully distributed Lloyd means
    (:func:`_lloyd_means_df`), and the centroid table written INTO the
    index as parquet (``_ivf_centroids/``) instead of inlined JSON — the
    manifest then carries only a pointer. Return value is the small path's
    ``list[(cid, list[float])]`` or the Arrow path's ``(ids, matrix)``
    numpy pair."""
    dim = _vec_dim(embeddings, vec_col)
    if num_centroids * dim <= ARROW_CENTROID_CELLS:
        cents = _ivf_centroids(
            embeddings, num_centroids, lloyd_iters, id_col=id_col, vec_col=vec_col
        )
        assigned = embeddings.withColumn(
            "_cid", _assign_centroid(F.col(vec_col), cents)
        )
        # repartition by _cid before partitionBy: each inverted list lands as
        # contiguous files instead of one small file per (task, cid) pair
        assigned.repartition(F.col("_cid")).write.mode("overwrite").partitionBy(
            "_cid"
        ).parquet(index_path)
        write_centroid_manifest(embeddings.sparkSession, index_path, cents, id_col, vec_col)
        return cents

    ids, mat = _ivf_centroids_np(
        embeddings, num_centroids, lloyd_iters, id_col=id_col, vec_col=vec_col
    )
    assigned = assign_centroids_arrow(embeddings, ids, mat, vec_col)
    assigned.repartition(F.col("_cid")).write.mode("overwrite").partitionBy(
        "_cid"
    ).parquet(index_path)
    write_centroid_manifest(
        embeddings.sparkSession, index_path, (ids, mat), id_col, vec_col
    )
    return ids, mat


def write_centroid_manifest(
    spark, index_path: str, cents, id_col: str, vec_col: str
) -> None:
    """Store the centroid table with the index. Small path (a
    ``list[(cid, vector)]``): inline JSON. Arrow path (an ``(ids, matrix)``
    numpy pair): a parquet table INSIDE the index directory — the leading
    underscore keeps ``_ivf_centroids/`` out of the corpus scan's file
    listing — plus a pointer manifest; num_centroids x dim floats never
    round-trip through driver JSON."""
    import json as _json
    import os as _os

    if isinstance(cents, list):
        with open(
            _os.path.join(index_path, "_ivf_centroids.json"), "w", encoding="utf-8"
        ) as f:
            _json.dump({"centroids": cents, "id_col": id_col, "vec_col": vec_col}, f)
        return
    import pandas as _pd

    ids, mat = cents
    cent_pdf = _pd.DataFrame(
        {"cid": ids.tolist(), "cvec": [row.tolist() for row in mat]}
    )
    spark.createDataFrame(cent_pdf, schema="cid long, cvec array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(_os.path.join(index_path, "_ivf_centroids"))
    with open(
        _os.path.join(index_path, "_ivf_centroids.json"), "w", encoding="utf-8"
    ) as f:
        _json.dump(
            {
                "format": "parquet",
                "path": "_ivf_centroids",
                "id_col": id_col,
                "vec_col": vec_col,
            },
            f,
        )


# Driver-side centroid cache: a probe-serving workload ranks centroids on
# EVERY query, and on Arrow-path indexes that ranking would otherwise cost
# a Spark job (reading the in-index centroid parquet) per probe. Keyed by
# index path, validated by an mtime+size stamp over the manifest and the
# centroid files — a rebuild overwrites them and invalidates naturally.
_CENTROID_CACHE: dict[str, tuple[tuple, tuple]] = {}
_CENTROID_CACHE_MAX = 8


def _centroid_stamp(index_path: str) -> tuple:
    import hashlib as _hashlib
    import os as _os

    parts = []
    # the manifest is hashed by CONTENT (small, driver-local): an mtime+size
    # stamp could miss a same-tick, same-length rewrite on the inline-JSON
    # path, serving a rebuilt index stale centroids
    with open(_os.path.join(index_path, "_ivf_centroids.json"), "rb") as f:
        parts.append(("json", _hashlib.sha256(f.read()).hexdigest()))
    d = _os.path.join(index_path, "_ivf_centroids")
    if _os.path.isdir(d):
        for n in sorted(_os.listdir(d)):
            if n.endswith(".parquet"):
                s = _os.stat(_os.path.join(d, n))
                parts.append((n, s.st_mtime_ns, s.st_size))
    return tuple(parts)


def load_centroids(spark, index_path: str):
    """The index's centroid table plus its column names: ``(cents, id_col,
    vec_col)`` where ``cents`` is the small path's ``list[(cid, vector)]``
    or the Arrow path's ``(ids, matrix)`` numpy pair — the same shapes
    :func:`ivf_build` returns, so assignment code handles both uniformly
    (incremental refresh re-assigns NEW vectors against these). Served
    from a stamped driver cache after the first load, so repeated probes
    of one index submit ZERO Spark jobs for centroid ranking (pinned in
    test_llm_ops)."""
    import json as _json
    import os as _os

    stamp = _centroid_stamp(index_path)
    hit = _CENTROID_CACHE.get(index_path)
    if hit is not None and hit[0] == stamp:
        return hit[1]
    with open(
        _os.path.join(index_path, "_ivf_centroids.json"), encoding="utf-8"
    ) as f:
        meta = _json.load(f)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    if meta.get("format") == "parquet":
        cents = _cents_arrow(
            spark.read.parquet(_os.path.join(index_path, meta["path"])),
            "cid",
            "cvec",
        )
    else:
        cents = [(int(c), [float(x) for x in v]) for c, v in meta["centroids"]]
    out = (cents, id_col, vec_col)
    _CENTROID_CACHE[index_path] = (stamp, out)
    while len(_CENTROID_CACHE) > _CENTROID_CACHE_MAX:
        _CENTROID_CACHE.pop(next(iter(_CENTROID_CACHE)))
    return out


def probe_centroids(
    spark, index_path: str, query_vec: list[float], n_probe: int
) -> tuple[list[int], str, str]:
    """Rank an index's centroids against a query (driver-side,
    metadata-sized) and return ``(probe_cids, id_col, vec_col)``. Reads
    either manifest form: inline-JSON centroids (small path) or the
    in-index parquet centroid table (Arrow path, one numpy matmul)."""
    cents, id_col, vec_col = load_centroids(spark, index_path)
    if isinstance(cents, tuple):
        import numpy as np

        ids, mat = cents
        scores = mat @ np.asarray(query_vec, dtype=np.float64)
        order = np.lexsort((ids, -scores))  # score desc, cid asc on ties
        probe_cids = [int(c) for c in ids[order[: max(1, n_probe)]]]
    else:
        probe = sorted(
            cents,
            key=lambda c: (
                -sum(float(a) * float(b) for a, b in zip(query_vec, c[1])),
                c[0],
            ),
        )[: max(1, n_probe)]
        probe_cids = [cid for cid, _ in probe]
    return probe_cids, id_col, vec_col


def probe_index_df(
    hits: DataFrame, query_vec: list[float], k: int, id_col: str, vec_col: str
) -> DataFrame:
    """Score + top-k over an already-pruned inverted-list scan (shared by
    the raw :func:`ivf_probe`, the ad-hoc :func:`ivf_topk` and the governed
    ``Engine.ivf_probe``)."""
    q = _lit_vec(query_vec)
    return _scored_topk_against_query(
        hits, q, fold_norm(query_vec), k, id_col, vec_col
    )


def ivf_probe(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k against a materialized IVF index (:func:`ivf_build`): rank
    centroids driver-side (metadata-sized), then scan ONLY the probed
    ``_cid=`` partitions — the ``isin`` filter on the partition column
    prunes every other directory at planning time (visible as
    ``PartitionFilters`` in the explain; pinned in
    test_llm_ops.test_ivf_build_probe_prunes_partitions).

    This reads the index as RAW parquet — no ACLs. For an index derived
    from a governed table, build with ``Engine.build_ivf_index`` and probe
    with ``Engine.ivf_probe``, which carries the SOURCE table's ACL to the
    probe (derived data stays governed)."""
    probe_cids, id_col, vec_col = probe_centroids(
        spark, index_path, query_vec, n_probe
    )
    hits = spark.read.parquet(index_path).filter(F.col("_cid").isin(probe_cids))
    return probe_index_df(hits, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — Jegou et al. 2011, "Product Quantization for
# Nearest Neighbor Search". The corpus compresses to m small codes per
# vector (m * log2(k) bits instead of dim * 32), and a query scores the
# whole corpus through an m x k lookup table (ADC — asymmetric distance
# computation) instead of dim-length dot products.
# ---------------------------------------------------------------------------


def _sq_l2(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def pq_train(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 16,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train a PQ codebook: split each vector into ``m`` contiguous
    subvectors and k-means each subspace independently (reusing the IVF
    Lloyd machinery on the sliced column). Returns
    ``codebook[subspace][code] -> subvector centroid`` with ``k`` codes per
    subspace.

    Training scans the corpus once per (subspace, Lloyd step) — m * (1 +
    iters) passes over the VECTOR column only; training is a one-off index
    build, and m is small (4-16). Codes are deterministic: the Lloyd seeds
    are hash-ordered, like IVF.

    Past ``ARROW_CENTROID_CELLS`` (k x subspace-dim cells — production PQ is
    k=256 codes, the canonical Jegou setting) each subspace trains on the
    Arrow path like IVF (:func:`_ivf_centroids_np`: broadcast matrix +
    ``mapInPandas`` argmax assignment, distributed Lloyd means) — no literal
    expressions, no driver-side Lloyd collect. The finished codebook is
    m*k*sub floats on the driver either way (it IS the index metadata)."""
    dim = _vec_dim(embeddings, vec_col)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    codebook: list[list[list[float]]] = []
    for j in range(m):
        sliced = embeddings.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias(vec_col),
        )
        if k * sub > ARROW_CENTROID_CELLS:
            _ids, mat = _ivf_centroids_np(
                sliced, k, lloyd_iters, id_col=id_col, vec_col=vec_col
            )
            codebook.append([[float(x) for x in row] for row in mat])
        else:
            cents = _ivf_centroids(
                sliced, k, lloyd_iters, id_col=id_col, vec_col=vec_col
            )
            codebook.append([cv for _cid, cv in cents])
    return codebook


def _nearest_code(vec: Column, cents: list[list[float]]) -> Column:
    """argmin_{code} squared-L2(vec, cents[code]) — codegen-only: an array
    of (dist, code) structs reduced by array_min (struct compare orders by
    dist, ties toward the smaller code)."""
    scored = F.array(
        *[
            F.named_struct(
                F.lit("d"), _sq_l2(vec, _lit_vec(cv)),
                F.lit("c"), F.lit(int(code)).cast("int"),
            )
            for code, cv in enumerate(cents)
        ]
    )
    return F.array_min(scored)["c"]


def pq_codes_col(codebook: list[list[list[float]]], vec_col: str = "embedding") -> Column:
    """The PQ code array as a composable Column (one nearest-centroid code
    per subspace) — used by :func:`with_pq_codes` on the small (literal,
    SQL-reproducible) path. The expression inlines k*dim literal floats, so
    callers must route through :func:`with_pq_codes`, which switches to the
    broadcast-codebook Arrow encode past ``ARROW_CENTROID_CELLS``."""
    m = len(codebook)
    sub = len(codebook[0][0])
    return F.array(
        *[
            _nearest_code(F.slice(F.col(vec_col), j * sub + 1, sub), codebook[j])
            for j in range(m)
        ]
    )


def _codebook_cells(codebook: list[list[list[float]]]) -> int:
    """Total literal floats an inline encode expression would carry:
    m * k * sub == k * dim."""
    return len(codebook) * len(codebook[0]) * len(codebook[0][0])


def pq_codes_arrow(
    df: DataFrame, codebook: list[list[list[float]]], vec_col: str, out_col: str
) -> DataFrame:
    """PQ encode for LARGE codebooks: the (m, k, sub) codebook ships once
    per executor as a broadcast variable and each Arrow batch computes the
    per-subspace argmin with one float64 matmul per subspace (the
    ``|x-c|^2 = |x|^2 - 2x.c + |c|^2`` identity — the |x|^2 term is
    row-constant and dropped) — constant plan size in k, unlike the
    literal ``array_min`` expression tree. ``np.argmin``'s first-occurrence
    rule ties toward the smaller code, same as the codegen path."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    import numpy as np

    cb = np.asarray(codebook, dtype=np.float64)  # (m, k, sub)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(cb)
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(IntegerType()))]
    )

    def encode(batches):
        import numpy as np

        cb = bc.value
        m, _k, sub = cb.shape
        cnorm = (cb * cb).sum(axis=2)  # (m, k)
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = []
                yield pdf
                continue
            vecs = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                x = vecs[:, j * sub : (j + 1) * sub]
                codes[:, j] = np.argmin(cnorm[j] - 2.0 * (x @ cb[j].T), axis=1)
            pdf[out_col] = [row for row in codes]
            yield pdf

    return df.mapInPandas(encode, out_schema)


def with_pq_codes(
    df: DataFrame,
    codebook: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Attach the PQ code column, picking the encode strategy by codebook
    size: below ``ARROW_CENTROID_CELLS`` total cells the codebook inlines
    as a pure-codegen literal expression (SQL-reproducible, zero Python);
    past it — production PQ, e.g. k=256 on 768-dim — the literal tree
    would carry ~k*dim literals, so the encode switches to the broadcast
    codebook + ``mapInPandas`` argmin (:func:`pq_codes_arrow`)."""
    if _codebook_cells(codebook) <= ARROW_CENTROID_CELLS:
        return df.withColumn(out_col, pq_codes_col(codebook, vec_col))
    return pq_codes_arrow(df, codebook, vec_col, out_col)


def pq_encode(
    embeddings: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress the corpus to PQ codes: ``(id, codes array<int>)`` with one
    nearest-centroid code per subspace — a single map-only pass (literal
    codegen below ``ARROW_CENTROID_CELLS``, broadcast-codebook Arrow argmin
    past it; see :func:`with_pq_codes`). At 100 TB the encoded corpus is
    ~dim*32 / (m*log2 k) times smaller than the raw vectors — the
    representation that makes exhaustive ADC scans cheap."""
    return with_pq_codes(
        embeddings.select(F.col(id_col), F.col(vec_col)), codebook, vec_col, "codes"
    ).select(F.col(id_col), F.col("codes"))


def pq_search(
    codes_df: DataFrame,
    codebook: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over PQ codes: the query precomputes one m x k table of
    squared-L2 distances to every subspace centroid (driver-side — m*k
    floats, inlined as a literal), and each corpus row's approximate
    distance is m table lookups + a sum. Pure codegen over the (tiny) code
    column, finishing in a TakeOrdered — no shuffle, no Python, and the
    scan reads codes instead of vectors. Output:
    ``(id, pq_distance)`` ascending (approximate squared L2)."""
    dist = adc_distance_col(codebook, query_vec, "codes")
    return (
        codes_df.select(F.col(id_col), F.round(dist, 6).alias("pq_distance"))
        .orderBy(F.col("pq_distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def adc_distance_col(
    codebook: list[list[list[float]]], query_vec: list[float], codes_col: str
) -> Column:
    """The ADC approximate squared-L2 distance as a composable Column: the
    query's m x k subspace-distance table inlines as literals; each row
    costs m ``element_at`` lookups + a sum."""
    m = len(codebook)
    sub = len(codebook[0][0])
    tables = [
        [
            float(sum((query_vec[j * sub + i] - c[i]) ** 2 for i in range(sub)))
            for c in codebook[j]
        ]
        for j in range(m)
    ]
    lit_tables = F.array(*[F.array(*[F.lit(d) for d in row]) for row in tables])
    dist = None
    for j in range(m):
        term = F.element_at(
            F.element_at(lit_tables, j + 1),
            F.element_at(F.col(codes_col), j + 1) + 1,
        )
        dist = term if dist is None else dist + term
    return dist


def ivf_pq_build(
    embeddings: DataFrame,
    index_path: str,
    num_centroids: int = 16,
    m: int = 4,
    pq_k: int = 16,
    lloyd_iters: int = 1,
    pq_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """IVFPQ (the composition serious ANN systems run): train a PQ codebook,
    ride the per-vector codes INTO the IVF index as an extra column, and
    write the codebook next to the centroid manifest. A probe then prunes
    partitions like plain IVF but scores the survivors through the ADC
    lookup table — per-query work is (probed fraction of the corpus) x
    (m lookups per row), and the expensive exact distance touches only the
    shortlist (:func:`ivf_pq_probe`). Returns the codebook."""
    import json as _json
    import os as _os

    codebook = pq_train(
        embeddings, m=m, k=pq_k, lloyd_iters=pq_iters, id_col=id_col, vec_col=vec_col
    )
    with_codes = with_pq_codes(embeddings, codebook, vec_col, "pq_codes")
    ivf_build(
        with_codes,
        index_path,
        num_centroids=num_centroids,
        lloyd_iters=lloyd_iters,
        id_col=id_col,
        vec_col=vec_col,
    )
    with open(_os.path.join(index_path, "_pq_codebook.json"), "w", encoding="utf-8") as f:
        _json.dump({"m": m, "k": pq_k, "codebook": codebook}, f)
    return codebook


def ivf_pq_probe(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    shortlist: int = 100,
) -> DataFrame:
    """Top-k against an IVFPQ index: centroid ranking prunes to the probed
    ``_cid=`` partitions (PartitionFilters, exactly like :func:`ivf_probe`),
    the ADC lookup table shortlists within them (TakeOrdered over m
    ``element_at`` lookups per row — the vector column is carried but not
    computed on), and ONLY the ``shortlist`` survivors pay the exact cosine
    re-rank. Output matches :func:`ivf_probe`: ``(id, score)`` descending."""
    import json as _json
    import os as _os

    probe_cids, id_col, vec_col = probe_centroids(
        spark, index_path, query_vec, n_probe
    )
    with open(_os.path.join(index_path, "_pq_codebook.json"), encoding="utf-8") as f:
        meta = _json.load(f)
    codebook = meta["codebook"]
    hits = spark.read.parquet(index_path).filter(F.col("_cid").isin(probe_cids))
    adc = adc_distance_col(codebook, query_vec, "pq_codes")
    short = (
        hits.select(F.col(id_col), F.col(vec_col), adc.alias("_adc"))
        .orderBy(F.col("_adc").asc(), F.col(id_col).asc())
        .limit(max(int(shortlist), k))
    )
    return probe_index_df(short, query_vec, k, id_col, vec_col)
