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
    return dot(a, b) / (norm(a) * norm(b))


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
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


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

    with_bucket = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        lsh_bucket(F.col(vec_col), dim, num_planes, axis_planes).alias("_bucket"),
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
            F.round(cosine(F.col("a._vec"), F.col("b._vec")), 6).alias("cosine"),
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
    q = F.array(
        *[F.lit(int(round(float(x) / mx * 127))).cast("tinyint") for x in query_vec]
    )
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine(F.col(qvec_col), q), 6).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def _lit_vec(v) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


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
    """
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
    q = _lit_vec(query_vec)
    hits = embeddings.filter(
        _assign_centroid(F.col(vec_col), cents).isin(probe_cids)
    )
    scored = hits.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


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
            )  # empty cluster: keep the seed centroid
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
    index construction)."""
    import json as _json
    import os as _os

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
    with open(
        _os.path.join(index_path, "_ivf_centroids.json"), "w", encoding="utf-8"
    ) as f:
        _json.dump({"centroids": cents, "id_col": id_col, "vec_col": vec_col}, f)
    return cents


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
    test_llm_ops.test_ivf_build_probe_prunes_partitions)."""
    import json as _json
    import os as _os

    with open(
        _os.path.join(index_path, "_ivf_centroids.json"), encoding="utf-8"
    ) as f:
        meta = _json.load(f)
    cents = [(int(c), [float(x) for x in v]) for c, v in meta["centroids"]]
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    probe = sorted(
        cents,
        key=lambda c: (
            -sum(float(a) * float(b) for a, b in zip(query_vec, c[1])),
            c[0],
        ),
    )[: max(1, n_probe)]
    probe_cids = [cid for cid, _ in probe]
    q = _lit_vec(query_vec)
    hits = spark.read.parquet(index_path).filter(F.col("_cid").isin(probe_cids))
    scored = hits.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
