"""Solo profiling of dedup_near_duplicates at sf0.1 (r11 verdict next #3).

Two harnesses, both run solo (never alongside pytest/bench — this VM's
load noise swamps sub-second deltas):

- STAGED: times cumulative prefixes of the pipeline (shingles -> +64-min
  signature agg -> +banded self-join candidates -> +exact verification)
  with the Spark cache CLEARED between runs, so each stage's marginal
  cost is visible instead of being absorbed by plan-cache reuse.
- A/B: interleaved full-pipeline comparison of the current banding
  (xxhash64 over the per-band signature columns) against the slice-hash
  variant (xxhash64 over a slice of the signature array) the r11 verdict
  suggested. Interleaving (ABAB...) cancels slow environment drift that
  back-to-back blocks do not.

Round-12 findings (NOTES_r12): candidates stage ~1.5 s of the 2.7 s
total — the fixed machinery (persist+materialize, bucket-size aggregate,
broadcast salt join, self-join exchange, pair dedup) that amortizes at
scale; signature agg ~0.6 s; verification ~0.1 s; the slice-hash variant
measured identical (not adopted).
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_lake_proxy_spark.functions import dedup
from delta_lake_proxy_spark.io import load_table
from delta_lake_proxy_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_HASHES, BANDS, THRESHOLD = 64, 16, 0.6


def _signatures(docs, id_col="doc_id", text_col="text"):
    p = F.lit(dedup._MERSENNE_31).cast("long")
    base = docs.repartition(F.col(id_col)).select(
        F.col(id_col).alias("_id"),
        dedup.word_shingles(F.col(text_col), 3).alias("_shingles"),
    )
    exploded = base.select("_id", F.explode("_shingles").alias("_sh")).select(
        "_id",
        F.pmod(F.xxhash64("_sh"), p).alias("_h1"),
        F.pmod(F.xxhash64("_sh", F.lit("mh-salt")), p).alias("_h2"),
    )
    sig = exploded.groupBy("_id").agg(
        *[
            F.min(F.pmod(F.col("_h1") + F.lit(i) * F.col("_h2"), p)).alias(f"_m{i}")
            for i in range(NUM_HASHES)
        ]
    )
    return base, sig


def _pipeline(spark, docs, stop_at: str, banding: str = "cols") -> int:
    r = NUM_HASHES // BANDS
    base, sig_df = _signatures(docs)
    base = base.persist()
    if stop_at == "shingles":
        n = base.count()
        base.unpersist(); spark.catalog.clearCache()
        return n
    if stop_at == "sig":
        n = sig_df.count()
        base.unpersist(); spark.catalog.clearCache()
        return n
    if banding == "cols":
        banded = sig_df.select(
            "_id",
            F.posexplode(
                F.array(
                    *[
                        F.xxhash64(
                            F.lit(b), *[F.col(f"_m{b * r + i}") for i in range(r)]
                        )
                        for b in range(BANDS)
                    ]
                )
            ).alias("_band", "_bucket"),
        )
    else:  # slice-hash variant (r11 verdict suggestion; measured identical)
        arr = F.array(*[F.col(f"_m{i}") for i in range(NUM_HASHES)])
        banded = sig_df.select("_id", arr.alias("_sig")).select(
            "_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(BANDS - 1)),
                    lambda b: F.xxhash64(b, F.slice(F.col("_sig"), b * r + 1, r)),
                )
            ).alias("_band", "_bucket"),
        )
    banded, keys = dedup.salt_oversized_buckets(
        banded, ["_band", "_bucket"], F.xxhash64(F.col("_id"), F.col("_band")), 10_000
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=keys)
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if stop_at == "cand":
        n = cand.count()
        base.unpersist(); spark.catalog.clearCache()
        return n
    paired = cand.join(
        base.select(F.col("_id").alias("id_a"), F.col("_shingles").alias("_sh_a")),
        "id_a",
    ).join(
        base.select(F.col("_id").alias("id_b"), F.col("_shingles").alias("_sh_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect(F.col("_sh_a"), F.col("_sh_b")))
    union = F.size(F.array_union(F.col("_sh_a"), F.col("_sh_b")))
    out = (
        paired.withColumn("jaccard", F.round(inter.cast("double") / union, 6))
        .filter(F.col("jaccard") >= THRESHOLD)
        .select("id_a", "id_b", "jaccard")
        .localCheckpoint(eager=True)
    )
    n = out.count()
    base.unpersist(); spark.catalog.clearCache()
    return n


def main() -> None:
    spark = build_session("mh-profile", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    docs = load_table(spark, SF_DIR, "documents")
    print(f"documents: {docs.count()} @ {SF_DIR}")

    stages = ["shingles", "sig", "cand", "full"]
    for s in stages:
        _pipeline(spark, docs, s)  # warm
    res: dict[str, list[float]] = {s: [] for s in stages}
    for _ in range(3):
        for s in stages:
            gc.collect()
            t0 = time.time()
            _pipeline(spark, docs, s)
            res[s].append(time.time() - t0)
    print("\nSTAGED (cumulative, min of 3, cache cleared):")
    for s in stages:
        print(f"  {s:10s} {min(res[s]):.3f}s  {[round(x, 3) for x in res[s]]}")

    ab: dict[str, list[float]] = {"cols": [], "slice": []}
    counts = {}
    for v in ("cols", "slice"):
        counts[v] = _pipeline(spark, docs, "full", banding=v)  # warm
    for _ in range(4):
        for v in ("cols", "slice"):
            gc.collect()
            t0 = time.time()
            _pipeline(spark, docs, "full", banding=v)
            ab[v].append(time.time() - t0)
    print(f"\nA/B banding (interleaved, pairs: cols={counts['cols']} slice={counts['slice']}):")
    for v, xs in ab.items():
        print(f"  {v:6s} min {min(xs):.3f}s  {[round(x, 3) for x in xs]}")
    spark.stop()


if __name__ == "__main__":
    main()
