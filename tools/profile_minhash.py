"""Solo profiling of dedup_near_minhash variants at sf0.1 (verdict r2 #2).

Times the current implementation against variants that strip the two pieces
added in round 2 (repartition(id), eager localCheckpoint) to separate machine
noise from real regression. Run solo — never alongside pytest/bench.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_lake_proxy_spark import queries as Q
from delta_lake_proxy_spark.functions import dedup
from delta_lake_proxy_spark.session import build_session


def variant(corpus, repartition: bool, checkpoint: bool):
    """minhash_near_duplicates with the r2 additions toggled."""
    id_col, text_col = "doc_id", "text"
    num_hashes, bands, shingle_words, threshold = 32, 4, 3, 0.6
    rows_per_band = num_hashes // bands
    df = corpus.repartition(F.col(id_col)) if repartition else corpus
    base = df.select(
        F.col(id_col).alias("_id"),
        dedup.word_shingles(F.col(text_col), shingle_words).alias("_shingles"),
    ).persist()
    p = F.lit(dedup._MERSENNE_31).cast("long")
    exploded = base.select("_id", F.explode("_shingles").alias("_sh")).select(
        "_id",
        F.pmod(F.xxhash64("_sh"), p).alias("_h1"),
        F.pmod(F.xxhash64("_sh", F.lit("mh-salt")), p).alias("_h2"),
    )
    sig_df = exploded.groupBy("_id").agg(
        *[
            F.min(F.pmod(F.col("_h1") + F.lit(i) * F.col("_h2"), p)).alias(f"_m{i}")
            for i in range(num_hashes)
        ]
    )
    banded = sig_df.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[F.col(f"_m{b * rows_per_band + r}") for r in range(rows_per_band)],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bucket"),
    )
    banded, join_keys = dedup.salt_oversized_buckets(
        banded, ["_band", "_bucket"], F.xxhash64(F.col("_id"), F.col("_band")), 10_000
    )
    candidates = (
        banded.alias("a")
        .join(banded.alias("b"), on=join_keys)
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    paired = candidates.join(
        base.select(F.col("_id").alias("id_a"), F.col("_shingles").alias("_sh_a")), "id_a"
    ).join(base.select(F.col("_id").alias("id_b"), F.col("_shingles").alias("_sh_b")), "id_b")
    inter = F.size(F.array_intersect(F.col("_sh_a"), F.col("_sh_b")))
    union = F.size(F.array_union(F.col("_sh_a"), F.col("_sh_b")))
    out = (
        paired.withColumn("jaccard", F.round(inter.cast("double") / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if checkpoint:
        out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("minhash-profile")
    corpus = Q._docs_with_dups(spark, sf_dir)
    n = corpus.count()
    parts = corpus.rdd.getNumPartitions()
    print(f"# corpus rows={n} input_partitions={parts}", file=sys.stderr)

    cases = {
        "current (repart+ckpt)": (True, True),
        "no_repartition": (False, True),
        "no_checkpoint": (True, False),
        "neither": (False, False),
    }
    results: dict[str, list[float]] = {k: [] for k in cases}
    for rnd in range(3):
        for name, (rep, ckpt) in cases.items():
            spark.catalog.clearCache()
            gc.collect()
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
            t0 = time.time()
            df = variant(corpus, rep, ckpt)
            df.write.mode("overwrite").format("noop").save()
            results[name].append(round(time.time() - t0, 3))
            print(f"# round {rnd} {name}: {results[name][-1]:.2f}s", file=sys.stderr)
    for name, ts in results.items():
        print(f"{name}: min={min(ts):.2f} all={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
