"""Scale-posture spot check at the local sf1 fixture (r18, verdict r17
next #3): the sf0.1 bench is fixed-overhead-bound (13/19 queries ran FASTER
at 8 cores in PERF_r17), so scale-posture rewrites need at least one
measurement where data size, not scheduling, dominates.

Runs at ``tools/gen_sf1.py``'s 10x fixture (default /root/sf1_local):

1. join_inner — current dimension-first shape vs the pre-r17 fact-first
   shape (reproduced inline), interleaved: confirms or refutes the r17
   "5x less shuffle at scale" claim at a SF where orders no longer fits
   the broadcast threshold.
2. dedup_near_minhash — spread policies (byteaware/pin/countless/none),
   interleaved: the r17 pin's cost/benefit with 10x the docs, where the
   candidates machinery's ~2 s fixed cost amortizes.
3. text_stats / pipeline_clean_corpus — plain min-of-N at sf1.

Bench methodology (noop sink, cache cleared between runs). Run SOLO.
Usage: python tools/bench_sf1.py [rounds]
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from delta_lake_proxy_spark.functions import dedup  # noqa: E402
from delta_lake_proxy_spark.io import load_table  # noqa: E402
from delta_lake_proxy_spark.queries import QUERIES, dsum  # noqa: E402
from delta_lake_proxy_spark.session import build_session  # noqa: E402

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/sf1_local")


def join_inner_old(spark, sf_dir):
    """Pre-r17 shape: fact-fact join first, ASIA filter after (bc426db)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def timed(spark, build) -> float:
    gc.collect()
    t0 = time.time()
    df = build(spark, SF1_DIR)
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    spark.catalog.clearCache()
    dedup.release_salt_caches()
    return dt


def report(label: str, xs: list[float]) -> None:
    print(
        f"  {label:12s} min {min(xs):7.3f}  med {statistics.median(xs):7.3f}"
        f"  {[round(x, 3) for x in xs]}",
        flush=True,
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = build_session("sf1-spot", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))

    print(f"== join_inner @ sf1 (new dimension-first vs old fact-first) ==")
    variants = {"new": QUERIES["join_inner"], "old": join_inner_old}
    for v in variants.values():
        timed(spark, v)  # warm
    res: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(rounds):
        for k, v in variants.items():
            res[k].append(timed(spark, v))
    for k, xs in res.items():
        report(k, xs)

    print(f"== dedup_near_minhash @ sf1 (spread policies) ==")
    real = dedup._spread_by_id
    policies = {
        "byteaware": real,
        "pin_dp": lambda df, key: df.repartition(
            df.sparkSession.sparkContext.defaultParallelism, key
        ),
        "countless": lambda df, key: df.repartition(key),
        "none": lambda df, key: df,
    }
    q = QUERIES["dedup_near_minhash"]
    for p in policies.values():
        dedup._spread_by_id = p
        timed(spark, q)  # warm
    res = {k: [] for k in policies}
    for _ in range(rounds):
        for k, p in policies.items():
            dedup._spread_by_id = p
            res[k].append(timed(spark, q))
    dedup._spread_by_id = real
    for k, xs in res.items():
        report(k, xs)

    print(f"== plain rows @ sf1 ==")
    for name in ("text_stats", "pipeline_clean_corpus"):
        q = QUERIES[name]
        timed(spark, q)  # warm
        xs = [timed(spark, q) for _ in range(rounds)]
        report(name, xs)

    spark.stop()


if __name__ == "__main__":
    main()
