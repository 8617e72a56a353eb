"""Interleaved A/B of the dedup doc-spread repartition policies (r18,
verdict r17 next #1: settle the dedup_near_minhash repartition pin).

Variants swap ``dedup._spread_by_id`` (the single production hook both
MinHash and SimHash use) and time the REGISTERED queries end-to-end with
the bench methodology (noop sink, cache cleared between runs):

- byteaware  : repartition(max(defaultParallelism, scan splits), id) — r18
- pin_dp     : repartition(defaultParallelism, id)                   — r17
- countless  : repartition(id)  (AQE folds to ~1 partition)          — r16
- none       : no repartition at all

Interleaved rounds (ABCD ABCD ...) cancel environment drift; report
min + median per variant. Run SOLO.

Usage: python tools/bench_spread_ab.py [rounds] [query ...]
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
from delta_lake_proxy_spark.session import build_session  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_REAL = dedup._spread_by_id

VARIANTS = {
    "byteaware": _REAL,
    "pin_dp": lambda df, key: df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, key
    ),
    "countless": lambda df, key: df.repartition(key),
    "none": lambda df, key: df,
}


def run_once(spark, qname: str) -> float:
    fn = entry_mod.queries()[qname]
    gc.collect()
    t0 = time.time()
    df = fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return dt


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    queries = sys.argv[2:] or ["dedup_near_minhash", "dedup_near_simhash"]
    spark = build_session(
        "spread-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    )
    for q in queries:
        # warm each variant once (JIT/plan-cache), then interleave
        for name, fn in VARIANTS.items():
            dedup._spread_by_id = fn
            run_once(spark, q)
        res: dict[str, list[float]] = {v: [] for v in VARIANTS}
        for _ in range(rounds):
            for name, fn in VARIANTS.items():
                dedup._spread_by_id = fn
                res[name].append(run_once(spark, q))
        dedup._spread_by_id = _REAL
        print(f"\n== {q} (interleaved, {rounds} rounds) ==")
        for name, xs in res.items():
            print(
                f"  {name:10s} min {min(xs):6.3f}  med {statistics.median(xs):6.3f}"
                f"  {[round(x, 3) for x in xs]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
