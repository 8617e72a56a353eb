"""Per-phase wall-clock profiler for the expensive bench queries.

Usage: python tools/profile_phases.py <target> [sf_dir]

Times each sub-phase of a composite operator separately (noop sink, min-of-3,
job-description labelled) so optimization effort lands where the seconds are
(guide §1.1/§1.5). Read-only: no repo state is touched.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from delta_lake_proxy_spark.io import load_table  # noqa: E402
from delta_lake_proxy_spark.session import build_session  # noqa: E402


def timed(spark, label, fn, n=3):
    rs = []
    for _ in range(n):
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.time()
        spark.sparkContext.setJobDescription(label)
        df = fn()
        df.write.mode("overwrite").format("noop").save()
        spark.sparkContext.setJobDescription(None)
        rs.append(round(time.time() - t0, 3))
    print(f"{label:42s} min {min(rs):7.3f}s of {rs}", flush=True)
    return min(rs)


def profile_gopher(spark, sf_dir):
    from delta_lake_proxy_spark.functions import quality

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    timed(spark, "gopher: quality_flags only", lambda: quality.gopher_quality_flags(docs))
    timed(spark, "gopher: repetition_stats only", lambda: quality.repetition_stats(docs))
    timed(
        spark,
        "gopher: repetition_ngram_stats only",
        lambda: quality.repetition_ngram_stats(docs),
    )
    timed(
        spark,
        "gopher: repetition_ngram top only",
        lambda: quality.repetition_ngram_stats(docs, dup_ns=()),
    )
    timed(
        spark,
        "gopher: repetition_ngram dup only",
        lambda: quality.repetition_ngram_stats(docs, top_ns=()),
    )
    timed(spark, "gopher: full repetition_flags", lambda: quality.gopher_repetition_flags(docs))
    from delta_lake_proxy_spark import queries as Q

    timed(spark, "gopher: full query", lambda: Q.gopher_flags(spark, sf_dir))


def profile_minhash(spark, sf_dir):
    from delta_lake_proxy_spark import queries as Q
    from delta_lake_proxy_spark.functions import dedup

    corpus = Q._docs_with_dups(spark, sf_dir)
    timed(spark, "minhash: corpus materialize", lambda: corpus)

    def sig_only():
        base = corpus.repartition(F.col("doc_id")).select(
            F.col("doc_id").alias("_id"),
            dedup.word_shingles(F.col("text"), 3).alias("_shingles"),
        )
        p = F.lit(dedup._MERSENNE_31).cast("long")
        exploded = base.select("_id", F.explode("_shingles").alias("_sh")).select(
            "_id",
            F.pmod(F.xxhash64("_sh"), p).alias("_h1"),
            F.pmod(F.xxhash64("_sh", F.lit("mh-salt")), p).alias("_h2"),
        )
        return exploded.groupBy("_id").agg(
            *[
                F.min(F.pmod(F.col("_h1") + F.lit(i) * F.col("_h2"), p)).alias(f"_m{i}")
                for i in range(64)
            ]
        )

    timed(spark, "minhash: shingle+signature agg", sig_only)
    timed(
        spark,
        "minhash: full",
        lambda: dedup.minhash_near_duplicates(corpus, threshold=0.6),
    )


def profile_aggs(spark, sf_dir):
    from delta_lake_proxy_spark import queries as Q

    li = load_table(spark, sf_dir, "lineitem")
    timed(spark, "agg: scan only", lambda: li)
    timed(
        spark,
        "agg: q1 aggs only (no distinct)",
        lambda: li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*Q.Q1_AGGS()),
    )
    timed(spark, "agg: agg_group full", lambda: Q.agg_group(spark, sf_dir))
    timed(spark, "agg: rollup_cube full", lambda: Q.agg_rollup_cube(spark, sf_dir))


def profile_text(spark, sf_dir):
    from delta_lake_proxy_spark import queries as Q
    from delta_lake_proxy_spark import text  # type: ignore[attr-defined]


def profile_cdf(spark, sf_dir):
    """Phase breakdown of the table_changes bench row (r17): scratch-table
    write, CDF enablement, DELETE, UPDATE, CDF read+agg — each timed as its
    own wall segment inside one full run (three full runs printed; read the
    fastest run's segments — per-segment minima across runs would not sum
    to a real run)."""
    import shutil as _sh
    import tempfile as _tf
    import time as _time

    from pyspark.sql import functions as F  # noqa: F811

    from delta_lake_proxy_spark import queries as Q
    from delta_lake_proxy_spark.config import EngineConfig
    from delta_lake_proxy_spark.engine import Engine, write_governed_table
    from delta_lake_proxy_spark.queries import dsum

    for run in range(3):
        spark.catalog.clearCache()
        gc.collect()
        marks = [("start", _time.time())]
        li = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
            .filter(F.col("l_orderkey") % 7 == 0)
        )
        scratch_dir = _tf.mkdtemp(prefix="graft_cdf_prof_")
        scratch = os.path.join(scratch_dir, "t")
        write_governed_table(spark, li.repartition(2), scratch, [])
        marks.append(("write_table", _time.time()))
        eng = Engine(
            spark, EngineConfig(table_mapping={"cdf_t": scratch}, read_only=False)
        )
        eng.set_table_properties("cdf_t", {"delta.enableChangeDataFeed": "true"})
        marks.append(("enable_cdf", _time.time()))
        eng.delete("cdf_t", F.col("l_returnflag") == "A")
        marks.append(("delete", _time.time()))
        eng.update(
            "cdf_t",
            F.col("l_returnflag") == "N",
            {"l_quantity": F.col("l_quantity") * 2},
        )
        marks.append(("update", _time.time()))
        cdf = eng.table_changes("cdf_t", from_version=1, to_version=3)
        out = cdf.groupBy("_change_type", "_commit_version").agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
        )
        out.write.mode("overwrite").format("noop").save()
        marks.append(("read_cdf", _time.time()))
        segs = "  ".join(
            f"{name}={t1 - t0:6.3f}s"
            for (_, t0), (name, t1) in zip(marks, marks[1:])
        )
        print(f"cdf run {run}: total={marks[-1][1] - marks[0][1]:6.3f}s  {segs}",
              flush=True)
        _sh.rmtree(scratch_dir, ignore_errors=True)


def main() -> None:
    target = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = build_session("spark-graft-profile")
    # warm the JVM so phase 1 doesn't eat the class-loading bill
    load_table(spark, sf_dir, "documents").write.mode("overwrite").format("noop").save()
    load_table(spark, sf_dir, "lineitem").write.mode("overwrite").format("noop").save()
    fn = globals()[f"profile_{target}"]
    fn(spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
