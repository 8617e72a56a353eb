"""Headline benchmark: times the engine's representative queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from delta_lake_proxy_spark import queries as Q
from delta_lake_proxy_spark.session import build_session

HEADLINE = [
    "governed_read",
    "filter_project",
    "agg_group",
    "agg_rollup_cube",
    "join_inner",
    "join_outer",
    "join_asof",
    "window_funcs",
    "top_k",
    "metrics_tumbling_window",
    "window_session",
    "dedup_exact",
    "dedup_near_minhash",
    "text_stats",
    "similarity_topk",
    "similarity_lsh",
    "multimodal_scan",
    "pipeline_clean_corpus",
    "array_funcs",
]

# Protocol-path queries (rounds 7-9 machinery: DV decode + shallow-clone
# read, CDF, log replay/history, checkpoint-seeded snapshot replay) — timed
# on EVERY run (round-10, r9 advice: protocol regressions were invisible)
# but reported under separate keys so the headline total stays comparable
# round-over-round.
PROTOCOL = [
    "dv_read",
    "table_changes",
    "table_history",
    "read_delta_log",
    "checkpoint_replay",
]

# Round-7/11 additions, timed under SPARK_GRAFT_BENCH_EXTENDED=1 (kept out of
# the headline list so its total stays comparable round-over-round).
EXTENDED = [
    "sequence_pack",
    "pii_scrub",
    "auth_join",
    "dedup_substring",
    "lm_perplexity",
    "dsir_weights",
    "bpe_pipeline",
    "decontamination",
    "mix_sample",
    "gopher_flags",
    # r13 incremental-ingest additions
    "hamming_incremental",
    "line_dedup_incremental",
    "byte_bpe",
    # r14: batched multi-query IVF probe vs the single-probe loop
    "ivf_probe_batch16",
    "ivf_probe_loop16",
    # r15: batched BM25 index probe vs the no-index corpus-scan loop
    "bm25_probe_batch16",
    "bm25_scan_loop16",
    # r16: one-call hybrid serving, batched vs a per-request loop
    "hybrid_batch16",
    "hybrid_loop16",
]


def checkpoint_replay(spark, sf_dir):
    """Snapshot replay seeded from a CHECKPOINT: checkpoint the governed
    fixture once (idempotent per version), then replay its live file set —
    times the checkpoint-parquet + JSON-tail reconstruction path."""
    from delta_lake_proxy_spark import deltalog

    path = Q.governed_fixture(spark, sf_dir)
    v = deltalog.latest_version(path)
    import glob

    if not glob.glob(os.path.join(path, "_delta_log", f"{v:020d}.checkpoint*")):
        deltalog.write_checkpoint(spark, path)
    return deltalog.snapshot_files(spark, path).select(
        "path", "size", "partitionValues"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = build_session("spark-graft-bench")
    # Warm the session outside the timed region: governed fixture, JVM/codegen
    # JIT, and a first read of each input table (the queries measure compute,
    # not first-job class-loading).
    Q.governed_fixture(spark, sf_dir)
    from delta_lake_proxy_spark.io import load_all

    for df in load_all(spark, sf_dir).values():
        df.write.mode("overwrite").format("noop").save()
    import gc

    # Fixed-work calibration row (verdict r14 next #5): a code-independent
    # shuffle+agg over spark.range — identical work every round, so the
    # round-over-round headline totals can be read drift-normalized
    # (r12->r14 driver totals swung +/-30% on unchanged headline code).
    # Same min-of-3 discipline as the queries.
    cal_runs = []
    for _ in range(3):
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.time()
        (
            spark.range(50_000_000)
            .selectExpr("id % 100000 AS k", "id AS v")
            .groupBy("k")
            .agg({"v": "sum"})
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        cal_runs.append(round(time.time() - t0, 3))
    calibration = min(cal_runs)
    print(f"# calibration: min {calibration:.2f}s of {cal_runs}", file=sys.stderr)

    # Small-jobs calibration row (verdict r15 next #2): the protocol rows
    # (checkpoint_replay, read_delta_log) are many-tiny-jobs, metadata-IO
    # bound — a shape the big-shuffle calibration above doesn't capture
    # (r14->r15 those rows doubled on provably unchanged code). Fixed work:
    # 20 iterations of spark.read.json over the same 3 tiny files + count.
    import tempfile as _tf

    cal_dir = os.path.join(_tf.gettempdir(), "spark_graft_bench_caljson")
    os.makedirs(cal_dir, exist_ok=True)
    for i in range(3):
        fp = os.path.join(cal_dir, f"part{i}.json")
        if not os.path.exists(fp):
            with open(fp, "w", encoding="utf-8") as f:
                for j in range(200):
                    f.write('{"a": %d, "b": "x%d"}\n' % (j, i))
    small_runs = []
    for _ in range(3):
        gc.collect()
        t0 = time.time()
        for _ in range(20):
            spark.read.json(cal_dir).count()
        small_runs.append(round(time.time() - t0, 3))
    small_cal = min(small_runs)
    print(
        f"# small-jobs calibration: min {small_cal:.2f}s of {small_runs}",
        file=sys.stderr,
    )

    names = list(HEADLINE) + list(PROTOCOL)
    if os.environ.get("SPARK_GRAFT_BENCH_EXTENDED"):
        names += EXTENDED
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in names:
        # isolate queries: drop cached/checkpointed blocks left by earlier
        # operators and collect both runtimes so GC pressure from query N
        # doesn't bill query N+1.
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        # headline queries are registry entries; a retired-from-registry
        # query (e.g. multimodal_scan, round 7) stays benchmarked by name;
        # bench-local micro-benches (checkpoint_replay) resolve last
        fn = Q.QUERIES.get(name) or getattr(Q, name, None) or globals()[name]
        # min-of-3: this VM's load spikes can inflate a single run 2-4x,
        # and the driver records exactly one bench per round; per-run times
        # are published so a reader can see the noise band, not just the min.
        # Protocol rows run min-of-5 (verdict r15 nit #3): they are seconds
        # each and high-variance small-job paths — table_changes ran
        # [4.2, 2.8, 5.4] in r15 — so two extra runs stabilize the signal
        # the round-10 change added them for.
        rs = []
        for _ in range(5 if name in PROTOCOL else 3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            # noop sink materializes every output column (count() would let
            # Catalyst prune the projection and under-measure the query).
            df.write.mode("overwrite").format("noop").save()
            rs.append(round(time.time() - t0, 3))
        timings[name] = min(rs)
        runs[name] = rs
        print(f"# {name}: min {timings[name]:.2f}s of {rs}", file=sys.stderr)
    proto = {k: timings.pop(k) for k in PROTOCOL if k in timings}
    proto_runs = {k: runs.pop(k) for k in PROTOCOL if k in runs}
    # headline keys only: an extended run must report the same comparable
    # total the driver's plain run does
    total = round(sum(v for k, v in timings.items() if k in HEADLINE), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "protocol_queries": proto,
                "protocol_runs": proto_runs,
                "protocol_total": round(sum(proto.values()), 3),
                "calibration_sec": calibration,
                "calibration_runs": cal_runs,
                "calibration_small_jobs_sec": small_cal,
                "calibration_small_jobs_runs": small_runs,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
