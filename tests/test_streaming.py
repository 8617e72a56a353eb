"""Streaming metrics (T1-T4): batch correctness + Structured Streaming smoke.

Mirrors the reference's 60s tumbling aggregation (src/metrics.rs:90-137):
n requests, exact distinct users, average latency per window.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from delta_lake_proxy_spark.streaming.metrics import (
    session_windows,
    streaming_tumbling_metrics,
    tumbling_metrics,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, user_id long, value double")


def test_tumbling_metrics_exact(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (t0 + dt.timedelta(seconds=5), 1, 1.0),
        (t0 + dt.timedelta(seconds=30), 1, 3.0),
        (t0 + dt.timedelta(seconds=59), 2, 5.0),
        (t0 + dt.timedelta(seconds=61), 3, 7.0),
    ]
    out = tumbling_metrics(_events(spark, rows)).orderBy("window_start").collect()
    assert len(out) == 2
    w0, w1 = out
    assert w0["n_requests"] == 3 and w0["n_users"] == 2 and w0["avg_latency"] == 3.0
    assert w1["n_requests"] == 1 and w1["n_users"] == 1 and w1["avg_latency"] == 7.0
    assert (w0["window_end"] - w0["window_start"]).total_seconds() == 60


def test_session_windows_gap(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0, 1, 0.0),
        (t0 + dt.timedelta(minutes=2), 1, 0.0),  # same session (gap < 5m)
        (t0 + dt.timedelta(minutes=20), 1, 0.0),  # new session
        (t0, 2, 0.0),
    ]
    out = session_windows(_events(spark, rows), gap="5 minutes").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2 and len(by_user[2]) == 1
    first = min(by_user[1], key=lambda r: r["session_start"])
    assert first["n_events"] == 2


def test_streaming_tumbling_smoke(spark, tmp_path):
    """Same aggregation as a real Structured Streaming query with watermark."""
    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "stream_src")
    _events(
        spark,
        [
            (t0 + dt.timedelta(seconds=s), u, float(s))
            for s in (1, 10, 70)
            for u in (1, 2)
        ],
    ).write.parquet(src)
    stream = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .parquet(src)
    )
    q = (
        streaming_tumbling_metrics(stream)
        .writeStream.format("memory")
        .queryName("metrics_smoke")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    out = spark.sql("SELECT * FROM metrics_smoke").orderBy("window_start").collect()
    assert len(out) == 2
    assert out[0]["n_requests"] == 4 and out[1]["n_requests"] == 2
    # approx distinct in the streaming path (state-bounded); exact in batch
    assert out[0]["n_users"] >= 1


def test_engine_counters(spark, gov_table):
    from delta_lake_proxy_spark import Engine, EngineConfig

    eng = Engine(spark, EngineConfig(table_mapping={"gov": gov_table}))
    assert eng.counters["queries_served"] == 0
    eng.read_table("gov")
    eng.read_table("gov")
    assert eng.counters["queries_served"] == 2


def test_stream_static_permission_join(spark, tmp_path):
    """T6: a streaming event feed joined to the static permissions table —
    only events whose (user, table) hold a grant pass through."""
    import datetime as dt

    perms = spark.createDataFrame(
        [(1, "7", "trades", "{}"), (2, "9", "trades", "{}")],
        "id int, user_id string, table_name string, partition_filters string",
    )
    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "ev_src")
    spark.createDataFrame(
        [(t0, 7, "trades"), (t0, 8, "trades"), (t0, 9, "trades"), (t0, 7, "other")],
        "ts timestamp, user_id long, table_name string",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("ts timestamp, user_id long, table_name string").parquet(src)
    joined = stream.withColumn("user_id", F.col("user_id").cast("string")).join(
        F.broadcast(perms), ["user_id", "table_name"], "inner"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("perm_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    out = spark.sql("SELECT user_id, table_name FROM perm_join").collect()
    assert sorted((r["user_id"], r["table_name"]) for r in out) == [("7", "trades"), ("9", "trades")]


def test_late_data_watermark_timeout_raises_not_partial(spark, monkeypatch):
    """T3 regression (driver r4): if the availableNow drain has not finished
    within the timeout, the query must RAISE — never read the memory sink and
    silently return a partial aggregate (the 44/8961-row red row)."""
    import pytest as _pytest

    from delta_lake_proxy_spark import queries

    monkeypatch.setattr(queries, "_STREAM_TIMEOUT_S", 0.001)
    with _pytest.raises(TimeoutError, match="partial sink"):
        queries.late_data_watermark(spark, "/root/testdata/sf0.001")


def test_late_data_watermark_completes(spark):
    """Happy path: the full drain equals the batch aggregation row count."""
    from delta_lake_proxy_spark import queries
    from delta_lake_proxy_spark.io import load_table

    out = queries.late_data_watermark(spark, "/root/testdata/sf0.001")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    want = ev.select(F.date_trunc("minute", "ts")).distinct().count()
    assert out.count() == want
