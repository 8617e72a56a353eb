"""Streaming metrics (T1-T4): batch correctness + Structured Streaming smoke.

Mirrors the reference's 60s tumbling aggregation (src/metrics.rs:90-137):
n requests, exact distinct users, average latency per window.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from delta_lake_proxy_spark.streaming.metrics import (
    session_windows,
    sliding_metrics,
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


def test_sliding_metrics_exact(spark):
    """T4 sliding windows (pytest pin — the driver row was folded into
    window_session in round 7): 10-minute windows every 5 minutes place each
    event in exactly two windows with exact counts/averages."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (t0 + dt.timedelta(minutes=1), 1, 2.0),   # windows [-5,5) and [0,10)
        (t0 + dt.timedelta(minutes=6), 2, 4.0),   # windows [0,10) and [5,15)
        (t0 + dt.timedelta(minutes=6, seconds=30), 3, 8.0),
    ]
    out = {
        r["window_start"]: r
        for r in sliding_metrics(
            _events(spark, rows), window_duration="10 minutes", slide_duration="5 minutes"
        ).collect()
    }
    assert sum(r["n_requests"] for r in out.values()) == 2 * len(rows)
    w_0 = out[t0]
    assert w_0["n_requests"] == 3 and w_0["avg_latency"] == (2.0 + 4.0 + 8.0) / 3
    w_5 = out[t0 + dt.timedelta(minutes=5)]
    assert w_5["n_requests"] == 2 and w_5["avg_latency"] == 6.0
    w_m5 = out[t0 - dt.timedelta(minutes=5)]
    assert w_m5["n_requests"] == 1 and w_m5["avg_latency"] == 2.0
    assert all(
        (r["window_end"] - r["window_start"]).total_seconds() == 600
        for r in out.values()
    )


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


def test_event_ts_encoding_invariance(spark, tmp_path):
    """The driver fixtures have shipped events.ts as BOTH int64 ns-since-epoch
    and parquet timestamp[us] across rounds (the r4 red-row cause). Batch and
    streaming readers must produce identical windows for either encoding."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from delta_lake_proxy_spark import queries
    from delta_lake_proxy_spark.io import load_table

    base = dt.datetime(2024, 1, 1)
    ts = [base + dt.timedelta(seconds=90 * i) for i in range(40)]
    cols = {
        "event_id": pa.array(range(40), pa.int64()),
        "user_id": pa.array([i % 5 for i in range(40)], pa.int64()),
        "event_type": pa.array(["get"] * 40),
        "value": pa.array([float(i) for i in range(40)]),
        "props": pa.array(["{}"] * 40),
    }
    d_us = tmp_path / "us"
    d_ns = tmp_path / "ns"
    d_us.mkdir()
    d_ns.mkdir()
    pq.write_table(
        pa.table({**cols, "ts": pa.array(ts, pa.timestamp("us"))}),
        str(d_us / "events.parquet"),
    )
    epoch = dt.datetime(1970, 1, 1)
    ns_vals = [int((t - epoch).total_seconds() * 1_000_000) * 1000 for t in ts]
    pq.write_table(
        pa.table({**cols, "ts": pa.array(ns_vals, pa.int64())}),
        str(d_ns / "events.parquet"),
    )
    for sf_dir in (str(d_us), str(d_ns)):
        assert dict(load_table(spark, sf_dir, "events").dtypes)["ts"] in (
            "timestamp",
            "timestamp_ntz",
        )
    a = queries.late_data_watermark(spark, str(d_us)).orderBy("window_start").collect()
    b = queries.late_data_watermark(spark, str(d_ns)).orderBy("window_start").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 40  # 90s spacing -> every event in its own 60s window


def test_transform_with_state_gated_on_protobuf(spark):
    """The Spark 4 transformWithStateInPandas operator refuses EARLY with
    the actionable dependency story when google.protobuf is absent (this
    container), instead of crashing the streaming Python runner mid-query.
    On a protobuf-equipped cluster the same code runs (semantics mirrored
    by the applyInPandasWithState spike monitor's test)."""
    import importlib.util

    import pytest as _pytest

    from delta_lake_proxy_spark.streaming import stateful

    events = spark.createDataFrame([(1, 1.0)], "user_id long, value double")
    try:
        missing = importlib.util.find_spec("google.protobuf") is None
    except ModuleNotFoundError:
        missing = True
    if missing:
        with _pytest.raises(stateful.TransformWithStateUnavailable, match="protobuf"):
            stateful.running_totals_tws(events)
    else:  # pragma: no cover - exercised only on protobuf-equipped clusters
        df = stateful.running_totals_tws(events)
        assert set(df.columns) == {"user_id", "total_events", "sum_value", "batches_seen"}
