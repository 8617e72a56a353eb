"""Streaming observability metrics (reference ``src/metrics.rs``).

The reference aggregates per-request observations (user_id, backend latency,
message size) in a detached task over 60-second tumbling windows: exact
distinct users, average latency, average size, drained per window
(``src/metrics.rs:90-137``). Here the same computation is a windowed
aggregation — one function shared by the batch path (DuckDB-oracle-checkable
on the ``events`` fixture) and the Structured Streaming path (watermarked,
update-mode) — plus monotonic counters kept on the Engine (G7).

Scale note: the tumbling-window agg is a single hash aggregation keyed on
(window), with map-side partial aggregation; ``approx_count_distinct`` keeps
the streaming state bounded where exactness isn't required (the batch/oracle
path stays exact per the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_metrics(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    latency_col: str = "value",
    size_col: str | None = None,
    window_duration: str = "60 seconds",
    exact_distinct: bool = True,
) -> DataFrame:
    """60-second tumbling-window request metrics (T1/W1/A1-A3).

    Output: window_start, window_end, n_requests, n_users, avg_latency
    (+ avg_size when ``size_col`` given). Latency averaging goes through an
    exact decimal sum so the result is bit-stable across engines/partitionings.
    """
    distinct = (
        F.countDistinct(user_col) if exact_distinct else F.approx_count_distinct(user_col)
    )
    aggs = [
        F.count(F.lit(1)).alias("n_requests"),
        distinct.alias("n_users"),
        (
            F.sum(F.col(latency_col).cast("decimal(27,9)")).cast("double")
            / F.count(latency_col)
        ).alias("avg_latency"),
    ]
    if size_col is not None:
        aggs.append(
            (
                F.sum(F.col(size_col).cast("decimal(27,9)")).cast("double")
                / F.count(size_col)
            ).alias("avg_size")
        )
    win = F.window(F.col(ts_col), window_duration)
    return (
        events.groupBy(win.alias("w"))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *[F.col(c) for c in ["n_requests", "n_users", "avg_latency"]],
            *([F.col("avg_size")] if size_col is not None else []),
        )
    )


def streaming_tumbling_metrics(
    events_stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    latency_col: str = "value",
    window_duration: str = "60 seconds",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Structured-Streaming variant with an event-time watermark (T3).

    Streaming state cannot hold exact per-window user sets unboundedly, so the
    distinct count is HLL-approximate here; the batch path stays exact.
    """
    return tumbling_metrics(
        events_stream.withWatermark(ts_col, watermark),
        ts_col=ts_col,
        user_col=user_col,
        latency_col=latency_col,
        window_duration=window_duration,
        exact_distinct=False,
    )


def sliding_metrics(
    events: DataFrame,
    ts_col: str = "ts",
    latency_col: str = "value",
    window_duration: str = "10 minutes",
    slide_duration: str = "5 minutes",
) -> DataFrame:
    """Sliding (hopping) window metrics (T4 first half, SURVEY §2.9).

    ``window(ts, duration, slide)`` assigns each event to
    duration/slide overlapping windows; the aggregation is still one hash
    agg keyed on window — Spark expands the window list map-side, so no
    extra shuffle versus tumbling."""
    return (
        events.groupBy(F.window(F.col(ts_col), window_duration, slide_duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            (
                F.sum(F.col(latency_col).cast("decimal(27,9)")).cast("double")
                / F.count(latency_col)
            ).alias("avg_latency"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_requests",
            "avg_latency",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "5 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user session windows (T4): sessionize by inactivity gap.

    Works in both batch and streaming (``session_window`` is supported in
    batch aggregation); output is one row per (user, session).
    """
    return (
        events.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("s"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )
