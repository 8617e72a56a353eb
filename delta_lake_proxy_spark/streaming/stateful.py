"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's metrics task keeps in-memory per-window state (user sets,
latency vectors) and drains it each minute (``src/metrics.rs:90-137``).
Built-in windowed aggregation covers that; this module adds the operator the
built-ins genuinely can't express: a per-user running anomaly monitor whose
state (exponential moving average + event count) evolves across micro-batches
and emits only threshold crossings.

State shape: one small row per user (bounded by user cardinality, not event
volume); timeouts evict idle users — the two properties that keep custom
state viable at stream scale.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "ema double, n long"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ema", T.DoubleType()),
        T.StructField("spike_value", T.DoubleType()),
    ]
)


def monitor_spikes(
    events: DataFrame,
    alpha: float = 0.2,
    factor: float = 3.0,
    idle_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Emit (user, count, ema, value) whenever a user's latency exceeds
    ``factor`` x their running EMA. Works on a streaming DataFrame grouped by
    user; also testable on a batch plan via the same function applied in
    ``applyInPandas`` (state collapses to a single batch)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ema, n = state.get if state.exists else (None, 0)
        out_rows = []
        for pdf in pdfs:
            for v in pdf.sort_values("ts")["value"]:
                v = float(v)
                if ema is not None and n >= 5 and v > factor * ema:
                    out_rows.append((key[0], n + 1, ema, v))
                ema = v if ema is None else alpha * v + (1 - alpha) * ema
                n += 1
        state.update((ema, n))
        state.setTimeoutDuration(idle_timeout_ms)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=["user_id", "n_events", "ema", "spike_value"])

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
