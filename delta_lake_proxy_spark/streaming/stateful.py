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


class TransformWithStateUnavailable(RuntimeError):
    """transformWithStateInPandas needs the RocksDB state store AND
    google.protobuf (the Python<->JVM state-server protocol is protobuf-
    framed); without protobuf the Spark streaming runner crashes with an
    opaque STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE — refuse early
    with the actionable story instead."""


def _require_tws() -> None:
    import importlib.util

    try:
        missing = importlib.util.find_spec("google.protobuf") is None
    except ModuleNotFoundError:  # no parent 'google' package at all
        missing = True
    if missing:
        raise TransformWithStateUnavailable(
            "transformWithStateInPandas requires the google.protobuf package "
            "(Spark's Python state-server protocol); it is not installed in "
            "this environment. Use running_totals (applyInPandasWithState) — "
            "same semantics, no protobuf dependency."
        )


def running_totals_tws(events, id_col: str = "user_id", value_col: str = "value"):
    """Per-key running totals on the Spark 4 ``transformWithStateInPandas``
    API (StatefulProcessor + typed ValueState): emits
    ``(key, total_events, sum_value, batches_seen)`` every micro-batch,
    state persists across batches via the RocksDB store. The modern
    replacement for applyInPandasWithState — typed state handles, multiple
    named states, timers — gated here on the protobuf dependency the
    environment may lack (:class:`TransformWithStateUnavailable`); the
    session must set ``spark.sql.streaming.stateStore.providerClass`` to
    the RocksDB provider."""
    _require_tws()
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self.state = handle.getValueState("tot", "cnt long, s double, b long")

        def handleInputRows(self, key, rows, timerValues):
            n, s = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                s += float(pdf[value_col].sum())
            prev = self.state.get()
            cnt, tot, b = (prev[0], prev[1], prev[2]) if prev else (0, 0.0, 0)
            self.state.update((cnt + n, tot + s, b + 1))
            yield pd.DataFrame(
                {
                    id_col: [key[0]],
                    "total_events": [cnt + n],
                    "sum_value": [tot + s],
                    "batches_seen": [b + 1],
                }
            )

        def close(self):
            pass

    return events.groupBy(id_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType=(
            f"{id_col} long, total_events long, sum_value double, batches_seen long"
        ),
        outputMode="Update",
        timeMode="None",
    )
