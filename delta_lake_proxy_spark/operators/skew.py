"""Skew-mitigation utilities for heavy-hitter keys (100 TB posture).

AQE's skew-join splitting covers joins; aggregations over heavy-hitter keys
(one user producing 10% of all events) still funnel a whole key into one
reducer. ``salted_agg`` implements the standard two-phase fix: append a
random-ish salt to the key, partially aggregate (key, salt) groups, then
merge partials per key. The salt is hash-derived from a row id, keeping the
computation deterministic (reproducible results, resumable stages).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERGEABLE = {"sum", "count", "min", "max"}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name -> (fn, input column) with fn in
    sum/count/min/max (the mergeable algebra; avg = sum/count composed by the
    caller). ``salt_col`` is any high-cardinality column used to derive the
    deterministic salt.

    Phase 1 groups on (keys, salt) — splitting each hot key across
    ``buckets`` reducers; phase 2 merges the tiny partials per key.
    """
    unknown = {fn for fn, _ in aggs.values()} - MERGEABLE
    if unknown:
        raise ValueError(f"non-mergeable aggregate(s): {sorted(unknown)}")
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)).alias("_salt")

    def phase1(fn: str, col: str) -> Column:
        return getattr(F, fn)(F.col(col) if fn != "count" else F.lit(1))

    partial = df.groupBy(*keys, salt).agg(
        *[phase1(fn, col).alias(f"_p_{out}") for out, (fn, col) in aggs.items()]
    )

    def phase2(out: str, fn: str) -> Column:
        merge = "sum" if fn in ("sum", "count") else fn
        return getattr(F, merge)(F.col(f"_p_{out}")).alias(out)

    return partial.groupBy(*keys).agg(
        *[phase2(out, fn) for out, (fn, _) in aggs.items()]
    )
