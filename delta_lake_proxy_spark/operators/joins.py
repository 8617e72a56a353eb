"""Join operators beyond Spark's built-ins — notably the as-of join (J7).

The reference's market-data domain (``README.md:222-247``: Ticker/MIC/
TradeTimestamp tables) makes time-series as-of joins the natural missing join
type (SURVEY §2.3 J7). Spark has no native as-of join; the scalable plan here
is the union+window formulation: tag both sides, union, and carry the most
recent right-side values forward with ``last(..., ignorenulls=True)`` over a
per-key ordered window. Cost: ONE shuffle on the key (same as any equi-join)
and no range-explosion — this survives 100x scale-up where a naive
inequality-join (broadcast nested loop) would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same key group (backward as-of).

    Ties (equal timestamps) resolve to the right row being visible to the left
    row, matching the ``<=`` contract. Right value columns come back as
    ``<name><suffix>`` (null when no prior right row exists).
    """
    lcols = left.columns
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[v]).alias(f"_rv_{v}") for v in right_values],
    )
    tagged_right = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) if c not in on else F.col(c) for c in lcols],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_side"),
        *[F.col(v).alias(f"_rv_{v}") for v in right_values],
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows (side=0) sort before left rows at the same timestamp -> "<=".
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("_side"),
        *[
            F.last(F.col(f"_rv_{v}"), ignorenulls=True).over(w).alias(f"{v}{suffix}")
            for v in right_values
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition,
    how: str = "inner",
) -> DataFrame:
    """Theta/range join (J6). Thin wrapper: Spark handles non-equi conditions
    via broadcast-nested-loop; callers should keep one side broadcastable
    (e.g. a bands/dimension table) — that is the scale-correct shape for
    band joins, and Catalyst broadcasts the small side automatically."""
    return left.join(right, on=condition, how=how)
