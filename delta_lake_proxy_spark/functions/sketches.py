"""Mergeable-sketch rollups — approximate distinct counting at 100 TB.

The hypertable-rollup pattern: maintain a small per-group SKETCH table
(Apache DataSketches HLL via Spark's built-in ``hll_sketch_agg`` family —
one binary column of ~``2^lg_k`` bytes per group row) and answer
"distinct values per group" by UNION-MERGING sketches instead of
re-shuffling the corpus. Because an HLL sketch is insensitive to item
order and duplication, partial sketches appended per source commit merge
to exactly the sketch a full rebuild would produce — the property that
makes the rollup incrementally maintainable (pinned in
tests/test_llm_ops.py).

Scale posture: the exact alternative (``countDistinct``) shuffles every
(group, value) pair; the rollup shuffles value rows once AT BUILD into
group-sized sketch state, after which every query aggregates
``groups x ~KB`` — driver-metadata-sized for any realistic group count —
and every refresh pays only the new commits. Standard error is
~1.04/sqrt(2^lg_k) (~1.6% at the default lg_k=12).

Reference parity: the reference proxies storage reads (src/main.rs) and
has no sketch surface; this is part of the repo's LLM-pipeline charter
(corpus accounting: distinct documents/urls/users per shard/day at
training-data scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# output / internal column names a group column may not collide with
SKETCH_RESERVED_COLS = frozenset({"sketch", "n_rows", "approx_distinct"})


def _check_group_cols(group_cols: list) -> list:
    if not group_cols:
        raise ValueError("sketch rollup requires at least one group column")
    clash = sorted(set(group_cols) & SKETCH_RESERVED_COLS)
    if clash:
        raise ValueError(
            f"group column(s) {clash} collide with the sketch rollup's "
            f"output columns ({sorted(SKETCH_RESERVED_COLS)}) — rename them"
        )
    return list(group_cols)


def sketch_rollup(
    df: DataFrame,
    group_cols: list,
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch row per group: ``(group_cols..., sketch, n_rows)``.
    ``n_rows`` is the exact row count (sketches only approximate DISTINCT;
    the row count is free at aggregation time and queries want both)."""
    group_cols = _check_group_cols(group_cols)
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(int(lg_k))).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def sketch_rollup_estimate(
    rollup: DataFrame, group_cols: list
) -> DataFrame:
    """Merge a rollup's (possibly many-per-group) sketch rows and
    estimate: ``(group_cols..., approx_distinct, n_rows)``. The merge is
    ``hll_union_agg`` — partial sketches from any number of refresh
    appends collapse to the full-corpus estimate."""
    group_cols = _check_group_cols(group_cols)
    return rollup.groupBy(*[F.col(c) for c in group_cols]).agg(
        # a group whose values were all NULL aggregates a NULL sketch
        # (hll_sketch_agg skips nulls) — its distinct count is 0, not NULL
        F.coalesce(
            F.hll_sketch_estimate(
                F.hll_union_agg(F.col("sketch"), F.lit(False))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )
