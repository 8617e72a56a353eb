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
HIST_RESERVED_COLS = frozenset({"counts", "n_rows"})


def _check_group_cols(
    group_cols: list, reserved: frozenset = SKETCH_RESERVED_COLS
) -> list:
    if not group_cols:
        raise ValueError("sketch rollup requires at least one group column")
    clash = sorted(set(group_cols) & reserved)
    if clash:
        raise ValueError(
            f"group column(s) {clash} collide with the rollup's "
            f"output columns ({sorted(reserved)}) — rename them"
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


def _hist_bin_expr(value_col: str, bins: int, lo: float, hi: float):
    """1-based counts-array position for a value: 1 = underflow (< lo),
    2..bins+1 = the in-range bins, bins+2 = overflow (>= hi). NULL values
    bin nowhere (they are rows without a measurable value)."""
    w = (float(hi) - float(lo)) / int(bins)
    v = F.col(value_col).cast("double")
    in_range = F.least(
        F.floor((v - F.lit(float(lo))) / F.lit(w)).cast("int"),
        F.lit(int(bins) - 1),
    ) + F.lit(2)
    return (
        F.when(v.isNull(), F.lit(None).cast("int"))
        .when(v < float(lo), F.lit(1))
        .when(v >= float(hi), F.lit(int(bins) + 2))
        .otherwise(in_range)
    )


def hist_rollup(
    df: DataFrame,
    group_cols: list,
    value_col: str,
    bins: int,
    lo: float,
    hi: float,
    negate: bool = False,
) -> DataFrame:
    """One fixed-bin histogram row per group: ``(group_cols..., counts
    array<long>[bins+2], n_rows)`` — positions 1 / 2..bins+1 / bins+2
    hold the underflow / in-range / overflow counts, so totals stay
    exact whatever the data does outside the pinned [lo, hi) range.
    ONE aggregation pass of bins+2 count-if expressions (pure codegen,
    partial-combined — no per-row array allocation, no shuffle beyond
    the groupBy).

    Unlike an HLL sketch, histogram counts are LINEAR: partials from any
    data slices merge by element-wise addition, and ``negate=True``
    emits a NEGATIVE partial — the delete-absorption mechanism (subtract
    the tombstoned rows' histogram; no group recompute, no group joins,
    NULL group keys are fine)."""
    group_cols = _check_group_cols(group_cols, HIST_RESERVED_COLS)
    b = _hist_bin_expr(value_col, bins, lo, hi)
    sign = -1 if negate else 1
    aggs = [
        F.count(F.when(b == i + 1, F.lit(1))).alias(f"_b{i}")
        for i in range(int(bins) + 2)
    ]
    g = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        *aggs, F.count(F.lit(1)).alias("_n")
    )
    return g.select(
        *[F.col(c) for c in group_cols],
        F.array(
            *[(F.col(f"_b{i}") * sign) for i in range(int(bins) + 2)]
        ).alias("counts"),
        (F.col("_n") * sign).alias("n_rows"),
    )


def hist_rollup_merge(
    rollup: DataFrame, group_cols: list, bins: int
) -> DataFrame:
    """Element-wise-sum merge of a histogram rollup's (possibly
    many-per-group, possibly negative) partial rows back to one exact
    histogram per group. Groups whose rows have all been deleted (zero
    n_rows) drop out, exactly like a rebuild over the live source."""
    group_cols = _check_group_cols(group_cols, HIST_RESERVED_COLS)
    sums = [
        F.sum(F.element_at(F.col("counts"), i + 1)).alias(f"_b{i}")
        for i in range(int(bins) + 2)
    ]
    m = rollup.groupBy(*[F.col(c) for c in group_cols]).agg(
        *sums, F.sum("n_rows").alias("n_rows")
    )
    return m.filter(F.col("n_rows") > 0).select(
        *[F.col(c) for c in group_cols],
        F.array(*[F.col(f"_b{i}") for i in range(int(bins) + 2)]).alias(
            "counts"
        ),
        F.col("n_rows"),
    )


def hist_quantile_cols(
    bins: int, lo: float, hi: float, quantiles
) -> "dict[str, object]":
    """Per-quantile value expressions over a merged ``counts`` array:
    cumulative sum via ``aggregate`` (a running-total array build —
    bins+2 elements, expression-only, no shuffle), first position whose
    cumulative count reaches ceil(q * total), mapped to the bin midpoint
    (underflow/overflow clamp to lo/hi — mass outside the pinned range
    has no midpoint). Estimates are within half a bin width of the exact
    quantile for in-range mass. A zero-mass histogram yields NULL."""
    w = (float(hi) - float(lo)) / int(bins)
    counts = F.col("counts")
    total = F.aggregate(
        counts, F.lit(0).cast("long"), lambda a, x: a + x
    )
    cum = F.aggregate(
        counts,
        F.array().cast("array<long>"),
        # try_element_at: the accumulator starts EMPTY, where a plain
        # element_at(-1) is an out-of-bounds error rather than NULL
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0).cast("long"))
                + x
            ),
        ),
    )
    out = {}
    for q in quantiles:
        q = float(q)
        target = F.greatest(
            F.ceil(total * F.lit(q)).cast("long"), F.lit(1).cast("long")
        )
        pos = F.array_position(
            F.transform(cum, lambda c: c >= target), F.lit(True)
        )
        val = (
            F.when(total <= 0, F.lit(None).cast("double"))
            .when(pos <= 0, F.lit(None).cast("double"))
            .when(pos == 1, F.lit(float(lo)))
            .when(pos == int(bins) + 2, F.lit(float(hi)))
            .otherwise(
                F.lit(float(lo)) + (pos.cast("double") - 2.0 + 0.5) * F.lit(w)
            )
        )
        out[f"q{str(q).replace('.', '_')}"] = F.round(val, 6)
    return out
