"""Scale-oriented features: governed SQL views, salted aggregation,
bucketed co-located joins, custom stateful streaming operator."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig
from delta_lake_proxy_spark.operators.skew import salted_agg


def test_governed_sql_view(spark, gov_table):
    eng = Engine(
        spark,
        EngineConfig(
            table_mapping={"gov": gov_table},
            allowed_partitions={"gov": [{"l_returnflag": "A"}]},
        ),
    )
    view = eng.create_governed_view("gov", user="u")
    flags = spark.sql(f"SELECT DISTINCT l_returnflag FROM {view}").collect()
    assert [r[0] for r in flags] == ["A"]


def test_salted_agg_matches_plain(spark, lineitem):
    got = (
        salted_agg(
            lineitem,
            keys=["l_returnflag"],
            aggs={
                "n": ("count", "l_quantity"),
                "total_qty": ("sum", "l_quantity"),
                "max_price": ("max", "l_extendedprice"),
                "min_price": ("min", "l_extendedprice"),
            },
            salt_col="l_orderkey",
            buckets=8,
        )
        .orderBy("l_returnflag")
        .collect()
    )
    want = (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.count("l_quantity").alias("n"),
            F.sum("l_quantity").alias("total_qty"),
            F.max("l_extendedprice").alias("max_price"),
            F.min("l_extendedprice").alias("min_price"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    assert [r["n"] for r in got] == [r["n"] for r in want]
    assert [r["max_price"] for r in got] == [r["max_price"] for r in want]
    assert [round(r["total_qty"], 6) for r in got] == [
        round(r["total_qty"], 6) for r in want
    ]


def test_salted_agg_rejects_non_mergeable(spark, lineitem):
    import pytest

    with pytest.raises(ValueError):
        salted_agg(lineitem, ["l_returnflag"], {"a": ("avg", "l_quantity")}, "l_orderkey")


def test_bucketed_join_has_no_shuffle(spark, tmp_path, lineitem):
    """Bucketing both sides on the join key removes the Exchange — the
    co-located-join strategy for repeated fact-fact joins at scale."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        name_a, name_b = "b_lineitem", "b_orders"
        from delta_lake_proxy_spark.io import load_table
        from tests.conftest import SF_DIR

        orders = load_table(spark, SF_DIR, "orders")
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable(name_a)
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable(name_b)
        joined = spark.table(name_a).join(
            spark.table(name_b),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


@pytest.mark.full
def test_stateful_spike_monitor_streaming(spark, tmp_path):
    from delta_lake_proxy_spark.streaming.stateful import monitor_spikes

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for s in range(20):
        rows.append((t0 + dt.timedelta(seconds=s), 1, 1.0))  # steady user
    rows.append((t0 + dt.timedelta(seconds=30), 1, 50.0))  # spike
    for s in range(10):
        rows.append((t0 + dt.timedelta(seconds=s), 2, 5.0))  # steady, no spike
    src = str(tmp_path / "events_src")
    spark.createDataFrame(rows, "ts timestamp, user_id long, value double").coalesce(
        1
    ).write.parquet(src)

    stream = spark.readStream.schema("ts timestamp, user_id long, value double").parquet(src)
    q = (
        monitor_spikes(stream)
        .writeStream.format("memory")
        .queryName("spikes")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    out = spark.sql("SELECT * FROM spikes").collect()
    assert len(out) == 1
    assert out[0]["user_id"] == 1 and out[0]["spike_value"] == 50.0
    assert out[0]["ema"] < 2.0
