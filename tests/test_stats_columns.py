"""Data-skipping stats bounding (Delta table properties
``delta.dataSkippingNumIndexedCols`` — default 32 — and
``delta.dataSkippingStatsColumns``): per-file min/max in ``add.stats``
must not grow with schema width (a 1000-column table would otherwise carry
~30x the stats Delta itself writes, in every add action, checkpoint, and
replay). ``numRecords`` is always kept; skipping on a non-indexed column
conservatively keeps files (pinned against scan_with_skipping)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig, deltalog
from delta_lake_proxy_spark.engine import write_governed_table


def mk_engine(spark, path):
    return Engine(spark, EngineConfig(table_mapping={"t": path}, read_only=False))


def wide_df(spark, ncols=40, rows=20):
    df = spark.range(rows).withColumnRenamed("id", "c000")
    return df.withColumns(
        {f"c{i:03d}": (F.col("c000") * i).cast("long") for i in range(1, ncols)}
    )


def live_stats(path):
    return {
        p: json.loads(a["stats"])
        for p, a in deltalog._live_adds_no_spark(path).items()
        if a.get("stats")
    }


def test_default_caps_at_32_columns(spark, tmp_path):
    path = str(tmp_path / "wide")
    write_governed_table(spark, wide_df(spark).repartition(1), path, [])
    stats = live_stats(path)
    assert stats
    for s in stats.values():
        assert s["numRecords"] == 20
        assert set(s["minValues"]) == {f"c{i:03d}" for i in range(32)}
        assert set(s["maxValues"]) == {f"c{i:03d}" for i in range(32)}
    # appends through the engine hold the same bound
    eng = mk_engine(spark, path)
    eng.write_table("t", wide_df(spark, rows=5).repartition(1), mode="append")
    for s in live_stats(path).values():
        assert len(s["minValues"]) == 32


def test_num_indexed_cols_property(spark, tmp_path):
    path = str(tmp_path / "n2")
    write_governed_table(spark, wide_df(spark, ncols=6).repartition(1), path, [])
    eng = mk_engine(spark, path)
    eng.set_table_properties("t", {"delta.dataSkippingNumIndexedCols": "2"})
    eng.write_table("t", wide_df(spark, ncols=6, rows=3).repartition(1), mode="append")
    v = deltalog.latest_version(path)
    with open(f"{path}/_delta_log/{v:020d}.json") as f:
        adds = [json.loads(x)["add"] for x in f if '"add"' in x[:16]]
    assert adds
    for a in adds:
        s = json.loads(a["stats"])
        assert set(s["minValues"]) == {"c000", "c001"}
        assert s["numRecords"] == 3


@pytest.mark.full
def test_unlimited_with_minus_one(spark, tmp_path):
    path = str(tmp_path / "all")
    write_governed_table(spark, wide_df(spark).repartition(1), path, [])
    eng = mk_engine(spark, path)
    eng.set_table_properties("t", {"delta.dataSkippingNumIndexedCols": "-1"})
    eng.write_table("t", wide_df(spark, rows=3).repartition(1), mode="append")
    v = deltalog.latest_version(path)
    with open(f"{path}/_delta_log/{v:020d}.json") as f:
        adds = [json.loads(x)["add"] for x in f if '"add"' in x[:16]]
    for a in adds:
        assert len(json.loads(a["stats"])["minValues"]) == 40


def test_explicit_stats_columns_win(spark, tmp_path):
    path = str(tmp_path / "explicit")
    write_governed_table(spark, wide_df(spark, ncols=6).repartition(1), path, [])
    eng = mk_engine(spark, path)
    eng.set_table_properties(
        "t",
        {
            "delta.dataSkippingStatsColumns": "c004, `c001`",
            "delta.dataSkippingNumIndexedCols": "1",  # list wins over N
        },
    )
    eng.write_table("t", wide_df(spark, ncols=6, rows=3).repartition(1), mode="append")
    v = deltalog.latest_version(path)
    with open(f"{path}/_delta_log/{v:020d}.json") as f:
        adds = [json.loads(x)["add"] for x in f if '"add"' in x[:16]]
    for a in adds:
        assert set(json.loads(a["stats"])["minValues"]) == {"c001", "c004"}


def test_skipping_on_unindexed_column_keeps_files(spark, tmp_path):
    """Correctness under bounded stats: a range probe on a column with no
    stats must keep every file (conservative), never prune wrongly."""
    path = str(tmp_path / "skip")
    write_governed_table(spark, wide_df(spark, ncols=6).repartition(1), path, [])
    eng = mk_engine(spark, path)
    eng.set_table_properties("t", {"delta.dataSkippingNumIndexedCols": "1"})
    eng.write_table("t", wide_df(spark, ncols=6, rows=10).repartition(1), mode="overwrite")
    total = eng.read_table("t").count()
    # c005 has no stats in the overwrite's files -> no file pruned, rows exact
    got = eng.scan_with_skipping("t", {"c005": (0, 5)}).filter(
        F.col("c005").between(0, 5)
    )
    expected = eng.read_table("t").filter(F.col("c005").between(0, 5)).count()
    assert got.count() == expected and total == 10
    # and an indexed column still prunes correctly
    got2 = eng.scan_with_skipping("t", {"c000": (0, 3)}).filter(
        F.col("c000").between(0, 3)
    )
    assert got2.count() == 4


def test_mapped_table_stats_keys_are_physical(spark, tmp_path):
    """Stats keys follow partitionValues keys: PHYSICAL names in mapped
    tables; dataSkippingStatsColumns is declared LOGICAL and translates."""
    from tests.test_column_mapping import make_mapped_table

    path = str(tmp_path / "mapped")
    make_mapped_table(path)
    # the foreign table declares an explicit LOGICAL stats column
    v0 = f"{path}/_delta_log/{0:020d}.json"
    lines = []
    with open(v0) as f:
        for x in f:
            a = json.loads(x)
            if a.get("metaData"):
                a["metaData"]["configuration"][
                    "delta.dataSkippingStatsColumns"
                ] = "val"
            lines.append(json.dumps(a))
    with open(v0, "w") as f:
        f.write("\n".join(lines) + "\n")
    eng = mk_engine(spark, path)
    src = spark.createDataFrame(
        [(10, 2.5, "A"), (11, 7.5, "B")], "id long, val double, part string"
    )
    eng.write_table("t", src, mode="append", partition_by=["part"])
    l2p = deltalog.column_mapping(path)
    v = deltalog.latest_version(path)
    with open(f"{path}/_delta_log/{v:020d}.json") as f:
        adds = [json.loads(x)["add"] for x in f if '"add"' in x[:16]]
    assert adds
    for a in adds:
        assert set(json.loads(a["stats"])["minValues"]) == {l2p["val"]}
