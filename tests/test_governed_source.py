"""format("governed") Python Data Source: the reference's FILE-level serving
model (allowed-file-set from log replay, forbidden files never opened) as a
Spark 4 DataSource. Contrast: Engine.read_table enforces at row level."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig, acl


@pytest.fixture(scope="module")
def registered(spark):
    from delta_lake_proxy_spark.sources.governed import GovernedDataSource

    spark.dataSource.register(GovernedDataSource)
    return spark


def _read(spark, path, dnf=None):
    r = spark.read.format("governed").option("path", path)
    if dnf is not None:
        r = r.option("dnf", json.dumps(dnf))
    return r.load()


def test_governed_source_matches_engine(registered, spark, gov_table, lineitem):
    eng = Engine(spark, EngineConfig(table_mapping={"t": gov_table}))
    base = eng.read_table("t")
    out = _read(spark, gov_table)
    assert out.count() == base.count()
    assert sorted(out.columns) == sorted(base.columns)
    # partition column values materialize from the add actions
    flags = {r[0] for r in out.select("l_returnflag").distinct().collect()}
    assert flags == {"A", "N", "R"}


def test_governed_source_file_level_acl(registered, spark, gov_table, lineitem):
    dnf = [{"l_returnflag": "A"}]
    out = _read(spark, gov_table, dnf)
    want = lineitem.filter(F.col("l_returnflag") == "A").count()
    assert out.count() == want
    # file-level: only the A partition's file becomes an input partition
    assert out.rdd.getNumPartitions() == 1
    # blanked grant ([{}]) fails CLOSED at the file tier too
    assert _read(spark, gov_table, [{}]).count() == 0


def test_governed_source_typed_partition_columns(registered, spark, ym_table):
    out = _read(spark, ym_table, [{"year": "1995", "month": "3"}])
    row = out.select("year", "month").distinct().collect()
    assert [(r["year"], r["month"]) for r in row] == [(1995, 3)]
    assert dict(out.dtypes)["year"] in ("int", "bigint")


def test_governed_source_filter_pushdown_prunes_files(registered, spark, gov_table, lineitem):
    """A WHERE on the partition column must shrink the FILE set (advisory
    pruning via pushFilters), while Spark still row-filters — results equal
    the plain filtered read."""
    full = _read(spark, gov_table)
    n_files_full = full.rdd.getNumPartitions()
    filtered = _read(spark, gov_table).filter(F.col("l_returnflag") == "A")
    want = lineitem.filter(F.col("l_returnflag") == "A").count()
    assert filtered.count() == want
    assert filtered.rdd.getNumPartitions() < n_files_full
    # stats-range pushdown on a data column is conservative but correct
    hi = lineitem.agg(F.max("l_quantity")).collect()[0][0]
    over = _read(spark, gov_table).filter(F.col("l_quantity") > hi)
    assert over.count() == 0
    assert over.rdd.getNumPartitions() <= n_files_full


def test_dnf_allows_model():
    assert acl.dnf_allows(None, {"p": "1"}) and acl.dnf_allows([], {})
    assert not acl.dnf_allows([{}], {"p": "1"})  # configured-empty: deny
    assert acl.dnf_allows([{"p": "1"}, {}], {"p": "1", "q": "2"})
    assert not acl.dnf_allows([{"p": "1", "q": "9"}], {"p": "1", "q": "2"})
