from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from delta_lake_proxy_spark.session import build_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session("spark-graft-tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def lineitem(spark):
    from delta_lake_proxy_spark.io import load_table

    return load_table(spark, SF_DIR, "lineitem")


@pytest.fixture(scope="session")
def gov_table(spark, lineitem, tmp_path_factory):
    """A delta-logged lineitem table partitioned by l_returnflag (A/N/R) —
    the analog of the reference's MIC-partitioned table (config.json:11-18)."""
    from delta_lake_proxy_spark.engine import write_governed_table

    path = str(tmp_path_factory.mktemp("gov") / "lineitem_gov")
    write_governed_table(spark, lineitem.repartition(1), path, ["l_returnflag"])
    return path


@pytest.fixture(scope="session")
def ym_table(spark, lineitem, tmp_path_factory):
    """Two-level year/month partitioned table mirroring test_config.json:10-19."""
    import pyspark.sql.functions as F

    from delta_lake_proxy_spark.engine import write_governed_table

    df = lineitem.withColumns(
        {"year": F.year("l_shipdate"), "month": F.month("l_shipdate")}
    ).repartition(1)
    path = str(tmp_path_factory.mktemp("ym") / "lineitem_ym")
    write_governed_table(spark, df, path, ["year", "month"])
    return path
