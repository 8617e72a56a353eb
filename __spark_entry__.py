"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship governed read at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator registry from
``delta_lake_proxy_spark.queries`` (SURVEY.md §2 inventory).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from delta_lake_proxy_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Governed read: alias catalog -> DNF partition ACL -> pruned Delta scan ->
    TPC-H-Q1-style aggregation (SURVEY §3.1's end-to-end path).
    """
    return Q.governed_read(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per SQL-expressible query."""
    return Q.resolved_oracles()
