"""Fixture-table loaders (the driver's synthetic TPC-H-ish tables).

Centralizes the one schema quirk: ``events.parquet`` stores ``ts`` as parquet
TIMESTAMP(NANOS), which Spark cannot read natively — we read it as long
(``spark.sql.legacy.parquet.nanosAsLong``) and convert to a microsecond
timestamp, which is exactly what DuckDB produces for the same file (verified:
min/max agree to the microsecond), keeping the oracle comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_engine_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_engine_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns epoch -> µs timestamp (integer div keeps ANSI mode happy).
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def local_df(spark: SparkSession, rows: list, schema) -> DataFrame:
    """Single-partition local DataFrame for tiny metadata row sets.

    ``createDataFrame`` slices local data across ``defaultParallelism``
    (32 under the bench profile), so a 1-row catalog listing becomes 32
    near-empty tasks — and a cross join of two of them 32x32 ≈ 1000 tasks of
    pure scheduler overhead. One slice keeps metadata surfaces at one task.
    """
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
