"""Type-lattice coverage (SURVEY §1.2): the engine round-trips and filters the
full Spark SQL type surface — decimals, timestamps, dates, arrays, maps,
nested structs, binary — through governed write + delta-logged read."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_proxy_spark import Engine, EngineConfig

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("part", T.StringType()),
        T.StructField("dec", T.DecimalType(18, 4)),
        T.StructField("ts", T.TimestampType()),
        T.StructField("d", T.DateType()),
        T.StructField("arr", T.ArrayType(T.FloatType())),
        T.StructField("m", T.MapType(T.StringType(), T.IntegerType())),
        T.StructField(
            "nested",
            T.StructType(
                [
                    T.StructField("a", T.StringType()),
                    T.StructField("b", T.ArrayType(T.LongType())),
                ]
            ),
        ),
        T.StructField("blob", T.BinaryType()),
    ]
)

ROWS = [
    (
        1,
        "x",
        Decimal("12.3456"),
        dt.datetime(2024, 1, 1, 12, 0, 0),
        dt.date(2024, 1, 1),
        [1.5, -2.5],
        {"k": 1},
        ("hello", [1, 2, 3]),
        b"\x00\x01binary",
    ),
    (
        2,
        "y",
        Decimal("-0.0001"),
        dt.datetime(2024, 6, 30, 23, 59, 59),
        dt.date(2024, 6, 30),
        [],
        {},
        ("world", []),
        b"",
    ),
]


def test_full_type_lattice_roundtrip(spark, tmp_path):
    path = str(tmp_path / "typed")
    df = spark.createDataFrame(ROWS, SCHEMA)
    eng = Engine(
        spark,
        EngineConfig(
            table_mapping={"typed": path},
            allowed_partitions={"typed": [{"part": "x"}, {"part": "y"}]},
            read_only=False,
        ),
    )
    from delta_lake_proxy_spark.engine import write_governed_table

    write_governed_table(spark, df, path, ["part"])
    back = eng.read_table("typed", user="u").orderBy("id")
    rows = back.collect()
    assert len(rows) == 2
    r = rows[0]
    assert r["dec"] == Decimal("12.3456")
    assert r["ts"] == dt.datetime(2024, 1, 1, 12, 0, 0)
    assert r["d"] == dt.date(2024, 1, 1)
    assert r["arr"] == [1.5, -2.5]
    assert r["m"] == {"k": 1}
    assert r["nested"]["a"] == "hello" and r["nested"]["b"] == [1, 2, 3]
    assert bytes(r["blob"]) == b"\x00\x01binary"
    # predicates over nested/complex types still work on the governed read
    assert back.filter(F.col("nested.a") == "hello").count() == 1
    assert back.filter(F.element_at("m", "k") == 1).count() == 1
    assert back.filter(F.size("arr") == 0).count() == 1
    # decimal aggregation stays exact
    total = back.agg(F.sum("dec").alias("s")).collect()[0]["s"]
    assert total == Decimal("12.3455")


def test_binary_file_source(spark, tmp_path):
    """X5: spark.read.format('binaryFile') as a multimodal ingestion path."""
    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.bin").write_bytes(b"abc")
    (d / "b.bin").write_bytes(b"\x00" * 10)
    df = spark.read.format("binaryFile").load(str(d))
    rows = {r["path"].split("/")[-1]: r for r in df.collect()}
    assert bytes(rows["a.bin"]["content"]) == b"abc"
    assert rows["b.bin"]["length"] == 10
