"""timestampNtz / variantType / typeWidening WRITE-side support — round 11.

Read-side these landed earlier (SUPPORTED_READER_FEATURES). Write-side
the features' obligation is producing files that encode the type per
spec — which Spark's parquet writer does natively (TIMESTAMP_NTZ as
int64 isAdjustedToUTC=false, VARIANT per the parquet variant encoding) —
so the gate now strips them instead of refusing every engine write into
a foreign table that declares them. A table CREATED with such types
declares the features at version 0 (spec contract: types may only be
used under a declared feature). The reference serves these tables via
``deltalake``'s protocol handling (ref ``src/main.rs:357``).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_proxy_spark import Engine, EngineConfig, deltalog


def _engine(spark, path: str) -> Engine:
    return Engine(spark, EngineConfig(table_mapping={"t": path}, read_only=False))


def test_create_ntz_table_declares_feature(spark, tmp_path):
    path = str(tmp_path / "t")
    eng = _engine(spark, path)
    eng.write_table(
        "t",
        spark.sql(
            "SELECT CAST(1 AS BIGINT) AS id, TIMESTAMP_NTZ'2024-01-01 12:00:00' AS ts"
        ),
        mode="overwrite",
    )
    proto = deltalog.table_protocol_no_spark(path)
    assert proto == {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "writerFeatures": ["timestampNtz"],
        "readerFeatures": ["timestampNtz"],
    }
    got = eng.read_table("t", user="admin")
    assert isinstance(got.schema["ts"].dataType, T.TimestampNTZType)
    assert got.count() == 1
    eng.write_table(
        "t",
        spark.sql(
            "SELECT CAST(2 AS BIGINT) AS id, TIMESTAMP_NTZ'2024-06-01 00:00:00' AS ts"
        ),
        mode="append",
    )
    assert eng.read_table("t", user="admin").count() == 2


def test_create_variant_table_declares_feature_and_roundtrips(spark, tmp_path):
    path = str(tmp_path / "t")
    eng = _engine(spark, path)
    eng.write_table(
        "t",
        spark.sql("SELECT CAST(1 AS BIGINT) AS id, parse_json('{\"a\": 7}') AS v"),
        mode="overwrite",
    )
    proto = deltalog.table_protocol_no_spark(path)
    assert proto["readerFeatures"] == ["variantType"]
    assert proto["writerFeatures"] == ["variantType"]
    got = eng.read_table("t", user="admin").select(
        F.expr("to_json(v)").alias("j")
    )
    assert got.collect()[0]["j"] == '{"a":7}'


def test_schema_demand_walker_nested_and_names(spark):
    """Nested occurrences demand the feature; a column merely NAMED
    'variant' does not."""
    nested = T.StructType(
        [
            T.StructField(
                "m",
                T.MapType(T.StringType(), T.ArrayType(T.TimestampNTZType())),
            ),
            T.StructField("variant", T.StringType()),
        ]
    )
    r, w = deltalog.schema_protocol_demands(nested.json())
    assert r == {"timestampNtz"} and w == {"timestampNtz"}
    plain = T.StructType([T.StructField("variant", T.LongType())])
    assert deltalog.schema_protocol_demands(plain.json()) == (set(), set())


def _foreign_ntz(root: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1], type=pa.int64()),
                "ts": pa.array([0], type=pa.timestamp("us")),  # no tz => NTZ
            }
        ),
        os.path.join(root, "f0.parquet"),
    )
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {
                    "name": "ts",
                    "type": "timestamp_ntz",
                    "nullable": True,
                    "metadata": {},
                },
            ],
        }
    )
    logd = os.path.join(root, "_delta_log")
    os.makedirs(logd)
    actions = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["timestampNtz"],
                "writerFeatures": ["timestampNtz"],
            }
        },
        {
            "metaData": {
                "id": "ntz-test",
                "format": {"provider": "parquet"},
                "schemaString": schema,
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 1700000000000,
            }
        },
        {
            "add": {
                "path": "f0.parquet",
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(root, "f0.parquet")),
                "modificationTime": 1700000000000,
                "dataChange": True,
                "stats": json.dumps({"numRecords": 1}),
            }
        },
    ]
    with open(os.path.join(logd, f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return root


def test_foreign_ntz_table_accepts_engine_append(spark, tmp_path):
    """Round-10 behavior: every engine write refused (timestampNtz not
    stripped). Now: the type is handled natively, the append lands."""
    root = _foreign_ntz(str(tmp_path / "ft"))
    eng = _engine(spark, root)
    eng.write_table(
        "t",
        spark.sql(
            "SELECT CAST(2 AS BIGINT) AS id, TIMESTAMP_NTZ'2025-01-01 00:00:00' AS ts"
        ),
        mode="append",
    )
    got = eng.read_table("t", user="admin")
    assert got.count() == 2
    assert isinstance(got.schema["ts"].dataType, T.TimestampNTZType)


def test_foreign_type_widening_table_accepts_append(spark, tmp_path):
    """A typeWidening table (narrow int32 file, widened long schema with
    delta.typeChanges metadata): appends at the widest type land and the
    widening metadata survives the re-emitted schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "tw")
    os.makedirs(root, exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array([7], type=pa.int32())}),
        os.path.join(root, "f0.parquet"),
    )
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.typeChanges": [
                            {"fromType": "integer", "toType": "long", "tableVersion": 1}
                        ]
                    },
                }
            ],
        }
    )
    logd = os.path.join(root, "_delta_log")
    os.makedirs(logd)
    actions = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["typeWidening"],
                "writerFeatures": ["typeWidening"],
            }
        },
        {
            "metaData": {
                "id": "tw-test",
                "format": {"provider": "parquet"},
                "schemaString": schema,
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 1700000000000,
            }
        },
        {
            "add": {
                "path": "f0.parquet",
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(root, "f0.parquet")),
                "modificationTime": 1700000000000,
                "dataChange": True,
                "stats": json.dumps({"numRecords": 1}),
            }
        },
    ]
    with open(os.path.join(logd, f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    eng = _engine(spark, root)
    eng.write_table(
        "t", spark.createDataFrame([Row(id=100)]), mode="append"
    )
    got = eng.read_table("t", user="admin")
    assert sorted(r["id"] for r in got.collect()) == [7, 100]
    # the widening metadata survives append-time schema evolution
    assert "delta.typeChanges" in deltalog.table_metadata_no_spark(root)["schemaString"]
