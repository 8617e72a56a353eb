"""collations (Delta collated-string-type writer feature) — round 11.

The feature changes COMPARISON semantics, not bytes: schemaString fields
carry the spec's ``__COLLATIONS`` metadata, which Spark 4 parses natively
into collated ``StringType``. This engine honors it end-to-end:

- reads re-type declared columns (``Engine._apply_collations``) so
  downstream filters/sorts/groupings run under the declared collation,
- writes preserve the metadata (the logged schema stays authoritative;
  plain incoming strings are not a schema conflict) and evaluate CHECK
  constraints / generated columns on collation-typed columns,
- a table CREATED with collated columns declares the writer feature at
  version 0; introducing collations into an existing plain table refuses;
  raw commits into declaring tables refuse.

The reference serves such tables via the ``deltalake`` crate's schema
passthrough (ref ``src/main.rs:357``).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_proxy_spark import Engine, EngineConfig, deltalog
from delta_lake_proxy_spark.errors import UnsupportedProtocolError


def _engine(spark, path: str) -> Engine:
    return Engine(spark, EngineConfig(table_mapping={"t": path}, read_only=False))


def _ci_df(spark, rows):
    df = spark.createDataFrame([Row(id=i, color=c) for i, c in rows])
    return df.withColumn("color", F.collate(F.col("color"), "UNICODE_CI"))


def test_create_collated_table_declares_feature(spark, tmp_path):
    path = str(tmp_path / "t")
    eng = _engine(spark, path)
    eng.write_table("t", _ci_df(spark, [(1, "Red"), (2, "blue")]), mode="overwrite")
    proto = deltalog.table_protocol_no_spark(path)
    assert proto["minWriterVersion"] == 7
    assert proto["writerFeatures"] == ["collations"]
    meta = deltalog.table_metadata_no_spark(path)
    assert "__COLLATIONS" in meta["schemaString"]
    assert deltalog.collated_columns(path) == {"color": "UNICODE_CI"}
    # the served schema is collation-typed and comparisons honor it
    got = eng.read_table("t", user="admin")
    assert isinstance(got.schema["color"].dataType, T.StringType)
    assert got.schema["color"].dataType.collation == "UNICODE_CI"
    assert got.filter(F.col("color") == F.lit("RED")).count() == 1
    # DISTINCT under UNICODE_CI folds case variants
    eng.write_table("t", _ci_df(spark, [(3, "RED")]), mode="append")
    assert eng.read_table("t", user="admin").select("color").distinct().count() == 2


def test_append_plain_strings_keeps_collation(spark, tmp_path):
    path = str(tmp_path / "t")
    eng = _engine(spark, path)
    eng.write_table("t", _ci_df(spark, [(1, "Red")]), mode="overwrite")
    # plain (uncollated) incoming strings: byte-identical layout, not a
    # schema conflict; the table's collation stays authoritative
    eng.write_table(
        "t", spark.createDataFrame([Row(id=2, color="rEd")]), mode="append"
    )
    assert "__COLLATIONS" in deltalog.table_metadata_no_spark(path)["schemaString"]
    got = eng.read_table("t", user="admin")
    assert got.filter(F.col("color") == F.lit("RED")).count() == 2


def test_raw_commit_refuses_engine_append_passes(spark, tmp_path):
    path = str(tmp_path / "t")
    eng = _engine(spark, path)
    eng.write_table("t", _ci_df(spark, [(1, "Red")]), mode="overwrite")
    with pytest.raises(UnsupportedProtocolError, match="collations"):
        deltalog.write_commit(path, adds=[], removes=[])
    eng.write_table("t", _ci_df(spark, [(2, "blue")]), mode="append")
    assert eng.read_table("t", user="admin").count() == 2


def test_introducing_collations_on_existing_table_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    eng = _engine(spark, path)
    eng.write_table(
        "t", spark.createDataFrame([Row(id=1, color="Red")]), mode="overwrite"
    )
    # appending a collated variant of an EXISTING plain column is fine:
    # the table's (plain) schema stays authoritative, bytes are identical
    eng.write_table("t", _ci_df(spark, [(2, "blue")]), mode="append")
    assert "__COLLATIONS" not in deltalog.table_metadata_no_spark(path)["schemaString"]
    # a NEW collated column would introduce __COLLATIONS without the
    # declared writer feature — refuse
    newcol = spark.createDataFrame([Row(id=3, color="x", tag="Hot")]).withColumn(
        "tag", F.collate(F.col("tag"), "UNICODE_CI")
    )
    with pytest.raises(UnsupportedProtocolError, match="collations"):
        eng.write_table("t", newcol, mode="append")


def _foreign_collated(root: str, extra_conf=None, features=("collations",)):
    """Hand-authored table from a conforming foreign writer: plain parquet
    bytes, __COLLATIONS schema metadata, writer-7 feature declaration."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2], type=pa.int64()),
                "color": pa.array(["Red", "BLUE"], type=pa.string()),
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
                    "name": "color",
                    "type": "string",
                    "nullable": True,
                    "metadata": {"__COLLATIONS": {"color": "icu.UNICODE_CI"}},
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
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": list(features),
            }
        },
        {
            "metaData": {
                "id": "coll-test",
                "format": {"provider": "parquet"},
                "schemaString": schema,
                "partitionColumns": [],
                "configuration": dict(extra_conf or {}),
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
                "stats": json.dumps({"numRecords": 2}),
            }
        },
    ]
    with open(os.path.join(logd, f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return root


def test_foreign_collated_table_reads_and_writes(spark, tmp_path):
    root = _foreign_collated(str(tmp_path / "ft"))
    eng = _engine(spark, root)
    got = eng.read_table("t", user="admin")
    assert got.schema["color"].dataType.collation == "UNICODE_CI"
    assert got.filter(F.col("color") == F.lit("red")).count() == 1
    eng.write_table(
        "t", spark.createDataFrame([Row(id=3, color="rEd")]), mode="append"
    )
    assert eng.read_table("t", user="admin").filter(
        F.col("color") == F.lit("RED")
    ).count() == 2
    with pytest.raises(UnsupportedProtocolError, match="collations"):
        deltalog.write_commit(root, adds=[], removes=[])


def test_dml_condition_under_collation(spark, tmp_path):
    """DELETE/UPDATE conditions compare under the declared collation,
    exactly like read_table: deleting 'red' under UNICODE_CI removes
    'Red'."""
    root = _foreign_collated(str(tmp_path / "dml"))
    eng = _engine(spark, root)
    eng.delete("t", F.col("color") == F.lit("red"))  # matches 'Red' (CI)
    left = [r["color"] for r in eng.read_table("t", user="admin").collect()]
    assert left == ["BLUE"]
    eng.update("t", F.col("color") == F.lit("blue"), {"id": F.lit(42)})
    assert eng.read_table("t", user="admin").collect()[0]["id"] == 42


def test_constraint_evaluated_under_collation(spark, tmp_path):
    """A CHECK constraint comparing a collated column must run under the
    declared collation: `color IN ('red','blue')` with UNICODE_CI accepts
    'RED' (binary evaluation would wrongly reject it) and still rejects
    'green'."""
    root = _foreign_collated(
        str(tmp_path / "ct"),
        extra_conf={"delta.constraints.okcolor": "color IN ('red', 'blue')"},
        features=("collations", "checkConstraints"),
    )
    eng = _engine(spark, root)
    eng.write_table(
        "t", spark.createDataFrame([Row(id=3, color="RED")]), mode="append"
    )
    assert eng.read_table("t", user="admin").count() == 3
    with pytest.raises(ValueError, match="okcolor"):
        eng.write_table(
            "t", spark.createDataFrame([Row(id=4, color="green")]), mode="append"
        )
