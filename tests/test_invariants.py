"""Column-invariant ENFORCEMENT (Delta writer protocol 2).

Round-9 state refused every write into a table declaring ``delta.invariants``
(safe, but a capability gap: the reference's delegate — the deltalake crate —
writes such tables by enforcing the predicate per row). Round 10 upgrades the
refusal to enforcement: the Engine write paths validate written rows against
each declared invariant under the same ``enforced_constraints`` proof that
covers writer-3 CHECK constraints, while raw ``deltalog.write_commit`` calls
(which cannot prove per-row validation) still refuse. Protocol semantics
pinned here: abort when the expression evaluates to FALSE for any written
row, null passes (PROTOCOL.md "Column Invariants": writers must abort when
the expression "evaluates to false"), and both serialized forms of the
metadata value — the JSON ``{"expression": {"expression": sql}}`` wrapper
and a bare SQL string — resolve to the same predicate.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig, deltalog
from delta_lake_proxy_spark.errors import UnsupportedProtocolError

INV_WRAPPED = '{"expression":{"expression":"id > 0"}}'


def _schema_string(invariant: str) -> str:
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {"delta.invariants": invariant},
                },
                {"name": "part", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )


def make_invariant_table(
    root: str, protocol: dict, invariant: str = INV_WRAPPED
) -> str:
    """A FOREIGN writer-2 (or writer-7 + feature) table whose ``id`` column
    declares an ``id > 0`` invariant, with one conforming data file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rel = "part=A/part-00000.parquet"
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    pq.write_table(pa.table({"id": pa.array([1, 2, 3], type=pa.int64())}), full)
    logd = os.path.join(root, "_delta_log")
    os.makedirs(logd, exist_ok=True)
    actions = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {"protocol": protocol},
        {
            "metaData": {
                "id": "inv-enforce",
                "format": {"provider": "parquet"},
                "schemaString": _schema_string(invariant),
                "partitionColumns": ["part"],
                "configuration": {},
                "createdTime": 1700000000000,
            }
        },
        {
            "add": {
                "path": rel,
                "partitionValues": {"part": "A"},
                "size": os.path.getsize(full),
                "modificationTime": 1700000000000,
                "dataChange": True,
            }
        },
    ]
    with open(os.path.join(logd, "00000000000000000000.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return root


WRITER2 = {"minReaderVersion": 1, "minWriterVersion": 2}
WRITER7 = {
    "minReaderVersion": 1,
    "minWriterVersion": 7,
    "writerFeatures": ["invariants"],
}


def _engine(spark, path: str) -> Engine:
    return Engine(spark, EngineConfig(table_mapping={"t": path}, read_only=False))


def _rows(spark, ids):
    return spark.createDataFrame(
        [Row(id=i, part="A") for i in ids], "id long, part string"
    )


def test_append_valid_rows_commits(spark, tmp_path):
    eng = _engine(spark, make_invariant_table(str(tmp_path / "t"), WRITER2))
    v = eng.write_table("t", _rows(spark, [5, 6]), mode="append")
    assert v == 1
    assert eng.read_table("t").count() == 5


def test_append_violating_rows_refused_and_uncommitted(spark, tmp_path):
    path = make_invariant_table(str(tmp_path / "t"), WRITER2)
    eng = _engine(spark, path)
    with pytest.raises(ValueError, match="invariant.*id"):
        eng.write_table("t", _rows(spark, [7, -1]), mode="append")
    # nothing committed: still version 0, still the 3 fixture rows
    assert deltalog.latest_version(path) == 0
    assert eng.read_table("t").count() == 3


def test_null_value_passes(spark, tmp_path):
    """SQL predicate semantics: NULL input -> NULL result -> NOT a
    violation (the protocol aborts only on FALSE)."""
    eng = _engine(spark, make_invariant_table(str(tmp_path / "t"), WRITER2))
    v = eng.write_table("t", _rows(spark, [None]), mode="append")
    assert v == 1
    assert eng.read_table("t").count() == 4


def test_bare_sql_string_form_enforced(spark, tmp_path):
    """Older writers stored the invariant as a bare SQL string, not the
    JSON expression wrapper — the same predicate must be enforced."""
    path = make_invariant_table(str(tmp_path / "t"), WRITER2, invariant="id > 0")
    eng = _engine(spark, path)
    with pytest.raises(ValueError, match="invariant"):
        eng.write_table("t", _rows(spark, [-2]), mode="append")
    assert eng.write_table("t", _rows(spark, [9]), mode="append") == 1


def test_raw_commit_still_refused(spark, tmp_path):
    """deltalog.write_commit cannot prove per-row validation — a table
    declaring invariants refuses it (pre-round-10 behavior, kept)."""
    path = make_invariant_table(str(tmp_path / "t"), WRITER2)
    with pytest.raises(UnsupportedProtocolError, match="delta.invariants"):
        deltalog.write_commit(path, [{"path": "x", "partitionValues": {}, "size": 1}])


def test_writer7_invariants_feature_honored(spark, tmp_path):
    """Writer-7 tables enumerate ``invariants`` as an explicit feature; the
    Engine's enforcement honors it (commit accepted), raw commits refuse."""
    path = make_invariant_table(str(tmp_path / "t7"), WRITER7)
    eng = _engine(spark, path)
    assert eng.write_table("t", _rows(spark, [4]), mode="append") == 1
    with pytest.raises(ValueError, match="invariant"):
        eng.write_table("t", _rows(spark, [0]), mode="append")
    with pytest.raises(UnsupportedProtocolError):
        deltalog.write_commit(path, [{"path": "y", "partitionValues": {}, "size": 1}])


def test_update_enforces_invariant(spark, tmp_path):
    """DML rewrites are writes too: an UPDATE whose assignment would break
    the invariant aborts before committing; a conforming one lands."""
    path = make_invariant_table(str(tmp_path / "t"), WRITER2)
    eng = _engine(spark, path)
    with pytest.raises(ValueError, match="invariant"):
        eng.update("t", F.col("id") == 2, {"id": F.lit(-10)})
    assert deltalog.latest_version(path) == 0
    v = eng.update("t", F.col("id") == 2, {"id": F.lit(20)})
    assert v == 1
    got = {r["id"] for r in eng.read_table("t").collect()}
    assert got == {1, 20, 3}


def test_declared_invariants_parses_both_forms(tmp_path):
    p1 = make_invariant_table(str(tmp_path / "a"), WRITER2)
    p2 = make_invariant_table(str(tmp_path / "b"), WRITER2, invariant="id > 0")
    assert deltalog.declared_invariants(p1) == {"id": "id > 0"}
    assert deltalog.declared_invariants(p2) == {"id": "id > 0"}


# ---------------------------------------------------------------------------
# NOT NULL (nullable=false) — the schema-declared invariant (ADVICE r11 #4)
# ---------------------------------------------------------------------------


def _notnull_table(root: str) -> str:
    """Foreign table whose ``id`` column is declared nullable=false and
    whose ``s`` struct column declares a NON-NULLABLE nested field ``a``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": False, "metadata": {}},
                {
                    "name": "s",
                    "type": {
                        "type": "struct",
                        "fields": [
                            {
                                "name": "a",
                                "type": "long",
                                "nullable": False,
                                "metadata": {},
                            }
                        ],
                    },
                    "nullable": True,
                    "metadata": {},
                },
            ],
        }
    )
    rel = "part-00000.parquet"
    full = os.path.join(root, rel)
    os.makedirs(root, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2], type=pa.int64()),
                "s": pa.array([{"a": 1}, {"a": 2}]),
            }
        ),
        full,
    )
    logd = os.path.join(root, "_delta_log")
    os.makedirs(logd, exist_ok=True)
    actions = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {"protocol": WRITER2},
        {
            "metaData": {
                "id": "notnull",
                "format": {"provider": "parquet"},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 1700000000000,
            }
        },
        {
            "add": {
                "path": rel,
                "partitionValues": {},
                "size": os.path.getsize(full),
                "modificationTime": 1700000000000,
                "dataChange": True,
                "stats": json.dumps({"numRecords": 2}),
            }
        },
    ]
    with open(os.path.join(logd, "00000000000000000000.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return root


def test_nested_nullability_conflicts_at_schema_level(spark, tmp_path):
    """ADVICE r11 #4: an incoming frame whose NESTED struct field is
    nullable where the logged schema declares it non-nullable must raise a
    schema conflict (nested fields get no value enforcement) — while a
    column-mapping-style metadata difference or the safe direction
    (stricter incoming nullability) stays accepted."""
    path = _notnull_table(str(tmp_path / "nn"))
    eng = _engine(spark, path)
    # nullable nested 'a' into non-nullable logged 'a': refuse
    bad = spark.createDataFrame(
        [Row(id=5, s=Row(a=None))], "id long, s struct<a: long>"
    )
    assert bad.schema["s"].dataType["a"].nullable
    with pytest.raises(ValueError, match="schema conflict on column 's'"):
        eng.write_table("t", bad, mode="append")
    # stricter incoming (non-nullable nested) into the same table: fine
    good = spark.createDataFrame([(6, (7,))], "id long, s struct<a: long>").select(
        F.col("id"), F.struct(F.lit(8).cast("long").alias("a")).alias("s")
    )
    assert not good.schema["s"].dataType["a"].nullable
    eng.write_table("t", good, mode="append")
    got = sorted(r["id"] for r in eng.read_table("t", user="admin").collect())
    assert got == [1, 2, 6]


def test_top_level_not_null_enforced_by_value(spark, tmp_path):
    """Top-level nullable=false is the protocol's NOT NULL invariant:
    enforced by VALUE (a nullable-typed frame with no nulls appends fine;
    actual nulls refuse), which is why _evolve_schema accepts the frame."""
    path = _notnull_table(str(tmp_path / "nn2"))
    eng = _engine(spark, path)
    ok = spark.createDataFrame([Row(id=9, s=Row(a=1))], "id long, s struct<a: long>")
    ok = ok.select(F.col("id"), F.struct(F.lit(1).cast("long").alias("a")).alias("s"))
    eng.write_table("t", ok, mode="append")  # nullable id type, no null values
    bad = spark.createDataFrame(
        [Row(id=None, s=Row(a=1))], "id long, s struct<a: long>"
    ).select(F.col("id"), F.struct(F.lit(1).cast("long").alias("a")).alias("s"))
    with pytest.raises(ValueError, match="NOT NULL"):
        eng.write_table("t", bad, mode="append")
    assert sorted(
        r["id"] for r in eng.read_table("t", user="admin").collect()
    ) == [1, 2, 9]


def test_top_level_not_null_absent_column_refuses(spark, tmp_path):
    """Review r12 #1: a frame OMITTING a declared NOT NULL column must
    refuse — every row would read back NULL for it (fill paths for
    defaults/identity/generated run before the check, so anything still
    missing is genuinely unfillable)."""
    path = _notnull_table(str(tmp_path / "nn3"))
    eng = _engine(spark, path)
    missing_id = spark.range(1).select(
        F.struct(F.lit(1).cast("long").alias("a")).alias("s")
    )
    with pytest.raises(ValueError, match="absent from the written frame"):
        eng.write_table("t", missing_id, mode="append")
    assert sorted(
        r["id"] for r in eng.read_table("t", user="admin").collect()
    ) == [1, 2]


def test_overwrite_may_drop_not_null_column(spark, tmp_path):
    """Advice r12 #1: a schema-REPLACING overwrite commits df.schema
    wholesale, so a previously NOT NULL column it drops (or relaxes) no
    longer exists to read back NULL — the NOT NULL probes must validate
    against the schema being committed, not the pre-write one. An append
    omitting the column still refuses (the table schema survives an
    append)."""
    path = _notnull_table(str(tmp_path / "nn4"))
    eng = _engine(spark, path)
    replacement = spark.createDataFrame([(0,), (1,), (2,)], "other long")
    v = eng.write_table("t", replacement, mode="overwrite")
    assert v >= 1
    got = eng.read_table("t", user="admin")
    assert got.columns == ["other"]
    assert sorted(r["other"] for r in got.collect()) == [0, 1, 2]
    # the new schema has no NOT NULL columns: null values append fine now
    eng.write_table(
        "t", spark.createDataFrame([Row(other=None)], "other long"), mode="append"
    )
    # and on a FRESH not-null table, appends keep refusing both ways
    path2 = _notnull_table(str(tmp_path / "nn5"))
    eng2 = _engine(spark, path2)
    with pytest.raises(ValueError, match="absent from the written frame"):
        eng2.write_table(
            "t",
            spark.range(1).select(F.struct(F.lit(1).cast("long").alias("a")).alias("s")),
            mode="append",
        )
    # and an overwrite that KEEPS the column but RELAXES it to nullable
    # (the committed schema is the frame's) accepts nulls — the second
    # half of the advice repro. (The inverse — a frame whose schema lies
    # nullable=false over an actual null — is unreachable by a value
    # probe: Catalyst constant-folds isNull to false on a non-null
    # schema, and a truthful frame can't exist in that state.)
    relaxed = spark.createDataFrame([Row(id=None), Row(id=7)], "id long")
    assert relaxed.schema["id"].nullable
    v2 = eng2.write_table("t", relaxed, mode="overwrite")
    assert v2 >= 1
    assert sorted(
        (r["id"] is None, r["id"]) for r in eng2.read_table("t", user="admin").collect()
    ) == [(False, 7), (True, None)]
