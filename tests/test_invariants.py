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
