"""Identity columns (Delta writer version 6 / writer feature
`identityColumns`) and default columns (writer feature
`allowColumnDefaults`) — the last commonly-hit rows of the writer-feature
matrix. The reference served such tables transparently because the
deltalake crate handles the protocol (src/main.rs:357, Cargo.toml:13);
this engine honors the obligations itself: generated values on the
start + k*step lattice beyond the high water mark for omitted identity
columns, stats-derived mark advancement in the same commit,
allowExplicitInsert policing on every insert-producing path, and
CURRENT_DEFAULT application to omitted columns — with raw commits refused
at the gate. Fixtures are hand-authored foreign logs (the
test_row_tracking interop pattern), never this engine's own output.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig, deltalog
from delta_lake_proxy_spark.errors import UnsupportedProtocolError


def mk_engine(spark, path):
    return Engine(spark, EngineConfig(table_mapping={"t": path}, read_only=False))


def _schema_string(identity_meta=None, default_meta=None):
    uid_md = dict(identity_meta or {})
    val_md = dict(default_meta or {})
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "uid", "type": "long", "nullable": False, "metadata": uid_md},
                {"name": "val", "type": "string", "nullable": True, "metadata": val_md},
            ],
        }
    )


def foreign_table(
    root,
    *,
    protocol,
    schema_string,
    rows=None,
    configuration=None,
):
    """Hand-author a foreign writer's table: protocol + metaData (+ one
    data file with footer stats when ``rows`` is given)."""
    os.makedirs(root, exist_ok=True)
    actions = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "CREATE"}},
        {"protocol": protocol},
        {
            "metaData": {
                "id": "idtest",
                "format": {"provider": "parquet"},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": dict(configuration or {}),
                "createdTime": 1700000000000,
            }
        },
    ]
    if rows is not None:
        uids, vals = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "uid": pa.array(uids, type=pa.int64()),
                    "val": pa.array(vals, type=pa.string()),
                }
            ),
            os.path.join(root, "f0.parquet"),
        )
        actions.append(
            {
                "add": {
                    "path": "f0.parquet",
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(root, "f0.parquet")),
                    "modificationTime": 1700000000000,
                    "dataChange": True,
                    "stats": json.dumps(
                        {
                            "numRecords": len(rows),
                            "minValues": {"uid": min(uids)},
                            "maxValues": {"uid": max(uids)},
                        }
                    ),
                }
            }
        )
    logd = os.path.join(root, "_delta_log")
    os.makedirs(logd, exist_ok=True)
    with open(
        os.path.join(logd, "00000000000000000000.json"), "w", encoding="utf-8"
    ) as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return root


IDENTITY_ALWAYS = {
    "delta.identity.start": 100,
    "delta.identity.step": 10,
    "delta.identity.allowExplicitInsert": False,
}
W7_IDENTITY = {
    "minReaderVersion": 1,
    "minWriterVersion": 7,
    "writerFeatures": ["identityColumns"],
}


@pytest.fixture()
def always_table(spark, tmp_path):
    """GENERATED ALWAYS AS IDENTITY (start 100, step 10), writer 7 +
    identityColumns, seeded by a foreign writer with hwm=120."""
    root = str(tmp_path / "ida")
    foreign_table(
        root,
        protocol=W7_IDENTITY,
        schema_string=_schema_string(
            {**IDENTITY_ALWAYS, "delta.identity.highWaterMark": 120}
        ),
        rows=[(100, "a"), (110, "b"), (120, "c")],
    )
    return root, mk_engine(spark, root)


def uid_vals(eng):
    return {r["val"]: r["uid"] for r in eng.read_table("t").collect()}


def test_raw_commit_refuses_identity_table(always_table):
    """A raw commit cannot prove identity maintenance — the gate refuses
    (the round-10 behavior, now with the Engine paths exempted)."""
    root, _ = always_table
    with pytest.raises(UnsupportedProtocolError, match="identityColumns"):
        deltalog.write_commit(root, adds=[], removes=[])


def test_append_generates_identity_beyond_foreign_hwm(always_table):
    """Engine append with the identity column OMITTED: values are
    generated on the start + k*step lattice strictly above the FOREIGN
    high water mark, are unique, and the mark advances in the same commit
    (schema metadata), derived from the written files' footer stats."""
    root, eng = always_table
    spark = eng.spark
    eng.write_table("t", spark.createDataFrame([("x",), ("y",), ("z",)], "val string"))
    got = uid_vals(eng)
    new = {got["x"], got["y"], got["z"]}
    assert len(new) == 3
    for v in new:
        assert v > 120 and (v - 100) % 10 == 0
    spec = deltalog.identity_columns(root)["uid"]
    assert spec["highWaterMark"] == max(new)
    # foreign rows untouched
    assert got["a"] == 100 and got["c"] == 120


def test_second_append_never_collides(always_table):
    root, eng = always_table
    spark = eng.spark
    eng.write_table("t", spark.createDataFrame([("x",), ("y",)], "val string"))
    first = set(uid_vals(eng).values())
    hwm1 = deltalog.identity_columns(root)["uid"]["highWaterMark"]
    eng.write_table("t", spark.createDataFrame([("p",), ("q",)], "val string"))
    got = uid_vals(eng)
    assert len(set(got.values())) == len(got)  # all unique across batches
    assert min(got[v] for v in ("p", "q")) > hwm1
    assert deltalog.identity_columns(root)["uid"]["highWaterMark"] == max(
        got.values()
    )
    assert first < set(got.values())


def test_explicit_insert_refused_on_generated_always(always_table):
    root, eng = always_table
    spark = eng.spark
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        eng.write_table(
            "t", spark.createDataFrame([(999, "x")], "uid long, val string")
        )
    # and MERGE (whole-row replacement = explicit values) refuses too
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        eng.merge(
            "t",
            spark.createDataFrame([(100, "a2")], "uid long, val string"),
            on=["uid"],
        )
    # and UPDATE may not assign the identity column
    with pytest.raises(ValueError, match="IDENTITY"):
        eng.update("t", F.col("val") == "a", {"uid": F.lit(1)})


def test_update_other_columns_still_works(always_table):
    """DML that PRESERVES identity values is unaffected by the feature."""
    root, eng = always_table
    eng.update("t", F.col("uid") == 110, {"val": F.lit("B")})
    got = uid_vals(eng)
    assert got["B"] == 110
    eng.delete("t", F.col("uid") == 120)
    assert "c" not in uid_vals(eng)
    assert deltalog.identity_columns(root)["uid"]["highWaterMark"] == 120


@pytest.fixture()
def by_default_table(spark, tmp_path):
    """GENERATED BY DEFAULT (allowExplicitInsert=true), no mark yet."""
    root = str(tmp_path / "idd")
    foreign_table(
        root,
        protocol=W7_IDENTITY,
        schema_string=_schema_string(
            {**IDENTITY_ALWAYS, "delta.identity.allowExplicitInsert": True}
        ),
    )
    return root, mk_engine(spark, root)


def test_by_default_accepts_explicit_and_advances_mark(by_default_table):
    """Explicit values are legal on BY DEFAULT identity; the mark still
    advances past them so later GENERATED values never collide."""
    root, eng = by_default_table
    spark = eng.spark
    eng.write_table(
        "t", spark.createDataFrame([(999, "x")], "uid long, val string")
    )
    assert deltalog.identity_columns(root)["uid"]["highWaterMark"] == 999
    # omitted column now generates ABOVE 999 on the lattice (1000, 1010, ...)
    eng.write_table("t", spark.createDataFrame([("y",), ("z",)], "val string"))
    got = uid_vals(eng)
    assert got["y"] > 999 and (got["y"] - 100) % 10 == 0
    assert got["z"] > 999 and got["z"] != got["y"]
    # MERGE with explicit values is legal here and keeps the mark correct
    eng.merge(
        "t",
        spark.createDataFrame([(2000, "m")], "uid long, val string"),
        on=["uid"],
    )
    assert deltalog.identity_columns(root)["uid"]["highWaterMark"] == 2000


def test_first_generation_starts_at_start(spark, tmp_path):
    """No mark yet: generation begins exactly at start."""
    root = str(tmp_path / "id0")
    foreign_table(
        root, protocol=W7_IDENTITY, schema_string=_schema_string(IDENTITY_ALWAYS)
    )
    eng = mk_engine(spark, root)
    eng.write_table(
        "t", spark.createDataFrame([("x",)], "val string").coalesce(1)
    )
    assert uid_vals(eng)["x"] == 100
    assert deltalog.identity_columns(root)["uid"]["highWaterMark"] == 100


def test_descending_step_tracks_min(spark, tmp_path):
    """step < 0: the high water mark is the MINIMUM generated value and
    advancement reads minValues from the stats."""
    root = str(tmp_path / "idn")
    foreign_table(
        root,
        protocol=W7_IDENTITY,
        schema_string=_schema_string(
            {
                "delta.identity.start": 0,
                "delta.identity.step": -5,
                "delta.identity.highWaterMark": -10,
                "delta.identity.allowExplicitInsert": False,
            }
        ),
    )
    eng = mk_engine(spark, root)
    spark = eng.spark
    eng.write_table("t", spark.createDataFrame([("x",), ("y",)], "val string"))
    got = uid_vals(eng)
    for v in got.values():
        assert v < -10 and v % 5 == 0
    assert deltalog.identity_columns(root)["uid"]["highWaterMark"] == min(
        got.values()
    )


def test_writer6_legacy_protocol(spark, tmp_path):
    """Writer version 6 (legacy identity, pre-features) appends through the
    same machinery; raw commits still refuse."""
    root = str(tmp_path / "id6")
    foreign_table(
        root,
        protocol={"minReaderVersion": 1, "minWriterVersion": 6},
        schema_string=_schema_string(
            {**IDENTITY_ALWAYS, "delta.identity.highWaterMark": 120}
        ),
        rows=[(100, "a"), (110, "b"), (120, "c")],
    )
    eng = mk_engine(spark, root)
    eng.write_table("t", spark.createDataFrame([("x",)], "val string"))
    got = uid_vals(eng)
    assert got["x"] > 120 and (got["x"] - 100) % 10 == 0
    with pytest.raises(UnsupportedProtocolError):
        deltalog.write_commit(root, adds=[], removes=[])


# ---------------------------------------------------------------------------
# default columns (allowColumnDefaults)
# ---------------------------------------------------------------------------

W7_DEFAULTS = {
    "minReaderVersion": 1,
    "minWriterVersion": 7,
    "writerFeatures": ["allowColumnDefaults"],
}


@pytest.fixture()
def defaults_table(spark, tmp_path):
    root = str(tmp_path / "dflt")
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": False, "metadata": {}},
                {
                    "name": "status",
                    "type": "string",
                    "nullable": True,
                    "metadata": {"CURRENT_DEFAULT": "'pending'"},
                },
                {
                    "name": "score",
                    "type": "integer",
                    "nullable": True,
                    "metadata": {"CURRENT_DEFAULT": "CAST(1 + 2 AS INT)"},
                },
            ],
        }
    )
    foreign_table(root, protocol=W7_DEFAULTS, schema_string=schema)
    return root, mk_engine(spark, root)


def test_raw_commit_refuses_defaults_table(defaults_table):
    root, _ = defaults_table
    with pytest.raises(UnsupportedProtocolError, match="allowColumnDefaults"):
        deltalog.write_commit(root, adds=[], removes=[])


def test_append_applies_defaults_to_omitted_columns(defaults_table):
    """Omitted defaulted columns are filled with their CURRENT_DEFAULT
    expression cast to the declared type; provided columns pass through;
    existing rows are never rewritten."""
    root, eng = defaults_table
    spark = eng.spark
    eng.write_table("t", spark.createDataFrame([(1,), (2,)], "k long"))
    rows = {r["k"]: (r["status"], r["score"]) for r in eng.read_table("t").collect()}
    assert rows == {1: ("pending", 3), 2: ("pending", 3)}
    assert dict(eng.read_table("t").dtypes)["score"] == "int"
    # provided values win — defaults apply only to omission
    eng.write_table(
        "t",
        spark.createDataFrame([(3, "done", 9)], "k long, status string, score int"),
    )
    rows = {r["k"]: (r["status"], r["score"]) for r in eng.read_table("t").collect()}
    assert rows[3] == ("done", 9)
    assert rows[1] == ("pending", 3)


def test_partial_omission_applies_only_missing_default(defaults_table):
    root, eng = defaults_table
    spark = eng.spark
    eng.write_table(
        "t", spark.createDataFrame([(7, "live")], "k long, status string")
    )
    rows = {r["k"]: (r["status"], r["score"]) for r in eng.read_table("t").collect()}
    assert rows[7] == ("live", 3)
