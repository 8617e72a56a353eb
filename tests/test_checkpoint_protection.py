"""checkpointProtection (Delta RFC checkpoint-protection) — round 11.

The feature declares checkpoints below
``delta.requireCheckpointProtectionBeforeVersion`` non-recreatable (a
dropped feature's traces, ICT backfill): metadata cleanup must truncate to
a boundary at/above that version in ONE run or delete nothing. Ordinary
commits carry no obligation. This file pins:

- ``Engine.enable_checkpoint_protection`` (protocol (3,7) + the property,
  defaulting to the enabling commit's version),
- ``cleanup_log``'s refusal when the retained checkpoint sits below the
  protected version, and its normal one-run truncation once the boundary
  reaches it,
- ordinary raw commits still being accepted (the obligation binds cleanup,
  not commits),
- a hand-authored FOREIGN-WRITER fixture (reference serves such tables via
  ``deltalake::open_table``, ref ``src/main.rs:357``).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig, deltalog
from delta_lake_proxy_spark.errors import UnsupportedProtocolError


def _engine(spark, path: str) -> Engine:
    return Engine(spark, EngineConfig(table_mapping={"t": path}, read_only=False))


def _plain_table(spark, root: str) -> str:
    eng = Engine(spark, EngineConfig(table_mapping={"t": root}, read_only=False))
    df = spark.createDataFrame([Row(id=i, part="A") for i in (1, 2, 3)])
    eng.write_table("t", df, mode="overwrite")
    return root


def _log_files(path: str) -> list[str]:
    return sorted(os.listdir(os.path.join(path, "_delta_log")))


def test_enable_sets_protocol_and_property(spark, tmp_path):
    path = _plain_table(spark, str(tmp_path / "t"))
    eng = _engine(spark, path)
    v = eng.enable_checkpoint_protection("t")
    proto = deltalog.table_protocol_no_spark(path)
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert proto["readerFeatures"] == ["checkpointProtection"]
    assert proto["writerFeatures"] == ["checkpointProtection"]
    conf = deltalog.table_configuration_no_spark(path)
    # default: everything strictly below the enabling commit is protected
    assert int(conf["delta.requireCheckpointProtectionBeforeVersion"]) == v
    # the read gate accepts the feature — rows still served
    assert eng.read_table("t", user="admin").count() == 3


def test_enable_idempotent_and_explicit_version(spark, tmp_path):
    path = _plain_table(spark, str(tmp_path / "t"))
    eng = _engine(spark, path)
    v = eng.enable_checkpoint_protection("t")
    assert eng.enable_checkpoint_protection("t") == v  # no second commit
    path2 = _plain_table(spark, str(tmp_path / "t2"))
    eng2 = _engine(spark, path2)
    eng2.enable_checkpoint_protection("t", before_version=0)
    conf = deltalog.table_configuration_no_spark(path2)
    assert conf["delta.requireCheckpointProtectionBeforeVersion"] == "0"
    with pytest.raises(ValueError, match="outside the table's history"):
        _engine(spark, _plain_table(spark, str(tmp_path / "t3"))).enable_checkpoint_protection(
            "t", before_version=99
        )


def test_enable_refuses_featured_tables(spark, tmp_path):
    path = _plain_table(spark, str(tmp_path / "t"))
    eng = _engine(spark, path)
    eng.enable_deletion_vectors("t")
    with pytest.raises(UnsupportedProtocolError, match="refusing to rewrite"):
        eng.enable_checkpoint_protection("t")


def test_cleanup_refuses_below_protected_version(spark, tmp_path):
    """Checkpoint at v1, protection starting at v2: the boundary (v1) sits
    below the protected version, so cleanup must delete NOTHING — not even
    the commits the checkpoint already captures."""
    path = _plain_table(spark, str(tmp_path / "t"))
    eng = _engine(spark, path)
    eng.write_table("t", spark.createDataFrame([Row(id=9, part="B")]), mode="append")
    deltalog.write_checkpoint(spark, path)  # checkpoint at v1
    v = eng.enable_checkpoint_protection("t")  # v2, protect < 2
    assert v == 2
    before = _log_files(path)
    assert deltalog.cleanup_log(path, retention_hours=0.0) == 0
    assert eng.cleanup_log("t", retention_hours=0.0) == 0
    assert _log_files(path) == before  # nothing reclaimed
    assert eng.read_table("t", user="admin").count() == 4


def test_cleanup_truncates_once_boundary_reaches_protection(spark, tmp_path):
    """A later checkpoint at/above the protected version truncates history
    below it in one run — protected checkpoints go WITH their commits, the
    replay stays intact."""
    path = _plain_table(spark, str(tmp_path / "t"))
    eng = _engine(spark, path)
    eng.write_table("t", spark.createDataFrame([Row(id=9, part="B")]), mode="append")
    deltalog.write_checkpoint(spark, path)  # protected checkpoint at v1
    v = eng.enable_checkpoint_protection("t")  # protect < 2
    deltalog.write_checkpoint(spark, path)  # boundary checkpoint at v2 >= 2
    removed = deltalog.cleanup_log(path, retention_hours=0.0)
    # one-run truncation: commits 0..2 and the superseded v1 checkpoint
    # commits 0..2, the superseded v1 checkpoint, and the v0/v1 crcs
    assert removed == 6
    names = _log_files(path)
    assert f"{v:020d}.checkpoint.parquet" in names
    assert not any(n.endswith(".json") and n[:-5].isdigit() for n in names)
    # checkpoint-seeded replay still serves every row
    assert eng.read_table("t", user="admin").count() == 4


def test_ordinary_raw_commit_accepted(spark, tmp_path):
    """checkpointProtection binds metadata cleanup, not commits: a raw
    append into a protected table is safe and accepted."""
    path = _plain_table(spark, str(tmp_path / "t"))
    eng = _engine(spark, path)
    eng.enable_checkpoint_protection("t")
    deltalog.write_commit(path, adds=[], removes=[])
    assert deltalog.latest_version(path) == 2


def test_foreign_writer_fixture(spark, tmp_path):
    """A conforming foreign writer's table (hand-written log declaring
    (3,7)+checkpointProtection and a protected version beyond HEAD): reads
    serve rows, Engine appends work, and cleanup refuses while the
    boundary is below the protected version."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "ft")
    os.makedirs(root, exist_ok=True)
    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    pq.write_table(
        pa.table({"id": pa.array([1, 2, 3], type=pa.int64())}),
        os.path.join(root, "f1.parquet"),
    )
    logd = os.path.join(root, "_delta_log")
    os.makedirs(logd)
    actions = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["checkpointProtection"],
                "writerFeatures": ["checkpointProtection"],
            }
        },
        {
            "metaData": {
                "id": "cp-test",
                "format": {"provider": "parquet"},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": {
                    "delta.requireCheckpointProtectionBeforeVersion": "100"
                },
                "createdTime": 1700000000000,
            }
        },
        {
            "add": {
                "path": "f1.parquet",
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(root, "f1.parquet")),
                "modificationTime": 1700000000000,
                "dataChange": True,
                "stats": json.dumps({"numRecords": 3}),
            }
        },
    ]
    with open(os.path.join(logd, f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")

    eng = _engine(spark, root)
    assert eng.read_table("t", user="admin").count() == 3
    eng.write_table(
        "t", spark.createDataFrame([Row(id=4)]), mode="append"
    )  # ordinary commit: no cleanup obligation bites
    assert eng.read_table("t", user="admin").count() == 4
    deltalog.write_checkpoint(spark, root)  # HEAD=1 < 100: still protected
    before = _log_files(root)
    assert deltalog.cleanup_log(root, retention_hours=0.0) == 0
    assert _log_files(root) == before


def _legacy_table(tmp_path, name: str, protocol: dict, configuration: dict) -> str:
    """Hand-written foreign table with a LEGACY protocol (no feature
    lists) — the shape ADVICE r11 #1 flagged: minWriterVersion 3-6 implies
    capabilities an enable_* upgrade must not silently drop."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / name)
    os.makedirs(root, exist_ok=True)
    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    pq.write_table(
        pa.table({"id": pa.array([1, 2], type=pa.int64())}),
        os.path.join(root, "f1.parquet"),
    )
    logd = os.path.join(root, "_delta_log")
    os.makedirs(logd)
    actions = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {"protocol": protocol},
        {
            "metaData": {
                "id": f"legacy-{name}",
                "format": {"provider": "parquet"},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": configuration,
                "createdTime": 1700000000000,
            }
        },
        {
            "add": {
                "path": "f1.parquet",
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(root, "f1.parquet")),
                "modificationTime": 1700000000000,
                "dataChange": True,
                "stats": json.dumps({"numRecords": 2}),
            }
        },
    ]
    with open(os.path.join(logd, f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return root


def test_enable_refuses_legacy_writer_versions(spark, tmp_path):
    """ADVICE r11 #1: a legacy minWriterVersion 3-6 table has NO explicit
    feature lists, so it passed the explicit-list guard — and the (3,7)
    upgrade listing only checkpointProtection would drop its implied
    capability declarations (checkConstraints at 3, changeDataFeed at 4).
    Every protocol-rewriting enable_* now refuses such tables."""
    # writer 3 (CHECK constraints implied)
    p3 = _legacy_table(
        tmp_path, "w3",
        {"minReaderVersion": 1, "minWriterVersion": 3},
        {"delta.constraints.pos": "id > 0"},
    )
    eng3 = _engine(spark, p3)
    with pytest.raises(
        UnsupportedProtocolError, match="minWriterVersion=3.*checkConstraints"
    ):
        eng3.enable_checkpoint_protection("t")
    # writer 4 (CDF + generated columns implied) — another enable_*
    p4 = _legacy_table(
        tmp_path, "w4",
        {"minReaderVersion": 1, "minWriterVersion": 4},
        {"delta.enableChangeDataFeed": "true"},
    )
    eng4 = _engine(spark, p4)
    with pytest.raises(
        UnsupportedProtocolError, match="minWriterVersion=4.*changeDataFeed"
    ):
        eng4.enable_in_commit_timestamps("t")
    with pytest.raises(
        UnsupportedProtocolError, match="minWriterVersion=4.*changeDataFeed"
    ):
        eng4.enable_v2_checkpoints("t")
    # an INACTIVE implied capability drops nothing: a bare writer-4 table
    # (CDF off, no generated columns) upgrades fine
    p4b = _legacy_table(
        tmp_path, "w4bare",
        {"minReaderVersion": 1, "minWriterVersion": 4},
        {},
    )
    assert _engine(spark, p4b).enable_in_commit_timestamps("t") == 1


def test_enable_refuses_active_writer2_capability(spark, tmp_path):
    """A writer-2 table with delta.appendOnly=true: the upgrade would stop
    conforming writer-7 clients from enforcing append-only (the feature is
    not in writerFeatures), so it refuses; without the active capability
    the same table upgrades fine."""
    pa_ = _legacy_table(
        tmp_path, "w2ao",
        {"minReaderVersion": 1, "minWriterVersion": 2},
        {"delta.appendOnly": "true"},
    )
    eng = _engine(spark, pa_)
    with pytest.raises(UnsupportedProtocolError, match="appendOnly"):
        eng.enable_checkpoint_protection("t")
    plain = _legacy_table(
        tmp_path, "w2plain",
        {"minReaderVersion": 1, "minWriterVersion": 2},
        {},
    )
    eng2 = _engine(spark, plain)
    v = eng2.enable_checkpoint_protection("t")
    assert deltalog.table_protocol_no_spark(plain)["writerFeatures"] == [
        "checkpointProtection"
    ]
    assert v == 1
