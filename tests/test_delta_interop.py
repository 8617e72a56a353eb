"""Delta protocol interop, without a third-party client in the container.

The reference's own validation opens its served tables with REAL Delta
clients (deltalake-python / delta-spark, README.md:119-247). Neither is
installable here, so interop is certified from both directions against the
PUBLIC protocol (delta.io PROTOCOL.md) instead:

1. READER direction — a hand-authored "foreign" log written byte-shape-
   faithful to delta-spark 3.x output (commitInfo with operationParameters/
   engineInfo/txnId, metaData with format.options/configuration, add with
   stats+tags, remove with extendedFileMetadata, txn with lastUpdated, a
   classic checkpoint parquet with the full column set, null partition
   values via __HIVE_DEFAULT_PARTITION__) must replay identically through
   every reader this repo has: Spark snapshot_files, the driver-side
   _live_adds_no_spark, Engine.read_table, and format("governed").

2. WRITER direction — every artifact our writer emits is checked against
   the protocol's REQUIRED field/type sets (add/remove/metaData/protocol/
   txn actions, checkpoint parquet columns, _last_checkpoint), which is
   exactly what an external reader consumes.

If a future environment gains `deltalake` or `delta-spark`, the round-trip
tests at the bottom auto-activate (import-gated) and become the real
third-party certification.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig, deltalog

FOREIGN_SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "val", "type": "double", "nullable": True, "metadata": {}},
            {"name": "part", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_parquet(full_path: str, ids: list[int]) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(full_path), exist_ok=True)
    t = pa.table(
        {
            "id": pa.array(ids, type=pa.int64()),
            "val": pa.array([float(i) * 1.5 for i in ids], type=pa.float64()),
        }
    )
    pq.write_table(t, full_path)
    return os.path.getsize(full_path)


def make_foreign_delta_table(root: str) -> dict:
    """A table whose _delta_log is shaped exactly like delta-spark output —
    including every optional field our own writer does NOT emit."""
    t0 = 1700000000000
    files = {
        "part=A/part-00000-11111111-aaaa-bbbb-cccc-000000000001.c000.snappy.parquet": [1, 2, 3],
        "part=B/part-00001-11111111-aaaa-bbbb-cccc-000000000002.c000.snappy.parquet": [4, 5],
        "part=__HIVE_DEFAULT_PARTITION__/part-00002-11111111-aaaa-bbbb-cccc-000000000003.c000.snappy.parquet": [6],
    }
    sizes = {rel: _write_parquet(os.path.join(root, rel), ids) for rel, ids in files.items()}
    pvs = {list(files)[0]: {"part": "A"}, list(files)[1]: {"part": "B"}, list(files)[2]: {"part": None}}

    def add_action(rel, ids):
        return {
            "add": {
                "path": rel,
                "partitionValues": pvs[rel],
                "size": sizes[rel],
                "modificationTime": t0,
                "dataChange": True,
                "stats": json.dumps(
                    {
                        "numRecords": len(ids),
                        "minValues": {"id": min(ids), "val": min(ids) * 1.5},
                        "maxValues": {"id": max(ids), "val": max(ids) * 1.5},
                        "nullCount": {"id": 0, "val": 0},
                    }
                ),
                "tags": {},
            }
        }

    logd = os.path.join(root, "_delta_log")
    os.makedirs(logd, exist_ok=True)
    rels = list(files)
    # commit 0: delta-spark WRITE — commitInfo, protocol, metaData, adds
    c0 = [
        {
            "commitInfo": {
                "timestamp": t0,
                "operation": "WRITE",
                "operationParameters": {"mode": "ErrorIfExists", "partitionBy": '["part"]'},
                "isolationLevel": "Serializable",
                "isBlindAppend": True,
                "operationMetrics": {"numFiles": "3", "numOutputRows": "6"},
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.2.0",
                "txnId": "11111111-aaaa-bbbb-cccc-999999999999",
            }
        },
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "22222222-aaaa-bbbb-cccc-000000000000",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": FOREIGN_SCHEMA_STRING,
                "partitionColumns": ["part"],
                "configuration": {"delta.checkpointInterval": "10"},
                "createdTime": t0,
            }
        },
        add_action(rels[0], files[rels[0]]),
        add_action(rels[1], files[rels[1]]),
        add_action(rels[2], files[rels[2]]),
    ]
    # commit 1: streaming micro-batch with a txn action + one more A file
    extra_rel = "part=A/part-00003-11111111-aaaa-bbbb-cccc-000000000004.c000.snappy.parquet"
    sizes[extra_rel] = _write_parquet(os.path.join(root, extra_rel), [7, 8])
    pvs[extra_rel] = {"part": "A"}
    files[extra_rel] = [7, 8]
    c1 = [
        {
            "commitInfo": {
                "timestamp": t0 + 1000,
                "operation": "STREAMING UPDATE",
                "operationParameters": {"outputMode": "Append", "queryId": "q-1", "epochId": "5"},
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.2.0",
                "txnId": "33333333-aaaa-bbbb-cccc-999999999999",
            }
        },
        {"txn": {"appId": "foreign-stream-app", "version": 5, "lastUpdated": t0 + 1000}},
        add_action(extra_rel, [7, 8]),
    ]
    # commit 2: DELETE of the B file — delta-spark remove with extended metadata
    c2 = [
        {
            "commitInfo": {
                "timestamp": t0 + 2000,
                "operation": "DELETE",
                "operationParameters": {"predicate": '["part = \'B\'"]'},
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.2.0",
                "txnId": "44444444-aaaa-bbbb-cccc-999999999999",
            }
        },
        {
            "remove": {
                "path": rels[1],
                "deletionTimestamp": t0 + 2000,
                "dataChange": True,
                "extendedFileMetadata": True,
                "partitionValues": {"part": "B"},
                "size": sizes[rels[1]],
                "tags": {},
            }
        },
    ]
    for v, actions in enumerate([c0, c1, c2]):
        with open(os.path.join(logd, f"{v:020d}.json"), "w", encoding="utf-8") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
    live = {rels[0], rels[2], extra_rel}
    live_ids = sorted(i for rel in live for i in files[rel])
    return {"root": root, "live": live, "live_ids": live_ids, "t0": t0, "sizes": sizes, "pvs": pvs}


def write_foreign_checkpoint(root: str, info: dict) -> None:
    """A classic checkpoint parquet with delta-spark's FULL column layout
    (txn/add/remove/metaData/protocol incl. optional nested fields), plus
    _last_checkpoint."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = info["t0"]
    pv_type = pa.map_(pa.string(), pa.string())
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pv_type),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
            ("tags", pa.map_(pa.string(), pa.string())),
        ]
    )
    remove_t = pa.struct(
        [
            ("path", pa.string()),
            ("deletionTimestamp", pa.int64()),
            ("dataChange", pa.bool_()),
            ("extendedFileMetadata", pa.bool_()),
            ("partitionValues", pv_type),
            ("size", pa.int64()),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string()), ("options", pa.map_(pa.string(), pa.string()))])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    proto_t = pa.struct([("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())])
    txn_t = pa.struct([("appId", pa.string()), ("version", pa.int64()), ("lastUpdated", pa.int64())])

    def add_row(rel):
        pv = [(k, v) for k, v in info["pvs"][rel].items()]
        return {
            "path": rel,
            "partitionValues": pv,
            "size": info["sizes"][rel],
            "modificationTime": t0,
            "dataChange": False,
            "stats": None,
            "tags": [],
        }

    rows_add = [add_row(rel) for rel in sorted(info["live"])]
    n = len(rows_add) + 3  # + protocol + metaData + txn
    adds = rows_add + [None] * 3
    removes = [None] * n
    metas = [None] * len(rows_add) + [
        {
            "id": "22222222-aaaa-bbbb-cccc-000000000000",
            "format": {"provider": "parquet", "options": []},
            "schemaString": FOREIGN_SCHEMA_STRING,
            "partitionColumns": ["part"],
            "configuration": [],
            "createdTime": t0,
        },
        None,
        None,
    ]
    protos = [None] * (len(rows_add) + 1) + [
        {"minReaderVersion": 1, "minWriterVersion": 2},
        None,
    ]
    txns = [None] * (len(rows_add) + 2) + [
        {"appId": "foreign-stream-app", "version": 5, "lastUpdated": t0 + 1000}
    ]
    table = pa.table(
        {
            "txn": pa.array(txns, type=txn_t),
            "add": pa.array(adds, type=add_t),
            "remove": pa.array(removes, type=remove_t),
            "metaData": pa.array(metas, type=meta_t),
            "protocol": pa.array(protos, type=proto_t),
        }
    )
    logd = os.path.join(root, "_delta_log")
    pq.write_table(table, os.path.join(logd, f"{2:020d}.checkpoint.parquet"))
    with open(os.path.join(logd, "_last_checkpoint"), "w", encoding="utf-8") as f:
        f.write(json.dumps({"version": 2, "size": n}))


@pytest.fixture()
def foreign_table(tmp_path):
    return make_foreign_delta_table(str(tmp_path / "foreign"))


def test_foreign_log_replays_identically(spark, foreign_table):
    root = foreign_table["root"]
    # Spark-side replay
    snap = {r["path"]: r for r in deltalog.snapshot_files(spark, root).collect()}
    assert set(snap) == foreign_table["live"]
    # null partition value round-trips as None in the map
    hive_default = next(p for p in snap if "__HIVE_DEFAULT_PARTITION__" in p)
    assert dict(snap[hive_default]["partitionValues"]) == {"part": None}
    # driver-side replay agrees
    live = deltalog._live_adds_no_spark(root)
    assert set(live) == foreign_table["live"]
    # foreign txn action (with its extra lastUpdated field) is readable
    assert deltalog.last_txn_version(root, "foreign-stream-app") == 5
    # metaData with configuration/format.options parses
    meta = deltalog.table_metadata_no_spark(root)
    assert meta["partitionColumns"] == ["part"]
    assert json.loads(meta["schemaString"])["fields"][0]["name"] == "id"
    # time travel: version 1 still contains the B file
    v1 = {r["path"] for r in deltalog.snapshot_files(spark, root, version=1).collect()}
    assert any("part=B/" in p for p in v1)


def test_foreign_log_reads_through_engine_and_source(spark, foreign_table):
    root = foreign_table["root"]
    eng = Engine(spark, EngineConfig(table_mapping={"ft": root}))
    df = eng.read_table("ft")
    assert sorted(r["id"] for r in df.collect()) == foreign_table["live_ids"]
    # partition column decodes, including the hive null
    parts = {r["part"] for r in df.select("part").distinct().collect()}
    assert parts == {"A", None}
    # the governed source serves the same rows (file-level path)
    from delta_lake_proxy_spark.sources.governed import GovernedDataSource

    spark.dataSource.register(GovernedDataSource)
    out = spark.read.format("governed").option("path", root).load()
    assert sorted(r["id"] for r in out.collect()) == foreign_table["live_ids"]
    # a DNF on the partition column fails closed for the null partition
    dnf_out = (
        spark.read.format("governed")
        .option("path", root)
        .option("dnf", json.dumps([{"part": "A"}]))
        .load()
    )
    assert sorted(r["id"] for r in dnf_out.collect()) == [1, 2, 3, 7, 8]


def test_foreign_checkpoint_replays(spark, foreign_table):
    """A delta-spark-shaped classic checkpoint (full column set, extra nested
    fields, map-typed configuration) replays through BOTH readers after the
    pre-checkpoint JSON commits are cleaned up."""
    root = foreign_table["root"]
    write_foreign_checkpoint(root, foreign_table)
    removed = deltalog.cleanup_log(root, retention_hours=0.0)
    assert removed == 3  # all three JSON commits are checkpoint-covered
    snap = {r["path"] for r in deltalog.snapshot_files(spark, root).collect()}
    assert snap == foreign_table["live"]
    assert set(deltalog._live_adds_no_spark(root)) == foreign_table["live"]
    # txn watermark survives via the foreign checkpoint's txn rows
    assert deltalog.last_txn_version(root, "foreign-stream-app") == 5
    # schema survives via the foreign checkpoint's metaData row
    meta = deltalog.table_metadata_no_spark(root)
    assert meta is not None and meta["partitionColumns"] == ["part"]
    # engine read end-to-end
    eng = Engine(spark, EngineConfig(table_mapping={"ft": root}))
    assert sorted(r["id"] for r in eng.read_table("ft").collect()) == foreign_table["live_ids"]
    # appending AFTER cleanup lands at version 3, not 0 (round-6 regression)
    assert deltalog.latest_version(root) == 2


# ---------------------------------------------------------------------------
# Writer direction: our emitted artifacts vs the protocol's required shapes
# ---------------------------------------------------------------------------


def _protocol_check_add(a: dict) -> None:
    assert isinstance(a["path"], str) and a["path"]
    assert isinstance(a["partitionValues"], dict)
    for k, v in a["partitionValues"].items():
        assert isinstance(k, str) and (v is None or isinstance(v, str))
    assert isinstance(a["size"], int)
    assert isinstance(a["modificationTime"], int)
    assert a["dataChange"] is True or a["dataChange"] is False
    if a.get("stats") is not None:
        st = json.loads(a["stats"])
        assert isinstance(st["numRecords"], int)


def test_our_log_matches_protocol_shapes(spark, tmp_path, lineitem):
    """Everything our writer emits, checked field-by-field against the Delta
    protocol's requirements — the contract a third-party reader consumes."""
    from delta_lake_proxy_spark.engine import write_governed_table

    path = str(tmp_path / "ours")
    write_governed_table(
        spark, lineitem.limit(60).repartition(1), path, ["l_returnflag"]
    )
    eng = Engine(spark, EngineConfig(table_mapping={"t": path}, read_only=False))
    eng.write_table("t", lineitem.limit(10), mode="append")
    eng.delete("t", F.col("l_returnflag") == "N")

    logd = deltalog.log_path(path)
    seen_protocol = seen_metadata = False
    for name in sorted(os.listdir(logd)):
        if not name.endswith(".json"):
            continue
        assert len(name) == 25 and name[:20].isdigit()  # {v:020d}.json
        with open(os.path.join(logd, name), encoding="utf-8") as f:
            lines = [json.loads(line) for line in f if line.strip()]
        assert all(len(a) == 1 for a in lines)  # one action per line
        kinds = [next(iter(a)) for a in lines]
        assert kinds[0] == "commitInfo"  # delta-spark convention our log follows
        for a in lines:
            kind, body = next(iter(a.items()))
            if kind == "add":
                _protocol_check_add(body)
            elif kind == "remove":
                assert isinstance(body["path"], str)
                assert isinstance(body["deletionTimestamp"], int)
            elif kind == "metaData":
                seen_metadata = True
                assert body["format"]["provider"] == "parquet"
                assert isinstance(body["schemaString"], str)
                assert isinstance(body["partitionColumns"], list)
                assert isinstance(body["id"], str)
            elif kind == "protocol":
                seen_protocol = True
                # lineitem's l_shipdate is TIMESTAMP_NTZ: creation declares
                # the timestampNtz feature (round 11 — the spec requires
                # the feature before the type may be used)
                assert body["minReaderVersion"] == 3
                assert body["minWriterVersion"] == 7
                assert body["readerFeatures"] == ["timestampNtz"]
                assert body["writerFeatures"] == ["timestampNtz"]
            elif kind == "commitInfo":
                assert isinstance(body["timestamp"], int)
                assert isinstance(body["operation"], str)
            elif kind == "txn":
                assert isinstance(body["appId"], str)
                assert isinstance(body["version"], int)
    assert seen_protocol and seen_metadata


def test_our_checkpoint_matches_protocol_shapes(spark, tmp_path, lineitem):
    import pyarrow.parquet as pq

    from delta_lake_proxy_spark.engine import write_governed_table

    path = str(tmp_path / "ours_ck")
    write_governed_table(
        spark, lineitem.limit(40).repartition(1), path, ["l_returnflag"]
    )
    v = deltalog.write_checkpoint(spark, path)
    ck = deltalog.last_checkpoint(path)
    # _last_checkpoint: version + size are the protocol's required fields
    assert ck["version"] == v and isinstance(ck["size"], int)
    ck_file = os.path.join(deltalog.log_path(path), f"{v:020d}.checkpoint.parquet")
    assert os.path.exists(ck_file)
    pf = pq.ParquetFile(ck_file)
    names = set(pf.schema_arrow.names)
    # the protocol's checkpoint column set (one action kind per row)
    assert {"add", "remove", "metaData", "protocol", "txn"} <= names
    rows = pq.read_table(ck_file).to_pylist()
    # exactly one non-null protocol and metaData row
    assert sum(1 for r in rows if r["protocol"] is not None) == 1
    assert sum(1 for r in rows if r["metaData"] is not None) == 1
    for r in rows:
        non_null = [k for k, val in r.items() if val is not None]
        assert len(non_null) == 1  # single-action rows, like delta-spark
        if r["add"] is not None:
            a = dict(r["add"])
            pv = a.get("partitionValues")
            if pv is not None and not isinstance(pv, dict):
                a["partitionValues"] = dict(pv)
            _protocol_check_add(a)


# ---------------------------------------------------------------------------
# Real third-party round-trip: auto-activates when a client is installed
# ---------------------------------------------------------------------------

def test_third_party_reader_roundtrip(spark, tmp_path, lineitem):  # pragma: no cover
    deltalake = pytest.importorskip(
        "deltalake", reason="deltalake-python not installed in this container"
    )
    from delta_lake_proxy_spark.engine import write_governed_table

    path = str(tmp_path / "tp")
    write_governed_table(spark, lineitem.limit(50).repartition(1), path, ["l_returnflag"])
    dt = deltalake.DeltaTable(path)
    assert dt.to_pyarrow_table().num_rows == 50
