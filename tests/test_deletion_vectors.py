"""Deletion-vector READ support (Delta reader feature ``deletionVectors``).

Round-6 verdict flagged reader-3 tables as the one silent-misread hazard;
round 7 first made them refuse, and these tests pin the graduation from
refused to READ-SUPPORTED: a foreign table whose files carry deletion
vectors (delta-spark DELETE/UPDATE without rewrite) returns exactly the
live rows through every read path — engine scan (enumerated AND
listing-join), time travel, data-skipping scan, and the governed Python
DataSource (batch + stream). The codec follows the public Delta protocol
spec (PROTOCOL.md "Deletion Vectors") and RoaringFormatSpec; the reference
proxy inherits identical semantics from ``deltalake::open_table``
(ref src/main.rs:357).

Second wave: DELETEs on delta.enableDeletionVectors=true tables WRITE
vectors (executor-side serialization, no rewrite), Engine DML on DV
tables rewrites with identity-correct removes, raw commits still refuse,
CDF refuses DV windows without change files, and vacuum never reclaims a
referenced DV file.
"""

from __future__ import annotations

import json
import os
import uuid as _uuid

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig, deltalog, dv
from delta_lake_proxy_spark.errors import UnsupportedProtocolError

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "part", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)

PROTOCOL = {
    "minReaderVersion": 3,
    "minWriterVersion": 7,
    "readerFeatures": ["deletionVectors"],
    "writerFeatures": ["deletionVectors"],
}


def _write_parquet(full_path: str, ids: list[int]) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(full_path), exist_ok=True)
    pq.write_table(pa.table({"id": pa.array(ids, type=pa.int64())}), full_path)
    return os.path.getsize(full_path)


def _commit(root: str, version: int, actions: list[dict]) -> None:
    logd = os.path.join(root, "_delta_log")
    os.makedirs(logd, exist_ok=True)
    with open(os.path.join(logd, f"{version:020d}.json"), "w", encoding="utf-8") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _add(rel: str, part: str, size: int, dv_desc: dict | None = None) -> dict:
    a = {
        "path": rel,
        "partitionValues": {"part": part},
        "size": size,
        "modificationTime": 1700000000000,
        "dataChange": True,
    }
    if dv_desc is not None:
        a["deletionVector"] = dv_desc
    return a


def _remove(rel: str, dv_desc: dict | None = None) -> dict:
    r = {"path": rel, "deletionTimestamp": 1700000000001, "dataChange": True}
    if dv_desc is not None:
        r["deletionVector"] = dv_desc
    return r


REL_A = "part=A/part-00000.parquet"
REL_B = "part=B/part-00000.parquet"
A_IDS = list(range(10))
B_IDS = list(range(10, 20))


def make_dv_table(root: str) -> str:
    """delta-spark-shaped history:

    * v0: protocol(3,7 deletionVectors) + metaData + adds of A (ids 0-9,
      partition A) and B (ids 10-19, partition B)
    * v1: DELETE -> DV on file A marking positions {1,3,5} ("u" storage:
      a UUID-named bin file at the table root, descriptor carries the
      z85-encoded UUID), committed as remove(A) + add(A, dv1)
    * v2: another DELETE -> DV update marking {1,3,5,7}, committed as
      remove(A, dv1) + add(A, dv2) with an INLINE ("i") descriptor
    """
    size_a = _write_parquet(os.path.join(root, REL_A), A_IDS)
    size_b = _write_parquet(os.path.join(root, REL_B), B_IDS)
    _commit(
        root,
        0,
        [
            {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
            {"protocol": PROTOCOL},
            {
                "metaData": {
                    "id": "dv-test",
                    "format": {"provider": "parquet"},
                    "schemaString": SCHEMA_STRING,
                    "partitionColumns": ["part"],
                    "configuration": {},
                    "createdTime": 1700000000000,
                }
            },
            {"add": _add(REL_A, "A", size_a)},
            {"add": _add(REL_B, "B", size_b)},
        ],
    )
    # v1: "u"-storage DV file, exactly as delta-spark lays it out
    u = _uuid.uuid4()
    dv_file = os.path.join(root, f"deletion_vector_{u}.bin")
    desc1 = dv.write_dv_file(dv_file, [[1, 3, 5]])[0]
    desc1.update({"storageType": "u", "pathOrInlineDv": dv.z85_encode(u.bytes)})
    _commit(
        root,
        1,
        [
            {"commitInfo": {"timestamp": 1700000000100, "operation": "DELETE"}},
            {"remove": _remove(REL_A)},
            {"add": _add(REL_A, "A", size_a, desc1)},
        ],
    )
    # v2: DV update (remove old identity, add new) with an inline descriptor
    desc2 = dv.inline_descriptor([1, 3, 5, 7])
    _commit(
        root,
        2,
        [
            {"commitInfo": {"timestamp": 1700000000200, "operation": "DELETE"}},
            {"remove": _remove(REL_A, desc1)},
            {"add": _add(REL_A, "A", size_a, desc2)},
        ],
    )
    return root


@pytest.fixture()
def dv_table(tmp_path):
    return make_dv_table(str(tmp_path / "t"))


def _engine(spark, path, **kw) -> Engine:
    return Engine(spark, EngineConfig(table_mapping={"t": path}, **kw))


LIVE_IDS = sorted(set(A_IDS) - {1, 3, 5, 7}) + B_IDS


# -- codec ------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 33)), min_size=0, max_size=2000
    )
)
def test_codec_roundtrip_property(positions):
    got = dv.decode_dv_data(dv.encode_dv_data(positions))
    assert got.tolist() == sorted(set(positions))


def test_codec_bitmap_container():
    """>4096 values in one 16-bit chunk forces the bitmap-container form."""
    pos = list(range(0, 10000, 2))
    assert dv.decode_dv_data(dv.encode_dv_data(pos)).tolist() == pos


def test_codec_known_bytes():
    """Hand-computed portable serialization of {7}: pins the byte layout
    (cookie 12346, one container, key 0, card-1=0, offset 16, value 7)
    against the public RoaringFormatSpec — a symmetric serializer/parser
    bug cannot hide behind a round-trip."""
    import struct

    data = dv.encode_dv_data([7])
    want = (
        struct.pack("<iq", dv.DV_MAGIC, 1)
        + struct.pack("<ii", 12346, 1)  # cookie, size
        + struct.pack("<HH", 0, 0)  # key, cardinality-1
        + struct.pack("<i", 16)  # offset of container data
        + struct.pack("<H", 7)  # array container: the single value
    )
    assert data == want


def test_codec_run_container_decodes():
    import struct

    cookie = 12347 | (0 << 16)  # 1 container, with run flag set
    payload = (
        struct.pack("<i", cookie)
        + bytes([0x01])
        + struct.pack("<HH", 2, 4)  # key=2, card-1=4
        + struct.pack("<HHH", 1, 100, 4)  # 1 run: 100..104
    )
    arr, end = dv._deserialize_roaring32(memoryview(payload), 0)
    assert arr.tolist() == [(2 << 16) + v for v in range(100, 105)]
    assert end == len(payload)


def test_codec_checksum_detects_corruption(tmp_path):
    p = str(tmp_path / "deletion_vector_x.bin")
    desc = dv.write_dv_file(p, [[1, 2, 3]])[0]
    raw = bytearray(open(p, "rb").read())
    raw[10] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(dv.DeletionVectorError, match="checksum|magic|cookie"):
        dv.load_dv_positions(str(tmp_path), desc)


# -- replay -----------------------------------------------------------------


def test_driver_replay_reconciles_by_dv_identity(dv_table):
    live = deltalog._live_adds_no_spark(dv_table)
    assert sorted(live) == [REL_A, REL_B]
    assert live[REL_A]["deletionVector"]["storageType"] == "i"
    assert live[REL_A]["deletionVector"]["cardinality"] == 4
    assert "deletionVector" not in live[REL_B] or live[REL_B].get("deletionVector") is None


def test_snapshot_files_reconciles_by_dv_identity(spark, dv_table):
    rows = {r["path"]: r for r in deltalog.snapshot_files(spark, dv_table).collect()}
    assert sorted(rows) == [REL_A, REL_B]
    assert rows[REL_A]["deletionVector"]["storageType"] == "i"
    assert rows[REL_A]["version"] == 2
    assert rows[REL_B]["deletionVector"] is None


def test_time_travel_replay(spark, dv_table):
    v1 = {r["path"]: r for r in deltalog.snapshot_files(spark, dv_table, version=1).collect()}
    assert v1[REL_A]["deletionVector"]["storageType"] == "u"
    v0 = {r["path"]: r for r in deltalog.snapshot_files(spark, dv_table, version=0).collect()}
    assert v0[REL_A]["deletionVector"] is None


# -- engine read paths ------------------------------------------------------


def test_engine_read_filters_deleted_rows(spark, dv_table):
    eng = _engine(spark, dv_table)
    got = sorted(r["id"] for r in eng.read_table("t").collect())
    assert got == LIVE_IDS


def test_engine_read_time_travel(spark, dv_table):
    eng = _engine(spark, dv_table)
    assert sorted(r["id"] for r in eng.read_table("t", version=1).collect()) == sorted(
        set(A_IDS) - {1, 3, 5}
    ) + B_IDS
    assert sorted(r["id"] for r in eng.read_table("t", version=0).collect()) == A_IDS + B_IDS


def test_engine_read_listing_join_path(spark, dv_table):
    eng = _engine(spark, dv_table)
    eng.large_listing_threshold = 1  # force the distributed listing-join scan
    got = sorted(r["id"] for r in eng.read_table("t").collect())
    assert got == LIVE_IDS


def test_engine_read_with_acl(spark, dv_table):
    eng = Engine(
        spark,
        EngineConfig(
            table_mapping={"t": dv_table},
            allowed_partitions={"t": [{"part": "A"}]},
        ),
    )
    got = sorted(r["id"] for r in eng.read_table("t").collect())
    assert got == sorted(set(A_IDS) - {1, 3, 5, 7})


def test_scan_with_skipping_applies_dv(spark, dv_table):
    eng = _engine(spark, dv_table)
    got = sorted(
        r["id"] for r in eng.scan_with_skipping("t", {"id": (0, 9)}).collect()
    )
    assert got == sorted(set(A_IDS) - {1, 3, 5, 7})


# -- governed DataSource ----------------------------------------------------


def test_governed_batch_source(spark, dv_table):
    from delta_lake_proxy_spark.sources.governed import GovernedDataSource

    spark.dataSource.register(GovernedDataSource)
    df = spark.read.format("governed").option("path", dv_table).load()
    assert sorted(r["id"] for r in df.collect()) == LIVE_IDS


def test_governed_stream_bootstrap(spark, dv_table, tmp_path):
    from delta_lake_proxy_spark.sources.governed import GovernedDataSource

    spark.dataSource.register(GovernedDataSource)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        spark.readStream.format("governed")
        .option("path", dv_table)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == LIVE_IDS


# -- surrounding guarantees -------------------------------------------------


def test_engine_dml_supported_raw_commits_refused(spark, dv_table):
    """Second-wave upgrade: Engine DML on foreign DV tables is SUPPORTED —
    the copy-on-write rewrite tombstones the (path, dv uniqueId) identity
    and never resurrects DV-deleted rows. Raw log-level commits still
    refuse (they cannot prove identity-correct removes)."""
    eng = _engine(spark, dv_table, read_only=False)
    eng.delete("t", F.col("id") == 0)
    got = sorted(r["id"] for r in eng.read_table("t").collect())
    assert got == sorted(set(LIVE_IDS) - {0})  # 0 gone, DV'd rows stay dead
    with pytest.raises(UnsupportedProtocolError):
        deltalog.write_commit(dv_table, adds=[], removes=[{"path": REL_B}])


def test_cdf_refuses_dv_window(spark, dv_table):
    eng = _engine(spark, dv_table)
    with pytest.raises(UnsupportedProtocolError, match="deletion-vector"):
        eng.table_changes("t", 0).collect()


def test_vacuum_reclaims_only_unreferenced_dv_files(spark, dv_table):
    """The fixture's v1 "u"-storage bin was SUPERSEDED by v2's inline
    descriptor: vacuum reclaims it (like Delta — DV files are data files),
    and the table still reads exactly right afterwards."""
    eng = _engine(spark, dv_table, read_only=False)
    bins = [e for e in os.listdir(dv_table) if e.startswith("deletion_vector_")]
    assert bins, "fixture should have a u-storage DV file"
    eng.vacuum("t", retention_hours=0)
    assert not [
        e for e in os.listdir(dv_table) if e.startswith("deletion_vector_")
    ]  # superseded bin reclaimed; the live DV is inline
    assert sorted(r["id"] for r in eng.read_table("t").collect()) == LIVE_IDS


def test_checkpoint_carries_dv(spark, dv_table):
    deltalog.write_checkpoint(spark, dv_table)
    # drop the JSON commits the checkpoint superseded: replay must come
    # from the checkpoint alone and still carry the descriptors
    logd = os.path.join(dv_table, "_delta_log")
    for name in list(os.listdir(logd)):
        if name.endswith(".json") and name[:-5].isdigit():
            os.remove(os.path.join(logd, name))
    live = deltalog._live_adds_no_spark(dv_table)
    assert live[REL_A]["deletionVector"]["cardinality"] == 4
    eng = _engine(spark, dv_table)
    assert sorted(r["id"] for r in eng.read_table("t").collect()) == LIVE_IDS


def test_file_listing_shows_dv_files_as_live(spark, dv_table):
    """The snapshot keys stay the parquet files (DV bins are auxiliary
    metadata, not table keys) — matching the reference's listing of the
    delta snapshot's file set."""
    eng = _engine(spark, dv_table)
    keys = sorted(r["path"] for r in eng.snapshot_files("t").collect())
    assert keys == [REL_A, REL_B]


def test_dv_snapshot_under_admission_control(spark, dv_table, tmp_path):
    """DV filtering composes with paced bootstrap: maxFilesPerTrigger=1
    splits the snapshot across micro-batches and each file's DV still
    applies file-locally — exactly-once, no resurrected rows."""
    from delta_lake_proxy_spark.sources.governed import GovernedDataSource

    spark.dataSource.register(GovernedDataSource)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("governed")
        .option("path", dv_table)
        .option("maxFilesPerTrigger", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # availableNow under pacing drains one window-slice per run: loop runs
    # over the same checkpoint until the offsets stop advancing
    for _ in range(4):
        q = (
            spark.readStream.format("governed")
            .option("path", dv_table)
            .option("maxFilesPerTrigger", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == LIVE_IDS


# -- WRITING deletion vectors (round 7, second wave) ------------------------


@pytest.fixture()
def dv_write_table(spark, tmp_path):
    from delta_lake_proxy_spark.engine import write_governed_table

    path = str(tmp_path / "w")
    df = spark.createDataFrame(
        [(i, float(i), "A" if i < 10 else "B") for i in range(20)],
        "id long, val double, part string",
    )
    write_governed_table(spark, df.repartition(1), path, ["part"])  # v0
    eng = _engine(spark, path, read_only=False)
    eng.enable_deletion_vectors("t")  # v1: property + (3,7) protocol
    return eng, path


def test_enable_dv_upgrades_protocol(dv_write_table):
    eng, path = dv_write_table
    proto = deltalog.table_protocol_no_spark(path)
    assert proto["minReaderVersion"] == 3
    assert proto["readerFeatures"] == ["deletionVectors"]
    # raw commits refuse (writer 7, no proof of DV maintenance)
    with pytest.raises(UnsupportedProtocolError):
        deltalog.write_commit(path, adds=[], removes=[{"path": "x"}])


def test_dv_delete_writes_vectors_not_files(dv_write_table, spark):
    eng, path = dv_write_table
    files_before = {
        r["path"] for r in deltalog.snapshot_files(spark, path).collect()
    }
    v = eng.delete("t", F.col("id").isin(2, 3, 15))  # v2
    assert v == 2
    # no data rewrite: the SAME parquet files stay live, now DV'd
    snap = {r["path"]: r for r in deltalog.snapshot_files(spark, path).collect()}
    assert set(snap) == files_before
    dvd = [r for r in snap.values() if r["deletionVector"] is not None]
    assert len(dvd) == 2  # one DV per touched partition file
    assert all(r["deletionVector"]["storageType"] == "u" for r in dvd)
    assert sum(r["deletionVector"]["cardinality"] for r in dvd) == 3
    # rows are gone through every read path
    assert sorted(r["id"] for r in eng.read_table("t").collect()) == sorted(
        set(range(20)) - {2, 3, 15}
    )
    from delta_lake_proxy_spark.sources.governed import GovernedDataSource

    spark.dataSource.register(GovernedDataSource)
    got = spark.read.format("governed").option("path", path).load()
    assert sorted(r["id"] for r in got.collect()) == sorted(set(range(20)) - {2, 3, 15})
    # time travel to the pre-delete snapshot still serves everything
    assert eng.read_table("t", version=1).count() == 20


def test_dv_delete_merges_with_existing_vector(dv_write_table, spark):
    eng, path = dv_write_table
    eng.delete("t", F.col("id") == 2)  # v2: DV {pos of 2}
    eng.delete("t", F.col("id") == 4)  # v3: merged DV on the same file
    snap = {r["path"]: r for r in deltalog.snapshot_files(spark, path).collect()}
    dvd = [r for r in snap.values() if r["deletionVector"] is not None]
    assert len(dvd) == 1 and dvd[0]["deletionVector"]["cardinality"] == 2
    assert sorted(r["id"] for r in eng.read_table("t").collect()) == sorted(
        set(range(20)) - {2, 4}
    )
    # and the intermediate version still reads with only the first delete
    assert sorted(r["id"] for r in eng.read_table("t", version=2).collect()) == sorted(
        set(range(20)) - {2}
    )


def test_dv_delete_escalates_to_full_remove(dv_write_table, spark):
    eng, path = dv_write_table
    eng.delete("t", F.col("part") == "A")  # every row of the A file dies
    snap = {r["path"]: r for r in deltalog.snapshot_files(spark, path).collect()}
    assert len(snap) == 1  # the A file was fully REMOVED, not DV'd
    assert all("part=B" in p for p in snap)
    assert sorted(r["id"] for r in eng.read_table("t").collect()) == list(range(10, 20))


def test_dv_delete_noop(dv_write_table):
    eng, path = dv_write_table
    v_before = deltalog.latest_version(path)
    assert eng.delete("t", F.col("id") == 999) == v_before


def test_merge_on_foreign_dv_table_rewrites_with_identity(spark, dv_table):
    """Copy-on-write MERGE on a FOREIGN DV table (DV protocol but no
    delta.enableDeletionVectors property, so no DV-writing path) must
    tombstone the (path, dv uniqueId) identity — and the rewritten file
    carries only live rows (the DV'd ones stay dead)."""
    eng = _engine(spark, dv_table, read_only=False)
    src = spark.createDataFrame([(0, "A")], "id long, part string")
    eng.merge("t", src, on=["id"])  # copy-on-write rewrite of file A
    got = sorted(r["id"] for r in eng.read_table("t").collect())
    assert got == LIVE_IDS  # 0 replaced in place; DV'd 1,3,5,7 stay dead
    snap = {r["path"]: r for r in deltalog.snapshot_files(spark, dv_table).collect()}
    rewritten = [p for p in snap if p not in (REL_A, REL_B)]
    assert rewritten  # A was rewritten into a fresh file
    assert all(r["deletionVector"] is None for r in snap.values())


def test_overwrite_and_compact_tombstone_dv_identities(dv_write_table, spark):
    eng, path = dv_write_table
    eng.delete("t", F.col("id") == 2)
    eng.compact_table("t", files_per_partition=1)
    assert sorted(r["id"] for r in eng.read_table("t").collect()) == sorted(
        set(range(20)) - {2}
    )
    snap = deltalog.snapshot_files(spark, path).collect()
    assert all(r["deletionVector"] is None for r in snap)  # compaction applied DVs


def test_our_dv_tables_interop_with_foreign_reader_model(dv_write_table, spark):
    """The written descriptors round-trip through the same public-format
    codec paths a conforming foreign reader would use: resolve the 'u'
    file, verify CRC, decode positions."""
    from delta_lake_proxy_spark import dv as dv_mod

    eng, path = dv_write_table
    eng.delete("t", F.col("id").isin(5, 6))
    live = deltalog._live_adds_no_spark(path)
    descs = [
        a["deletionVector"] for a in live.values() if a.get("deletionVector")
    ]
    assert descs
    for d in descs:
        pos = dv_mod.load_dv_positions(path, d)
        assert len(pos) == d["cardinality"]


def test_dv_update_marks_and_appends(dv_write_table, spark):
    """UPDATE on a DV-enabled table: old positions get vectored, the
    updated rows append as a new file — touched files are not rewritten."""
    eng, path = dv_write_table
    files_before = {
        r["path"] for r in deltalog.snapshot_files(spark, path).collect()
    }
    eng.update("t", F.col("id") == 7, {"val": F.col("val") * 100})
    snap = {r["path"]: r for r in deltalog.snapshot_files(spark, path).collect()}
    # the original files all survive (one now DV'd) plus one appended file
    assert files_before <= set(snap)
    assert len(snap) == len(files_before) + 1
    dvd = [r for r in snap.values() if r["deletionVector"] is not None]
    assert len(dvd) == 1 and dvd[0]["deletionVector"]["cardinality"] == 1
    rows = {r["id"]: r for r in eng.read_table("t").collect()}
    assert len(rows) == 20 and rows[7]["val"] == 700.0
    # compose: a DV delete after the DV update
    eng.delete("t", F.col("id") == 7)
    assert 7 not in {r["id"] for r in eng.read_table("t").collect()}


def test_dv_update_partition_column_still_rejected(dv_write_table):
    eng, path = dv_write_table
    with pytest.raises(ValueError, match="partition column"):
        eng.update("t", F.col("id") == 1, {"part": F.lit("C")})


def test_dv_merge_marks_and_appends(dv_write_table, spark):
    eng, path = dv_write_table
    files_before = {
        r["path"] for r in deltalog.snapshot_files(spark, path).collect()
    }
    src = spark.createDataFrame(
        [(3, 300.0, "A"), (50, 1.0, "B")], "id long, val double, part string"
    )
    eng.merge("t", src, on=["id"])
    snap = {r["path"]: r for r in deltalog.snapshot_files(spark, path).collect()}
    assert files_before <= set(snap)  # originals survive, one now DV'd
    dvd = [r for r in snap.values() if r["deletionVector"] is not None]
    assert len(dvd) == 1 and dvd[0]["deletionVector"]["cardinality"] == 1
    rows = {r["id"]: r for r in eng.read_table("t").collect()}
    assert len(rows) == 21 and rows[3]["val"] == 300.0 and rows[50]["val"] == 1.0
    # pure-insert merge: no DVs written, just an append
    src2 = spark.createDataFrame([(60, 2.0, "B")], "id long, val double, part string")
    eng.merge("t", src2, on=["id"])
    assert eng.read_table("t").count() == 22


def test_vacuum_reclaims_superseded_dv_bins(dv_write_table, spark):
    """A second DELETE supersedes the first vector; vacuum reclaims the
    orphaned bin while the live one (and the table) survive."""
    eng, path = dv_write_table
    eng.delete("t", F.col("id") == 2)
    eng.delete("t", F.col("id") == 4)  # supersedes the first A-file DV

    def bins():
        return sorted(
            e for e in os.listdir(path) if e.startswith("deletion_vector_")
        )

    assert len(bins()) == 2
    n = eng.vacuum("t", retention_hours=0)
    assert n >= 1  # the superseded bin is gone
    remaining = bins()
    assert len(remaining) == 1
    live = deltalog._live_adds_no_spark(path)
    descs = [a["deletionVector"] for a in live.values() if a.get("deletionVector")]
    from delta_lake_proxy_spark.dv import dv_file_path

    assert {os.path.basename(dv_file_path(path, d)) for d in descs} == set(remaining)
    assert sorted(r["id"] for r in eng.read_table("t").collect()) == sorted(
        set(range(20)) - {2, 4}
    )


# -- round-8 advice pins ----------------------------------------------------


def test_dv_property_without_protocol_refused(spark, tmp_path):
    """set_table_properties must not smuggle delta.enableDeletionVectors
    onto a (1,2) table: the property alone never authorizes DV actions —
    a conforming reader ignores descriptors a protocol does not declare,
    so DV-writing DML would leave 'deleted' rows visible. The upgrade and
    the property land together via enable_deletion_vectors()."""
    from delta_lake_proxy_spark.engine import write_governed_table

    path = str(tmp_path / "plain")
    df = spark.createDataFrame(
        [(i, "A") for i in range(10)], "id long, part string"
    )
    write_governed_table(spark, df.repartition(1), path, ["part"])
    eng = _engine(spark, path, read_only=False)
    with pytest.raises(UnsupportedProtocolError, match="enable_deletion_vectors"):
        eng.set_table_properties("t", {"delta.enableDeletionVectors": "true"})
    # unrelated properties still set fine
    eng.set_table_properties("t", {"myapp.owner": "alice"})
    assert (
        deltalog.table_configuration_no_spark(path)["myapp.owner"] == "alice"
    )


def test_dv_property_on_declared_protocol_table_ok(dv_write_table):
    """On a table whose protocol already declares deletionVectors, the
    property may be toggled via set_table_properties (no upgrade needed)."""
    eng, path = dv_write_table
    eng.set_table_properties("t", {"delta.enableDeletionVectors": "true"})
    conf = deltalog.table_configuration_no_spark(path)
    assert conf["delta.enableDeletionVectors"] == "true"


def test_foreign_property_only_table_takes_copy_on_write(spark, tmp_path):
    """A foreign (1,2) table that carries delta.enableDeletionVectors=true
    in its configuration (protocol never upgraded — the exact hazard the
    round-7 advice flagged) must NOT take the DV-writing DML path: DELETE
    rewrites copy-on-write, emits zero deletionVector actions, and the
    rows are actually gone on read."""
    from delta_lake_proxy_spark.engine import write_governed_table

    path = str(tmp_path / "foreign")
    df = spark.createDataFrame(
        [(i, "A") for i in range(10)], "id long, part string"
    )
    write_governed_table(spark, df.repartition(1), path, ["part"])
    meta = deltalog.table_metadata_no_spark(path)
    # foreign writer sets the property WITHOUT a protocol upgrade
    deltalog.write_commit(
        path,
        [],
        [],
        schema_json=meta["schemaString"],
        partition_cols=["part"],
        operation="SET TBLPROPERTIES",
        configuration={"delta.enableDeletionVectors": "true"},
    )
    eng = _engine(spark, path, read_only=False)
    assert not eng._dv_dml_eligible(path)
    eng.delete("t", F.col("id") < 3)
    snap = deltalog.snapshot_files(spark, path).collect()
    assert all(r["deletionVector"] is None for r in snap)
    assert sorted(r["id"] for r in eng.read_table("t").collect()) == list(
        range(3, 10)
    )


def test_dv_merge_schema_mismatch_rejected(dv_write_table, spark):
    """The DV MERGE path appends the source verbatim, so it must enforce
    the same schema contract unionByName gives the copy-on-write path:
    missing or extra source columns reject loudly (no nonconforming
    files); conforming columns in any order cast to the logged types."""
    eng, path = dv_write_table
    missing = spark.createDataFrame([(3, "A")], "id long, part string")
    with pytest.raises(ValueError, match="missing columns.*val"):
        eng.merge("t", missing, on=["id"])
    extra = spark.createDataFrame(
        [(3, 1.0, "A", "x")], "id long, val double, part string, bonus string"
    )
    with pytest.raises(ValueError, match="unexpected columns.*bonus"):
        eng.merge("t", extra, on=["id"])
    # reordered + narrower-typed source conforms: cast and merge
    reordered = spark.createDataFrame(
        [("A", 3, 300)], "part string, id int, val int"
    )
    eng.merge("t", reordered, on=["id"])
    rows = {r["id"]: r for r in eng.read_table("t").collect()}
    assert rows[3]["val"] == 300.0 and len(rows) == 20


def test_dv_merge_incompatible_types_rejected(dv_write_table, spark):
    """Advice pin (round 9): the DV MERGE reconciliation must reject
    lossy/invalid coercions instead of letting Column.cast silently null
    them — a string source for a double table column, or a double source
    for a long key, must fail loudly, not commit null-filled rows."""
    eng, path = dv_write_table
    stringy = spark.createDataFrame(
        [(3, "not-a-number", "A")], "id long, val string, part string"
    )
    with pytest.raises(ValueError, match="incompatible column types"):
        eng.merge("t", stringy, on=["id"])
    narrowing = spark.createDataFrame(
        [(3.5, 1.0, "A")], "id double, val double, part string"
    )
    with pytest.raises(ValueError, match="incompatible column types"):
        eng.merge("t", narrowing, on=["id"])
    # nothing committed: the table still reads all 20 original rows
    assert eng.read_table("t").count() == 20


def test_restore_reverts_dv_delete(dv_write_table, spark):
    """RESTORE on a DV table: a DV-writing DELETE changes row liveness
    inside unchanged files, so the restore diff must key on the full
    (path, dv uniqueId) identity — a path-only diff sees 'live in both'
    and silently keeps the new deletion state."""
    eng, path = dv_write_table
    eng.delete("t", F.col("id").isin(2, 3, 15))  # v2: writes DVs
    assert eng.read_table("t").count() == 17
    eng.restore("t", version=1)  # v3: back to all 20 rows
    assert sorted(r["id"] for r in eng.read_table("t").collect()) == list(
        range(20)
    )
    # identity-correct action pair: no live add carries a DV any more,
    # and the DV'd identities were tombstoned (reconciliation clean)
    live = deltalog._live_adds_no_spark(path)
    assert all(
        not (a.get("deletionVector") or {}).get("storageType")
        for a in live.values()
    )
    # restore BACK to the deleted state works too (re-adds the DV'd pair)
    eng.restore("t", version=2)
    assert sorted(r["id"] for r in eng.read_table("t").collect()) == sorted(
        set(range(20)) - {2, 3, 15}
    )


def test_dv_null_cardinality_never_broadcasts(spark, dv_table):
    """A descriptor lacking cardinality could represent an unboundedly
    large position set: the enumerated path must mirror the distributed
    path and skip the broadcast hint (advice pin)."""
    eng = _engine(spark, dv_table)
    items = [
        (rel, {**d, "cardinality": None})
        for rel, d in eng._dv_map(dv_table).items()
    ]
    assert items, "fixture should carry at least one DV"
    pos_df = eng._dv_positions_df(dv_table, dv_items=items)
    plan = pos_df._jdf.queryExecution().logical().toString()
    assert "broadcast" not in plan.lower()
    # with known cardinality the same set broadcasts (plan keeps its
    # no-shuffle scan shape)
    pos_bc = eng._dv_positions_df(
        dv_table, dv_items=list(eng._dv_map(dv_table).items())
    )
    plan_bc = pos_bc._jdf.queryExecution().logical().toString()
    assert "broadcast" in plan_bc.lower()
