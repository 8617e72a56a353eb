"""Positive-path certification of the rowTracking writer feature
(Delta protocol `rowTracking`): fresh baseRowId assignment above the
high-water mark, `delta.rowTracking` domain maintenance, survival through
checkpoints and log cleanup, identity carry through clone/restore and on
tombstones, `read_table(with_row_ids=True)` values, and the
`delta.enableRowTracking=true` DML stability refusals.

The reference delegates its read surface to the deltalake crate
(src/main.rs:357) and never writes row ids; this suite pins the engine's
own write-side obligations against the Delta spec's contract.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig, deltalog
from delta_lake_proxy_spark.errors import UnsupportedProtocolError


def mk_engine(spark, path, extra=None):
    mapping = {"t": path, **(extra or {})}
    return Engine(spark, EngineConfig(table_mapping=mapping, read_only=False))


def live_adds(path):
    return deltalog._live_adds_no_spark(path)


def id_ranges(path):
    """(baseRowId, numRecords) per live file — must tile disjoint ranges."""
    out = []
    for p, a in sorted(live_adds(path).items()):
        n = json.loads(a["stats"]).get("numRecords")
        out.append((p, a.get("baseRowId"), a.get("defaultRowCommitVersion"), n))
    return out


def assert_disjoint_ids(path, expected_total):
    """Every live file carries a baseRowId; ranges are pairwise disjoint;
    the high-water mark clears the top of every range."""
    spans = []
    for p, base, dcv, n in id_ranges(path):
        assert base is not None, f"live file {p} has no baseRowId"
        assert dcv is not None, f"live file {p} has no defaultRowCommitVersion"
        spans.append((base, base + n - 1))
    spans.sort()
    total = 0
    for i, (lo, hi) in enumerate(spans):
        total += hi - lo + 1
        if i:
            assert lo > spans[i - 1][1], f"overlapping id ranges: {spans}"
    assert total == expected_total
    assert deltalog.row_id_high_water_mark(path) >= max(hi for _, hi in spans)


@pytest.fixture
def rt_table(spark, tmp_path):
    """A plain 2-file table upgraded via enable_row_tracking (enabled=False:
    the feature is SUPPORTED but ids are not yet part of the read contract,
    so DML stays allowed — the spec's two-level distinction)."""
    path = str(tmp_path / "t")
    eng = mk_engine(spark, path)
    df = spark.range(0, 10).select(
        F.col("id"), (F.col("id") % 2).alias("k"), (F.col("id") * 10).alias("v")
    )
    eng.write_table("t", df.repartition(2))
    eng.enable_row_tracking("t", enabled=False)
    return path, eng


def test_enable_backfills_ids_and_domain(rt_table):
    path, eng = rt_table
    proto = deltalog.table_protocol_no_spark(path)
    assert set(proto["writerFeatures"]) == {"rowTracking", "domainMetadata"}
    assert proto["minWriterVersion"] == 7 and proto["minReaderVersion"] == 1
    assert_disjoint_ids(path, 10)
    assert deltalog.row_id_high_water_mark(path) == 9
    # the domain action is live (not just implied)
    dm = deltalog.live_domain_metadata(path)[deltalog.ROW_TRACKING_DOMAIN]
    assert json.loads(dm["configuration"])["rowIdHighWaterMark"] == 9


def test_append_assigns_above_hwm(spark, rt_table):
    path, eng = rt_table
    before = {
        p: (base, dcv) for p, base, dcv, _ in id_ranges(path)
    }
    eng.write_table("t", spark.range(100, 107).select(
        F.col("id"), F.lit(0).cast("long").alias("k"), F.lit(0).cast("long").alias("v")
    ).coalesce(1))
    assert_disjoint_ids(path, 17)
    # pre-existing files keep their identity untouched
    for p, base, dcv, _ in id_ranges(path):
        if p in before:
            assert (base, dcv) == before[p]
        else:
            assert base >= 10  # fresh range strictly above the old mark
    assert deltalog.row_id_high_water_mark(path) == 16


def test_identity_survives_checkpoint_and_cleanup(spark, rt_table):
    path, eng = rt_table
    ranges_before = id_ranges(path)
    deltalog.write_checkpoint(spark, path)
    deltalog.cleanup_log(path, retention_hours=0.0)
    # replay now starts from the checkpoint: ids and the hwm domain must
    # have been carried into it
    assert id_ranges(path) == ranges_before
    assert deltalog.row_id_high_water_mark(path) == 9
    # and the NEXT append still continues above the mark
    eng.write_table("t", spark.range(200, 203).select(
        F.col("id"), F.lit(1).cast("long").alias("k"), F.lit(1).cast("long").alias("v")
    ).coalesce(1))
    assert_disjoint_ids(path, 13)
    assert deltalog.row_id_high_water_mark(path) == 12


def test_clone_carries_ids_and_continues_above_hwm(spark, tmp_path, rt_table):
    path, eng = rt_table
    dst = str(tmp_path / "c")
    eng.clone_table("t", dst, target_alias="c")
    # identity travels with the clone, domain included
    src_ids = {
        os.path.basename(p): (b, d) for p, b, d, _ in id_ranges(path)
    }
    clone_ids = {
        os.path.basename(p): (b, d) for p, b, d, _ in id_ranges(dst)
    }
    assert clone_ids == src_ids
    assert deltalog.row_id_high_water_mark(dst) == 9
    # appends to the clone assign above the carried mark
    eng.write_table("c", spark.range(50, 55).select(
        F.col("id"), F.lit(0).cast("long").alias("k"), F.lit(0).cast("long").alias("v")
    ).coalesce(1))
    assert_disjoint_ids(dst, 15)
    # the source is untouched
    assert deltalog.row_id_high_water_mark(path) == 9
    assert_disjoint_ids(path, 10)


def test_with_row_ids_values(spark, rt_table):
    path, eng = rt_table
    df = eng.read_table("t", with_row_ids=True)
    rows = df.collect()
    assert len(rows) == 10
    # fresh ids tile exactly [0, 9] with no duplicates
    assert sorted(r["_row_id"] for r in rows) == list(range(10))
    # commit version stamps the backfill commit for every file
    assert {r["_row_commit_version"] for r in rows} == {2}
    # ids are stable across an append: the same logical row keeps its id
    before = {r["_row_id"]: r["id"] for r in rows}
    eng.write_table("t", spark.range(300, 302).select(
        F.col("id"), F.lit(0).cast("long").alias("k"), F.lit(0).cast("long").alias("v")
    ).coalesce(1))
    after = {
        r["_row_id"]: r["id"]
        for r in eng.read_table("t", with_row_ids=True).collect()
    }
    assert len(after) == 12
    for rid, ident in before.items():
        assert after[rid] == ident
    # and the new rows got ids above the old mark
    assert min(rid for rid, v in after.items() if v >= 300) >= 10


def test_with_row_ids_requires_protocol(spark, tmp_path):
    path = str(tmp_path / "plain")
    eng = mk_engine(spark, path)
    eng.write_table("t", spark.range(3).select(F.col("id")))
    with pytest.raises(UnsupportedProtocolError, match="rowTracking"):
        eng.read_table("t", with_row_ids=True)


def test_tombstones_carry_identity_on_overwrite_and_restore(spark, rt_table):
    path, eng = rt_table
    ids_v2 = {os.path.basename(p): (b, d) for p, b, d, _ in id_ranges(path)}
    eng.write_table(
        "t",
        spark.range(400, 404).select(
            F.col("id"), F.lit(0).cast("long").alias("k"), F.lit(0).cast("long").alias("v")
        ).coalesce(1),
        mode="overwrite",
    )
    v = deltalog.latest_version(path)
    removed = {}
    with open(
        os.path.join(path, "_delta_log", f"{v:020d}.json"), encoding="utf-8"
    ) as f:
        for line in f:
            a = json.loads(line)
            if "remove" in a:
                removed[os.path.basename(a["remove"]["path"])] = a["remove"]
    assert removed, "overwrite produced no removes"
    for name, rm in removed.items():
        assert rm.get("baseRowId") == ids_v2[name][0]
        assert rm.get("defaultRowCommitVersion") == ids_v2[name][1]
    # RESTORE re-adds the old files WITH their original identity and
    # tombstones the overwrite file with its own
    eng.restore("t", version=2)
    assert {
        os.path.basename(p): (b, d) for p, b, d, _ in id_ranges(path)
    } == ids_v2
    assert deltalog.row_id_high_water_mark(path) >= 13


def test_enabled_dml_stability_refusals(spark, rt_table):
    """delta.enableRowTracking=true promises STABLE ids: operations that
    rewrite surviving rows must refuse (this engine writes no materialized
    row-id columns); appends stay allowed."""
    path, eng = rt_table
    eng.enable_row_tracking("t", enabled=True)  # idempotent re-run + enable
    assert deltalog.row_tracking_enabled(path)
    assert_disjoint_ids(path, 10)  # re-run did not renumber
    with pytest.raises(UnsupportedProtocolError, match="renumber"):
        eng.update("t", F.col("id") == 1, {"v": F.lit(0)})
    with pytest.raises(UnsupportedProtocolError, match="renumber"):
        eng.merge(
            "t",
            spark.range(1).select(
                F.col("id"), F.lit(9).cast("long").alias("k"), F.lit(9).cast("long").alias("v")
            ),
            on=["id"],
        )
    with pytest.raises(UnsupportedProtocolError, match="renumber"):
        eng.compact_table("t")
    with pytest.raises(UnsupportedProtocolError, match="renumber"):
        eng.delete("t", F.col("id") == 1)  # copy-on-write shape rewrites
    # appends never renumber surviving rows
    eng.write_table("t", spark.range(500, 502).select(
        F.col("id"), F.lit(0).cast("long").alias("k"), F.lit(0).cast("long").alias("v")
    ).coalesce(1))
    assert_disjoint_ids(path, 12)


def test_raw_commit_still_refuses(rt_table):
    """deltalog.write_commit without row_tracking_assign cannot prove the
    assignment obligation — refuses rather than corrupting the table."""
    path, _ = rt_table
    with pytest.raises(UnsupportedProtocolError, match="rowTracking"):
        deltalog.write_commit(path, adds=[], removes=[{"path": "x"}])


def test_enable_refuses_featured_tables(spark, tmp_path):
    path = str(tmp_path / "dv")
    eng = mk_engine(spark, path)
    eng.write_table("t", spark.range(3).select(F.col("id")))
    eng.enable_deletion_vectors("t")
    with pytest.raises(UnsupportedProtocolError, match="refusing to rewrite"):
        eng.enable_row_tracking("t")


def test_with_row_ids_on_foreign_writer_table(spark, tmp_path):
    """Interop: a rowTracking table authored by a CONFORMING FOREIGN
    writer (hand-written log: explicit baseRowId/defaultRowCommitVersion
    adds + rowIdHighWaterMark domain, ids NOT starting at 0 and NOT in
    file order) reads back exactly baseRowId + physical index — the
    broadcast (path -> identity) map must come from the log, not from any
    assumption about this engine's own assignment order."""
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
    files = {"f1.parquet": [10, 11, 12], "f2.parquet": [20, 21]}
    sizes = {}
    for name, ids in files.items():
        pq.write_table(
            pa.table({"id": pa.array(ids, type=pa.int64())}),
            os.path.join(root, name),
        )
        sizes[name] = os.path.getsize(os.path.join(root, name))
    # foreign assignment: f2's range (100..101) sits BELOW f1's (500..502)
    base = {"f1.parquet": 500, "f2.parquet": 100}
    dcv = {"f1.parquet": 7, "f2.parquet": 3}
    logd = os.path.join(root, "_delta_log")
    os.makedirs(logd)
    actions = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {
            "protocol": {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": ["rowTracking", "domainMetadata"],
            }
        },
        {
            "metaData": {
                "id": "ft-test",
                "format": {"provider": "parquet"},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": {"delta.enableRowTracking": "true"},
                "createdTime": 1700000000000,
            }
        },
        {
            "domainMetadata": {
                "domain": "delta.rowTracking",
                "configuration": json.dumps({"rowIdHighWaterMark": 502}),
                "removed": False,
            }
        },
    ] + [
        {
            "add": {
                "path": name,
                "partitionValues": {},
                "size": sizes[name],
                "modificationTime": 1700000000000,
                "dataChange": True,
                "stats": json.dumps({"numRecords": len(ids)}),
                "baseRowId": base[name],
                "defaultRowCommitVersion": dcv[name],
            }
        }
        for name, ids in sorted(files.items())
    ]
    with open(
        os.path.join(logd, "00000000000000000000.json"), "w", encoding="utf-8"
    ) as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    eng = mk_engine(spark, root)
    got = {
        r["id"]: (r["_row_id"], r["_row_commit_version"])
        for r in eng.read_table("t", with_row_ids=True).collect()
    }
    assert got == {
        10: (500, 7), 11: (501, 7), 12: (502, 7),
        20: (100, 3), 21: (101, 3),
    }
    # and an engine append continues above the FOREIGN high-water mark
    eng.write_table("t", spark.range(900, 902).select(F.col("id")).coalesce(1))
    new = {
        r["id"]: r["_row_id"]
        for r in eng.read_table("t", with_row_ids=True).collect()
        if r["id"] >= 900
    }
    assert sorted(new.values()) == [503, 504]
    assert deltalog.row_id_high_water_mark(root) == 504
