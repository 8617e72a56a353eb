"""Delta log-compaction files (protocol spec "Log Compaction Files"):
``<x>.<y>.compacted.json`` aggregates the reconciled actions of a commit
range so replays read one file instead of the whole JSON tail. This suite
pins the writer's checkpoint-rule reconciliation, reader preference in
EVERY replay path (driver-side and distributed — proven by deleting the
individual commits), per-version granularity preservation (time travel
inside a range), cleanup retirement, foreign-authored files, and the
unknown-action refusal. The reference reads these through the deltalake
kernel (ref src/main.rs:357, dep Cargo.toml:13)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig, deltalog
from delta_lake_proxy_spark.engine import write_governed_table
from delta_lake_proxy_spark.errors import UnsupportedProtocolError


def mk_engine(spark, path, **cfg):
    return Engine(
        spark, EngineConfig(table_mapping={"t": path}, read_only=False, **cfg)
    )


def build_table(spark, tmp_path, lineitem, name="lc"):
    """v0 create, v1-v3 appends, v4 delete — a 5-commit tail, no checkpoint
    (checkpoint_interval=0 keeps the whole range compactable)."""
    path = str(tmp_path / name)
    write_governed_table(
        spark, lineitem.limit(60).repartition(2), path, ["l_returnflag"]
    )
    eng = mk_engine(spark, path, checkpoint_interval=0)
    for lo in (60, 70, 80):
        eng.write_table("t", lineitem.limit(lo + 10).offset(lo), mode="append")
    eng.delete("t", F.col("l_quantity") > 45)
    return path, eng


def snapshot_state(eng):
    rows = eng.read_table("t").select("l_orderkey", "l_linenumber", "l_quantity")
    return sorted(map(tuple, rows.collect()))


def delete_commits(path, versions):
    for v in versions:
        os.remove(os.path.join(path, "_delta_log", f"{v:020d}.json"))


def test_compaction_replay_equivalence_and_preference(spark, tmp_path, lineitem):
    path, eng = build_table(spark, tmp_path, lineitem)
    before_live = deltalog._live_adds_no_spark(path)
    before_rows = snapshot_state(eng)
    name = eng.compact_log("t", 1, 4)
    assert name == f"{1:020d}.{4:020d}.compacted.json"
    assert os.path.isfile(os.path.join(path, "_delta_log", name))
    # with commits still present the replay result is unchanged
    eng.invalidate_caches()
    assert deltalog._live_adds_no_spark(path) == before_live
    assert snapshot_state(eng) == before_rows
    # delete the compacted range's individual commits: the only way the
    # replay can still be correct is by actually reading the compaction
    delete_commits(path, range(1, 5))
    eng.invalidate_caches()
    assert deltalog._live_adds_no_spark(path) == before_live
    assert snapshot_state(eng) == before_rows
    # the distributed replay too (snapshot_files reads the segments)
    paths = sorted(
        r["path"] for r in deltalog.snapshot_files(spark, path).collect()
    )
    assert paths == sorted(before_live)


def test_latest_version_unaffected(spark, tmp_path, lineitem):
    path, eng = build_table(spark, tmp_path, lineitem)
    assert deltalog.latest_version(path) == 4
    eng.compact_log("t", 0, 4)
    assert deltalog.latest_version(path) == 4


def test_metadata_protocol_txn_domain_through_compaction(spark, tmp_path, lineitem):
    path = str(tmp_path / "meta")
    slim = lineitem.select("l_orderkey", "l_quantity", "l_returnflag")
    write_governed_table(spark, slim.limit(40).repartition(1), path, ["l_returnflag"])
    eng = mk_engine(spark, path, checkpoint_interval=0)
    eng.set_table_properties("t", {"delta.appendOnly": "false", "custom.tag": "v1"})
    eng.enable_clustering("t", ["l_quantity"])  # protocol upgrade + domain
    eng.write_table(
        "t", slim.limit(5), mode="append", txn={"appId": "app-1", "version": 7}
    )
    end = deltalog.latest_version(path)
    proto0 = deltalog.table_protocol_no_spark(path)
    conf0 = deltalog.table_configuration_no_spark(path)
    dom0 = deltalog.live_domain_metadata(path)
    txn0 = deltalog.all_txn_versions(path)
    assert txn0 == {"app-1": 7} and "delta.clustering" in dom0
    eng.compact_log("t", 0, end)
    delete_commits(path, range(0, end + 1))
    eng.invalidate_caches()
    assert deltalog.table_protocol_no_spark(path) == proto0
    assert deltalog.table_configuration_no_spark(path) == conf0
    assert deltalog.live_domain_metadata(path) == dom0
    assert deltalog.all_txn_versions(path) == txn0
    assert deltalog.table_metadata_no_spark(path)["partitionColumns"] == [
        "l_returnflag"
    ]


def test_removed_domain_stays_removed(spark, tmp_path, lineitem):
    """A domain dropped INSIDE the range must tombstone in the compacted
    file — without the kept `removed` action it would resurrect from any
    pre-range state."""
    path = str(tmp_path / "dom")
    write_governed_table(
        spark,
        lineitem.select("l_orderkey", "l_quantity", "l_returnflag")
        .limit(20)
        .repartition(1),
        path,
        ["l_returnflag"],
    )
    eng = mk_engine(spark, path, checkpoint_interval=0)
    eng.enable_clustering("t", ["l_quantity"])  # v1+v2 (protocol, domain)
    # drop the domain via a raw domainMetadata tombstone commit
    v = deltalog.latest_version(path) + 1
    with open(
        os.path.join(path, "_delta_log", f"{v:020d}.json"), "w", encoding="utf-8"
    ) as f:
        f.write(
            json.dumps(
                {
                    "domainMetadata": {
                        "domain": "delta.clustering",
                        "configuration": "{}",
                        "removed": True,
                    }
                }
            )
            + "\n"
        )
    assert "delta.clustering" not in deltalog.live_domain_metadata(path)
    eng.compact_log("t", 1, v)
    compacted = os.path.join(
        path, "_delta_log", f"{1:020d}.{v:020d}.compacted.json"
    )
    assert '"removed": true' in open(compacted).read().lower()
    delete_commits(path, range(1, v + 1))
    assert "delta.clustering" not in deltalog.live_domain_metadata(path)


def test_time_travel_inside_range_uses_commits(spark, tmp_path, lineitem):
    path, eng = build_table(spark, tmp_path, lineitem)
    at_v2 = sorted(
        r["path"]
        for r in deltalog.snapshot_files(spark, path, version=2).collect()
    )
    eng.compact_log("t", 0, 4)
    # commits retained: a version strictly inside the compacted range still
    # replays exactly (segments bound by max_version skip the compaction)
    assert (
        sorted(
            r["path"]
            for r in deltalog.snapshot_files(spark, path, version=2).collect()
        )
        == at_v2
    )
    # once the commits are gone, interior versions are honestly gone too...
    delete_commits(path, range(0, 5))
    with pytest.raises(ValueError, match="no longer reproducible"):
        deltalog.snapshot_files(spark, path, version=2).collect()
    # ...but the range ENDPOINT stays reproducible through the compaction
    assert deltalog.snapshot_files(spark, path, version=4).count() > 0


def test_compaction_below_checkpoint_is_ignored(spark, tmp_path, lineitem):
    """A compaction whose range starts at/below the seeding checkpoint must
    not replay (its latest-in-range metaData could be staler than the
    checkpoint's)."""
    path, eng = build_table(spark, tmp_path, lineitem)
    eng.compact_log("t", 0, 3)
    deltalog.write_checkpoint(spark, path)  # checkpoint at v4
    segs = deltalog.log_segments(path, 4)
    assert segs == []  # nothing after the checkpoint, compaction unused
    live = deltalog._live_adds_no_spark(path)
    assert sorted(live) == sorted(
        r["path"] for r in deltalog.snapshot_files(spark, path).collect()
    )


def test_log_segments_greedy_longest(spark, tmp_path, lineitem):
    path, eng = build_table(spark, tmp_path, lineitem)
    eng.compact_log("t", 1, 2)
    eng.compact_log("t", 1, 4)
    segs = deltalog.log_segments(path)
    assert [(s, e) for s, e, _p in segs] == [(0, 0), (1, 4)]
    # bounded walk cannot use a range crossing the bound
    segs = deltalog.log_segments(path, max_version=3)
    assert [(s, e) for s, e, _p in segs] == [(0, 0), (1, 2), (3, 3)]


def test_foreign_compacted_file(spark, tmp_path, lineitem):
    """Hand-authored compaction in a foreign layout (unpadded range names,
    interleaved action order) — readers must accept the spec shape, not
    this engine's writer idiom."""
    path, eng = build_table(spark, tmp_path, lineitem)
    d = os.path.join(path, "_delta_log")
    state_before = deltalog._live_adds_no_spark(path)
    rows_before = snapshot_state(eng)
    # reconcile commits 1..4 by hand, emit adds before the metaData line
    actions = []
    for v in range(1, 5):
        with open(os.path.join(d, f"{v:020d}.json")) as f:
            actions += [json.loads(x) for x in f if x.strip()]
    from delta_lake_proxy_spark.dv import dv_unique_id

    state: dict = {}
    for a in actions:
        if a.get("add"):
            state[(a["add"]["path"], dv_unique_id(a["add"].get("deletionVector")))] = (
                "add",
                a["add"],
            )
        elif a.get("remove"):
            state[
                (a["remove"]["path"], dv_unique_id(a["remove"].get("deletionVector")))
            ] = ("remove", a["remove"])
    with open(os.path.join(d, "1.4.compacted.json"), "w") as f:
        for kind, act in state.values():
            f.write(json.dumps({kind: act}) + "\n")
    delete_commits(path, range(1, 5))
    eng.invalidate_caches()
    assert deltalog._live_adds_no_spark(path) == state_before
    assert snapshot_state(eng) == rows_before


def test_unknown_action_refuses_compaction(spark, tmp_path, lineitem):
    path, eng = build_table(spark, tmp_path, lineitem)
    v = deltalog.latest_version(path) + 1
    with open(os.path.join(path, "_delta_log", f"{v:020d}.json"), "w") as f:
        f.write(json.dumps({"futureAction": {"x": 1}}) + "\n")
    with pytest.raises(UnsupportedProtocolError, match="futureAction"):
        eng.compact_log("t", 0, v)


def test_missing_commit_refuses_compaction(spark, tmp_path, lineitem):
    path, eng = build_table(spark, tmp_path, lineitem)
    with pytest.raises(ValueError, match="not retained"):
        deltalog.write_log_compaction(path, 0, 99)


def test_cleanup_retires_covered_compactions(spark, tmp_path, lineitem):
    path, eng = build_table(spark, tmp_path, lineitem)
    eng.compact_log("t", 1, 4)
    deltalog.write_checkpoint(spark, path)  # checkpoint at v4 covers [1,4]
    removed = eng.cleanup_log("t", retention_hours=0)
    assert removed > 0
    d = os.path.join(path, "_delta_log")
    assert not any(name.endswith(".compacted.json") for name in os.listdir(d))
    assert eng.read_table("t").count() == len(snapshot_state(eng))


def test_auto_compaction_interval(spark, tmp_path, lineitem):
    path = str(tmp_path / "auto")
    write_governed_table(
        spark, lineitem.limit(20).repartition(1), path, ["l_returnflag"]
    )
    eng = mk_engine(
        spark, path, checkpoint_interval=0, log_compaction_interval=3
    )
    for i in range(6):
        eng.write_table("t", lineitem.limit(3), mode="append")
    d = os.path.join(path, "_delta_log")
    comps = sorted(n for n in os.listdir(d) if n.endswith(".compacted.json"))
    assert comps == [
        f"{1:020d}.{3:020d}.compacted.json",
        f"{4:020d}.{6:020d}.compacted.json",
    ]
    # and the tail replays through them once the commits retire
    state = deltalog._live_adds_no_spark(path)
    delete_commits(path, range(1, 7))
    eng.invalidate_caches()
    assert deltalog._live_adds_no_spark(path) == state


def test_dv_table_compaction(spark, tmp_path, lineitem):
    """DV identity (path, dvUniqueId) must survive reconciliation: a DV
    update inside the range keeps exactly the newest DV per path."""
    path = str(tmp_path / "dv")
    write_governed_table(
        spark,
        lineitem.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .limit(50)
        .repartition(1),
        path,
        ["l_returnflag"],
    )
    eng = mk_engine(spark, path, checkpoint_interval=0)
    eng.enable_deletion_vectors("t")
    eng.delete("t", F.col("l_quantity") > 40)  # DV write
    eng.delete("t", F.col("l_quantity") > 30)  # DV update (same files)
    rows = snapshot_state(eng)
    end = deltalog.latest_version(path)
    eng.compact_log("t", 0, end)
    delete_commits(path, range(0, end + 1))
    eng.invalidate_caches()
    assert snapshot_state(eng) == rows
    assert max(t[2] for t in rows) <= 30


def test_governed_sink_auto_compaction(spark, tmp_path, gov_table, lineitem):
    """The DataSource writer's logCompactionInterval option: one commit per
    batch is the spec's motivating case for log compaction, and the sink's
    driver-side commit has no SparkSession for a checkpoint — the pure-
    Python compactor covers the tail instead."""
    import shutil

    from delta_lake_proxy_spark.sources.governed import GovernedDataSource

    try:
        spark.dataSource.register(GovernedDataSource)
    except Exception:
        pass
    path = str(tmp_path / "sink")
    shutil.copytree(gov_table, path)
    v0 = deltalog.latest_version(path)
    cols = [f.name for f in spark.read.parquet(path).schema.fields]
    batch = lineitem.limit(4).select(*cols)
    for _ in range(4):
        (
            batch.write.format("governed")
            .mode("append")
            .option("path", path)
            .option("logCompactionInterval", "2")
            .save()
        )
    d = os.path.join(path, "_delta_log")
    comps = sorted(n for n in os.listdir(d) if n.endswith(".compacted.json"))
    assert comps == [
        f"{v0 + 1:020d}.{v0 + 2:020d}.compacted.json",
        f"{v0 + 3:020d}.{v0 + 4:020d}.compacted.json",
    ]
    # tail replays through the compactions once the commits retire
    state = deltalog._live_adds_no_spark(path)
    delete_commits(path, range(v0 + 1, v0 + 5))
    assert deltalog._live_adds_no_spark(path) == state


def test_compaction_preserves_last_commit_info_under_ict(spark, tmp_path, lineitem):
    """ADVICE r11 #2: with In-Commit Timestamps enabled, the compaction
    stands in for commit `end` during replay, so the range's LAST
    commitInfo (whose inCommitTimestamp is the authoritative time of
    `end`) must survive into the compacted file — first line, the spec's
    fixed position. Without ICT, commitInfo stays dropped."""
    from pyspark.sql import Row

    path = str(tmp_path / "lc_ict")
    write_governed_table(
        spark, spark.createDataFrame([Row(id=1), Row(id=2)]), path, []
    )
    eng = mk_engine(spark, path, checkpoint_interval=0)
    eng.enable_in_commit_timestamps("t")  # v1
    eng.write_table("t", spark.createDataFrame([Row(id=3)]), mode="append")  # v2
    eng.write_table("t", spark.createDataFrame([Row(id=4)]), mode="append")  # v3
    # the authoritative ICT of v3, straight from its raw commit
    with open(os.path.join(path, "_delta_log", f"{3:020d}.json")) as f:
        ict3 = json.loads(f.readline())["commitInfo"]["inCommitTimestamp"]
    name = eng.compact_log("t", 1, 3)
    with open(os.path.join(path, "_delta_log", name)) as f:
        first = json.loads(f.readline())
    assert "commitInfo" in first
    assert first["commitInfo"]["inCommitTimestamp"] == ict3
    # replay through the compaction still serves the same rows
    before = sorted(r["id"] for r in eng.read_table("t").collect())
    delete_commits(path, [1, 2, 3])
    eng._snapshot_cache.invalidate()
    got = sorted(r["id"] for r in mk_engine(spark, path).read_table("t").collect())
    assert got == before

    # non-ICT table: commitInfo stays replay-irrelevant and dropped
    path2, eng2 = build_table(spark, tmp_path, lineitem, name="lc_noict")
    name2 = eng2.compact_log("t", 1, 4)
    with open(os.path.join(path2, "_delta_log", name2)) as f:
        kinds = {next(iter(json.loads(l))) for l in f if l.strip()}
    assert "commitInfo" not in kinds


def test_compaction_ict_resolved_as_of_range_end(spark, tmp_path):
    """Review r12 #4: the ICT decision must use the configuration AS OF
    the range end, not the tip — disabling ICT after the range must not
    drop the range's authoritative commitInfo from the compaction."""
    from pyspark.sql import Row

    path = str(tmp_path / "lc_ict_off")
    write_governed_table(spark, spark.createDataFrame([Row(id=1)]), path, [])
    eng = mk_engine(spark, path, checkpoint_interval=0)
    eng.enable_in_commit_timestamps("t")  # v1 (metaData carries ICT on)
    eng.write_table("t", spark.createDataFrame([Row(id=2)]), mode="append")  # v2
    eng.write_table("t", spark.createDataFrame([Row(id=3)]), mode="append")  # v3
    # tip flips the property OFF after the range
    eng.set_table_properties("t", {}, unset=["delta.enableInCommitTimestamps"])  # v4
    assert (
        deltalog.table_configuration_no_spark(path).get(
            "delta.enableInCommitTimestamps"
        )
        is None
    )
    # range [2,3] carries no metaData; resolution must find v1's config
    assert (
        deltalog.configuration_at(path, 3).get("delta.enableInCommitTimestamps")
        == "true"
    )
    with open(os.path.join(path, "_delta_log", f"{3:020d}.json")) as f:
        ict3 = json.loads(f.readline())["commitInfo"]["inCommitTimestamp"]
    name = eng.compact_log("t", 2, 3)
    with open(os.path.join(path, "_delta_log", name)) as f:
        first = json.loads(f.readline())
    assert first.get("commitInfo", {}).get("inCommitTimestamp") == ict3
