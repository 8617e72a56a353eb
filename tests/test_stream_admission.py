"""Admission-controlled streaming bootstrap (round-7 verdict item 2).

The governed log-cursor stream must bound each micro-batch with
``maxFilesPerTrigger`` / ``maxBytesPerTrigger`` and split the initial
snapshot (and large commits) across checkpointable ``(version, index)``
offsets — Delta's public streaming-source semantics. Without this, batch 1
of a 100 TB table is the entire table in one micro-batch.

Also pins the non-append-change contract (ADVICE r6): a remove outside the
current window fails the stream unless ignoreDeletes/ignoreChanges is set.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig, deltalog
from delta_lake_proxy_spark.sources.governed import GovernedStreamReader


def _schema(spark, path):
    from delta_lake_proxy_spark.sources.governed import _logged_schema

    return _logged_schema(path)


def _served(reader, start, end) -> list[str]:
    return sorted(
        fp.full_path
        for p in reader.partitions(start, end)
        for fp in p.files
    )


def _drain(reader, max_triggers: int = 200) -> tuple[list[list[str]], dict]:
    """Drive initialOffset/latestOffset/partitions like the microbatch loop;
    returns (per-batch file lists, final offset)."""
    pos = reader.initialOffset()
    batches: list[list[str]] = []
    for _ in range(max_triggers):
        nxt = reader.latestOffset()
        if nxt == pos:
            break
        batches.append(_served(reader, pos, nxt))
        reader.commit(nxt)
        pos = nxt
    return batches, pos


@pytest.fixture()
def table(spark, gov_table, tmp_path):
    path = str(tmp_path / "adm_t")
    shutil.copytree(gov_table, path)
    return path


def test_bootstrap_splits_snapshot(spark, table):
    """maxFilesPerTrigger=1: the initial snapshot arrives one file per
    micro-batch, every live file exactly once, offsets carrying the
    (version, index, snapshot) shape."""
    schema = _schema(spark, table)
    r = GovernedStreamReader(schema, {"path": table, "maxFilesPerTrigger": "1"})
    live = sorted(
        os.path.join(table, p) for p in deltalog._live_adds_no_spark(table)
    )
    batches, pos = _drain(r)
    assert all(len(b) == 1 for b in batches)
    assert sorted(f for b in batches for f in b) == live  # exactly once each
    assert len(batches) == len(live)
    assert pos == {
        "version": deltalog.latest_version(table),
        "index": len(live),
        "snapshot": True,
    }


def test_bootstrap_respects_byte_cap(spark, table):
    """maxBytesPerTrigger below the smallest file still admits exactly one
    file per trigger (first-file rule), so the stream can never stall."""
    schema = _schema(spark, table)
    r = GovernedStreamReader(schema, {"path": table, "maxBytesPerTrigger": "1"})
    live = sorted(os.path.join(table, p) for p in deltalog._live_adds_no_spark(table))
    batches, _ = _drain(r)
    assert all(len(b) == 1 for b in batches)
    assert sorted(f for b in batches for f in b) == live


def test_incremental_commits_paced(spark, table, lineitem):
    """After bootstrap, append commits are served through bounded windows:
    a 3-file commit with maxFilesPerTrigger=2 takes two batches."""
    schema = _schema(spark, table)
    r = GovernedStreamReader(schema, {"path": table, "maxFilesPerTrigger": "2"})
    _, pos = _drain(r)
    eng = Engine(spark, EngineConfig(table_mapping={"t": table}, read_only=False))
    cols = [f.name for f in schema.fields]
    extra = lineitem.limit(90).select(*cols).repartition(3)
    before = set(deltalog._live_adds_no_spark(table))
    eng.write_table("t", extra, mode="append")
    v = deltalog.latest_version(table)
    n_new = len(set(deltalog._live_adds_no_spark(table)) - before)
    assert n_new >= 3
    batches = []
    for _ in range(n_new + 2):
        nxt = r.latestOffset()
        if nxt == pos:
            break
        batches.append(_served(r, pos, nxt))
        pos = nxt
    new_files = [f for b in batches for f in b]
    assert len(new_files) == len(set(new_files)) == n_new  # exactly once each
    assert all(len(b) <= 2 for b in batches)
    assert len(batches) == -(-n_new // 2)  # ceil(n/2) bounded windows
    assert pos["version"] == v


def test_restart_mid_snapshot_exactly_once(spark, table):
    """A restart mid-bootstrap with a pending batch replays EXACTLY that
    batch (same offsets => same files) and pacing continues bounded — no
    file skipped, none served twice."""
    schema = _schema(spark, table)
    opts = {"path": table, "maxFilesPerTrigger": "1"}
    a = GovernedStreamReader(schema, opts)
    pos = a.initialOffset()
    served: list[str] = []
    o1 = a.latestOffset()
    served += _served(a, pos, o1)
    o2 = a.latestOffset()  # planned but "crashed" before commit

    # fresh reader = restarted query; Spark replays the pending batch (o1,o2]
    b = GovernedStreamReader(schema, opts)
    replay = _served(b, o1, o2)
    assert replay == _served(a, o1, o2)  # deterministic window split
    served += replay
    b.commit(o2)
    pos = o2
    for _ in range(200):
        nxt = b.latestOffset()
        if nxt == pos:
            break
        batch = _served(b, pos, nxt)
        assert len(batch) <= 1
        served += batch
        pos = nxt
    live = sorted(os.path.join(table, p) for p in deltalog._live_adds_no_spark(table))
    assert sorted(served) == live
    assert len(served) == len(set(served))


def test_clean_restart_resumes_bounded(spark, table):
    """Clean restart: Spark's AcceptsLatestSeenOffset delivers the
    checkpointed offset as a (off, off) no-op partitions call BEFORE the
    first latestOffset — pacing resumes bounded from exactly there."""
    schema = _schema(spark, table)
    v = deltalog.latest_version(table)
    live = sorted(os.path.join(table, p) for p in deltalog._live_adds_no_spark(table))
    ckpt = {"version": v, "index": 1, "snapshot": True}  # first file committed
    fresh = GovernedStreamReader(schema, {"path": table, "maxFilesPerTrigger": "1"})
    assert fresh.partitions(ckpt, ckpt) == []  # setLatestSeenOffset delivery
    served, pos = [], ckpt
    for _ in range(200):
        nxt = fresh.latestOffset()
        if nxt == pos:
            break
        batch = _served(fresh, pos, nxt)
        assert len(batch) == 1  # bounded immediately, no catch-up blob
        served += batch
        pos = nxt
    assert served == live[1:]  # remainder exactly once, nothing re-served

    # legacy (un-indexed) checkpointed end offsets still compose: the range
    # (mid-snapshot, legacy tip] serves the remainder + later commits
    r2 = GovernedStreamReader(schema, {"path": table, "maxFilesPerTrigger": "1"})
    got = _served(r2, ckpt, {"version": v})
    assert got == live[1:]


def test_non_append_commit_fails_stream(spark, table):
    """A DELETE/rewrite commit (remove of a file outside the window) fails
    the paced stream by default and is tolerated with ignoreChanges."""
    schema = _schema(spark, table)
    r = GovernedStreamReader(schema, {"path": table, "maxFilesPerTrigger": "100"})
    _, pos = _drain(r)
    eng = Engine(spark, EngineConfig(table_mapping={"t": table}, read_only=False))
    eng.delete("t", F.col("l_returnflag") == "A")  # copy-on-write rewrite
    with pytest.raises(ValueError, match="ignoreDeletes"):
        r.latestOffset()

    tolerant = GovernedStreamReader(
        schema, {"path": table, "maxFilesPerTrigger": "100", "ignoreChanges": "true"}
    )
    tolerant.partitions(pos, pos)  # seed cursor at the pre-delete position
    nxt = tolerant.latestOffset()  # paces INTO the rewrite commit: no raise
    assert nxt != pos
    served = _served(tolerant, pos, nxt)
    assert all(f.endswith(".parquet") for f in served)


def test_non_append_commit_fails_legacy_window(spark, table):
    """Same contract on the legacy (un-paced) multi-commit window path."""
    schema = _schema(spark, table)
    v0 = deltalog.latest_version(table)
    any_live = next(iter(deltalog._live_adds_no_spark(table)))
    deltalog.write_commit(table, [], [{"path": any_live}])
    v1 = deltalog.latest_version(table)
    r = GovernedStreamReader(schema, {"path": table})
    with pytest.raises(ValueError, match="non-append"):
        r.partitions({"version": v0}, {"version": v1})
    tolerant = GovernedStreamReader(schema, {"path": table, "ignoreDeletes": "true"})
    assert tolerant.partitions({"version": v0}, {"version": v1}) == []


def test_end_to_end_paced_stream(spark, table, tmp_path):
    """Real streaming query with maxFilesPerTrigger=1: the sink converges to
    the full snapshot and the checkpoint records MULTIPLE micro-batches —
    the bootstrap actually split."""
    from delta_lake_proxy_spark.sources.governed import GovernedDataSource

    spark.dataSource.register(GovernedDataSource)
    n_live = len(deltalog._live_adds_no_spark(table))
    assert n_live >= 2
    want = (
        spark.read.format("governed").option("path", table).load().count()
    )
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("governed")
        .option("path", table)
        .option("maxFilesPerTrigger", "1")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("adm_e2e")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("adm_e2e").count() >= want:
                break
            time.sleep(0.5)
        assert spark.table("adm_e2e").count() == want
    finally:
        q.stop()
    offsets = [f for f in os.listdir(os.path.join(ckpt, "offsets")) if f.isdigit()]
    assert len(offsets) >= n_live  # one bounded batch per file (plus maybe empty)


def test_starting_version_skips_snapshot(spark, table, lineitem):
    """startingVersion=N (Delta public option): no initial snapshot — the
    stream serves changes from commit N on."""
    schema = _schema(spark, table)
    eng = Engine(spark, EngineConfig(table_mapping={"t": table}, read_only=False))
    cols = [f.name for f in schema.fields]
    before = set(deltalog._live_adds_no_spark(table))
    eng.write_table("t", lineitem.limit(20).select(*cols), mode="append")
    v_new = deltalog.latest_version(table)
    new_files = sorted(
        os.path.join(table, p)
        for p in set(deltalog._live_adds_no_spark(table)) - before
    )
    r = GovernedStreamReader(schema, {"path": table, "startingVersion": str(v_new)})
    pos = r.initialOffset()
    assert pos == {"version": v_new - 1}
    nxt = r.latestOffset()
    assert _served(r, pos, nxt) == new_files  # snapshot never served

    # "latest": only commits made AFTER the stream starts
    r2 = GovernedStreamReader(schema, {"path": table, "startingVersion": "latest"})
    pos2 = r2.initialOffset()
    assert r2.latestOffset() == pos2  # nothing yet
    eng.write_table("t", lineitem.limit(5).select(*cols), mode="append")
    nxt2 = r2.latestOffset()
    served2 = _served(r2, pos2, nxt2)
    assert len(served2) >= 1
    assert set(served2).isdisjoint(set(new_files))


def test_starting_timestamp_resolves_first_commit(spark, table, lineitem):
    import time

    schema = _schema(spark, table)
    eng = Engine(spark, EngineConfig(table_mapping={"t": table}, read_only=False))
    cols = [f.name for f in schema.fields]
    time.sleep(0.05)
    t_between = time.time() * 1000
    time.sleep(0.05)
    before = set(deltalog._live_adds_no_spark(table))
    eng.write_table("t", lineitem.limit(10).select(*cols), mode="append")
    new_files = sorted(
        os.path.join(table, p)
        for p in set(deltalog._live_adds_no_spark(table)) - before
    )
    r = GovernedStreamReader(
        schema, {"path": table, "startingTimestamp": str(t_between / 1000.0)}
    )
    pos = r.initialOffset()
    nxt = r.latestOffset()
    assert _served(r, pos, nxt) == new_files  # only the post-timestamp commit


def test_mid_stream_schema_change_fails(spark, table, lineitem):
    """A commit that EVOLVES the table schema fails an already-running
    stream (Delta semantics: restart to pick up the new schema); historical
    re-emissions of the same schema pass."""
    old_schema = _schema(spark, table)
    r = GovernedStreamReader(old_schema, {"path": table})
    _drain_legacy_pos = r.initialOffset()
    v0 = deltalog.latest_version(table)
    eng = Engine(spark, EngineConfig(table_mapping={"t": table}, read_only=False))
    cols = [f.name for f in old_schema.fields]
    # same-schema append: metaData re-emitted identically -> no failure
    eng.write_table("t", lineitem.limit(5).select(*cols), mode="append")
    v1 = deltalog.latest_version(table)
    assert r.partitions({"version": v0}, {"version": v1})
    # evolving append: new column -> the old stream must fail loudly
    evolved = lineitem.limit(5).select(*cols).withColumn("extra_col", F.lit(1))
    eng.write_table("t", evolved, mode="append")
    v2 = deltalog.latest_version(table)
    with pytest.raises(ValueError, match="schema .* changed"):
        r.partitions({"version": v1}, {"version": v2})
    # a NEW stream opened with the evolved schema reads fine
    fresh_schema = _schema(spark, table)
    r2 = GovernedStreamReader(fresh_schema, {"path": table})
    assert r2.partitions({"version": v1}, {"version": v2})


def test_offset_arithmetic_property(spark):
    """Model-based check of the offset arithmetic: for RANDOM commit
    histories, pacing limits, crashes mid-batch, and clean restarts, a
    faithful simulation of the micro-batch loop (including the
    AcceptsLatestSeenOffset delivery and pending-batch replay) must deliver
    every file EXACTLY once with every batch within the file cap."""
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    event = st.one_of(
        st.tuples(st.just("append"), st.integers(min_value=0, max_value=4)),
        st.just(("crash_mid",)),
        st.just(("restart",)),
        st.just(("tick",)),
    )

    @given(
        pre_commits=st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=4),
        max_files=st.one_of(st.none(), st.integers(min_value=1, max_value=5)),
        events=st.lists(event, max_size=8),
    )
    @settings(
        max_examples=40,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(pre_commits, max_files, events):
        root = tempfile.mkdtemp(prefix="offprop_")
        try:
            table = os.path.join(root, "t")
            os.makedirs(table)
            all_files: list[str] = []
            counter = [0]

            def append_commit(n):
                adds = []
                for _ in range(n):
                    rel = f"part=A/f{counter[0]:05d}.parquet"
                    counter[0] += 1
                    adds.append(
                        {"path": rel, "partitionValues": {"part": "A"}, "size": 1}
                    )
                    all_files.append(os.path.join(table, rel))
                deltalog.write_commit(table, adds)

            for n in pre_commits:
                append_commit(n)

            opts = {"path": table}
            if max_files is not None:
                opts["maxFilesPerTrigger"] = str(max_files)

            reader = GovernedStreamReader(None, dict(opts))
            committed = reader.initialOffset()  # fresh query
            wal_end = committed
            pending = False
            served: list[str] = []

            def files_of(start, end):
                return [
                    fp.full_path
                    for p in reader.partitions(start, end)
                    for fp in p.files
                ]

            def tick():
                nonlocal wal_end, committed, pending
                assert not pending
                nxt = reader.latestOffset()
                if nxt == wal_end:
                    return False
                batch = files_of(wal_end, nxt)
                if max_files is not None:
                    assert len(batch) <= max_files
                served.extend(batch)
                wal_end = nxt
                reader.commit(nxt)
                committed = nxt
                return True

            for ev in events:
                if ev[0] == "append":
                    append_commit(ev[1])
                elif ev[0] == "tick":
                    if not pending:
                        tick()
                elif ev[0] == "crash_mid":
                    # plan a batch (WAL advances) but crash before running it
                    if not pending:
                        nxt = reader.latestOffset()
                        if nxt != wal_end:
                            pending = True
                            prev, wal_end = wal_end, nxt
                            pending_range = (prev, nxt)
                elif ev[0] == "restart":
                    reader = GovernedStreamReader(None, dict(opts))
                    # AcceptsLatestSeenOffset: checkpointed offset delivered
                    # as a (off, off) no-op before anything else
                    assert reader.partitions(wal_end, wal_end) == []
                    if pending:
                        batch = files_of(*pending_range)
                        if max_files is not None:
                            assert len(batch) <= max_files
                        served.extend(batch)
                        reader.commit(wal_end)
                        committed = wal_end
                        pending = False
            # crash with a pending batch at the end: replay it like a restart
            if pending:
                reader = GovernedStreamReader(None, dict(opts))
                assert reader.partitions(wal_end, wal_end) == []
                served.extend(files_of(*pending_range))
                reader.commit(wal_end)
                pending = False
            # drain to quiescence
            for _ in range(200):
                if not tick():
                    break
            assert sorted(served) == sorted(all_files)  # exactly once each
            assert len(served) == len(set(served))
        finally:
            shutil.rmtree(root, ignore_errors=True)

    run()


def test_available_now_runs_resume_across_restarts(spark, table, tmp_path):
    """Repeated availableNow runs over ONE checkpoint: every run is a real
    query restart (AcceptsLatestSeenOffset path); the paced bootstrap
    resumes where the last run stopped and the sink converges to exactly
    the snapshot — no file lost, none duplicated."""
    from delta_lake_proxy_spark.sources.governed import GovernedDataSource

    spark.dataSource.register(GovernedDataSource)
    n_live = len(deltalog._live_adds_no_spark(table))
    want = spark.read.format("governed").option("path", table).load().count()
    ckpt = str(tmp_path / "an_ckpt")
    out = str(tmp_path / "an_out")
    for _ in range(n_live + 3):
        q = (
            spark.readStream.format("governed")
            .option("path", table)
            .option("maxFilesPerTrigger", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()
        if spark.read.parquet(out).count() >= want:
            break
    assert spark.read.parquet(out).count() == want
