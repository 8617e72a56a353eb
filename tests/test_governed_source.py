"""format("governed") Python Data Source: the reference's FILE-level serving
model (allowed-file-set from log replay, forbidden files never opened) as a
Spark 4 DataSource. Contrast: Engine.read_table enforces at row level."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig, acl


@pytest.fixture(scope="module")
def registered(spark):
    from delta_lake_proxy_spark.sources.governed import GovernedDataSource

    spark.dataSource.register(GovernedDataSource)
    return spark


def _read(spark, path, dnf=None, target_task_bytes=None):
    r = spark.read.format("governed").option("path", path)
    if dnf is not None:
        r = r.option("dnf", json.dumps(dnf))
    if target_task_bytes is not None:
        # one file per task makes getNumPartitions() observe the FILE set
        r = r.option("target_task_bytes", str(target_task_bytes))
    return r.load()


def test_governed_source_matches_engine(registered, spark, gov_table, lineitem):
    eng = Engine(spark, EngineConfig(table_mapping={"t": gov_table}))
    base = eng.read_table("t")
    out = _read(spark, gov_table)
    assert out.count() == base.count()
    assert sorted(out.columns) == sorted(base.columns)
    # partition column values materialize from the add actions
    flags = {r[0] for r in out.select("l_returnflag").distinct().collect()}
    assert flags == {"A", "N", "R"}


def test_governed_source_file_level_acl(registered, spark, gov_table, lineitem):
    dnf = [{"l_returnflag": "A"}]
    out = _read(spark, gov_table, dnf, target_task_bytes=1)
    want = lineitem.filter(F.col("l_returnflag") == "A").count()
    assert out.count() == want
    # file-level: only the A partition's file becomes an input partition
    assert out.rdd.getNumPartitions() == 1
    # blanked grant ([{}]) fails CLOSED at the file tier too
    assert _read(spark, gov_table, [{}]).count() == 0


def test_governed_source_typed_partition_columns(registered, spark, ym_table):
    out = _read(spark, ym_table, [{"year": "1995", "month": "3"}])
    row = out.select("year", "month").distinct().collect()
    assert [(r["year"], r["month"]) for r in row] == [(1995, 3)]
    assert dict(out.dtypes)["year"] in ("int", "bigint")


def test_governed_source_filter_pushdown_prunes_files(registered, spark, gov_table, lineitem):
    """A WHERE on the partition column must shrink the FILE set (advisory
    pruning via pushFilters), while Spark still row-filters — results equal
    the plain filtered read."""
    full = _read(spark, gov_table, target_task_bytes=1)
    n_files_full = full.rdd.getNumPartitions()
    filtered = _read(spark, gov_table, target_task_bytes=1).filter(F.col("l_returnflag") == "A")
    want = lineitem.filter(F.col("l_returnflag") == "A").count()
    assert filtered.count() == want
    assert filtered.rdd.getNumPartitions() < n_files_full
    # stats-range pushdown on a data column is conservative but correct
    hi = lineitem.agg(F.max("l_quantity")).collect()[0][0]
    over = _read(spark, gov_table, target_task_bytes=1).filter(F.col("l_quantity") > hi)
    assert over.count() == 0
    assert over.rdd.getNumPartitions() <= n_files_full


def test_governed_source_bin_packs_files_into_tasks(registered, spark, gov_table):
    """Tasks are sized by cumulative logged bytes (target_task_bytes,
    default 128 MiB): the 3 small partition files pack into ONE task by
    default, and a 1-byte target degenerates to one file per task — a
    million-small-file table must not schedule a million tasks."""
    assert _read(spark, gov_table).rdd.getNumPartitions() == 1
    assert _read(spark, gov_table, target_task_bytes=1).rdd.getNumPartitions() == 3
    # row results are identical either way
    a = _read(spark, gov_table).orderBy("l_orderkey", "l_linenumber").collect()
    b = (
        _read(spark, gov_table, target_task_bytes=1)
        .orderBy("l_orderkey", "l_linenumber")
        .collect()
    )
    assert a == b


def test_governed_source_reads_through_checkpoint(registered, spark, gov_table, tmp_path):
    """After a checkpoint + pruning of pre-checkpoint JSON commits (Delta log
    cleanup), the driver-side replay must still reconstruct the full live set
    — both for format('governed') and for _live_paths_no_spark consumers."""
    import os
    import shutil

    from delta_lake_proxy_spark import deltalog

    path = str(tmp_path / "ckpt_t")
    shutil.copytree(gov_table, path)
    before_rows = _read(spark, path).count()
    live_before = sorted(deltalog._live_paths_no_spark(path))
    v = deltalog.write_checkpoint(spark, path)
    logd = deltalog.log_path(path)
    for name in os.listdir(logd):
        if name.endswith(".json") and name[:-5].isdigit() and int(name[:-5]) <= v:
            os.remove(os.path.join(logd, name))
    assert sorted(deltalog._live_paths_no_spark(path)) == live_before
    assert _read(spark, path).count() == before_rows  # schema + files via checkpoint


def test_checkpoint_with_partition_dnf(registered, spark, gov_table, lineitem, tmp_path):
    """Partition ACLs must keep working AFTER a checkpoint: the columnar
    checkpoint renders ``partitionValues`` as a list of (k, v) tuples via
    pyarrow, while JSON commits carry a dict — the replay normalizes both to
    dict so ``acl.dnf_allows`` (and file pruning) see one shape. Covers
    Engine.authorize_file AND format('governed') with a DNF post-checkpoint."""
    import os
    import shutil

    from delta_lake_proxy_spark import deltalog
    from delta_lake_proxy_spark.errors import ForbiddenByPolicyError

    path = str(tmp_path / "ckpt_dnf_t")
    shutil.copytree(gov_table, path)
    dnf = [{"l_returnflag": "A"}]
    want = lineitem.filter(F.col("l_returnflag") == "A").count()
    v = deltalog.write_checkpoint(spark, path)
    logd = deltalog.log_path(path)
    for name in os.listdir(logd):
        if name.endswith(".json") and name[:-5].isdigit() and int(name[:-5]) <= v:
            os.remove(os.path.join(logd, name))

    # replayed adds carry dict-shaped partitionValues even from the checkpoint
    for add in deltalog._live_adds_no_spark(path).values():
        assert isinstance(add.get("partitionValues") or {}, dict)

    # file-level governed source honors the DNF through the checkpoint
    out = _read(spark, path, dnf, target_task_bytes=1)
    assert out.count() == want
    assert out.rdd.getNumPartitions() == 1

    # per-request authorization: allowed partition passes, others 403
    cfg = EngineConfig(table_mapping={"t": path}, allowed_partitions={"t": dnf})
    eng = Engine(spark, cfg)
    live = deltalog._live_adds_no_spark(path)
    a_files = [
        p for p, add in live.items() if add["partitionValues"]["l_returnflag"] == "A"
    ]
    n_files = [
        p for p, add in live.items() if add["partitionValues"]["l_returnflag"] == "N"
    ]
    assert a_files and n_files
    assert eng.authorize_file("t", "anonymous", a_files[0]) is True
    with pytest.raises(ForbiddenByPolicyError):
        eng.authorize_file("t", "anonymous", n_files[0])


def test_pushdown_boolean_partition_is_not_pruned():
    """str(True) == 'True' but Delta logs 'true': raw str() comparison would
    wrongly prune the matching file of a boolean partition column."""
    from pyspark.sql import types as T
    from pyspark.sql.datasource import EqualTo, In

    from delta_lake_proxy_spark.sources.governed import GovernedReader

    reader = GovernedReader(T.StructType([]), {"path": "/nonexistent"})
    reader._pruning = [EqualTo(("flag",), True)]
    assert reader._file_may_match({"flag": "true"}, None) is True
    assert reader._file_may_match({"flag": "false"}, None) is False
    reader._pruning = [In(("flag",), (True,))]
    assert reader._file_may_match({"flag": "true"}, None) is True
    # a value type whose Delta serialization we don't reproduce: keep the file
    import datetime

    reader._pruning = [EqualTo(("d",), datetime.datetime(2024, 1, 1))]
    assert reader._file_may_match({"d": "2024-01-01 00:00:00"}, None) is True


def test_governed_reader_partition_arrow_types(tmp_path):
    """Partition columns cast through the Arrow type derived from the Spark
    field — decimal/timestamp partition columns used to ship string arrays
    against a non-string schema and fail at scan time."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from delta_lake_proxy_spark.sources.governed import (
        GovernedFilePartition,
        GovernedReader,
    )

    f = str(tmp_path / "part.parquet")
    pq.write_table(pa.table({"v": pa.array([1, 2], pa.int64())}), f)
    schema = T.StructType(
        [
            T.StructField("v", T.LongType()),
            T.StructField("d", T.DecimalType(10, 2)),
            T.StructField("ts", T.TimestampNTZType()),
        ]
    )
    reader = GovernedReader(schema, {"path": str(tmp_path)})
    part = GovernedFilePartition(f, {"d": "12.50", "ts": "2024-01-02T03:04:05"})
    tbl = pa.Table.from_batches(list(reader.read(part)))
    assert tbl.column("d").type == pa.decimal128(10, 2)
    assert pa.types.is_timestamp(tbl.column("ts").type)
    assert tbl.column("v").to_pylist() == [1, 2]


def test_dnf_allows_model():
    assert acl.dnf_allows(None, {"p": "1"}) and acl.dnf_allows([], {})
    assert not acl.dnf_allows([{}], {"p": "1"})  # configured-empty: deny
    assert acl.dnf_allows([{"p": "1"}, {}], {"p": "1", "q": "2"})
    assert not acl.dnf_allows([{"p": "1", "q": "9"}], {"p": "1", "q": "2"})


def test_governed_writer_append_and_overwrite(registered, spark, gov_table, lineitem, tmp_path):
    """df.write.format('governed'): task-written hive files + ONE atomic log
    commit; append adds rows, overwrite tombstones the old live set; the
    partition column leaves the file and comes back from the path."""
    import os
    import shutil

    from delta_lake_proxy_spark import deltalog

    path = str(tmp_path / "w_t")
    shutil.copytree(gov_table, path)
    base = _read(spark, path)
    n0 = base.count()
    v0 = deltalog.latest_version(path)
    extra = lineitem.limit(20).select(*base.columns)
    extra.write.format("governed").mode("append").option("path", path).save()
    assert deltalog.latest_version(path) == v0 + 1
    assert _read(spark, path).count() == n0 + 20
    # written files are hive-partitioned and drop the partition column
    live = deltalog._live_adds_no_spark(path)
    new_rels = [r for r in live if "part-" in r]
    assert new_rels and all(r.startswith("l_returnflag=") for r in new_rels)
    import pyarrow.parquet as pq

    assert "l_returnflag" not in pq.read_schema(
        os.path.join(path, new_rels[0])
    ).names
    # engine read agrees (log-aware, row-level)
    eng = Engine(spark, EngineConfig(table_mapping={"t": path}))
    assert eng.read_table("t").count() == n0 + 20
    # overwrite replaces the live set in one commit
    lineitem.limit(7).select(*base.columns).write.format("governed").mode(
        "overwrite"
    ).option("path", path).save()
    assert _read(spark, path).count() == 7
    # the engine's snapshot cache is TTL-bounded (reference semantics);
    # an external writer's commit shows up after invalidation/TTL
    eng.invalidate_caches()
    assert eng.read_table("t").count() == 7


def test_governed_writer_rejects_readonly_and_schema_drift(registered, spark, gov_table, lineitem, tmp_path):
    import shutil

    path = str(tmp_path / "ro_t")
    shutil.copytree(gov_table, path)
    df = lineitem.limit(5)
    with pytest.raises(Exception, match="read-only"):
        df.select(*_read(spark, path).columns).write.format("governed").mode(
            "append"
        ).option("path", path).option("readonly", "true").save()
    with pytest.raises(Exception, match="schema mismatch"):
        df.select("l_orderkey").write.format("governed").mode("append").option(
            "path", path
        ).save()


@pytest.mark.full
def test_governed_stream_writer_sink(registered, spark, gov_table, lineitem, tmp_path):
    """writeStream.format('governed'): one log commit per micro-batch through
    the same hive-file machinery; rows land and versions advance."""
    import shutil

    from delta_lake_proxy_spark import deltalog

    path = str(tmp_path / "sw_t")
    shutil.copytree(gov_table, path)
    cols = _read(spark, path).columns
    n0 = _read(spark, path).count()
    v0 = deltalog.latest_version(path)
    src = str(tmp_path / "sw_src")
    lineitem.limit(25).select(*cols).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(_read(spark, path).schema).parquet(src)
    q = (
        stream.writeStream.format("governed")
        .option("path", path)
        .option("checkpointLocation", str(tmp_path / "sw_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    assert _read(spark, path).count() == n0 + 25
    assert deltalog.latest_version(path) > v0


def test_stream_writer_txn_idempotent_replay(registered, spark, gov_table, lineitem, tmp_path):
    """Delta txn idempotence: with txnAppId, a replayed micro-batch (same
    batchId re-committed after a sink-committed/checkpoint-lost crash) is
    dropped — no double append, and its staged files are cleaned up."""
    import os
    import shutil

    from delta_lake_proxy_spark import deltalog
    from delta_lake_proxy_spark.sources.governed import (
        GovernedStreamWriter,
        GovernedWriteCommit,
    )

    path = str(tmp_path / "txn_t")
    shutil.copytree(gov_table, path)
    cols = _read(spark, path).columns
    n0 = _read(spark, path).count()
    src = str(tmp_path / "txn_src")
    lineitem.limit(10).select(*cols).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(_read(spark, path).schema).parquet(src)
    q = (
        stream.writeStream.format("governed")
        .option("path", path)
        .option("txnAppId", "app-1")
        .option("checkpointLocation", str(tmp_path / "txn_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    assert _read(spark, path).count() == n0 + 10
    assert deltalog.last_txn_version(path, "app-1") == 0  # batch 0 recorded
    n_files = len(deltalog._live_adds_no_spark(path))

    # simulate the replay: same appId, same batchId, fresh writer
    w = GovernedStreamWriter({"path": path, "txnappid": "app-1"}, _read(spark, path).schema)
    import pyarrow.parquet as pq

    rel = "l_returnflag=A/replayed-part.parquet"
    full = os.path.join(path, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    any_live = next(iter(deltalog._live_adds_no_spark(path)))
    shutil.copyfile(os.path.join(path, any_live), full)
    w.commit([GovernedWriteCommit(rel_paths=[rel])], batchId=0)
    # replay dropped: row count unchanged, staged file deleted, no new commit
    assert _read(spark, path).count() == n0 + 10
    assert not os.path.exists(full)
    assert len(deltalog._live_adds_no_spark(path)) == n_files
    # a NEW batchId commits normally
    shutil.copyfile(os.path.join(path, any_live), full)
    w.commit([GovernedWriteCommit(rel_paths=[rel])], batchId=1)
    assert deltalog.last_txn_version(path, "app-1") == 1
    assert len(deltalog._live_adds_no_spark(path)) == n_files + 1


def test_stream_writer_txn_survives_cleanup(registered, spark, gov_table, lineitem, tmp_path):
    """Exactly-once must survive log maintenance: stream a batch -> checkpoint
    -> cleanup_log(0) removes every pre-checkpoint JSON commit -> a REPLAYED
    batch is STILL dropped (txn watermark read from the checkpoint)."""
    import os
    import shutil

    from delta_lake_proxy_spark import deltalog
    from delta_lake_proxy_spark.sources.governed import (
        GovernedStreamWriter,
        GovernedWriteCommit,
    )

    path = str(tmp_path / "txn_clean_t")
    shutil.copytree(gov_table, path)
    schema = _read(spark, path).schema
    n0 = _read(spark, path).count()
    w = GovernedStreamWriter({"path": path, "txnappid": "app-X"}, schema)

    def staged(rel):
        full = os.path.join(path, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        any_live = next(iter(deltalog._live_adds_no_spark(path)))
        shutil.copyfile(os.path.join(path, any_live), full)
        return full

    f0 = staged("l_returnflag=A/b0.parquet")
    n_f0 = spark.read.parquet(f0).count()
    w.commit([GovernedWriteCommit(rel_paths=["l_returnflag=A/b0.parquet"])], batchId=0)
    f1 = staged("l_returnflag=A/b1.parquet")
    w.commit([GovernedWriteCommit(rel_paths=["l_returnflag=A/b1.parquet"])], batchId=1)
    assert deltalog.last_txn_version(path, "app-X") == 1
    n_after = _read(spark, path).count()
    assert n_after == n0 + 2 * n_f0

    deltalog.write_checkpoint(spark, path)
    assert deltalog.cleanup_log(path, retention_hours=0.0) > 0
    # watermark survives the cleanup via the checkpointed txn action
    assert deltalog.last_txn_version(path, "app-X") == 1
    # replayed batch 1 after cleanup: dropped, files cleaned, no growth
    f1r = staged("l_returnflag=A/b1-replay.parquet")
    w.commit([GovernedWriteCommit(rel_paths=["l_returnflag=A/b1-replay.parquet"])], batchId=1)
    assert not os.path.exists(f1r)
    assert _read(spark, path).count() == n_after
    # batch 2 still lands, at a version above the checkpoint
    staged("l_returnflag=A/b2.parquet")
    w.commit([GovernedWriteCommit(rel_paths=["l_returnflag=A/b2.parquet"])], batchId=2)
    assert _read(spark, path).count() == n_after + n_f0


def test_stream_writer_overwrite_truncates(registered, spark, gov_table, tmp_path):
    """streamWriter(overwrite=True) — outputMode('complete') semantics: each
    micro-batch's commit tombstones the previously-live set, so the table
    holds exactly the latest batch (no silent duplicate accumulation)."""
    import os
    import shutil

    from delta_lake_proxy_spark import deltalog
    from delta_lake_proxy_spark.sources.governed import (
        GovernedDataSource,
        GovernedStreamWriter,
        GovernedWriteCommit,
    )

    path = str(tmp_path / "trunc_t")
    shutil.copytree(gov_table, path)
    schema = _read(spark, path).schema
    # the DataSource now threads the overwrite flag through
    ds = GovernedDataSource({"path": path})
    w = ds.streamWriter(schema, overwrite=True)
    assert isinstance(w, GovernedStreamWriter)

    any_live = next(iter(deltalog._live_adds_no_spark(path)))

    def staged(rel):
        full = os.path.join(path, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        shutil.copyfile(os.path.join(path, any_live), full)

    n_one = spark.read.parquet(os.path.join(path, any_live)).count()
    staged("l_returnflag=A/c0.parquet")
    w.commit([GovernedWriteCommit(rel_paths=["l_returnflag=A/c0.parquet"])], batchId=0)
    assert _read(spark, path).count() == n_one  # prior live set tombstoned
    staged("l_returnflag=A/c1a.parquet")
    staged("l_returnflag=N/c1b.parquet")
    w.commit(
        [GovernedWriteCommit(rel_paths=["l_returnflag=A/c1a.parquet", "l_returnflag=N/c1b.parquet"])],
        batchId=1,
    )
    assert _read(spark, path).count() == 2 * n_one
    live = set(deltalog._live_adds_no_spark(path))
    assert live == {"l_returnflag=A/c1a.parquet", "l_returnflag=N/c1b.parquet"}


def test_governed_writer_caps_open_writers(registered, spark, gov_table, lineitem, tmp_path, monkeypatch):
    """A high-cardinality partition column must not hold unbounded open
    ParquetWriters per task: with the cap forced to 2, a 10-partition write
    still lands every row (rotated part files, bounded descriptors)."""
    import shutil

    from delta_lake_proxy_spark import deltalog
    from delta_lake_proxy_spark.sources.governed import GovernedWriter

    path = str(tmp_path / "cap_t")
    # build a table partitioned by a 10-value key
    df = lineitem.limit(200).withColumn("bucket", (F.col("l_orderkey") % 10).cast("string"))
    from delta_lake_proxy_spark.engine import write_governed_table

    write_governed_table(spark, df.repartition(1), path, ["bucket"])
    n0 = _read(spark, path).count()
    monkeypatch.setattr(GovernedWriter, "MAX_OPEN_WRITERS", 2)
    more = lineitem.limit(100).withColumn(
        "bucket", (F.col("l_orderkey") % 10).cast("string")
    )
    more.select(*_read(spark, path).columns).coalesce(1).write.format("governed").mode(
        "append"
    ).option("path", path).save()
    assert _read(spark, path).count() == n0 + 100
    # every bucket value still readable with correct per-bucket counts
    got = {r["bucket"]: r["count"] for r in _read(spark, path).groupBy("bucket").count().collect()}
    want = {
        r["bucket"]: r["count"]
        for r in df.select(*_read(spark, path).columns)
        .unionByName(more.select(*_read(spark, path).columns))
        .groupBy("bucket")
        .count()
        .collect()
    }
    assert got == want


def test_governed_stream_reader_log_cursor(registered, spark, gov_table, lineitem, tmp_path):
    """readStream.format('governed'): the log-cursor source serves the live
    snapshot as batch one, picks up append commits, never serves forbidden
    partitions, and never re-serves tombstoned files."""
    import os
    import shutil

    from delta_lake_proxy_spark import deltalog
    from delta_lake_proxy_spark.engine import write_governed_table

    path = str(tmp_path / "sr_t")
    shutil.copytree(gov_table, path)
    cols = spark.read.format("governed").option("path", path).load().columns

    # tombstone the N partition BEFORE the stream starts (overwrite with A+R only)
    eng = Engine(spark, EngineConfig(table_mapping={"t": path}, read_only=False))
    keep = eng.read_table("t").filter(F.col("l_returnflag") != "N")
    n_keep = keep.count()
    eng.write_table("t", keep, mode="overwrite")

    dnf = [{"l_returnflag": "A"}, {"l_returnflag": "R"}]
    want_initial = (
        spark.read.format("governed").option("path", path)
        .option("dnf", json.dumps(dnf)).load().count()
    )
    assert want_initial == n_keep  # sanity: N rows gone from the live set

    ckpt = str(tmp_path / "sr_ckpt")
    out_dir = str(tmp_path / "sr_out")

    def run_stream():
        q = (
            spark.readStream.format("governed")
            .option("path", path)
            .option("dnf", json.dumps(dnf))
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()

    run_stream()
    got = spark.read.parquet(out_dir)
    # batch one == the tombstone-reconciled, DNF-filtered live snapshot
    assert got.count() == want_initial
    flags = {r[0] for r in got.select("l_returnflag").distinct().collect()}
    assert "N" not in flags  # forbidden/tombstoned partition never served

    # append new rows (one commit); a restarted availableNow stream picks up
    # ONLY the new commit (offset cursor advances past the snapshot batch)
    extra = lineitem.limit(30).select(*cols).filter(F.col("l_returnflag") == "A")
    n_extra = extra.count()
    eng.invalidate_caches()
    eng.write_table("t", extra, mode="append")
    # also append rows in the FORBIDDEN partition — must never be served
    bad = lineitem.limit(40).select(*cols).filter(F.col("l_returnflag") == "N")
    assert bad.count() > 0
    eng.write_table("t", bad, mode="append")

    run_stream()  # resumes from the SAME checkpoint: serves only the delta
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == want_initial + n_extra  # allowed append only, no re-serves
    flags2 = {r[0] for r in got2.select("l_returnflag").distinct().collect()}
    assert "N" not in flags2


def test_governed_stream_reader_add_then_remove_in_window(registered, spark, gov_table, tmp_path):
    """An add tombstoned by a LATER commit inside the same batch window is
    never served; an offset predating log retention fails loudly."""
    import os
    import shutil

    import pytest as _pytest

    from delta_lake_proxy_spark import deltalog
    from delta_lake_proxy_spark.sources.governed import GovernedStreamReader

    path = str(tmp_path / "srw_t")
    shutil.copytree(gov_table, path)
    schema = spark.read.format("governed").option("path", path).load().schema
    r = GovernedStreamReader(schema, {"path": path})
    v0 = deltalog.latest_version(path)

    any_live = next(iter(deltalog._live_adds_no_spark(path)))
    rel = "l_returnflag=A/transient.parquet"
    full = os.path.join(path, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    shutil.copyfile(os.path.join(path, any_live), full)
    deltalog.write_commit(path, [deltalog.add_action_for(path, rel, ["l_returnflag"])])
    deltalog.write_commit(path, [], [{"path": rel}])
    v2 = deltalog.latest_version(path)
    parts = r.partitions({"version": v0}, {"version": v2})
    served = {fp.full_path for p in parts for fp in p.files}
    assert full not in served  # add+remove inside the window: never served
    # a cleaned-up commit range fails the stream instead of skipping data
    deltalog.write_checkpoint(spark, path)
    deltalog.cleanup_log(path, retention_hours=0.0)
    with _pytest.raises(ValueError, match="predates log retention"):
        r.partitions({"version": v0}, {"version": v2})


def test_engine_read_table_stream_log(registered, spark, gov_table, tmp_path):
    """Engine.read_table_stream_log resolves the user's DNF into the
    log-cursor stream: only permitted partitions flow."""
    eng = Engine(
        spark,
        EngineConfig(
            table_mapping={"t": gov_table},
            allowed_partitions={"t": [{"l_returnflag": "A"}]},
        ),
    )
    stream = eng.read_table_stream_log("t", user="analyst")
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("eng_log_stream")
        .option("checkpointLocation", str(tmp_path / "els_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    got = spark.sql("SELECT * FROM eng_log_stream")
    want = _read(spark, gov_table, [{"l_returnflag": "A"}]).count()
    assert got.count() == want
    assert {r[0] for r in got.select("l_returnflag").distinct().collect()} == {"A"}


def test_governed_stream_reader_typed_partitions(registered, spark, ym_table, tmp_path):
    """The log-cursor stream materializes typed (int) partition columns from
    the string partitionValues exactly like the batch reader, and a
    two-column DNF prunes at file level."""
    dnf = [{"year": "1995", "month": "3"}]
    want = _read(spark, ym_table, dnf).count()
    assert want > 0
    q = (
        spark.readStream.format("governed")
        .option("path", ym_table)
        .option("dnf", json.dumps(dnf))
        .load()
        .writeStream.format("memory")
        .queryName("ym_stream")
        .option("checkpointLocation", str(tmp_path / "ym_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    got = spark.sql("SELECT * FROM ym_stream")
    assert got.count() == want
    pairs = {(r["year"], r["month"]) for r in got.select("year", "month").distinct().collect()}
    assert pairs == {(1995, 3)}
    assert dict(got.dtypes)["year"] in ("int", "bigint")
