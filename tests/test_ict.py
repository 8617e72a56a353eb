"""In-Commit Timestamps (Delta ``inCommitTimestamp`` writer feature) —
WRITE-side support, round 10.

The read side landed earlier (``version_at_timestamp`` /
``version_at_or_after_timestamp`` coalesce ICT over wall-clock). This file
pins the write side: ``Engine.enable_in_commit_timestamps`` performs the
spec's post-creation enablement (writer-7 upgrade + the enabling commit
naming ITSELF in ``delta.inCommitTimestampEnablementVersion/-Timestamp``),
and every subsequent commit — Engine writes AND raw ``deltalog.write_commit``
calls, which funnel through the same ``stream_body`` — carries a strictly
monotonic ``commitInfo.inCommitTimestamp`` as the commit's first action,
clamped above a predecessor whose ICT is ahead of this writer's clock.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig, deltalog
from delta_lake_proxy_spark.errors import UnsupportedProtocolError


def _commit_actions(path: str, version: int) -> list[dict]:
    p = os.path.join(path, "_delta_log", f"{version:020d}.json")
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def _ict(path: str, version: int) -> int | None:
    for a in _commit_actions(path, version):
        if "commitInfo" in a:
            return a["commitInfo"].get("inCommitTimestamp")
    return None


def _engine(spark, path: str) -> Engine:
    return Engine(spark, EngineConfig(table_mapping={"t": path}, read_only=False))


def _plain_table(spark, root: str) -> str:
    eng = Engine(spark, EngineConfig(table_mapping={"t": root}, read_only=False))
    df = spark.createDataFrame([Row(id=i, part="A") for i in (1, 2, 3)])
    eng.write_table("t", df, mode="overwrite")
    return root


def test_enablement_commit_names_itself(spark, tmp_path):
    path = _plain_table(spark, str(tmp_path / "t"))
    eng = _engine(spark, path)
    v = eng.enable_in_commit_timestamps("t")
    conf = deltalog.table_configuration_no_spark(path)
    assert conf["delta.enableInCommitTimestamps"] == "true"
    assert int(conf["delta.inCommitTimestampEnablementVersion"]) == v
    # the enabling commit's own ICT equals the enablement timestamp (spec)
    assert int(conf["delta.inCommitTimestampEnablementTimestamp"]) == _ict(path, v)
    proto = deltalog.table_protocol_no_spark(path)
    assert proto["minWriterVersion"] == 7
    assert proto["writerFeatures"] == ["inCommitTimestamp"]
    # commitInfo is the FIRST action of the enabling commit
    assert "commitInfo" in _commit_actions(path, v)[0]


def test_enable_idempotent(spark, tmp_path):
    path = _plain_table(spark, str(tmp_path / "t"))
    eng = _engine(spark, path)
    v = eng.enable_in_commit_timestamps("t")
    assert eng.enable_in_commit_timestamps("t") == v  # no second commit


def test_subsequent_commits_strictly_monotonic(spark, tmp_path):
    path = _plain_table(spark, str(tmp_path / "t"))
    eng = _engine(spark, path)
    v0 = eng.enable_in_commit_timestamps("t")
    df = spark.createDataFrame([Row(id=9, part="A")])
    v1 = eng.write_table("t", df, mode="append")
    v2 = eng.write_table("t", df, mode="append")
    icts = [_ict(path, v) for v in (v0, v1, v2)]
    assert all(i is not None for i in icts)
    assert icts[0] < icts[1] < icts[2]
    # commits BEFORE enablement carry no ICT
    assert _ict(path, 0) is None


def test_monotonic_clamp_above_future_predecessor(spark, tmp_path):
    """A predecessor whose ICT is ahead of this writer's clock (clock skew
    between writers) forces prev+1, never a regression."""
    path = _plain_table(spark, str(tmp_path / "t"))
    eng = _engine(spark, path)
    v = eng.enable_in_commit_timestamps("t")
    # hand-bump the last commit's ICT far into the future (foreign writer)
    p = os.path.join(path, "_delta_log", f"{v:020d}.json")
    acts = _commit_actions(path, v)
    future = acts[0]["commitInfo"]["inCommitTimestamp"] + 10**10
    acts[0]["commitInfo"]["inCommitTimestamp"] = future
    with open(p, "w") as f:
        for a in acts:
            f.write(json.dumps(a) + "\n")
    v1 = eng.write_table("t", spark.createDataFrame([Row(id=9, part="A")]), mode="append")
    assert _ict(path, v1) == future + 1


def test_raw_commit_path_also_emits_ict(spark, tmp_path):
    """deltalog.write_commit funnels through the same stream_body — a raw
    add-only commit into an ICT table keeps the feature's contract."""
    path = _plain_table(spark, str(tmp_path / "t"))
    eng = _engine(spark, path)
    v = eng.enable_in_commit_timestamps("t")
    rel = "part=A/raw.parquet"
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(path, "part=A"), exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array([7], type=pa.int64())}),
        os.path.join(path, rel),
    )
    v1 = deltalog.write_commit(
        path,
        [
            {
                "path": rel,
                "partitionValues": {"part": "A"},
                "size": os.path.getsize(os.path.join(path, rel)),
                "dataChange": True,
            }
        ],
    )
    assert _ict(path, v1) is not None and _ict(path, v1) > _ict(path, v)


def test_featured_table_refuses_upgrade(spark, tmp_path):
    path = _plain_table(spark, str(tmp_path / "t"))
    eng = _engine(spark, path)
    eng.enable_v2_checkpoints("t")
    with pytest.raises(UnsupportedProtocolError, match="refusing to rewrite"):
        eng.enable_in_commit_timestamps("t")


def test_timestamp_time_travel_uses_ict_not_wall_clock(spark, tmp_path):
    """A FOREIGN ICT table whose wall-clock timestamps disagree with its
    ICTs (logs copied between stores): resolution follows ICT."""
    root = str(tmp_path / "foreign")
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    logd = os.path.join(root, "_delta_log")
    os.makedirs(logd)
    for v, (wall, ict, rel) in enumerate(
        [(1000, 5000, "a.parquet"), (2000, 6000, "b.parquet")]
    ):
        pq.write_table(
            pa.table({"id": pa.array([v], type=pa.int64())}),
            os.path.join(root, rel),
        )
        actions = [
            {
                "commitInfo": {
                    "operation": "WRITE",
                    "timestamp": wall,
                    "inCommitTimestamp": ict,
                }
            }
        ]
        if v == 0:
            actions += [
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        "writerFeatures": ["inCommitTimestamp"],
                    }
                },
                {
                    "metaData": {
                        "id": "ict-foreign",
                        "format": {"provider": "parquet"},
                        "schemaString": schema,
                        "partitionColumns": [],
                        "configuration": {
                            "delta.enableInCommitTimestamps": "true",
                            "delta.inCommitTimestampEnablementVersion": "0",
                            "delta.inCommitTimestampEnablementTimestamp": "5000",
                        },
                        "createdTime": 1000,
                    }
                },
            ]
        actions.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(root, rel)),
                    "modificationTime": wall,
                    "dataChange": True,
                }
            }
        )
        with open(os.path.join(logd, f"{v:020d}.json"), "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
    # wall-clock would resolve 5500 -> version 1 (2000 <= 5500); ICT says 0
    assert deltalog.version_at_timestamp(spark, root, 5500) == 0
    assert deltalog.version_at_timestamp(spark, root, 6000) == 1
    with pytest.raises(ValueError, match="after the latest"):
        deltalog.version_at_timestamp(spark, root, 7000)
    # Engine append continues the foreign chain above ITS marks
    eng = _engine(spark, root)
    v2 = eng.write_table(
        "t", spark.createDataFrame([Row(id=9)], "id long"), mode="append"
    )
    assert _ict(root, v2) > 6000
    # history surfaces ICT (5000ms epoch), not the wall clock (1000ms)
    hist = {r["version"]: r["timestamp"] for r in eng.history("t").collect()}
    assert abs(hist[0].timestamp() * 1000 - 5000) < 1
