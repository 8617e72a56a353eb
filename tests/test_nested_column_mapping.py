"""Nested (struct-column) column mapping: mapped tables store data under
``delta.columnMapping.physicalName`` at EVERY nesting level (Delta spec,
column mapping), and a conforming reader/writer must translate nested
fields too — delta-spark maps nested fields routinely, so foreign tables
with struct columns arrive this way. Through round 10 such tables refused
wholesale; now the Spark scan paths rebuild the nested physical type
(``deltalog.physical_data_type``) and rename back with a positional
struct cast, writes stage nested-physical files, and the pyarrow
DataSource refuses with a pointer to Engine.read_table. The reference
serves these tables through the deltalake kernel (src/main.rs:357)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from delta_lake_proxy_spark import Engine, EngineConfig, deltalog
from delta_lake_proxy_spark.errors import UnsupportedProtocolError

P_ID = "col-aa01"
P_INFO = "col-bb02"
P_NAME = "col-cc03"
P_SCORE = "col-dd04"
P_TAGS = "col-ee05"
P_PART = "col-ff06"

NESTED_SCHEMA = {
    "type": "struct",
    "fields": [
        {
            "name": "id",
            "type": "long",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 1,
                "delta.columnMapping.physicalName": P_ID,
            },
        },
        {
            "name": "info",
            "type": {
                "type": "struct",
                "fields": [
                    {
                        "name": "name",
                        "type": "string",
                        "nullable": True,
                        "metadata": {
                            "delta.columnMapping.id": 3,
                            "delta.columnMapping.physicalName": P_NAME,
                        },
                    },
                    {
                        "name": "score",
                        "type": "double",
                        "nullable": True,
                        "metadata": {
                            "delta.columnMapping.id": 4,
                            "delta.columnMapping.physicalName": P_SCORE,
                        },
                    },
                ],
            },
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 2,
                "delta.columnMapping.physicalName": P_INFO,
            },
        },
        {
            "name": "tags",
            "type": {
                "type": "array",
                "elementType": {
                    "type": "struct",
                    "fields": [
                        {
                            "name": "k",
                            "type": "string",
                            "nullable": True,
                            "metadata": {
                                "delta.columnMapping.id": 6,
                                "delta.columnMapping.physicalName": "col-kk07",
                            },
                        }
                    ],
                },
                "containsNull": True,
            },
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 5,
                "delta.columnMapping.physicalName": P_TAGS,
            },
        },
        {
            "name": "part",
            "type": "string",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 7,
                "delta.columnMapping.physicalName": P_PART,
            },
        },
    ],
}


def make_nested_mapped_table(root: str, mode: str = "name") -> str:
    """Foreign mapped table with a struct, an array<struct>, and a mapped
    partition column — physical names at every level, like delta-spark
    writes once column mapping is enabled."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rel = f"{P_PART}=A/part-00000.parquet"
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    info_t = pa.struct([(P_NAME, pa.string()), (P_SCORE, pa.float64())])
    tags_t = pa.list_(pa.struct([("col-kk07", pa.string())]))
    t = pa.table(
        {
            P_ID: pa.array([1, 2, 3], type=pa.int64()),
            P_INFO: pa.array(
                [
                    {P_NAME: "ann", P_SCORE: 0.5},
                    {P_NAME: "bob", P_SCORE: 1.5},
                    {P_NAME: "cyd", P_SCORE: 2.5},
                ],
                type=info_t,
            ),
            P_TAGS: pa.array(
                [[{"col-kk07": "x"}], [], [{"col-kk07": "y"}, {"col-kk07": "z"}]],
                type=tags_t,
            ),
        }
    )
    pq.write_table(t, full)
    logd = os.path.join(root, "_delta_log")
    os.makedirs(logd, exist_ok=True)
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "nested-cm",
                "format": {"provider": "parquet"},
                "schemaString": json.dumps(NESTED_SCHEMA),
                "partitionColumns": ["part"],
                "configuration": {
                    "delta.columnMapping.mode": mode,
                    "delta.columnMapping.maxColumnId": "7",
                },
                "createdTime": 1700000000000,
            }
        },
        {
            "add": {
                "path": rel,
                "partitionValues": {P_PART: "A"},
                "size": os.path.getsize(full),
                "modificationTime": 1700000000000,
                "dataChange": True,
                "stats": json.dumps({"numRecords": 3}),
            }
        },
    ]
    with open(os.path.join(logd, f"{0:020d}.json"), "w", encoding="utf-8") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return root


def mk_engine(spark, path):
    return Engine(spark, EngineConfig(table_mapping={"t": path}, read_only=False))


def test_read_nested_logical_names(spark, tmp_path):
    path = make_nested_mapped_table(str(tmp_path / "n"))
    eng = mk_engine(spark, path)
    df = eng.read_table("t")
    assert set(df.columns) == {"id", "info", "tags", "part"}
    assert df.schema["info"].dataType.fieldNames() == ["name", "score"]
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["info"]["name"] == "ann" and rows[3]["info"]["score"] == 2.5
    assert [t["k"] for t in rows[3]["tags"]] == ["y", "z"]
    assert rows[2]["part"] == "A"


def test_filter_on_nested_field(spark, tmp_path):
    path = make_nested_mapped_table(str(tmp_path / "f"))
    eng = mk_engine(spark, path)
    got = eng.read_table("t").filter(F.col("info.score") > 1.0)
    assert sorted(r["id"] for r in got.collect()) == [2, 3]


def test_engine_write_stages_nested_physical(spark, tmp_path):
    path = make_nested_mapped_table(str(tmp_path / "w"))
    eng = mk_engine(spark, path)
    src = spark.createDataFrame(
        [(10, ("dee", 9.5), [("w",)], "B")],
        "id long, info struct<name:string,score:double>, "
        "tags array<struct<k:string>>, part string",
    )
    eng.write_table("t", src, mode="append", partition_by=["part"])
    # the staged file carries PHYSICAL names at every level
    import pyarrow.parquet as pq

    new_files = [
        rel
        for rel in deltalog._live_adds_no_spark(path)
        if rel.startswith(f"{P_PART}=B/")
    ]
    assert new_files
    arrow_schema = pq.ParquetFile(os.path.join(path, new_files[0])).schema_arrow
    assert P_INFO in arrow_schema.names
    info_field = arrow_schema.field(P_INFO)
    assert [f.name for f in info_field.type] == [P_NAME, P_SCORE]
    # and reads round-trip to logical
    eng.invalidate_caches()
    rows = {r["id"]: r for r in eng.read_table("t").collect()}
    assert rows[10]["info"]["name"] == "dee" and rows[10]["part"] == "B"
    assert len(rows) == 4


def test_dml_on_nested_mapped_table(spark, tmp_path):
    path = make_nested_mapped_table(str(tmp_path / "dml"))
    eng = mk_engine(spark, path)
    eng.delete("t", F.col("info.score") > 2.0)
    rows = {r["id"]: r for r in eng.read_table("t").collect()}
    assert sorted(rows) == [1, 2]
    eng.update("t", F.col("id") == 2, {"info": F.expr("named_struct('name', 'BOB', 'score', info.score)")})
    rows = {r["id"]: r for r in eng.read_table("t").collect()}
    assert rows[2]["info"]["name"] == "BOB" and rows[2]["info"]["score"] == 1.5


def test_id_mode_nested_resolves_by_field_id(spark, tmp_path):
    """ID mode: nested parquet columns resolve by field id, not name — the
    file stores DIFFERENT names with matching ids and must still read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "idm")
    make_nested_mapped_table(path, mode="id")
    # rewrite the data file with arbitrary names but spec'd field ids
    rel = f"{P_PART}=A/part-00000.parquet"

    def fld(name, typ, fid):
        return pa.field(name, typ, metadata={b"PARQUET:field_id": str(fid).encode()})

    info_t = pa.struct([fld("x1", pa.string(), 3), fld("x2", pa.float64(), 4)])
    tags_t = pa.list_(pa.struct([fld("x3", pa.string(), 6)]))
    schema = pa.schema(
        [
            fld("a1", pa.int64(), 1),
            fld("a2", info_t, 2),
            fld("a3", tags_t, 5),
        ]
    )
    t = pa.table(
        {
            "a1": pa.array([1, 2, 3], type=pa.int64()),
            "a2": pa.array(
                [
                    {"x1": "ann", "x2": 0.5},
                    {"x1": "bob", "x2": 1.5},
                    {"x1": "cyd", "x2": 2.5},
                ],
                type=info_t,
            ),
            "a3": pa.array([[{"x3": "x"}], [], [{"x3": "y"}]], type=tags_t),
        },
        schema=schema,
    )
    pq.write_table(t, os.path.join(path, rel))
    eng = mk_engine(spark, path)
    rows = {r["id"]: r for r in eng.read_table("t").collect()}
    assert rows[2]["info"]["name"] == "bob" and rows[3]["info"]["score"] == 2.5
    assert [g["k"] for g in rows[3]["tags"]] == ["y"]


def test_pyarrow_datasource_refuses_nested(spark, tmp_path):
    from delta_lake_proxy_spark.sources.governed import GovernedDataSource

    path = make_nested_mapped_table(str(tmp_path / "ds"))
    try:
        spark.dataSource.register(GovernedDataSource)
    except Exception:
        pass  # already registered in this session
    with pytest.raises(Exception, match="Engine.read_table"):
        spark.read.format("governed").option("path", path).load().collect()


def test_malformed_nested_metadata_refuses(spark, tmp_path):
    path = str(tmp_path / "bad")
    make_nested_mapped_table(path)
    # strip the nested physicalName from the logged schema
    v0 = os.path.join(path, "_delta_log", f"{0:020d}.json")
    lines = []
    with open(v0) as f:
        for x in f:
            a = json.loads(x)
            if a.get("metaData"):
                sch = json.loads(a["metaData"]["schemaString"])
                del sch["fields"][1]["type"]["fields"][0]["metadata"][
                    "delta.columnMapping.physicalName"
                ]
                a["metaData"]["schemaString"] = json.dumps(sch)
            lines.append(json.dumps(a))
    with open(v0, "w") as f:
        f.write("\n".join(lines) + "\n")
    eng = mk_engine(spark, path)
    with pytest.raises(UnsupportedProtocolError, match="physicalName"):
        eng.read_table("t").collect()


def test_struct_in_struct_roundtrip(spark, tmp_path):
    """Two levels of struct nesting: physical names must apply at EVERY
    depth on write and rename back on read (the positional cast recurses
    with the type tree)."""
    import pyarrow.parquet as pq

    deep_schema = {
        "type": "struct",
        "fields": [
            {
                "name": "id",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "c-1",
                },
            },
            {
                "name": "outer",
                "type": {
                    "type": "struct",
                    "fields": [
                        {
                            "name": "inner",
                            "type": {
                                "type": "struct",
                                "fields": [
                                    {
                                        "name": "leaf",
                                        "type": "string",
                                        "nullable": True,
                                        "metadata": {
                                            "delta.columnMapping.id": 4,
                                            "delta.columnMapping.physicalName": "c-4",
                                        },
                                    }
                                ],
                            },
                            "nullable": True,
                            "metadata": {
                                "delta.columnMapping.id": 3,
                                "delta.columnMapping.physicalName": "c-3",
                            },
                        }
                    ],
                },
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "c-2",
                },
            },
        ],
    }
    path = str(tmp_path / "deep")
    logd = os.path.join(path, "_delta_log")
    os.makedirs(logd)
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "deep-cm",
                "format": {"provider": "parquet"},
                "schemaString": json.dumps(deep_schema),
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "4",
                },
                "createdTime": 1700000000000,
            }
        },
    ]
    with open(os.path.join(logd, f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    eng = mk_engine(spark, path)
    src = spark.createDataFrame(
        [(1, ((("x",),))), (2, ((("y",),)))],
        "id long, outer struct<inner:struct<leaf:string>>",
    )
    eng.write_table("t", src, mode="append")
    rel = next(iter(deltalog._live_adds_no_spark(path)))
    sch = pq.ParquetFile(os.path.join(path, rel)).schema_arrow
    assert sch.names == ["c-1", "c-2"]
    inner = sch.field("c-2").type
    assert [f.name for f in inner] == ["c-3"]
    assert [f.name for f in inner.field("c-3").type] == ["c-4"]
    rows = {r["id"]: r for r in eng.read_table("t").collect()}
    assert rows[1]["outer"]["inner"]["leaf"] == "x"
    assert rows[2]["outer"]["inner"]["leaf"] == "y"
