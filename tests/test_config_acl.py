"""Config parsing + ACL compilation semantics (reference-faithful).

Mirrors: config shape src/config.rs:6-26; empty-map skip src/main.rs:399-401;
no-ACL allow-all src/main.rs:576; static∪DB union src/main.rs:555-573;
SigV4 identity src/main.rs:1129-1135.
"""

from __future__ import annotations

import json

from delta_lake_proxy_spark import acl
from delta_lake_proxy_spark.config import EngineConfig


def test_config_from_dict_camel_case():
    cfg = EngineConfig.from_dict(
        {
            "tableMapping": {"t": "/data/t"},
            "allowedPartitions": {"t": [{"year": 2023, "month": 10}]},
            "readOnly": False,
        }
    )
    assert cfg.table_mapping == {"t": "/data/t"}
    # values normalize to strings (Delta partition values are strings)
    assert cfg.allowed_partitions == {"t": [{"year": "2023", "month": "10"}]}
    assert cfg.read_only is False


def test_config_default_read_only():
    # reference defaults readOnly=true (src/config.rs:36-38)
    assert EngineConfig.from_dict({}).read_only is True


def test_config_env_overrides():
    cfg = EngineConfig.from_dict({"tableMapping": {"a": "/a"}})
    cfg.apply_env(
        {
            "PROXY_READONLY": "false",
            "PROXY_TABLEMAPPING": json.dumps({"b": "/b"}),
            "PROXY_ALLOWEDPARTITIONS": json.dumps({"b": [{"p": "1"}]}),
        }
    )
    assert cfg.read_only is False
    assert cfg.table_mapping == {"a": "/a", "b": "/b"}
    assert cfg.allowed_partitions["b"] == [{"p": "1"}]


def test_extract_user_sigv4():
    h = "AWS4-HMAC-SHA256 Credential=AKIAXX/20240101/us-east-1/s3/aws4_request"
    assert acl.extract_user(h) == "AKIAXX"
    assert acl.extract_user(None) == "anonymous"
    assert acl.extract_user("") == "anonymous"
    assert acl.extract_user("Bearer zzz") == "anonymous"


def test_empty_map_skipped_not_allow_all(spark):
    # {} inside a DNF is skipped as a branch (src/main.rs:399-401)...
    assert acl.normalize_dnf([{}]) == []
    # ...but a CONFIGURED DNF of only empty maps is an EMPTY allowed set =
    # deny-all (src/main.rs:389-415, 576-594), never allow-all.
    pred = acl.compile_dnf([{}])
    assert pred is not None
    # [{}, {k:v}] restricts to {k:v} only
    dnf = acl.normalize_dnf([{}, {"k": "v"}])
    assert dnf == [{"k": "v"}]


def test_all_empty_dnf_denies_all(spark):
    df = spark.createDataFrame([("A", 1), ("R", 9)], "flag string, n int")
    assert df.filter(acl.compile_dnf([{}])).count() == 0
    assert df.filter(acl.compile_dnf([{}, {}])).count() == 0
    # a non-empty branch alongside empties still admits its rows
    assert df.filter(acl.compile_dnf([{}, {"flag": "R"}])).count() == 1


def test_compile_dnf_none_means_unrestricted():
    assert acl.compile_dnf(None) is None
    assert acl.compile_dnf([]) is None


def test_union_static_db():
    # empty maps are PRESERVED by the union: they carry the "configured"
    # signal that makes compile_dnf fail closed instead of open.
    merged = acl.union_dnf([{"a": "1"}], [{"b": "2"}, {}])
    assert merged == [{"a": "1"}, {"b": "2"}, {}]
    assert acl.union_dnf(None, []) == []


def test_dnf_filter_on_dataframe(spark):
    df = spark.createDataFrame(
        [("A", 1), ("A", 2), ("N", 1), ("R", 9)], "flag string, n int"
    )
    # OR of two conjunctions; int column compared against string ACL value
    pred = acl.compile_dnf([{"flag": "A", "n": "1"}, {"flag": "R"}])
    got = sorted((r["flag"], r["n"]) for r in df.filter(pred).collect())
    assert got == [("A", 1), ("R", 9)]


def test_permissions_for(spark):
    perms = spark.createDataFrame(
        [
            (1, "alice", "t", json.dumps({"mic": "XLON"})),
            (2, "alice", "t", json.dumps({})),  # blanked grant -> kept as {}
            (3, "alice", "u", json.dumps({"mic": "XPAR"})),
            (4, "bob", "t", json.dumps({"mic": "XMIL"})),
            (5, "dave", "t", json.dumps({})),  # ONLY a blanked grant
        ],
        "id int, user_id string, table_name string, partition_filters string",
    )
    assert acl.permissions_for(perms, "alice", "t") == [{"mic": "XLON"}, {}]
    assert acl.permissions_for(perms, "carol", "t") == []
    assert acl.permissions_for(None, "alice", "t") == []
    # dave's blanked grant must resolve to a configured-but-empty DNF
    dave = acl.permissions_for(perms, "dave", "t")
    assert dave == [{}]
    assert acl.compile_dnf(dave) is not None  # deny-all, not unrestricted
    assert acl.compile_dnf([]) is None  # no rows at all -> unrestricted


def test_ttl_cache_eviction_and_expiry():
    now = [0.0]
    cache = acl.TTLCache(maxsize=2, ttl_s=10.0, clock=lambda: now[0])
    calls = []
    cache.get_or_compute("a", lambda: calls.append("a") or 1)
    cache.get_or_compute("a", lambda: calls.append("a2") or 2)
    assert calls == ["a"]  # cached
    now[0] = 11.0  # expired
    assert cache.get_or_compute("a", lambda: calls.append("a3") or 3) == 3
    cache.get_or_compute("b", lambda: 4)
    cache.get_or_compute("c", lambda: 5)  # evicts oldest
    assert len(cache._data) == 2
