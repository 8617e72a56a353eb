"""S3-listing emulation semantics (S3-S5, O1-O2, P1, P5).

Mirrors the reference's listing tests (src/main.rs:1247-1346: prefix
translation, alias-namespace rewriting; src/main.rs:1601-1652: continuation
token; src/main.rs:251-262: start-after strictly-after, max-keys limit).
"""

from __future__ import annotations

import pytest

from delta_lake_proxy_spark import Engine, EngineConfig


@pytest.fixture(scope="module")
def eng(spark, gov_table):
    return Engine(spark, EngineConfig(table_mapping={"gov": gov_table}))


def keys(df):
    return [r["key"] for r in df.collect()]


def test_keys_are_alias_namespaced_and_ordered(eng):
    ks = keys(eng.list_files("gov"))
    assert ks == sorted(ks)
    assert all(k.startswith("gov/l_returnflag=") for k in ks)
    assert len(ks) == 3


def test_prefix_filter(eng):
    ks = keys(eng.list_files("gov", prefix="gov/l_returnflag=A/"))
    assert len(ks) == 1 and "l_returnflag=A" in ks[0]
    assert keys(eng.list_files("gov", prefix="gov/zzz")) == []


def test_start_after_strictly_after(eng):
    all_keys = keys(eng.list_files("gov"))
    ks = keys(eng.list_files("gov", start_after=all_keys[0]))
    assert ks == all_keys[1:]


def test_max_keys_and_continuation_token(eng):
    all_keys = keys(eng.list_files("gov"))
    page1 = keys(eng.list_files("gov", max_keys=2))
    assert page1 == all_keys[:2]
    page2 = keys(eng.list_files("gov", continuation_token=page1[-1], max_keys=2))
    assert page2 == all_keys[2:]


def test_listing_is_not_acl_filtered(spark, gov_table):
    # the reference never filters listings (src/main.rs:514-529)
    eng = Engine(
        spark,
        EngineConfig(
            table_mapping={"gov": gov_table},
            allowed_partitions={"gov": [{"l_returnflag": "A"}]},
        ),
    )
    assert len(keys(eng.list_files("gov"))) == 3


def test_file_stats_schema(eng):
    rows = eng.file_stats("gov").collect()
    assert len(rows) == 3
    for r in rows:
        assert r["size"] > 0 and r["last_modified"] is not None
