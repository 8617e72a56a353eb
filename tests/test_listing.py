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


def test_delimiter_groups_common_prefixes(eng):
    """delimiter='/' collapses partition directories into CommonPrefixes
    rows (ref src/main.rs:307-317; golden src/main.rs:1286-1294)."""
    df = eng.list_files("gov", prefix="gov/", delimiter="/")
    rows = df.collect()
    assert [r["key"] for r in rows] == [
        "gov/l_returnflag=A/",
        "gov/l_returnflag=N/",
        "gov/l_returnflag=R/",
    ]
    assert all(r["is_common_prefix"] for r in rows)
    assert all(r["size"] is None and r["modificationTime"] is None for r in rows)


def test_delimiter_mixes_contents_and_prefixes_in_key_order(eng):
    """Keys without the delimiter in their remainder stay Contents rows,
    interleaved with prefixes in lexicographic order; max_keys counts both
    (S3 semantics)."""
    # delimiter '=' with prefix 'gov/': every key groups at 'gov/l_returnflag='
    rows = eng.list_files("gov", prefix="gov/", delimiter="=").collect()
    assert [r["key"] for r in rows] == ["gov/l_returnflag="]
    assert rows[0]["is_common_prefix"]
    # a prefix BELOW the partition dir leaves plain file keys ungrouped
    rows2 = eng.list_files("gov", prefix="gov/l_returnflag=A/", delimiter="/").collect()
    assert len(rows2) == 1 and not rows2[0]["is_common_prefix"]
    assert rows2[0]["size"] > 0
    # pagination over grouped rows: strictly-after + max_keys
    page1 = eng.list_files("gov", prefix="gov/", delimiter="/", max_keys=2).collect()
    assert [r["key"] for r in page1] == ["gov/l_returnflag=A/", "gov/l_returnflag=N/"]
    page2 = eng.list_files(
        "gov", prefix="gov/", delimiter="/", continuation_token=page1[-1]["key"]
    ).collect()
    assert [r["key"] for r in page2] == ["gov/l_returnflag=R/"]


def test_file_stats_schema(eng):
    rows = eng.file_stats("gov").collect()
    assert len(rows) == 3
    for r in rows:
        assert r["size"] > 0 and r["last_modified"] is not None
