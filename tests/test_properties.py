"""Property-based tests (hypothesis): the engine vs a direct Python model of
the reference's algorithms.

- ACL: the reference unions per-filter-map file sets (src/main.rs:389-415);
  the engine compiles one predicate. For random DNFs and partition tuples the
  selected sets must be identical.
- Delta replay: random add/remove commit sequences; the DataFrame replay must
  match a sequential dict replay (last action per path wins).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_lake_proxy_spark import acl

COLS = ["p", "q"]
VALS = ["1", "2", "3"]

filter_map = st.dictionaries(st.sampled_from(COLS), st.sampled_from(VALS), max_size=2)
dnf_st = st.lists(filter_map, max_size=4)
partition_st = st.tuples(st.sampled_from(VALS), st.sampled_from(VALS))


def reference_allowed(dnf: list[dict[str, str]], part: dict[str, str]) -> bool:
    """Direct transcription of the proxy's allowed-file-set computation:
    per-map AND, union across maps, empty maps skipped inside the loop,
    absent/empty DNF = allow. Enforcement runs whenever the combined list is
    NON-empty (src/main.rs:576-594) — so a list of only empty maps yields an
    empty allowed set, i.e. deny-all, not allow-all."""
    if not dnf:
        return True  # no membership check runs (src/main.rs:576)
    return any(m and all(part.get(k) == v for k, v in m.items()) for m in dnf)


@given(dnf=dnf_st, parts=st.lists(partition_st, min_size=1, max_size=10))
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_compiled_dnf_matches_reference_model(spark, dnf, parts):
    df = spark.createDataFrame([(p, q, i) for i, (p, q) in enumerate(parts)], "p string, q string, i long")
    pred = acl.compile_dnf(dnf)
    got = set(
        r["i"] for r in (df if pred is None else df.filter(pred)).select("i").collect()
    )
    want = {
        i
        for i, (p, q) in enumerate(parts)
        if reference_allowed(dnf, {"p": p, "q": q})
    }
    assert got == want


@given(dnf=dnf_st, parts=st.lists(partition_st, min_size=1, max_size=10))
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dnf_to_sql_agrees_with_compiled_predicate(spark, dnf, parts):
    """The two enforcement tiers — the library predicate (compile_dnf) and
    the plan-level SQL text (dnf_to_sql, parsed by the Catalyst extension) —
    must admit identical row sets for every DNF."""
    df = spark.createDataFrame(
        [(p, q, i) for i, (p, q) in enumerate(parts)], "p string, q string, i long"
    )
    df.createOrReplaceTempView("dnf_prop_t")
    pred = acl.compile_dnf(dnf)
    via_col = set(
        r["i"] for r in (df if pred is None else df.filter(pred)).select("i").collect()
    )
    sql = acl.dnf_to_sql(dnf)
    where = "" if sql is None else f" WHERE {sql}"
    via_sql = set(
        r["i"] for r in spark.sql(f"SELECT i FROM dnf_prop_t{where}").collect()
    )
    assert via_col == via_sql


action_st = st.tuples(st.booleans(), st.sampled_from(["a", "b", "c", "d"]))
commit_st = st.lists(action_st, min_size=1, max_size=3)


@given(commits=st.lists(commit_st, min_size=1, max_size=5))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_log_replay_matches_sequential_model(spark, tmp_path_factory, commits):
    import os

    from delta_lake_proxy_spark import deltalog

    t = str(tmp_path_factory.mktemp("dl") / "t")
    os.makedirs(t)
    live: dict[str, bool] = {}
    for commit in commits:
        adds, removes = [], []
        seen = set()
        for is_add, path in commit:
            if path in seen:
                continue  # a path appears at most once per commit (Delta invariant)
            seen.add(path)
            if is_add:
                adds.append({"path": path, "partitionValues": {}, "size": 1, "modificationTime": 0})
                live[path] = True
            else:
                removes.append({"path": path})
                live[path] = False
        deltalog.write_commit(t, adds, removes)
    got = {r["path"] for r in deltalog.snapshot_files(spark, t).collect()}
    want = {p for p, alive in live.items() if alive}
    assert got == want
