"""Property-based tests (hypothesis): the engine vs a direct Python model of
the reference's algorithms.

- ACL: the reference unions per-filter-map file sets (src/main.rs:389-415);
  the engine compiles one predicate. For random DNFs and partition tuples the
  selected sets must be identical.
- Delta replay: random add/remove commit sequences; the DataFrame replay must
  match a sequential dict replay (last action per path wins).
"""

from __future__ import annotations

import pytest
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


# -- container parsers: encode -> decode round-trips on random media ---------

import numpy as np  # noqa: E402

from delta_lake_proxy_spark.functions import multimodal  # noqa: E402

dims = st.integers(min_value=1, max_value=16)


@given(
    w=dims,
    h=dims,
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_ppm_roundtrip_random(w, h, seed):
    px = np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(px)) == px).all()


@given(
    n=st.integers(min_value=0, max_value=2000),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_random(n, sr, seed):
    samples = (
        np.random.RandomState(seed).randint(-32768, 32768, n).astype(np.int16)
    )
    decoded, got_sr = multimodal.decode_wav_pcm16(
        multimodal.encode_wav_pcm16(samples, sr)
    )
    assert got_sr == sr
    assert (decoded == samples.astype(np.float64)).all()


@given(
    n_frames=st.integers(min_value=1, max_value=8),
    w=st.integers(min_value=2, max_value=16).filter(lambda v: v % 2 == 0),
    h=st.integers(min_value=2, max_value=16).filter(lambda v: v % 2 == 0),
    cs=st.sampled_from(["C444", "C422", "C420jpeg"]),
    fps=st.sampled_from([(24, 1), (30, 1), (30000, 1001)]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_y4m_roundtrip_random(n_frames, w, h, cs, fps, seed):
    rng = np.random.RandomState(seed)
    ch, cw = multimodal._y4m_chroma_shape(cs, h, w)
    y = rng.randint(0, 256, (n_frames, h, w), dtype=np.uint8)
    cb = rng.randint(0, 256, (n_frames, ch, cw), dtype=np.uint8)
    cr = rng.randint(0, 256, (n_frames, ch, cw), dtype=np.uint8)
    dy, dcb, dcr, got_fps = multimodal.decode_y4m(
        multimodal.encode_y4m(y, cb, cr, fps=fps, colorspace=cs)
    )
    assert got_fps == fps
    assert (dy == y).all() and (dcb == cb).all() and (dcr == cr).all()


@given(data=st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_parsers_reject_garbage_with_valueerror(data):
    """Random bytes must raise ValueError (never crash, never return junk
    silently) from all three container parsers — unless the bytes happen to
    be a genuinely valid payload, which 200 random bytes won't be for the
    magic-checked formats."""
    for parse in (multimodal.decode_ppm, multimodal.decode_wav_pcm16, multimodal.decode_y4m):
        try:
            parse(data)
        except ValueError:
            pass


def test_uri_rel_col_matches_uri_to_rel(spark, tmp_path):
    """Column-side URI decoding (broad DML / listing-join) must agree with
    the driver-side uri_to_rel for awkward names: spaces, percent-escapes,
    unicode, nested hive dirs."""
    import os

    from pyspark.sql import functions as F

    from delta_lake_proxy_spark.engine import uri_rel_col, uri_to_rel

    table = str(tmp_path / "uri t@ble")  # space + symbol in the TABLE path
    rels = [
        "part=A/f1.parquet",
        "part=hello world/f 2.parquet",
        "part=café/unicode–name.parquet",
        "a=1/b=two words/deep.parquet",
    ]
    uris = []
    for rel in rels:
        full = os.path.join(table, rel)
        # the URI shape input_file_name() produces: file:// + percent-encoding
        import urllib.parse as up

        uris.append("file://" + up.quote(os.path.abspath(full)))
    df = spark.createDataFrame([(u,) for u in uris], "uri string")
    got = [
        r["rel"]
        for r in df.select(uri_rel_col(F.col("uri"), table).alias("rel")).collect()
    ]
    want = [uri_to_rel(u, table) for u in uris]
    assert got == want == rels


def test_driver_replay_matches_model_random_histories(tmp_path):
    """Property: for ANY random interleaving of add/remove/re-add commits,
    the driver-side log replay equals a trivial dict model (latest action
    per path wins). Pure file IO — no SparkSession — so hypothesis can
    explore hundreds of histories cheaply."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from delta_lake_proxy_spark import deltalog

    paths = [f"p{i}.parquet" for i in range(6)]

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from(paths), st.booleans()),  # (path, is_add)
            min_size=1,
            max_size=24,
        )
    )
    def run(history):
        import os
        import shutil
        import uuid

        t = str(tmp_path / f"h{uuid.uuid4().hex[:12]}")
        os.makedirs(t)
        try:
            model: dict[str, bool] = {}
            # group into commits of up to 3 actions
            for i in range(0, len(history), 3):
                chunk = history[i : i + 3]
                adds, removes, seen = [], [], set()
                for p, is_add in chunk:
                    if p in seen:
                        continue  # one action per path per commit
                    seen.add(p)
                    if is_add:
                        adds.append({"path": p, "partitionValues": {}, "size": 1, "modificationTime": 0})
                    else:
                        removes.append({"path": p})
                    model[p] = is_add
                deltalog.write_commit(t, adds, removes)
            live = set(deltalog._live_adds_no_spark(t))
            want = {p for p, is_add in model.items() if is_add}
            assert live == want
        finally:
            shutil.rmtree(t, ignore_errors=True)

    run()


def test_dv_replay_matches_model_random_histories(tmp_path):
    """Property: reconciliation is by (path, deletionVector uniqueId) — for
    ANY random interleaving of adds/removes carrying DV identities (the
    delta DV-update shape: remove old identity + add new one, possibly in
    one commit), the driver replay's live PATH set equals a dict model
    keyed by the logical-file identity."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from delta_lake_proxy_spark import deltalog

    paths = [f"p{i}.parquet" for i in range(4)]
    dv_ids = [None, "dv1", "dv2"]

    def dv_desc(tag):
        if tag is None:
            return None
        return {
            "storageType": "i",
            "pathOrInlineDv": tag,
            "sizeInBytes": 8,
            "cardinality": 1,
        }

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(paths), st.sampled_from(dv_ids), st.booleans()
            ),
            min_size=1,
            max_size=24,
        )
    )
    def run(history):
        import os
        import shutil
        import uuid

        t = str(tmp_path / f"dv{uuid.uuid4().hex[:12]}")
        os.makedirs(t)
        try:
            model: dict[tuple, bool] = {}
            for i in range(0, len(history), 3):
                chunk = history[i : i + 3]
                adds, removes, seen = [], [], set()
                for p, tag, is_add in chunk:
                    if (p, tag) in seen:
                        continue  # one action per identity per commit
                    seen.add((p, tag))
                    d = dv_desc(tag)
                    if is_add:
                        a = {"path": p, "partitionValues": {}, "size": 1, "modificationTime": 0}
                        if d:
                            a["deletionVector"] = d
                        adds.append(a)
                    else:
                        r = {"path": p}
                        if d:
                            r["deletionVector"] = d
                        removes.append(r)
                    model[(p, tag)] = is_add
                deltalog.write_commit(t, adds, removes)
            live = set(deltalog._live_adds_no_spark(t))
            want = {p for (p, _tag), is_add in model.items() if is_add}
            assert live == want
        finally:
            shutil.rmtree(t, ignore_errors=True)

    run()


def test_log_compaction_replay_matches_model_random_histories(tmp_path):
    """Property: for ANY random add/remove/txn history, compacting ANY
    valid commit range — and then even deleting the range's individual
    commits — leaves every driver-side resolver (live adds, protocol,
    configuration, txn watermarks) byte-identical to the uncompacted
    replay. Pure file IO, no SparkSession."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from delta_lake_proxy_spark import deltalog

    paths = [f"p{i}.parquet" for i in range(5)]
    apps = ["app-a", "app-b"]

    @settings(max_examples=40, deadline=None)
    @given(
        history=st.lists(
            st.tuples(
                st.sampled_from(paths),
                st.booleans(),  # is_add
                st.sampled_from([None] + apps),  # txn app on this commit
                st.integers(min_value=0, max_value=9),  # txn version
            ),
            min_size=4,
            max_size=20,
        ),
        cut=st.tuples(
            st.integers(min_value=0, max_value=6), st.integers(min_value=1, max_value=6)
        ),
    )
    def run(history, cut):
        import os
        import shutil
        import uuid

        t = str(tmp_path / f"c{uuid.uuid4().hex[:12]}")
        os.makedirs(t)
        try:
            for p, is_add, app, tv in history:
                add = [
                    {"path": p, "partitionValues": {}, "size": 1, "modificationTime": 0}
                ]
                deltalog.write_commit(
                    t,
                    add if is_add else [],
                    [] if is_add else [{"path": p}],
                    txn={"appId": app, "version": tv} if app else None,
                )
            latest = deltalog.latest_version(t)
            want_live = deltalog._live_adds_no_spark(t)
            want_proto = deltalog.table_protocol_no_spark(t)
            want_conf = deltalog.table_configuration_no_spark(t)
            want_txn = deltalog.all_txn_versions(t)
            start = min(cut[0], latest - 1)
            end = min(start + cut[1], latest)
            if start < end:
                deltalog.write_log_compaction(t, start, end)
                # resolvers agree with commits present...
                assert deltalog._live_adds_no_spark(t) == want_live
                assert deltalog.all_txn_versions(t) == want_txn
                # ...and after the compacted commits retire
                for v in range(start, end + 1):
                    os.remove(os.path.join(t, "_delta_log", f"{v:020d}.json"))
                assert deltalog._live_adds_no_spark(t) == want_live
                assert deltalog.table_protocol_no_spark(t) == want_proto
                assert deltalog.table_configuration_no_spark(t) == want_conf
                assert deltalog.all_txn_versions(t) == want_txn
                assert deltalog.latest_version(t) == latest
        finally:
            shutil.rmtree(t, ignore_errors=True)

    run()


# ---------------------------------------------------------------------------
# Duplicate-substring spans vs a direct Python model (round 11)
# ---------------------------------------------------------------------------

_SPAN_K = 3
# two-letter alphabet so random docs collide on k-grams constantly —
# exercising within-doc repeats, cross-doc repeats, overlap and adjacency
_span_doc = st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=24)
_span_corpus = st.lists(_span_doc, min_size=1, max_size=6)


def _span_model(corpus: list[list[str]], k: int) -> dict[int, tuple[int, int, int]]:
    """Brute-force ExactSubstr model: count every k-gram occurrence, mark hit
    positions, merge overlapping/adjacent intervals."""
    from collections import Counter

    grams: Counter = Counter()
    for ts in corpus:
        for i in range(len(ts) - k + 1):
            grams[tuple(ts[i : i + k])] += 1
    out = {}
    for d, ts in enumerate(corpus):
        hits = [
            i for i in range(len(ts) - k + 1) if grams[tuple(ts[i : i + k])] >= 2
        ]
        spans: list[list[int]] = []
        for i in hits:
            if spans and i <= spans[-1][1] + 1:
                spans[-1][1] = i + k - 1
            else:
                spans.append([i, i + k - 1])
        out[d] = (len(ts), len(spans), sum(e - s + 1 for s, e in spans))
    return out


@given(corpus=_span_corpus)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_duplicate_span_stats_matches_model(spark, corpus):
    from delta_lake_proxy_spark.functions import dedup

    docs = spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_spans"], r["dup_span_tokens"])
        for r in dedup.duplicate_span_stats(docs, k=_SPAN_K).collect()
    }
    assert got == _span_model(corpus, _SPAN_K)


# ---------------------------------------------------------------------------
# Version checksum chain vs a direct model over random histories (round 11)
# ---------------------------------------------------------------------------

_crc_op = st.one_of(
    st.tuples(st.just("add_fresh"), st.integers(1, 999)),
    st.tuples(st.just("readd_live"), st.integers(1, 999)),  # same path, new size
    st.tuples(st.just("remove_live"), st.integers(0, 0)),
    st.tuples(st.just("remove_ghost"), st.integers(0, 0)),
    st.tuples(st.just("txn"), st.integers(0, 50)),
    st.tuples(st.just("domain_set"), st.integers(0, 3)),
    st.tuples(st.just("domain_drop"), st.integers(0, 3)),
)


@given(ops=st.lists(_crc_op, min_size=1, max_size=12))
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_version_checksum_chain_matches_model_random_histories(tmp_path, ops):
    """For ANY raw commit history (fresh adds, same-path re-adds, live and
    ghost tombstones, txns, domain set/drop), every committed version must
    carry a crc whose deep validation against the replay passes — the
    incremental maintenance must never drift from the truth, no matter the
    action mix."""
    import itertools
    import os

    from delta_lake_proxy_spark import deltalog

    t = str(tmp_path / f"t{next(_crc_case_counter)}")
    os.makedirs(t)
    deltalog.write_commit(
        t,
        [{"path": "seed.parquet", "partitionValues": {}, "size": 7, "modificationTime": 0}],
        schema_json='{"type":"struct","fields":[]}',
    )
    fresh = itertools.count()
    for kind, arg in ops:
        live = sorted(deltalog._live_adds_no_spark(t))
        adds, removes, txn, domains = [], [], None, None
        if kind == "add_fresh":
            adds = [{"path": f"f{next(fresh)}.parquet", "partitionValues": {}, "size": arg, "modificationTime": 0}]
        elif kind == "readd_live" and live:
            adds = [{"path": live[0], "partitionValues": {}, "size": arg, "modificationTime": 0}]
        elif kind == "remove_live" and live:
            removes = [{"path": live[-1]}]
        elif kind == "remove_ghost":
            removes = [{"path": "ghost.parquet"}]
        elif kind == "txn":
            txn = {"appId": f"app{arg % 3}", "version": arg}
        elif kind == "domain_set":
            domains = [{"domain": f"d{arg}", "configuration": str(arg), "removed": False}]
        elif kind == "domain_drop":
            domains = [{"domain": f"d{arg}", "removed": True}]
        else:
            continue  # re-add/remove on an empty table: no-op case
        deltalog.write_commit_streamed(
            t,
            lambda adds=adds: iter(adds),
            (lambda removes=removes: iter(removes)) if removes else None,
            txn=txn,
            domain_actions=domains,
        )
        v = deltalog.latest_version(t)
        assert deltalog.read_version_checksum(t, v) is not None, (kind, v)
        rep = deltalog.validate_version_checksum(t)
        assert rep["ok"], (kind, rep)


_crc_case_counter = __import__("itertools").count()


# -- Gopher quality/repetition metrics vs the pure-Python oracle (round 12) --

_gq_word = st.text(alphabet="abcXY01#.", min_size=0, max_size=8)
_gq_sep = st.sampled_from(
    [" ", "\n", "\r\n", "\t", " ", "\n\n", " • ", "... ", "…\n"]
)
_gq_text = st.lists(st.tuples(_gq_word, _gq_sep), max_size=40).map(
    lambda ps: "".join(w + s for w, s in ps)
)


@given(text=_gq_text)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gopher_quality_flags_property(spark, text):
    """Every reported metric equals the Python oracle on arbitrary
    whitespace/bullet/ellipsis/NBSP-laced text."""
    from tests.test_llm_ops import _gopher_oracle
    from delta_lake_proxy_spark.functions import quality

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = quality.gopher_quality_flags(docs).collect()[0].asDict()
    want = _gopher_oracle(text)
    for key, val in want.items():
        assert got[key] == pytest.approx(val, abs=1e-6), (key, got[key], val, text)


@given(text=_gq_text)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_repetition_ngram_stats_property(spark, text):
    """Top/dup n-gram coverage equals the Python oracle (incl. the
    overlap-counted-once union) on arbitrary generated text."""
    from tests.test_llm_ops import _rep_ngram_oracle
    from delta_lake_proxy_spark.functions import quality

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = (
        quality.repetition_ngram_stats(docs, top_ns=(2, 3), dup_ns=(2, 4))
        .collect()[0]
        .asDict()
    )
    want = _rep_ngram_oracle(text, top_ns=(2, 3), dup_ns=(2, 4))
    for key, val in want.items():
        assert got[key] == pytest.approx(val, abs=1e-6), (key, got[key], val, text)


_bg_word = st.sampled_from(["a", "b", "c", "dd", "e1"])
_bg_text = st.lists(_bg_word, max_size=25).map(" ".join)


@given(texts=st.lists(_bg_text, min_size=1, max_size=5))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bigram_nll_property(spark, texts):
    """bigram_nll equals the closed-form add-one bigram model (decimal-
    exact: round each logp to 9 dp, exact sum, final divide) on random
    small-alphabet corpora."""
    import math
    from collections import Counter
    from decimal import Decimal

    from delta_lake_proxy_spark.functions import text as T

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in T.bigram_nll(docs).collect()}
    bg_c: Counter = Counter()
    for t in texts:
        ws = t.split()
        bg_c.update(zip(ws, ws[1:]))
    ctx_c: Counter = Counter()
    for (w1, _), c in bg_c.items():
        ctx_c[w1] += c
    vocab = {w for bg in bg_c for w in bg}
    v = len(vocab)
    for i, t in enumerate(texts):
        ws = t.split()
        trans = list(zip(ws, ws[1:]))
        if not trans:
            assert i not in got
            continue
        s = sum(
            Decimal(str(round(math.log((bg_c[bg] + 1) / (ctx_c[bg[0]] + v)), 9)))
            for bg in trans
        )
        want = round(float(-s) / len(trans), 6)
        assert got[i]["n_transitions"] == len(trans)
        assert got[i]["bigram_nll"] == pytest.approx(want, abs=1e-9), (i, t)


@given(
    sigs=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                  min_size=2, max_size=24, unique=True),
    max_hamming=st.integers(min_value=0, max_value=16),
    flips=st.lists(st.integers(min_value=0, max_value=63), max_size=6),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.full
def test_hamming_incremental_equals_batch_cross_pairs(spark, sigs, max_hamming, flips):
    """Property (r13): for ANY signature set and banding, the incremental
    path over the persisted index finds EXACTLY the batch pairer's
    cross pairs at the same distances — the pigeonhole recall guarantee
    carries through the index unchanged. The new batch contains one
    bit-flipped variant of an indexed signature (distance len(flips') by
    construction) plus fresh random sigs."""
    from delta_lake_proxy_spark.functions import dedup

    half = max(1, len(sigs) // 2)
    corpus = [(i, s) for i, s in enumerate(sigs[:half])]
    newsigs = [(1000 + i, s) for i, s in enumerate(sigs[half:])]
    # a controlled near-dup: flip |set(flips)| distinct bits of corpus[0]
    # (flips run in UNSIGNED space — Python XOR on a negative int would
    # leave the infinite-two's-complement range of an int64)
    mutated = corpus[0][1] & (2**64 - 1)
    for b in set(flips):
        mutated ^= 1 << b
    if mutated >= 2**63:
        mutated -= 2**64
    newsigs.append((1999, mutated))
    cdf = spark.createDataFrame(corpus, "doc_id long, sig long")
    ndf = spark.createDataFrame(newsigs, "doc_id long, sig long")
    index = dedup.hamming_signature_index(cdf, sig_col="sig", max_hamming=max_hamming)
    inc = {
        (r["new_id"], r["indexed_id"]): r["hamming"]
        for r in dedup.hamming_near_duplicates_incremental(
            ndf, index, max_hamming=max_hamming
        ).collect()
    }
    batch = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"])): r["hamming"]
        for r in dedup.hamming_near_duplicates(
            cdf.union(ndf), sig_col="sig", max_hamming=max_hamming,
            max_bucket_size=None,
        ).collect()
        if (r["id_a"] >= 1000) != (r["id_b"] >= 1000)
    }
    assert inc == batch
    if len(set(flips)) <= max_hamming:
        assert (1999, corpus[0][0]) in inc  # pigeonhole recall guarantee


@given(
    seed=st.integers(0, 10_000),
    n_cents=st.integers(2, 8),
    dim=st.integers(2, 6),
    n_queries=st.integers(1, 5),
    n_probe=st.integers(1, 10),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rank_centroids_arrow_matches_lexsort_oracle(
    spark, seed, n_cents, dim, n_queries, n_probe
):
    """The batch probe's vectorized per-query centroid ranking equals the
    single probe's lexsort rule (score desc, cid asc) on random matrices:
    the probed-cid PREFIX SET at any random cut agrees, so a ranking
    error anywhere in the order would surface across examples."""
    from delta_lake_proxy_spark.functions import similarity

    rng = np.random.RandomState(seed)
    ids = np.sort(
        rng.choice(np.arange(100), size=n_cents, replace=False)
    ).astype(np.int64)
    mat = rng.randn(n_cents, dim)
    qs = rng.randn(n_queries, dim)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in qs[i]]) for i in range(n_queries)],
        "qid long, v array<double>",
    )
    got: dict[int, set] = {}
    for r in similarity.rank_centroids_arrow(df, ids, mat, "v", n_probe).collect():
        got.setdefault(r["qid"], set()).add(r["_cid"])
    n = max(1, min(n_probe, n_cents))
    for i in range(n_queries):
        scores = mat @ qs[i]
        order = np.lexsort((ids, -scores))  # probe_centroids' exact rule
        want = {int(c) for c in ids[order[:n]]}
        assert got[i] == want and len(got[i]) == n


@given(
    seed=st.integers(0, 10_000),
    n_cents=st.integers(2, 8),
    dim=st.integers(2, 6),
    n_rows=st.integers(1, 8),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.full
def test_assigned_sq_dist_matches_numpy_oracle(
    spark, seed, n_cents, dim, n_rows
):
    """The drift metric's per-row assigned distance equals the plain
    numpy computation on random vectors/assignments, through BOTH
    centroid representations (literal map lookup and broadcast Arrow
    gather) — the dispatch threshold can never change a distance."""
    from delta_lake_proxy_spark.functions import similarity

    rng = np.random.RandomState(seed)
    ids = np.sort(
        rng.choice(np.arange(100), size=n_cents, replace=False)
    ).astype(np.int64)
    mat = rng.randn(n_cents, dim)
    cents_list = [(int(c), [float(x) for x in mat[i]])
                  for i, c in enumerate(ids)]
    vecs = rng.randn(n_rows, dim)
    cids = ids[rng.randint(0, n_cents, size=n_rows)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], int(cids[i])) for i in range(n_rows)],
        "rid long, vec array<double>, _cid long",
    )
    pos = np.searchsorted(ids, cids)
    expect = ((vecs - mat[pos]) ** 2).sum(axis=1)
    for cents in (cents_list, (ids, mat)):
        got = {
            r["rid"]: r["_dist"]
            for r in similarity.assigned_sq_dist(df, cents, "vec").collect()
        }
        for i in range(n_rows):
            assert abs(got[i] - expect[i]) < 1e-9, (i, cents is cents_list)


# -- histogram rollup: merge-linearity + quantile bound (r15) ---------------

hist_vals_st = st.lists(
    st.floats(min_value=-50.0, max_value=150.0,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=60,
)


@given(vals=hist_vals_st, bins=st.integers(1, 16), cut=st.integers(0, 60),
       q=st.sampled_from([0.1, 0.5, 0.9]))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.full
def test_hist_rollup_merge_linear_and_quantile_bound(spark, vals, bins, cut, q):
    """Properties of the mergeable histogram (functions.sketches): for
    ANY value list, bin count and split point — (1) partials over an
    arbitrary split merge to exactly the direct histogram (linearity),
    (2) the estimated quantile is within half a bin width of the exact
    percentile whenever that percentile lands in range, and clamps to
    the pinned [lo, hi] edges otherwise."""
    import math

    from pyspark.sql import functions as F

    from delta_lake_proxy_spark.functions import sketches as sk

    lo, hi = 0.0, 100.0
    w = (hi - lo) / bins
    df = spark.createDataFrame([("g", float(v)) for v in vals],
                               "g string, v double")
    cut = min(cut, len(vals))
    a, b = vals[:cut], vals[cut:]
    parts = []
    for chunk in (a, b):
        if chunk:
            parts.append(sk.hist_rollup(
                spark.createDataFrame([("g", float(v)) for v in chunk],
                                      "g string, v double"),
                ["g"], "v", bins, lo, hi))
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    merged = sk.hist_rollup_merge(un, ["g"], bins).collect()[0]
    direct = sk.hist_rollup(df, ["g"], "v", bins, lo, hi).collect()[0]
    assert merged["counts"] == direct["counts"]
    assert merged["n_rows"] == direct["n_rows"]
    qc = sk.hist_quantile_cols(bins, lo, hi, (q,))
    est = (
        sk.hist_rollup_merge(un, ["g"], bins)
        .select(*[e.alias(n) for n, e in qc.items()])
        .collect()[0][0]
    )
    exact = sorted(vals)[math.ceil(q * len(vals)) - 1]
    if exact < lo:
        assert est == lo
    elif exact >= hi:
        assert est == hi
    else:
        # +1e-6: the estimate column is rounded to 6 decimals, which can
        # carry a boundary midpoint (e.g. 50/3) just past the exact w/2
        assert abs(est - exact) <= w / 2 + 1e-6
