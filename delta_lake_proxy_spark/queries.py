"""Operator query registry: the driver-facing surface of the engine.

Every implemented operator from SURVEY.md §2 registers here as
``QUERIES[name] -> (spark, sf_dir) -> DataFrame`` and (when SQL-expressible)
``ORACLES[name]`` — an equivalent DuckDB SQL statement over the raw fixture
parquet views. The driver hash-compares both at sf0.01; names, column names,
and value rounding are aligned on both sides by construction.

Cross-engine float stability: double sums go through exact DECIMAL
accumulation (bit-stable under any partitioning/order), then cast back to
double; scores/ratios are rounded to 6 decimals on both sides.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import acl, deltalog
from .config import EngineConfig
from .engine import Engine, write_governed_table
from .errors import ReadOnlyError
from .functions import dedup, multimodal, similarity, text
from .io import load_table, local_df, spread_if_narrow
from .operators.joins import asof_join
from .streaming.metrics import session_windows, tumbling_metrics

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, QueryFn] = {}

# Streaming drains must finish before their sink is read; overridable so tests
# can simulate a loaded machine (timeout -> raise, never a partial result).
_STREAM_TIMEOUT_S = float(os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT_S", "300"))
# str, or a zero-arg callable resolved at oracle_sql() time (used by oracles
# whose SQL embeds the on-disk fixture path, which depends on the scale factor)
ORACLES: dict[str, "str | Callable[[], str]"] = {}


def register(name: str, oracle: "str | Callable[[], str] | None" = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def resolved_oracles() -> dict[str, str]:
    """ORACLES with lazy (callable) entries resolved to SQL strings."""
    return {k: (v() if callable(v) else v) for k, v in ORACLES.items()}


def _oracle_fixture_base() -> str:
    """On-disk fixture directory the driver's oracle SQL must read.

    The driver evaluates oracle SQL at sf0.01 (its CORRECTNESS scale);
    ``SPARK_GRAFT_ORACLE_SF_DIR`` overrides for local checks at other SFs.
    """
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    return os.path.join(
        tempfile.gettempdir(),
        "spark_graft_fixtures",
        os.path.basename(os.path.abspath(sf_dir)),
    )


def _gov_replay_sql(body: str) -> Callable[[], str]:
    """Lazy oracle: DuckDB replay of the governed fixture's Delta log (adds
    minus removes, latest action per path wins) exposed as CTE ``live(key,
    size, modificationTime, pv)``; ``log(version, add, remove, commitInfo)``
    holds the raw actions. ``body`` selects from either."""

    def build() -> str:
        glob = os.path.join(_oracle_fixture_base(), GOV_ALIAS, "_delta_log", "*.json")
        return f"""
        WITH log AS (
          SELECT CAST(regexp_extract(filename, '(\\d+)\\.json$', 1) AS BIGINT) AS version,
                 add, remove, commitInfo
          FROM read_json_auto('{glob}', filename=true, format='newline_delimited')
        ),
        actions AS (
          SELECT COALESCE(add.path, remove.path) AS path, add.size AS size,
                 add.modificationTime AS modificationTime,
                 to_json(add.partitionValues) AS pv,
                 add IS NOT NULL AS is_add, version
          FROM log WHERE add IS NOT NULL OR remove IS NOT NULL
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY path ORDER BY version DESC, is_add ASC) AS rn
          FROM actions
        ),
        live AS (
          SELECT '{GOV_ALIAS}/' || path AS key, size, modificationTime, pv
          FROM ranked WHERE rn = 1 AND is_add
        )
        {body}
        """

    return build


def dsum(col: Column, scale: int = 4) -> Column:
    """Exact decimal-accumulated sum of a double column, returned as double.

    Pick ``scale`` so the decimal rounding boundary (0.5 * 10^-scale) sits
    FAR above the input's double binary noise: a product of ~1e5-magnitude
    doubles carries ~1e-6 absolute noise, so scale 8 (half-gap 1e-8) lets
    Spark's and DuckDB's double->decimal conversions round a few
    knife-edge rows to different sides — visible as ~1e-7-level sum drift
    at sf0.1 (caught by the sf0.1 oracle sweep, round 11). Scale 4 keeps
    the gap (5e-5) two orders above the noise on every driver query."""
    return F.sum(col.cast(f"decimal(27,{scale})")).cast("double")


def davg(col: Column, scale: int = 6) -> Column:
    return dsum(col, scale) / F.count(col)


def _sql_dsum(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,{scale}))) AS DOUBLE)"


def _sql_davg(expr: str, scale: int = 6) -> str:
    return f"{_sql_dsum(expr, scale)} / COUNT({expr})"


# ---------------------------------------------------------------------------
# Governed-table fixture (built once per process per sf_dir)
# ---------------------------------------------------------------------------

GOV_ALIAS = "lineitem_gov"
_FIXTURES: dict[str, str] = {}
_FIXTURE_LOCK = __import__("threading").Lock()


def governed_fixture(spark: SparkSession, sf_dir: str) -> str:
    """A delta-logged lineitem table partitioned by ``l_returnflag`` (the
    analog of the reference's MIC partitions, ``config.json:11-18``), with a
    compaction commit so the log contains remove tombstones (FIXTURES.md B5).
    Build is locked against concurrent same-process query invocations."""
    key = os.path.abspath(sf_dir)
    if key in _FIXTURES:
        return _FIXTURES[key]
    return _build_fixture_locked(spark, sf_dir, key)


def _build_fixture_locked(spark: SparkSession, sf_dir: str, key: str) -> str:
    with _FIXTURE_LOCK:
        if key in _FIXTURES:
            return _FIXTURES[key]
        base = os.path.join(
            tempfile.gettempdir(), "spark_graft_fixtures", os.path.basename(key)
        )
        path = os.path.join(base, GOV_ALIAS)
        marker = os.path.join(base, ".ready")
        if not os.path.exists(marker):
            li = load_table(spark, sf_dir, "lineitem").repartition(1)
            write_governed_table(spark, li, path, ["l_returnflag"])
            eng = Engine(
                spark,
                EngineConfig(table_mapping={GOV_ALIAS: path}, read_only=False),
            )
            eng.compact_table(GOV_ALIAS, files_per_partition=1)
            with open(marker, "w", encoding="utf-8") as f:
                f.write("ok")
        _FIXTURES[key] = path
        return path


def governed_engine(
    spark: SparkSession,
    sf_dir: str,
    allowed: dict | None = None,
    permissions: list[tuple] | None = None,
    read_only: bool = True,
) -> Engine:
    path = governed_fixture(spark, sf_dir)
    perms_df = None
    if permissions is not None:
        perms_df = spark.createDataFrame(
            permissions, "id int, user_id string, table_name string, partition_filters string"
        )
    return Engine(
        spark,
        EngineConfig(
            table_mapping={GOV_ALIAS: path},
            allowed_partitions=allowed or {},
            read_only=read_only,
        ),
        permissions_df=perms_df,
    )


# ---------------------------------------------------------------------------
# Retrieval + rollup fixtures (round 16): a governed corpus holding text AND
# vectors with its BM25 + IVF indexes built at fixture time, and a governed
# events table with an incrementally-refreshed HLL sketch rollup — the
# serving-shape driver rows (bm25_probe / hybrid_search /
# sketch_rollup_estimate), each DuckDB-oracle-checked.
# ---------------------------------------------------------------------------

DOCS_ALIAS = "documents_gov"
DOCS_BM25 = DOCS_ALIAS + "__bm25"
DOCS_IVF = DOCS_ALIAS + "__ivf"
EVENTS_ALIAS = "events_gov"
EVENTS_SKETCH = EVENTS_ALIAS + "__sketch"

# SigV4 Authorization header whose Credential access-key segment IS the
# probing identity (G4, ref src/main.rs:1129-1135): acl.extract_user pulls
# 'AKIARETRIEVER' out of it, and that user's DB grants (PROBE_LANGS) gate
# both retrieval rows — the oracle mirrors the grant as a WHERE clause, so
# hash equality certifies extraction AND enforcement end-to-end.
PROBE_AUTH = (
    "AWS4-HMAC-SHA256 Credential=AKIARETRIEVER/20240101/us-east-1/s3/"
    "aws4_request, SignedHeaders=host, Signature=cafe"
)
PROBE_TERMS = ("spark", "window", "merge", "filter")
PROBE_LANGS = ("en", "fr")
# deterministic 64-dim query vector with exact one-decimal components: the
# same double literals appear in the Spark plan and the DuckDB oracle
PROBE_VEC = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
PROBE_K1, PROBE_B = 1.2, 0.75
HYBRID_K, HYBRID_FETCH_K = 10, 20  # fetch_k = engine default 2*k


def docs_fixture(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Build-once (per process per sf_dir) retrieval fixture: documents
    JOIN embeddings as ONE governed Delta table (text + vectors,
    partitioned by ``lang``), plus its governed BM25 posting index and
    IVF vector index — built by an UNRESTRICTED engine, so the pinned
    ``graft.bm25.nDocs/sumDl`` collection statistics describe the full
    corpus while a restricted probe sees only its ACL slice (the
    standard-IR semantics ``Engine.bm25_probe`` documents). The IVF
    index uses 4 centroids so an ``n_probe=4`` probe scans every
    inverted list — EXACT top-k, which is what lets a SQL oracle
    reproduce the dense leg verbatim."""
    key = os.path.abspath(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "spark_graft_fixtures", os.path.basename(key)
    )
    paths = {
        DOCS_ALIAS: os.path.join(base, DOCS_ALIAS),
        DOCS_BM25: os.path.join(base, DOCS_BM25),
        DOCS_IVF: os.path.join(base, DOCS_IVF),
    }
    marker = os.path.join(base, ".ready_docs")
    with _FIXTURE_LOCK:
        if not os.path.exists(marker):
            docs = load_table(spark, sf_dir, "documents")
            emb = load_table(spark, sf_dir, "embeddings")
            corpus = docs.join(
                emb, docs["doc_id"] == emb["vec_id"]
            ).select("doc_id", "lang", "source", "n_chars", "text", "embedding")
            write_governed_table(
                spark, corpus.repartition(1), paths[DOCS_ALIAS], ["lang"]
            )
            eng = Engine(
                spark,
                EngineConfig(table_mapping=dict(paths), read_only=False),
            )
            eng.build_bm25_index(
                DOCS_ALIAS, paths[DOCS_BM25], k1=PROBE_K1, b=PROBE_B
            )
            eng.build_ivf_index(
                DOCS_ALIAS,
                paths[DOCS_IVF],
                num_centroids=4,
                id_col="doc_id",
                vec_col="embedding",
            )
            with open(marker, "w", encoding="utf-8") as f:
                f.write("ok")
    return paths


def retrieval_engine(spark: SparkSession, sf_dir: str) -> Engine:
    """Engine over the retrieval fixture whose DB permission rows grant the
    SigV4-extracted user exactly PROBE_LANGS of the corpus (J2 union
    semantics: no static config, two dynamic grants)."""
    paths = docs_fixture(spark, sf_dir)
    perms = spark.createDataFrame(
        [
            (i + 1, acl.extract_user(PROBE_AUTH), DOCS_ALIAS,
             json.dumps({"lang": lang}))
            for i, lang in enumerate(PROBE_LANGS)
        ],
        "id int, user_id string, table_name string, partition_filters string",
    )
    return Engine(
        spark,
        EngineConfig(table_mapping=paths, read_only=True),
        permissions_df=perms,
    )


def events_fixture(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Build-once governed events table (partitioned by ``event_type``)
    with its HLL sketch rollup taken through a REAL incremental cycle at
    fixture time: build at version 0, append a deterministic second copy
    of the corpus (user ids shifted by 1e6 — reproducible in SQL), then
    ``refresh_sketch_rollup`` so every group holds TWO partial sketch
    rows. The driver row then certifies the union-merged estimate, the
    exact row accounting, and the partial count externally."""
    key = os.path.abspath(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "spark_graft_fixtures", os.path.basename(key)
    )
    paths = {
        EVENTS_ALIAS: os.path.join(base, EVENTS_ALIAS),
        EVENTS_SKETCH: os.path.join(base, EVENTS_SKETCH),
    }
    marker = os.path.join(base, ".ready_events")
    with _FIXTURE_LOCK:
        if not os.path.exists(marker):
            ev = load_table(spark, sf_dir, "events").select(
                "event_id", "event_type", "user_id", "value"
            )
            write_governed_table(
                spark, ev.repartition(1), paths[EVENTS_ALIAS], ["event_type"]
            )
            eng = Engine(
                spark,
                EngineConfig(table_mapping=dict(paths), read_only=False),
            )
            eng.build_sketch_rollup(
                EVENTS_ALIAS, paths[EVENTS_SKETCH], [], "user_id"
            )
            appended = ev.select(
                (F.col("event_id") + 10_000_000).alias("event_id"),
                "event_type",
                (F.col("user_id") + 1_000_000).alias("user_id"),
                "value",
            )
            eng.write_table(EVENTS_ALIAS, appended, mode="append")
            eng.refresh_sketch_rollup(EVENTS_SKETCH)
            with open(marker, "w", encoding="utf-8") as f:
                f.write("ok")
    return paths


SKETCH_EVENT_TYPES = ("click", "purchase", "view")  # metrics_reader's grant

EVENTS_HIST_ALIAS = "events_hist_gov"
EVENTS_HIST = EVENTS_HIST_ALIAS + "__hist"
# power-of-two bin geometry: width (hi-lo)/bins = 32.0 and midpoints
# lo + (i+0.5)*32 are EXACT doubles, so the oracle's quantile arithmetic
# reproduces Spark's bit-for-bit (events.value sits in [0, ~500])
HIST_BINS, HIST_LO, HIST_HI = 16, 0.0, 512.0
HIST_QUANTILES = (0.25, 0.5, 0.95)


def hist_fixture(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Build-once governed events table with its histogram rollup taken
    through the FULL maintenance cycle at fixture time: build at the base
    version, append a deterministic second corpus copy, DELETE every
    seventh event id (both base and appended rows — exercising the
    histogram's unique delete story: counts are linear, so the refresh
    absorbs the delete as NEGATIVE partials with no group recompute),
    then one ``refresh_hist_rollup`` covering both commits. The driver
    row's oracle replays base + append − delete from raw parquet and
    re-derives the bin counts and quantile arithmetic exactly."""
    key = os.path.abspath(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "spark_graft_fixtures", os.path.basename(key)
    )
    paths = {
        EVENTS_HIST_ALIAS: os.path.join(base, EVENTS_HIST_ALIAS),
        EVENTS_HIST: os.path.join(base, EVENTS_HIST),
    }
    marker = os.path.join(base, ".ready_events_hist")
    with _FIXTURE_LOCK:
        if not os.path.exists(marker):
            ev = load_table(spark, sf_dir, "events").select(
                "event_id", "event_type", "value"
            )
            write_governed_table(
                spark, ev.repartition(1), paths[EVENTS_HIST_ALIAS],
                ["event_type"],
            )
            eng = Engine(
                spark,
                EngineConfig(table_mapping=dict(paths), read_only=False),
            )
            eng.build_hist_rollup(
                EVENTS_HIST_ALIAS, paths[EVENTS_HIST], [], "value",
                bins=HIST_BINS, lo=HIST_LO, hi=HIST_HI,
            )
            appended = ev.select(
                (F.col("event_id") + 10_000_000).alias("event_id"),
                "event_type",
                "value",
            )
            eng.write_table(EVENTS_HIST_ALIAS, appended, mode="append")
            eng.delete(
                EVENTS_HIST_ALIAS, condition=F.col("event_id") % 7 == 0
            )
            eng.refresh_hist_rollup(EVENTS_HIST)
            with open(marker, "w", encoding="utf-8") as f:
                f.write("ok")
    return paths


def _hist_quantiles_sql() -> str:
    """DuckDB replay of the histogram-rollup quantile path from raw
    parquet: rebuild the live row set (base ∪ shifted-append, minus the
    deleted seventh ids), assign bins with the SAME float arithmetic as
    ``sketches._hist_bin_expr`` (floor((v-lo)/w), clamp, under/overflow
    sentinels), then per quantile take the first bin whose cumulative
    count reaches ceil(q*total) and map it to its midpoint — zero-count
    bins can never cross first, so MIN(bin) over the non-zero bins equals
    Spark's array_position over the dense counts array."""
    w = (HIST_HI - HIST_LO) / HIST_BINS
    ll = ", ".join(f"'{t}'" for t in SKETCH_EVENT_TYPES)
    qcols, qsel_parts, joins_parts = [], [], []
    for q in HIST_QUANTILES:
        n = "q" + str(q).replace(".", "_")
        # ceil over a DOUBLE product: a decimal-literal q would make
        # total*q exact decimal arithmetic, which can land one integer
        # BELOW the double product Spark ceils (0.95's double sits above
        # 0.95) — cast q so both engines ceil the identical double
        qcols.append(f"""
    {n}_pos AS (
      SELECT c.event_type, MIN(c.b) AS pos
      FROM cum c JOIN totals t USING (event_type)
      WHERE c.cum >= greatest(
        CAST(ceil(t.total * CAST({q} AS DOUBLE)) AS BIGINT),
        CAST(1 AS BIGINT))
      GROUP BY 1
    )""")
        qsel_parts.append(
            f"round(CASE WHEN {n}_pos.pos = 1 THEN {HIST_LO} "
            f"WHEN {n}_pos.pos = {HIST_BINS + 2} THEN {HIST_HI} "
            f"ELSE {HIST_LO} + (CAST({n}_pos.pos AS DOUBLE) - 2.0 + 0.5) "
            f"* {w} END, 6) AS {n}"
        )
        joins_parts.append(f"JOIN {n}_pos USING (event_type)")
    qsel = ", ".join(qsel_parts)
    joins = " ".join(joins_parts)
    return f"""
    WITH base AS (
      SELECT event_id, event_type, value FROM events
      UNION ALL
      SELECT event_id + 10000000 AS event_id, event_type, value FROM events
    ),
    live AS (SELECT * FROM base WHERE event_id % 7 != 0
             AND event_type IN ({ll})),
    binned AS (
      SELECT event_type,
             CASE WHEN value IS NULL THEN NULL
                  WHEN value < {HIST_LO} THEN 1
                  WHEN value >= {HIST_HI} THEN {HIST_BINS + 2}
                  ELSE least(CAST(floor((value - {HIST_LO}) / {w}) AS INT),
                             {HIST_BINS - 1}) + 2 END AS b
      FROM live
    ),
    counts AS (SELECT event_type, b, COUNT(*) AS c FROM binned
               WHERE b IS NOT NULL GROUP BY 1, 2),
    totals AS (SELECT event_type, SUM(c) AS total FROM counts GROUP BY 1),
    nrows AS (SELECT event_type, COUNT(*) AS n_rows FROM live GROUP BY 1),
    cum AS (
      SELECT event_type, b,
             SUM(c) OVER (PARTITION BY event_type ORDER BY b) AS cum
      FROM counts
    ),{','.join(qcols)}
    SELECT nrows.event_type, nrows.n_rows, {qsel}
    FROM nrows {joins}
    """


HIST_QUANTILES_SQL = _hist_quantiles_sql()


def _bm25_sql_ctes() -> str:
    """The DuckDB replay of the BM25 scoring path: tokenize the corpus
    (same ``[a-z0-9]+`` word regex as ``functions.text.WORD_RE``), tf per
    (doc, term), dl per doc, collection stats over the FULL corpus (the
    pinned-at-build ``graft.bm25.*`` semantics), df on the ACL-visible
    query-term slice, then the shared Okapi formula with every mixed
    operand CAST to DOUBLE so each arithmetic op is the same IEEE-double
    op Spark's expression tree performs."""
    tl = ", ".join(f"'{t}'" for t in sorted(set(PROBE_TERMS)))
    ll = ", ".join(f"'{lang}'" for lang in PROBE_LANGS)
    k1, b = PROBE_K1, PROBE_B
    return f"""
    toks AS (
      SELECT d.doc_id, d.lang,
             unnest(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS term
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    tf AS (SELECT doc_id, lang, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2, 3),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM dl),
    sl AS (
      SELECT tf.doc_id, tf.term, tf.tf, dl.dl
      FROM tf JOIN dl USING (doc_id)
      WHERE tf.term IN ({tl}) AND tf.lang IN ({ll})
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM sl GROUP BY 1),
    bm AS (
      SELECT sl.doc_id,
             round(SUM(
               ln((CAST(stats.n AS DOUBLE) - dfreq.df + 0.5)
                  / (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0)
               * (CAST(sl.tf AS DOUBLE) * {k1 + 1})
               / (CAST(sl.tf AS DOUBLE)
                  + {k1} * ({1 - b} + ({b} * CAST(sl.dl AS DOUBLE))
                            / (CAST(stats.sumdl AS DOUBLE) / stats.n)))
             ), 6) AS bm25
      FROM sl JOIN dfreq USING (term) CROSS JOIN stats
      GROUP BY sl.doc_id
    )"""


BM25_PROBE_SQL = f"""
WITH {_bm25_sql_ctes()}
SELECT doc_id, bm25, '{acl.extract_user(PROBE_AUTH)}' AS probe_user
FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 15
"""


def _hybrid_sql() -> str:
    """RRF arithmetic over the two SQL top-k CTE legs: the BM25 leg from
    ``_bm25_sql_ctes``, the dense leg as exact double-precision cosine
    (the engine's 4-centroid / n_probe=4 probe scans every list, so the
    approximate index answers the EXACT top-k), ranks per leg on the
    rounded scores with the engine's (score desc, id asc) total order,
    contributions 1/(60 + rank) (Cormack 2009), fused top-k."""
    vec = "[" + ", ".join(str(x) for x in PROBE_VEC) + "]::DOUBLE[]"
    ll = ", ".join(f"'{lang}'" for lang in PROBE_LANGS)
    return f"""
    WITH {_bm25_sql_ctes()},
    lexk AS (SELECT doc_id, bm25 FROM bm
             ORDER BY bm25 DESC, doc_id ASC LIMIT {HYBRID_FETCH_K}),
    q AS (SELECT {vec} AS qv),
    dense AS (
      SELECT e.vec_id AS doc_id,
             round(
               list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qv, q.qv))), 6) AS score
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id CROSS JOIN q
      WHERE d.lang IN ({ll})
    ),
    denk AS (SELECT doc_id, score FROM dense
             ORDER BY score DESC, doc_id ASC LIMIT {HYBRID_FETCH_K}),
    lexr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)
                    AS rnk FROM lexk),
    denr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC)
                    AS rnk FROM denk),
    contrib AS (
      SELECT doc_id, CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + rnk) AS c
      FROM lexr
      UNION ALL
      SELECT doc_id, CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + rnk) AS c
      FROM denr
    ),
    fused AS (SELECT doc_id, round(SUM(c), 6) AS rrf_score
              FROM contrib GROUP BY 1)
    SELECT doc_id, rrf_score FROM fused
    ORDER BY rrf_score DESC, doc_id ASC LIMIT {HYBRID_K}
    """


HYBRID_SEARCH_SQL = _hybrid_sql()

SKETCH_ROLLUP_SQL = f"""
WITH all_events AS (
  SELECT event_type, user_id FROM events
  UNION ALL
  SELECT event_type, user_id + 1000000 AS user_id FROM events
)
SELECT event_type, COUNT(*) AS n_rows,
       COUNT(DISTINCT user_id) AS exact_distinct,
       true AS within_bounds,
       CAST(2 AS BIGINT) AS n_partials
FROM all_events
WHERE event_type IN ({', '.join(f"'{t}'" for t in SKETCH_EVENT_TYPES)})
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# G1 governed read (flagship) + ACL semantics (P2-P4, G3, J2)
# ---------------------------------------------------------------------------

Q1_AGGS = lambda: [  # noqa: E731 - shared TPC-H-Q1-style aggregate list
    dsum(F.col("l_quantity")).alias("sum_qty"),
    dsum(F.col("l_extendedprice")).alias("sum_base_price"),
    dsum((F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
    davg(F.col("l_quantity")).alias("avg_qty"),
    davg(F.col("l_discount"), 8).alias("avg_disc"),
    F.count(F.lit(1)).alias("count_order"),
]

_Q1_SQL_AGGS = f"""
  {_sql_dsum('l_quantity')} AS sum_qty,
  {_sql_dsum('l_extendedprice')} AS sum_base_price,
  {_sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
  {_sql_davg('l_quantity')} AS avg_qty,
  {_sql_davg('l_discount', 8)} AS avg_disc,
  COUNT(*) AS count_order
"""


@register(
    "governed_read",
    f"""
    SELECT l_returnflag, l_linestatus, {_Q1_SQL_AGGS},
           true AS strict_forbidden_403
    FROM lineitem WHERE l_returnflag IN ('A', 'N')
    GROUP BY l_returnflag, l_linestatus
    """,
)
def governed_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: catalog -> ACL DNF {A} OR {N} -> pruned scan -> aggregation.

    The scan is a real partitioned delta-logged table; the injected predicate
    prunes partitions (verified in tests via inputFiles()).

    ``strict_forbidden_403`` is the driver-visible NEGATIVE branch (the
    documented 403-vs-filter policy divergence, SURVEY §3.3): the reference
    403s explicit forbidden reads (src/main.rs:576-594) where the default
    governed read silently filters. The column certifies both reference
    behaviors: (a) ``strict=True`` with an empty permitted partition set
    raises before any scan is planned, and (b) an explicit file request in
    a forbidden partition (the R files, outside the A/N DNF) 403s through
    ``authorize_file`` — both driver-side, zero extra Spark jobs."""
    from . import deltalog as _dl
    from .errors import ForbiddenByPolicyError

    eng = governed_engine(
        spark,
        sf_dir,
        allowed={GOV_ALIAS: [{"l_returnflag": "A"}, {"l_returnflag": "N"}]},
    )
    df = eng.read_table(GOV_ALIAS, user="analyst")
    # (a) strict read with a configured-but-empty DNF -> 403, not empty rows
    denied_eng = governed_engine(spark, sf_dir, allowed={GOV_ALIAS: [{}]})
    try:
        denied_eng.read_table(GOV_ALIAS, user="intruder", strict=True)
        strict_403 = False
    except ForbiddenByPolicyError:
        strict_403 = True
    # (b) explicit GET of a forbidden partition's file -> 403 (file-level
    # membership check, reference semantics)
    path = governed_fixture(spark, sf_dir)
    r_file = next(
        rel
        for rel, add in sorted(_dl._live_adds_no_spark(path).items())
        if (add.get("partitionValues") or {}).get("l_returnflag") == "R"
    )
    try:
        eng.authorize_file(GOV_ALIAS, "analyst", r_file)
        file_403 = False
    except ForbiddenByPolicyError:
        file_403 = True
    return (
        df.groupBy("l_returnflag", "l_linestatus")
        .agg(*Q1_AGGS())
        .withColumn("strict_forbidden_403", F.lit(strict_403 and file_403))
    )


@register(
    "governed_stream_read",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem WHERE l_returnflag IN ('A', 'N')
    """,
)
def governed_stream_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: the log-cursor governed STREAMING reader, driver-checkable — an
    availableNow run serves exactly one batch: the tombstone-reconciled,
    DNF-filtered live snapshot, so the drained sink equals the batch filter
    and the DuckDB oracle can certify a real streaming execution (same
    memory-sink discipline as ``late_data_watermark``: a timed-out drain is
    a hard failure, never a partial result)."""
    import uuid as _uuid

    from .sources.governed import GovernedDataSource

    path = governed_fixture(spark, sf_dir)
    spark.dataSource.register(GovernedDataSource)
    stream = (
        spark.readStream.format("governed")
        .option("path", path)
        .option("dnf", json.dumps([{"l_returnflag": "A"}, {"l_returnflag": "N"}]))
        .load()
    )
    qname = f"gov_stream_{_uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(_STREAM_TIMEOUT_S):
            raise TimeoutError(
                f"governed_stream_read: streaming query still active after "
                f"{_STREAM_TIMEOUT_S}s; refusing to return a partial sink"
            )
        if q.exception() is not None:
            raise q.exception()
    finally:
        q.stop()
    return spark.table(qname).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@register(
    "acl_dnf",
    """
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(month(l_shipdate) AS BIGINT) AS ship_month,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE (CAST(year(l_shipdate) AS VARCHAR) = '1995' AND CAST(month(l_shipdate) AS VARCHAR) = '3')
       OR (CAST(year(l_shipdate) AS VARCHAR) = '1996' AND CAST(month(l_shipdate) AS VARCHAR) = '7')
    GROUP BY 1, 2
    """,
)
def acl_dnf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-column DNF (mirrors test_config.json:10-19's year/month ACL):
    compile_dnf produces the OR-of-ANDs predicate over derived columns.

    The leading empty map exercises the reference's empty-filter-map SKIP
    (src/main.rs:399-401, P4): an empty map contributes nothing — it is NOT
    allow-all — so the result equals the two non-empty branches alone. The
    oracle omits the empty branch; hash equality certifies the skip."""
    li = load_table(spark, sf_dir, "lineitem").withColumns(
        {
            "ship_year": F.year("l_shipdate").cast("long"),
            "ship_month": F.month("l_shipdate").cast("long"),
        }
    )
    pred = acl.compile_dnf(
        [
            {},
            {"ship_year": "1995", "ship_month": "3"},
            {"ship_year": "1996", "ship_month": "7"},
        ]
    )
    return (
        li.filter(pred)
        .groupBy("ship_year", "ship_month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("l_extendedprice")).alias("sum_price"),
        )
    )


@register(
    "permission_lookup_join",
    """
    SELECT l_returnflag, COUNT(*) AS n_rows FROM lineitem
    WHERE l_returnflag IN ('A', 'R') GROUP BY l_returnflag
    """,
)
def permission_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """static config ACL {A} UNION DB-granted {R} for user alice
    (union semantics: src/main.rs:555-573; DB lookup src/database.rs:38-43)."""
    eng = governed_engine(
        spark,
        sf_dir,
        allowed={GOV_ALIAS: [{"l_returnflag": "A"}]},
        permissions=[
            (1, "alice", GOV_ALIAS, '{"l_returnflag": "R"}'),
            (2, "bob", GOV_ALIAS, '{"l_returnflag": "N"}'),
            (3, "alice", "other_table", '{"l_returnflag": "N"}'),
        ],
    )
    df = eng.read_table(GOV_ALIAS, user="alice")
    return df.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_rows"))


@register("bm25_probe", BM25_PROBE_SQL)
def bm25_probe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governed BM25 index probe, driver-oracle-checked (X4 lexical leg +
    G4): the probing identity is EXTRACTED from a SigV4 Authorization
    header (``acl.extract_user``, ref src/main.rs:1129-1135) and its DB
    grants (PROBE_LANGS) gate the posting scan, while the collection
    statistics come from the ``graft.bm25.*`` properties pinned at build
    over the FULL corpus. The DuckDB oracle re-derives the entire path —
    tokenize, tf/dl/df, pinned-stats semantics, Okapi formula — from the
    raw parquet, so hash equality certifies the index content, the probe
    ranking, the pinned statistics AND the ACL in one row. Replaced the
    retired ``request_identity`` row in round 16 (still pytest-gated);
    the header-extraction leg rides along here."""
    eng = retrieval_engine(spark, sf_dir)
    user = acl.extract_user(PROBE_AUTH)
    out = eng.bm25_probe(DOCS_BM25, list(PROBE_TERMS), k=15, user=user)
    return out.withColumn("probe_user", F.lit(user))


REQUEST_IDENTITY_SQL = """
    SELECT doc_id,
           concat('trades/', source, '/', CAST(doc_id AS VARCHAR), '.parquet') AS key,
           regexp_replace(
             concat('physical-bucket/deep/prefix/trades/', source, '/', CAST(doc_id AS VARCHAR), '.parquet'),
             '^physical-bucket/deep/prefix/', '') AS rewritten,
           CASE WHEN doc_id % 5 = 0 THEN 'anonymous'
                ELSE concat('AKIA', upper(source)) END AS user_id
    FROM documents
    """


def request_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-request parsing in one pass (G4 + P5): SigV4 identity extraction
    from a synthesized Authorization header (src/main.rs:1129-1135; every
    fifth request anonymous) and the alias<->physical key-namespace
    projection (src/main.rs:273-317). The oracle reconstructs the extracted
    credential directly, so hash equality certifies the regex."""
    docs = load_table(spark, sf_dir, "documents")
    auth = F.when(F.col("doc_id") % 5 == 0, F.lit("")).otherwise(
        F.concat(
            F.lit("AWS4-HMAC-SHA256 Credential=AKIA"),
            F.upper("source"),
            F.lit("/20240101/us-east-1/s3/aws4_request, SignedHeaders=host, Signature=abc"),
        )
    )
    extracted = F.regexp_extract(auth, r"Credential=([^/,\s]+)/", 1)
    physical = F.concat(
        F.lit("physical-bucket/deep/prefix/trades/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit(".parquet"),
    )
    alias_key = F.concat(
        F.lit("trades/"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string"), F.lit(".parquet")
    )
    return docs.select(
        "doc_id",
        alias_key.alias("key"),
        F.regexp_replace(physical, "^physical-bucket/deep/prefix/", "").alias("rewritten"),
        F.when(extracted == "", F.lit(acl.ANONYMOUS)).otherwise(extracted).alias("user_id"),
    )


# ---------------------------------------------------------------------------
# Relational core: filters, aggregations, joins, windows, top-k (P7, A6, J3-J7, W2, O4)
# ---------------------------------------------------------------------------


@register(
    "filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_quantity < 24
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 row filter + projection; also the S9 byte-range analog — the
    pushed predicates + 4-column ReadSchema (verified via .explain in
    tests) are the engine's version of `Range: bytes=a-b`."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")


@register(
    "agg_group",
    f"""
    SELECT l_returnflag, l_linestatus, {_Q1_SQL_AGGS},
           COUNT(DISTINCT l_orderkey) AS n_orders,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (A6) — partial+final hash agg, no Python —
    plus the reference's plain counting surface in the same pass: exact
    distinct order count (A2), min/max extrema, row counts (A1)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            *Q1_AGGS(),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


@register(
    "agg_rollup_cube",
    """
    SELECT 'rollup' AS gset, l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS gset, l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 multi-level aggregation: ROLLUP and CUBE grouping sets over the
    same keys, tagged and unioned so both operators run under one driver
    row.

    r17: ROLLUP(a, b)'s grouping sets {(a,b), (a), ()} are a subset of
    CUBE(a, b)'s {(a,b), (a), (b), ()}, and each shared set's aggregates
    are identical — so ONE cube aggregation serves both legs: rows whose
    ``grouping_id`` is not the (b)-only set (gid == 2 for this column
    order) are re-emitted under the 'rollup' tag via a single explode.
    The old two-leg union scanned lineitem twice and expanded each input
    row 7x (3 rollup + 4 cube sets) across two shuffles; this shape is
    one scan, one 4x Expand, one shuffle — the exact row set (and oracle
    hash) of the union is preserved."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows"), dsum(F.col("l_quantity")).alias("sum_qty")]
    c = li.cube("l_returnflag", "l_linestatus").agg(
        *aggs, F.grouping_id().alias("_gid")
    )
    return c.select(
        F.explode(
            F.when(F.col("_gid") == 2, F.array(F.lit("cube"))).otherwise(
                F.array(F.lit("rollup"), F.lit("cube"))
            )
        ).alias("gset"),
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        "sum_qty",
    )


@register(
    "top_k",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: executed as TakeOrderedAndProject (per-partition top-k + merge)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@register(
    "join_inner",
    f"""
    SELECT n_name, {_sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-ish star join (J3).

    r17 (guide §3.2 — reduce the big side before shuffling it): the only
    selective predicate (``r_name = 'ASIA'``) enters through the dimension
    chain, so apply it BEFORE the fact-fact join — customer⋈nation⋈region
    filtered to ASIA (all broadcast, map-side), that onto orders (broadcast,
    map-side), and only then lineitem⋈orders. Inner joins commute, so the
    row set is identical, but the orders side of the fact join carries ~1/5
    of the rows projected to (o_orderkey, n_name) — small enough that AQE
    finishes the whole chain broadcast at bench scale, and 5x less shuffle
    at any scale. The old shape shuffled ALL of lineitem and ALL of orders
    first and threw 4/5 of the join away in the post-join filter."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    c_asia = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey", "n_name")
    )
    # Hint only the fixed-size dims (nation/region); c_asia grows with
    # customer cardinality, so AQE's size-based decision picks broadcast
    # vs shuffle for it (r18, advice r17: an unconditional hint would force
    # a driver-OOM-sized broadcast build at large SFs).
    o_asia = o.join(c_asia, o.o_custkey == c_asia.c_custkey).select(
        "o_orderkey", "n_name"
    )
    return (
        li.join(o_asia, li.l_orderkey == o_asia.o_orderkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "join_outer",
    """
    SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(27,4))), 0) AS DOUBLE) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r17 (guide §2.3 — aggregate before you shuffle): orders pre-aggregate
    to one row per custkey BEFORE the outer join, so the join moves ~1/10 of
    the rows and the post-join side needs no aggregation at all — a missing
    custkey is exactly the empty group (count 0 / sum 0, via coalesce). The
    old shape shuffled every raw order row into the join and aggregated the
    joined relation. Decimal sums are order-independent, so values are
    bit-identical."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    oa = o.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("_n"),
        F.sum(F.col("o_totalprice").cast("decimal(27,4)")).alias("_t"),
    )
    return c.join(oa, c.c_custkey == oa.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("_n"), F.lit(0).cast("long")).alias("n_orders"),
        F.coalesce(F.col("_t"), F.lit(0).cast("decimal(27,4)"))
        .cast("double")
        .alias("total_spent"),
    )


@register(
    "join_range",
    """
    SELECT band, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS band_total
    FROM orders
    JOIN (VALUES ('small', 0.0, 100000.0), ('medium', 100000.0, 300000.0),
                 ('large', 300000.0, 600000.0)) AS bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 theta join: the small band table is broadcast, so the non-equi
    condition runs as a broadcast nested-loop — the scale-correct shape."""
    o = load_table(spark, sf_dir, "orders")
    bands = local_df(
        spark,
        [("small", 0.0, 100000.0), ("medium", 100000.0, 300000.0), ("large", 300000.0, 600000.0)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("band_total"),
        )
    )


@register(
    "join_asof",
    """
    WITH u AS (
      SELECT user_id, ts, event_id AS click_id, NULL::BIGINT AS purchase_id, 1 AS side
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, NULL::BIGINT, event_id, 0 FROM events WHERE event_type = 'purchase'
    )
    SELECT click_id AS event_id, user_id, last_purchase_id
    FROM (
      SELECT *, last_value(purchase_id IGNORE NULLS) OVER (
        PARTITION BY user_id ORDER BY ts ASC, side ASC, purchase_id ASC NULLS FIRST
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_id
      FROM u
    ) WHERE side = 1
    """,
)
def join_asof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 as-of join: for each click, the latest purchase by the same user at
    or before the click. Union+window formulation — one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values=["purchase_id"],
        suffix="",
    )
    return out.select(
        "event_id", "user_id", F.col("purchase_id").alias("last_purchase_id")
    )


@register(
    "auth_join",
    """
    SELECT 'allowed' AS op, l_orderkey, l_linenumber, l_returnflag,
           CAST(NULL AS BIGINT) AS n_denied
    FROM lineitem
    WHERE l_returnflag IN (SELECT flag FROM (VALUES ('A'), ('N')) AS allowed(flag))
    UNION ALL
    SELECT 'denied', NULL, NULL, l_returnflag, COUNT(*) FROM lineitem
    WHERE l_returnflag NOT IN (SELECT flag FROM (VALUES ('A'), ('N')) AS allowed(flag))
    GROUP BY l_returnflag
    """,
)
def auth_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/J1/J5 in ONE driver row (merged in round 7 to free a slot in the
    pinned 50-query window): the 200 path — requested-rows ∈ allowed set as
    a left-SEMI join on the broadcast allowed set, row-level — UNION the
    403 complement — left-ANTI join, counted per denied partition."""
    li = load_table(spark, sf_dir, "lineitem")
    allowed = local_df(spark, [("A",), ("N",)], "flag: string")
    ln_type = li.schema["l_linenumber"].dataType
    ok_type = li.schema["l_orderkey"].dataType
    semi = li.join(
        F.broadcast(allowed), li.l_returnflag == allowed.flag, "left_semi"
    ).select(
        F.lit("allowed").alias("op"),
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.lit(None).cast("long").alias("n_denied"),
    )
    anti = (
        li.join(F.broadcast(allowed), li.l_returnflag == allowed.flag, "left_anti")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_denied"))
        .select(
            F.lit("denied").alias("op"),
            F.lit(None).cast(ok_type).alias("l_orderkey"),
            F.lit(None).cast(ln_type).alias("l_linenumber"),
            "l_returnflag",
            "n_denied",
        )
    )
    return semi.unionByName(anti)


@register(
    "window_funcs",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER w AS BIGINT) AS rk,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           round(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS mov_avg_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 in one pass: ranking (row_number), offsets (lag/lead), and a
    bounded frame aggregate (3-preceding moving average) over the same
    deterministic window spec — ONE sort+shuffle instead of three separate
    window queries (the r2 registry spent three driver rows on these)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    wf = w.rowsBetween(-3, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rk"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(F.avg("o_totalprice").over(wf), 6).alias("mov_avg_price"),
    )


@register(
    "string_funcs",
    """
    WITH u AS (
      SELECT p_partkey,
             concat('https://datalake.example.com/catalog/part?pkey=',
                    CAST(p_partkey AS VARCHAR), '&size=',
                    CAST(p_size AS VARCHAR)) AS url
      FROM part
    )
    SELECT p.p_partkey,
           lower(p_name) AS name_lc,
           upper(p_brand) AS brand_uc,
           split_part(p_type, ' ', 1) AS type_head,
           CAST(length(p_name) - length(replace(p_name, ' ', '')) + 1 AS INT) AS name_words,
           concat(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size,
           replace(replace(replace(replace(replace(
             concat(p_name, ' <', p_brand, '> & "', p_type, ''''),
             '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
             '"', '&quot;'), '''', '&apos;') AS escaped,
           regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]pkey=([^&]*)', 1) AS pkey_param
    FROM part p JOIN u ON u.p_partkey = p.p_partkey
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar string surface in one projection over ``part``:

    - F1/F7 string algebra (split/strip/concat/case);
    - F2 XML escaping (the reference's S3 ListObjects XML layer,
      src/main.rs:352): the 5 XML entities, & first so entities don't
      double-escape — a pure codegen replace chain, no UDF;
    - F3 URL parsing (src/main.rs:1129-1135): Spark's native parse_url
      extracts protocol/host/path/query and a named query param; the oracle
      reconstructs each with regexes."""
    p = load_table(spark, sf_dir, "part")
    raw = F.concat(
        F.col("p_name"), F.lit(" <"), F.col("p_brand"), F.lit("> & \""),
        F.col("p_type"), F.lit("'"),
    )
    escaped = raw
    for ch, ent in [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&apos;")]:
        escaped = F.replace(escaped, F.lit(ch), F.lit(ent))
    url = F.concat(
        F.lit("https://datalake.example.com/catalog/part?pkey="),
        F.col("p_partkey").cast("string"),
        F.lit("&size="),
        F.col("p_size").cast("string"),
    )
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.upper("p_brand").alias("brand_uc"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        (F.length("p_name") - F.length(F.replace(F.col("p_name"), F.lit(" "), F.lit(""))) + 1)
        .cast("int")
        .alias("name_words"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        escaped.alias("escaped"),
        F.lower(F.parse_url(url, F.lit("PROTOCOL"))).alias("scheme"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("pkey")).alias("pkey_param"),
    )


def join_cross_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 cross join: the tiny-dimension Cartesian case (the only sane one;
    Spark uses BroadcastNestedLoopJoin since region is broadcast-sized).

    Retired from the pinned 50-query driver window in round 7 to free a slot
    for ``dv_read`` — J8 stays driver-certified via ``catalog_surface``
    (catalogs x tables x detail, the same broadcast-sized crossJoin shape)
    and this function stays pinned by pytest (test_registry)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    a, b = r.alias("a"), r.alias("b")
    return a.crossJoin(b).select(
        F.col("a.r_name").alias("region_a"),
        F.col("b.r_name").alias("region_b"),
        (F.length("a.r_name") + F.length("b.r_name")).cast("int").alias("name_len_sum"),
    )


DV_ALIAS = "documents_dv"


def dv_fixture(spark: SparkSession, sf_dir: str) -> str:
    """A reader-3 deletion-vector table authored from the documents corpus
    (FIXTURES.md analog for the DV read path): one sorted parquet file of
    (doc_id, lang, n_chars), then a DELETE commit whose inline deletion
    vector marks the positions of every ``doc_id % 7 == 0`` row — the
    delta-spark shape for DELETE-without-rewrite (Delta PROTOCOL.md
    "Deletion Vectors"; the reference inherits the same semantics from
    ``deltalake::open_table``, ref src/main.rs:357)."""
    import glob as _glob
    import shutil as _sh

    from . import dv as _dv
    from .deltalog import log_path

    key = os.path.abspath(sf_dir)
    cache_key = ("dv", key)
    if cache_key in _FIXTURES:
        return _FIXTURES[cache_key]
    with _FIXTURE_LOCK:
        if cache_key in _FIXTURES:
            return _FIXTURES[cache_key]
        base = os.path.join(
            tempfile.gettempdir(), "spark_graft_fixtures", os.path.basename(key)
        )
        path = os.path.join(base, DV_ALIAS)
        marker = os.path.join(base, f".{DV_ALIAS}_ready")
        if not os.path.exists(marker):
            _sh.rmtree(path, ignore_errors=True)
            # the dv_read clone holds ABSOLUTE references into this fixture:
            # a rebuild (regenerated sf dir, cleared marker) would leave the
            # clone pointing at deleted/changed source files — its lifetime
            # is tied to the fixture's, so it rebuilds with it
            _sh.rmtree(path.rstrip("/") + "-clone", ignore_errors=True)
            docs = (
                load_table(spark, sf_dir, "documents")
                .select("doc_id", "lang", "n_chars")
                .repartition(1)
                .sortWithinPartitions("doc_id")
            )
            staging = path + ".staging"
            docs.write.mode("overwrite").parquet(staging)
            part = _glob.glob(os.path.join(staging, "part-*.parquet"))
            assert len(part) == 1, "fixture must be a single sorted file"
            rel = "part-00000-dv-fixture.parquet"
            os.makedirs(path, exist_ok=True)
            os.replace(part[0], os.path.join(path, rel))
            _sh.rmtree(staging, ignore_errors=True)
            # file row order == doc_id order, so the DELETEd positions are
            # the ranks of the doc_id % 7 == 0 rows (the oracle re-derives
            # the same set by PREDICATE — independent cross-check)
            ids = [
                r["doc_id"]
                for r in docs.select("doc_id").orderBy("doc_id").collect()
            ]
            positions = [i for i, d in enumerate(ids) if int(d) % 7 == 0]
            desc = _dv.inline_descriptor(positions)
            size = os.path.getsize(os.path.join(path, rel))
            schema_string = docs.schema.json()
            logd = log_path(path)
            os.makedirs(logd, exist_ok=True)
            base_add = {
                "path": rel,
                "partitionValues": {},
                "size": size,
                "modificationTime": 1700000000000,
                "dataChange": True,
            }
            commits = [
                [
                    {
                        "protocol": {
                            "minReaderVersion": 3,
                            "minWriterVersion": 7,
                            "readerFeatures": ["deletionVectors"],
                            "writerFeatures": ["deletionVectors"],
                        }
                    },
                    {
                        "metaData": {
                            "id": "dv-fixture",
                            "format": {"provider": "parquet"},
                            "schemaString": schema_string,
                            "partitionColumns": [],
                            "configuration": {},
                            "createdTime": 1700000000000,
                        }
                    },
                    dict(add=base_add),
                ],
                [
                    {"commitInfo": {"timestamp": 1700000000100, "operation": "DELETE"}},
                    {
                        "remove": {
                            "path": rel,
                            "deletionTimestamp": 1700000000100,
                            "dataChange": True,
                        }
                    },
                    {"add": {**base_add, "deletionVector": desc}},
                ],
            ]
            for v, actions in enumerate(commits):
                with open(
                    os.path.join(logd, f"{v:020d}.json"), "w", encoding="utf-8"
                ) as f:
                    for a in actions:
                        f.write(json.dumps(a) + "\n")
            with open(marker, "w", encoding="utf-8") as f:
                f.write("ok")
        _FIXTURES[cache_key] = path
        return path


@register(
    "dv_read",
    """
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 7 <> 0 GROUP BY lang
    """,
)
def dv_read_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reader-3 deletion-vector read (protocol surface graduated in round 7
    from refused to supported), served through a round-8 SHALLOW CLONE of
    the DV table: the clone commit copies the descriptors and re-declares
    the reader-3 protocol, the clone scan reads the SOURCE's files by
    absolute reference and anti-joins the deleted positions decoded from
    the carried DV, and the DuckDB oracle reconstructs the surviving rows
    by PREDICATE (doc_id % 7 <> 0) — the two agree only if the position
    bitmap, the (path, dv-uid) log reconciliation, the clone's descriptor
    carry, and the row-index anti-join are all exact."""
    path = dv_fixture(spark, sf_dir)
    clone = path.rstrip("/") + "-clone"
    eng = Engine(
        spark,
        EngineConfig(
            table_mapping={DV_ALIAS: path, "dv_clone": clone}, read_only=False
        ),
    )
    if deltalog.latest_version(clone) >= 0:
        # staleness guard: a clone whose absolute references no longer exist
        # (fixture rebuilt out from under it) is discarded and re-cloned
        refs = deltalog._live_adds_no_spark(clone)
        if any(r.startswith("/") and not os.path.exists(r) for r in refs):
            import shutil as _sh

            _sh.rmtree(clone, ignore_errors=True)
            eng.invalidate_caches()
    if deltalog.latest_version(clone) < 0:
        eng.clone_table(DV_ALIAS, clone)
    return (
        eng.read_table("dv_clone")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


RT_ALIAS = "documents_rt"


def rt_fixture(spark: SparkSession, sf_dir: str) -> str:
    """A rowTracking table authored FOREIGN-style (hand-written log, the
    test_row_tracking interop pattern): the documents corpus split into two
    sorted files whose ``baseRowId`` ranges are deliberately OUT OF FILE
    ORDER (the second file's range sits below the first's) — a reader that
    derives row ids from anything but the log's per-add identity gets the
    wrong answer. Protocol: writer 7 + rowTracking + domainMetadata with
    the rowIdHighWaterMark domain (Delta PROTOCOL.md "Row Tracking")."""
    import glob as _glob
    import shutil as _sh

    from .deltalog import log_path

    key = os.path.abspath(sf_dir)
    cache_key = ("rt", key)
    if cache_key in _FIXTURES:
        return _FIXTURES[cache_key]
    with _FIXTURE_LOCK:
        if cache_key in _FIXTURES:
            return _FIXTURES[cache_key]
        base = os.path.join(
            tempfile.gettempdir(), "spark_graft_fixtures", os.path.basename(key)
        )
        path = os.path.join(base, RT_ALIAS)
        marker = os.path.join(base, f".{RT_ALIAS}_ready")
        if not os.path.exists(marker):
            _sh.rmtree(path, ignore_errors=True)
            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", "lang", "n_chars"
            )
            halves = {
                "even.parquet": docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0),
                "odd.parquet": docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1),
            }
            os.makedirs(path, exist_ok=True)
            counts: dict[str, int] = {}
            for rel, half in halves.items():
                staging = path + f".{rel}.staging"
                half.repartition(1).sortWithinPartitions("doc_id").write.mode(
                    "overwrite"
                ).parquet(staging)
                part = _glob.glob(os.path.join(staging, "part-*.parquet"))
                assert len(part) == 1
                os.replace(part[0], os.path.join(path, rel))
                _sh.rmtree(staging, ignore_errors=True)
                counts[rel] = half.count()
            # foreign assignment, out of file order: odd's range BELOW even's
            bases = {"odd.parquet": 0, "even.parquet": counts["odd.parquet"] + 17}
            dcvs = {"odd.parquet": 3, "even.parquet": 7}
            hwm = bases["even.parquet"] + counts["even.parquet"] - 1
            schema_string = docs.schema.json()
            logd = log_path(path)
            os.makedirs(logd, exist_ok=True)
            actions = [
                {"commitInfo": {"timestamp": 1700000000000, "operation": "CREATE"}},
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        "writerFeatures": ["rowTracking", "domainMetadata"],
                    }
                },
                {
                    "metaData": {
                        "id": "rt-fixture",
                        "format": {"provider": "parquet"},
                        "schemaString": schema_string,
                        "partitionColumns": [],
                        "configuration": {"delta.enableRowTracking": "true"},
                        "createdTime": 1700000000000,
                    }
                },
                {
                    "domainMetadata": {
                        "domain": "delta.rowTracking",
                        "configuration": json.dumps({"rowIdHighWaterMark": hwm}),
                        "removed": False,
                    }
                },
            ] + [
                {
                    "add": {
                        "path": rel,
                        "partitionValues": {},
                        "size": os.path.getsize(os.path.join(path, rel)),
                        "modificationTime": 1700000000000,
                        "dataChange": True,
                        "stats": json.dumps({"numRecords": counts[rel]}),
                        "baseRowId": bases[rel],
                        "defaultRowCommitVersion": dcvs[rel],
                    }
                }
                for rel in sorted(halves)
            ]
            with open(
                os.path.join(logd, "00000000000000000000.json"), "w", encoding="utf-8"
            ) as f:
                for a in actions:
                    f.write(json.dumps(a) + "\n")
            with open(marker, "w", encoding="utf-8") as f:
                f.write("ok")
        _FIXTURES[cache_key] = path
        return path


def _row_ids_oracle() -> str:
    """DuckDB recomputes every row id FROM FIRST PRINCIPLES: the add's
    baseRowId (parsed out of the raw log JSON) plus the row's physical
    file position (``file_row_number``) — hash equality certifies the
    engine's broadcast (path -> identity) map and position arithmetic."""
    root = os.path.join(_oracle_fixture_base(), RT_ALIAS)
    return f"""
    WITH log AS (
      SELECT add FROM read_json_auto('{root}/_delta_log/*.json',
                                     format='newline_delimited')
      WHERE add IS NOT NULL
    ),
    rows AS (
      SELECT doc_id, lang, filename, file_row_number
      FROM read_parquet('{root}/*.parquet', filename=true, file_row_number=true)
    )
    SELECT r.doc_id, r.lang,
           CAST(l.add.baseRowId + r.file_row_number AS BIGINT) AS row_id,
           CAST(l.add.defaultRowCommitVersion AS BIGINT) AS row_commit_version
    FROM rows r JOIN log l ON r.filename LIKE '%/' || l.add.path
    """


@register("row_ids_read", _row_ids_oracle)
def row_ids_read_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9 rowTracking READ surface (the rounds-9/10 protocol machinery,
    driver-certified from round 11): ``read_table(with_row_ids=True)``
    materializes ``_row_id`` = the add's baseRowId + the row's physical
    index and ``_row_commit_version`` from the log replay — against a
    FOREIGN-authored fixture whose id ranges are out of file order, so
    only the log-derived broadcast map yields the oracle's answer.
    Scale shape: the (path -> baseRowId) map is metadata-sized and
    broadcast; the scan itself stays a distributed parquet read with
    per-file positions (no global ordering, no shuffle)."""
    path = rt_fixture(spark, sf_dir)
    eng = Engine(spark, EngineConfig(table_mapping={RT_ALIAS: path}))
    return eng.read_table(RT_ALIAS, with_row_ids=True).select(
        "doc_id",
        "lang",
        F.col("_row_id").alias("row_id"),
        F.col("_row_commit_version").alias("row_commit_version"),
    )


@register("hybrid_search", HYBRID_SEARCH_SQL)
def hybrid_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-call governed hybrid retrieval, driver-oracle-checked (X3+X4,
    the production RAG serving shape): the BM25 posting probe and the IVF
    vector probe (4 centroids, n_probe=4 — every list scanned, so the
    index answers the EXACT top-k a SQL oracle can reproduce) each read
    their pruned index slice under the SigV4-extracted user's ACL, then
    fuse rank-only by reciprocal-rank fusion (Cormack 2009; the fusion
    itself is a unionByName of per-leg rank contributions + one
    shortlist-sized group-sum — U1's union, driver-certified). The DuckDB
    oracle recomputes both legs and the RRF arithmetic from raw parquet.
    Replaced the retired ``set_ops`` row in round 16 (still pytest-gated;
    U2's EXCEPT shape stays driver-green via table_history's
    adds-minus-removes replay, U3's INTERSECT via auth_join's left-semi —
    Catalyst's own INTERSECT lowering)."""
    eng = retrieval_engine(spark, sf_dir)
    user = acl.extract_user(PROBE_AUTH)
    return eng.hybrid_search(
        DOCS_BM25,
        DOCS_IVF,
        list(PROBE_TERMS),
        list(PROBE_VEC),
        k=HYBRID_K,
        n_probe=4,
        user=user,
    )


SET_OPS_SQL = """
    SELECT 'except' AS op, custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
    UNION ALL
    SELECT 'intersect' AS op, custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
    """


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1-U3 in one query: EXCEPT (the adds-minus-removes reconciliation
    shape, U2), INTERSECT (U3), and the UNION ALL that tags and combines
    them (U1) — customers with urgent-only vs both urgent and low orders.
    Retired from the pinned driver window in round 16 (slot for
    hybrid_search); oracle-gated by test_retired_queries_match_oracle."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    ex = urgent.subtract(low).select(F.lit("except").alias("op"), "custkey")
    inter = urgent.intersect(low).select(F.lit("intersect").alias("op"), "custkey")
    return ex.unionByName(inter)


# ---------------------------------------------------------------------------
# Scalar function surface (F1-F9)
# ---------------------------------------------------------------------------


@register(
    "json_props",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           upper(event_type) AS event_type_uc,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS event_day,
           concat(CAST(user_id AS VARCHAR), ':', event_type) AS user_event
    FROM events
    """,
)
def json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 JSON decode + F1 string algebra + F5 date functions on events."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.upper("event_type").alias("event_type_uc"),
        F.date_trunc("day", F.col("ts")).alias("event_day"),
        F.concat_ws(":", F.col("user_id").cast("string"), F.col("event_type")).alias(
            "user_event"
        ),
    )


@register(
    "array_funcs",
    """
    SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_component,
           round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           CAST(list_sum(list_transform(embedding, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)) AS BIGINT) AS n_positive
    FROM embeddings
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 array functions over the embedding column — all JVM higher-order fns."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(vec).cast("long").alias("dim"),
        F.round(F.element_at(vec, 1).cast("double"), 6).alias("first_component"),
        F.round(F.sqrt(similarity.dot(vec, vec)), 6).alias("l2_norm"),
        F.aggregate(
            vec,
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.when(x > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
        ).alias("n_positive"),
    )


# ---------------------------------------------------------------------------
# Streaming metrics (T1-T4, A1-A3) — batch-equivalent forms
# ---------------------------------------------------------------------------


@register(
    "metrics_tumbling_window",
    f"""
    SELECT date_trunc('minute', ts) AS window_start,
           date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
           COUNT(*) AS n_requests,
           COUNT(DISTINCT user_id) AS n_users,
           {_sql_davg('value', 9)} AS avg_latency
    FROM events GROUP BY 1, 2
    """,
)
def metrics_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 60s metrics aggregation (src/metrics.rs:90-137):
    requests/min, exact distinct users/min, average latency/min."""
    ev = load_table(spark, sf_dir, "events")
    return tumbling_metrics(ev, ts_col="ts", user_col="user_id", latency_col="value")


AGG_EVENTS_SQL = f"""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
           {_sql_davg('value', 9)} AS avg_latency, COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """


def agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A3 on the request stream: exact distinct users and the reference's
    average-backend-latency gauge (src/metrics.rs:107-133) per event type.

    Retired from the pinned 50-query driver window in round 11 to free a
    slot for ``lm_perplexity`` — A2/A3 stay driver-certified via
    ``metrics_tumbling_window`` (the same exact-distinct + decimal-average
    shape, grouped by minute instead of event type), and this function stays
    oracle-pinned by pytest (test_llm_ops.test_retired_queries_match_oracle)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        davg(F.col("value"), 9).alias("avg_latency"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "late_data_watermark",
    f"""
    SELECT date_trunc('minute', ts) AS window_start, COUNT(*) AS n_requests,
           {_sql_davg('value', 9)} AS avg_latency
    FROM events GROUP BY 1
    """,
)
def late_data_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: a REAL Structured Streaming run — parquet stream source, 2-minute
    event-time watermark, tumbling agg, availableNow trigger, memory sink.
    With a single availableNow batch no rows are late, so the result equals
    the batch aggregation and stays oracle-checkable; complete output mode
    keeps the trailing windows that append mode would hold back behind the
    final watermark."""
    import uuid as _uuid

    from .io import read_event_stream

    stream = (
        read_event_stream(spark, sf_dir)
        .withWatermark("ts", "2 minutes")
        .groupBy(F.window("ts", "60 seconds").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            (
                F.sum(F.col("value").cast("decimal(27,9)")).cast("double")
                / F.count("value")
            ).alias("avg_latency"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_requests", "avg_latency"
        )
    )
    qname = f"late_wm_{_uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        # availableNow must drain fully before the sink is read: a partial
        # aggregate is silently wrong, so a timeout is a hard failure, never
        # a truncated result (returns False iff the timeout elapsed).
        if not q.awaitTermination(_STREAM_TIMEOUT_S):
            raise TimeoutError(
                f"late_data_watermark: streaming query still active after "
                f"{_STREAM_TIMEOUT_S}s; refusing to return a partial sink"
            )
        if q.exception() is not None:
            raise q.exception()
    finally:
        q.stop()
    return spark.table(qname)


@register(
    "window_session",
    """
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                       > INTERVAL 5 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM ordered
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) + INTERVAL 5 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def window_session_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 session windows (5-minute inactivity gap) per user."""
    ev = load_table(spark, sf_dir, "events")
    return session_windows(ev, gap="5 minutes")


# NOTE: the former `window_sliding` driver row was retired in round 7 to free
# a slot in the driver's pinned 50-query window for `table_changes` (CDF).
# `sliding_metrics` remains pytest-certified (test_streaming.py) and T4 is
# driver-certified via `window_session`.


# ---------------------------------------------------------------------------
# LLM-pipeline: dedup (X1/X2), text analysis (X4), similarity (X3), multimodal (X5)
# ---------------------------------------------------------------------------

_DUP_UNION_SQL = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, upper(text) || '   ' AS text
      FROM documents WHERE doc_id % 3 = 0
"""


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ a normalized-equal variant of every third doc (uppercased +
    trailing whitespace — removed by exact-dedup normalization)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    variants = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit("   ")).alias("text"),
    )
    return docs.unionByName(variants)


@register(
    "dedup_exact",
    f"""
    WITH corpus AS ({_DUP_UNION_SQL}),
    hashed AS (
      SELECT doc_id, sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS content_hash
      FROM corpus
    )
    SELECT content_hash, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM hashed GROUP BY content_hash
    """,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact dedup: normalized sha-256 content hash, deterministic survivor."""
    corpus = _docs_with_dups(spark, sf_dir)
    out = dedup.exact_dedup(corpus, text_col="text", id_col="doc_id")
    return out.select("content_hash", "doc_id", "n_copies")


_TEXT_STATS_SQL = """
    WITH t AS (SELECT doc_id, text, lower(text) AS lt FROM documents)
    SELECT doc_id,
      CAST(length(text) AS INT) AS n_chars,
      CAST(len(regexp_extract_all(lt, '[a-z0-9]+')) AS INT) AS n_words,
      CAST(len(regexp_extract_all(lt, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INT) AS n_tokens,
      CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS INT) AS n_punct,
      CAST(len(regexp_extract_all(lt, '\\b(the|and|of|to|in|is|that|with)\\b')) AS INT) AS n_stopwords,
      round(CAST(length(text) AS DOUBLE) / greatest(len(regexp_extract_all(lt, '[a-z0-9]+')), 1), 6) AS avg_word_len,
      round(0.5 * least(CAST(len(regexp_extract_all(lt, '\\b(the|and|of|to|in|is|that|with)\\b')) AS DOUBLE)
                        / greatest(len(regexp_extract_all(lt, '[a-z0-9]+')), 1) * 4, 1.0)
          + 0.3 * (CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) / greatest(length(text), 1))
          + 0.2 * (1.0 - least(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                               / greatest(length(text), 1) * 10, 1.0)), 6) AS quality_score
    FROM t
"""


_FINGERPRINT_SQL = """
    WITH norm AS (SELECT doc_id, lower(text) AS t FROM documents),
    idx AS (SELECT doc_id, t,
                   unnest(generate_series(1, greatest(length(t) - 7, 1), 4)) AS i
            FROM norm)
    SELECT doc_id, MIN(md5(substring(t, CAST(i AS INT), 8))) AS fingerprint
    FROM idx GROUP BY doc_id
"""


@register(
    "text_stats",
    lambda: f"""
    WITH stats AS ({_TEXT_STATS_SQL}),
    fp AS ({_FINGERPRINT_SQL}),
    lp AS (SELECT doc_id, {_lang_case_expr()} AS pred_lang FROM documents)
    SELECT s.doc_id, s.n_chars, s.n_words, s.n_tokens, s.n_punct, s.n_stopwords,
           s.avg_word_len, s.quality_score, fp.fingerprint, lp.pred_lang
    FROM stats s JOIN fp ON fp.doc_id = s.doc_id JOIN lp ON lp.doc_id = s.doc_id
    """,
)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 text analysis: length/token/punct/stopword stats + quality score
    (text.text_stats), the rolling-hash document fingerprint
    (text.fingerprint_col), and the language prediction (text.lang_pred_col
    — the round-11 fold of the retired standalone lang_id driver row) in
    ONE projection over ONE scan — per-row operators over the same table
    must never self-join (at 100 TB that is a second scan plus a
    full-corpus shuffle for columns that are computable side by side). The
    repartition is GATED on input parallelism (r17, verdict nit): it only
    fires for the single-file fixture shape; a well-split 100 TB source
    runs this as a shuffle-free single-pass projection."""
    docs = spread_if_narrow(
        load_table(spark, sf_dir, "documents"), F.col("doc_id")
    ).withColumn("_lt", F.lower(F.col("text")))
    return text.text_stats(
        docs,
        extra_cols=(
            text.fingerprint_col(F.col("_lt"), pre_lowered=True).alias(
                "fingerprint"
            ),
            text.lang_pred_col(F.col("text")).alias("pred_lang"),
        ),
    )


_TIER_SQL = (
    "CASE WHEN quality_score >= 0.55 THEN 'high' "
    "WHEN quality_score >= 0.45 THEN 'mid' ELSE 'low' END"
)


CORPUS_SAMPLE_SQL = f"""
    WITH stats AS ({_TEXT_STATS_SQL}),
    tiered AS (SELECT doc_id, n_tokens, {_TIER_SQL} AS tier FROM stats),
    flagged AS (
      SELECT tier, n_tokens,
             (tier = 'high') OR (tier = 'mid' AND doc_id % 2 = 0)
                             OR (tier = 'low' AND doc_id % 10 = 0) AS kept
      FROM tiered
    )
    SELECT tier, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS sampled_tokens
    FROM flagged GROUP BY tier
    """


def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline stratified sampling: quality-tier the corpus, keep
    all high, 1/2 of mid, 1/10 of low — deterministic modular-id sampling
    (reproducible, shuffle-free, auditable; see text.stratified_keep).

    Retired from the pinned 50-query driver window in round 11 to free a
    slot for ``dedup_substring`` — the same stratum totals and sampled
    counts stay driver-certified inside ``training_mix`` (its ``stratum-*``
    and ``sampled-*`` parts carry n_total / n_sampled / sampled_tokens per
    tier), and this function stays oracle-pinned by pytest
    (test_llm_ops.test_retired_queries_match_oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    stats = text.text_stats(docs)
    tiered = stats.select(
        "doc_id",
        "n_tokens",
        text.quality_tier(F.col("quality_score")).alias("tier"),
    )
    flagged = tiered.withColumn(
        "kept",
        text.stratified_keep(
            F.col("tier"), F.col("doc_id"), {"high": 1, "mid": 2, "low": 10}
        ),
    )
    return flagged.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("n_sampled"),
        F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("sampled_tokens"),
    )


@register(
    "training_mix",
    f"""
    WITH stats AS ({_TEXT_STATS_SQL}),
    tiered AS (SELECT doc_id, n_tokens, {_TIER_SQL} AS tier FROM stats),
    mix AS (
      SELECT 'high-epoch1' AS part, n_tokens FROM tiered WHERE tier = 'high'
      UNION ALL
      SELECT 'high-epoch2' AS part, n_tokens FROM tiered WHERE tier = 'high'
      UNION ALL
      SELECT 'rest' AS part, n_tokens FROM tiered
      WHERE tier <> 'high' AND doc_id % 2 = 0
      UNION ALL
      SELECT 'stratum-' || tier AS part, n_tokens FROM tiered
      UNION ALL
      SELECT 'sampled-' || tier AS part, n_tokens FROM tiered
      WHERE (tier = 'high') OR (tier = 'mid' AND doc_id % 2 = 0)
                            OR (tier = 'low' AND doc_id % 10 = 0)
    )
    SELECT part, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM mix GROUP BY part
    """,
)
def training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix composition (U1 for data pipelines): high-quality docs
    weighted at 2 epochs, the rest down-sampled 50% — plus the stratified-
    sampling audit parts folded in from the retired
    ``corpus_sample_stratified`` row (round 11): ``stratum-<tier>`` carries
    each tier's full population, ``sampled-<tier>`` what the deterministic
    modular-id sampler keeps (all high, 1/2 mid, 1/10 low).

    A naive union of filtered branches would SCAN (and re-run the regex
    stats over) the corpus once per branch; instead each row explodes into
    its list of mix memberships — one scan, one map-side explode, one
    aggregation shuffle, at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    stats = text.text_stats(docs)
    tiered = stats.select(
        "doc_id",
        "n_tokens",
        text.quality_tier(F.col("quality_score")).alias("tier"),
    )
    epochs = (
        F.when(
            F.col("tier") == "high",
            F.array(F.lit("high-epoch1"), F.lit("high-epoch2")),
        )
        .when(F.pmod(F.col("doc_id"), F.lit(2)) == 0, F.array(F.lit("rest")))
        .otherwise(F.array().cast("array<string>"))
    )
    kept = text.stratified_keep(
        F.col("tier"), F.col("doc_id"), {"high": 1, "mid": 2, "low": 10}
    )
    memberships = F.concat(
        epochs,
        F.array(F.concat(F.lit("stratum-"), F.col("tier"))),
        F.when(kept, F.array(F.concat(F.lit("sampled-"), F.col("tier")))).otherwise(
            F.array().cast("array<string>")
        ),
    )
    mix = tiered.select(F.explode(memberships).alias("part"), "n_tokens")
    return mix.groupBy("part").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )


_SUBSTR_K = 8  # duplicate-span threshold in word tokens (Lee et al. use 50 BPE)


@register(
    "dedup_substring",
    f"""
    WITH corpus AS ({_DUP_UNION_SQL}),
    toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM corpus
    ),
    occ AS (
      SELECT doc_id, CAST(i AS INT) AS pos,
             array_to_string(t[i:i+{_SUBSTR_K - 1}], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(t) - {_SUBSTR_K - 1})) AS r(i)
    ),
    dup AS (SELECT gram FROM occ GROUP BY gram HAVING COUNT(*) >= 2),
    hits AS (SELECT o.doc_id, o.pos FROM occ o JOIN dup USING (gram)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                            + {_SUBSTR_K}
                  THEN 1 ELSE 0 END AS brk
      FROM hits
    ),
    grp AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS g
      FROM isl
    ),
    spans AS (
      SELECT doc_id, g, MIN(pos) AS s, MAX(pos) + {_SUBSTR_K - 1} AS e
      FROM grp GROUP BY doc_id, g
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_dup_spans, SUM(e - s + 1) AS dup_span_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(COALESCE(p.dup_span_tokens, 0) AS BIGINT) AS dup_span_tokens
    FROM toks t LEFT JOIN per_doc p USING (doc_id)
    """,
)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 exact duplicate-substring detection (ExactSubstr, Lee et al.
    2022): per-document coverage by >= 8-token runs that occur twice+
    anywhere in the corpus. Runs over the dup-seeded corpus (the uppercased
    variants tokenize identically under the case-folding word regex, so
    every third doc is a guaranteed full-length duplicated span) — see
    functions/dedup.py:duplicate_span_stats for the suffix-array-equivalent
    hashed-k-gram plan."""
    corpus = _docs_with_dups(spark, sf_dir)
    return dedup.duplicate_span_stats(corpus, k=_SUBSTR_K)


@register(
    "lm_perplexity",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    vocab AS (SELECT term, SUM(tf) AS c FROM tf GROUP BY term),
    tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM vocab),
    lp AS (
      SELECT term,
             CAST(round(ln(CAST(c + 1 AS DOUBLE) / CAST(n + v AS DOUBLE)), 9)
                  AS DECIMAL(21,9)) AS logp
      FROM vocab, tot
    ),
    doc AS (
      SELECT tf.doc_id, SUM(tf.tf) AS n_tokens,
             SUM(CAST(tf.tf AS DECIMAL(10,0)) * lp.logp) AS s
      FROM tf JOIN lp USING (term) GROUP BY tf.doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(CAST(-s AS DOUBLE) / n_tokens, 6) AS unigram_nll,
           round(exp(round(CAST(-s AS DOUBLE) / n_tokens, 6)), 3) AS unigram_ppl
    FROM doc
    """,
)
def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 LM quality scoring (the CCNet perplexity filter) with a corpus-
    trained add-one unigram model: per-document NLL/token and perplexity —
    see functions/text.py:unigram_nll for the decimal-accumulation
    determinism contract and the vocab-sized-join plan."""
    docs = load_table(spark, sf_dir, "documents")
    return text.unigram_nll(docs)


def _lang_scores_sql() -> dict[str, str]:
    return {
        lang: f"len(regexp_extract_all(lower(text), '\\b({'|'.join(words)})\\b'))"
        for lang, words in text.LANG_STOPWORDS.items()
    }


def _lang_case_expr() -> str:
    """The lang_pred_col CASE chain in DuckDB SQL (shared by the text_stats
    oracle and the retired standalone lang_id oracle)."""
    scores = _lang_scores_sql()
    branches = []
    prio = text.LANG_PRIORITY
    for lang in prio:
        conds = []
        for other in prio:
            if other == lang:
                continue
            op = ">=" if prio.index(other) > prio.index(lang) else ">"
            conds.append(f"{scores[lang]} {op} {scores[other]}")
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE NULL END"


def _lang_case_sql() -> str:
    scores = _lang_scores_sql()
    score_cols = ", ".join(
        f"CAST({scores[lang]} AS INT) AS score_{lang}" for lang in text.LANG_PRIORITY
    )
    return f"SELECT doc_id, {_lang_case_expr()} AS pred_lang, {score_cols} FROM documents"


def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 language identification. Retired from the pinned 50-query driver
    window in round 11 to free a slot for ``row_ids_read`` (the one
    protocol surface without a DuckDB hash gate): the SAME lang_pred_col
    prediction is driver-certified inside ``text_stats`` (pred_lang
    column), and this standalone form (with per-language scores) stays
    pinned by pytest (test_registry / test_llm_ops)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.lang_id(docs)


@register(
    "ngram_jaccard",
    f"""
    WITH corpus AS ({_DUP_UNION_SQL}),
    sub AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
                 FROM corpus WHERE doc_id % 1000000 < 120),
    idx AS (SELECT doc_id, t,
                   unnest(generate_series(1, greatest(length(t) - 4, 1))) AS i
            FROM sub),
    shingles_all AS (
      SELECT DISTINCT doc_id, substring(t, CAST(i AS INT), 5) AS sh FROM idx
    ),
    shingles AS (
      SELECT doc_id, sh FROM (
        SELECT doc_id, sh, COUNT(*) OVER (PARTITION BY sh) AS df
        FROM shingles_all
      ) WHERE df <= 100
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.5
    """,
)
def ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 exact n-gram Jaccard via the inverted-index join.

    Runs over the dup-seeded corpus (original ∪ normalized-equal variants of
    every third doc) sliced to base ids < 120, so the result provably has >0
    pairs at every test SF — the r1 driver row passed vacuously (0 == 0 rows)
    on the raw ``documents`` slice. ``max_shingle_df=100`` exercises the
    hot-shingle guard (mirrored in the oracle's windowed df filter)."""
    corpus = _docs_with_dups(spark, sf_dir).filter(F.col("doc_id") % 1000000 < 120)
    return dedup.ngram_jaccard_pairs(corpus, shingle_k=5, threshold=0.5, max_shingle_df=100)


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]
    )
    return list(row["embedding"])


@register(
    "similarity_topk",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    idx AS (SELECT vec_id, embedding,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings),
    scored AS (
      SELECT idx.vec_id,
             round(SUM(CAST(idx.embedding[idx.i] AS DOUBLE) * CAST(q.qv[idx.i] AS DOUBLE))
                   / (sqrt(SUM(CAST(idx.embedding[idx.i] AS DOUBLE) * CAST(idx.embedding[idx.i] AS DOUBLE)))
                      * sqrt(SUM(CAST(q.qv[idx.i] AS DOUBLE) * CAST(q.qv[idx.i] AS DOUBLE)))), 6) AS score
      FROM idx, q
      GROUP BY idx.vec_id
    )
    SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id ASC LIMIT 10
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 brute-force cosine top-k against the vec_id=0 embedding."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, _query_vector(spark, sf_dir), k=10)


# ---------------------------------------------------------------------------
# Rows-only operators (non-SQL-expressible or path-dependent): file surface,
# writes/compaction, approximate dedup/similarity, multimodal.
# ---------------------------------------------------------------------------


@register(
    "partition_filter_scan",
    """
    SELECT l_linestatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
    FROM lineitem WHERE l_returnflag = 'N' AND l_linestatus = 'O'
    GROUP BY l_linestatus
    """,
)
def partition_filter_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+P3: one ACL filter map = AND of equalities (src/main.rs:391-396),
    compiled by compile_dnf; the l_returnflag term prunes partitions on the
    governed fixture (Catalyst PartitionPruning — pinned by
    tests/test_engine.py via inputFiles()), the l_linestatus term applies
    as a pushed row filter."""
    eng = governed_engine(spark, sf_dir)
    pred = acl.compile_dnf([{"l_returnflag": "N", "l_linestatus": "O"}])
    df = eng.read_table(GOV_ALIAS).filter(pred)
    return df.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum(F.col("l_quantity")).alias("sum_qty")
    )


def data_skipping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Footer-stats data skipping: a shipdate-clustered (sort-on-write) copy
    of lineitem is range-scanned via add-action min/max stats — only files
    overlapping the range are read (Delta data skipping, SURVEY §4).

    Retired from the pinned 50-query driver window in round 10 to make room
    for ``dedup_components`` (the transitive-closure dedup row, r9 advice
    item): ``scan_with_skipping`` stays pytest-certified — file pruning
    (test_deltalog), DV interaction (test_deletion_vectors), and
    column-mapped stats keys (test_column_mapping)."""
    key = os.path.abspath(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "spark_graft_fixtures", os.path.basename(key)
    )
    path = os.path.join(base, "lineitem_sorted")
    with _FIXTURE_LOCK:
        if not os.path.exists(os.path.join(path, ".ready")):
            eng0 = Engine(
                spark,
                EngineConfig(table_mapping={"s": path}, read_only=False),
            )
            os.makedirs(path, exist_ok=True)
            eng0.write_table(
                "s",
                load_table(spark, sf_dir, "lineitem").repartition(8),
                mode="overwrite",
                sort_by=["l_shipdate"],
                sort_files=8,
            )
            with open(os.path.join(path, ".ready"), "w", encoding="utf-8") as f:
                f.write("ok")
    eng = Engine(spark, EngineConfig(table_mapping={"s": path}))
    df = eng.scan_with_skipping(
        "s", {"l_shipdate": ("1997-01-01T00:00:00", "1997-12-31T00:00:00")}
    )
    return df.groupBy(F.year("l_shipdate").cast("long").alias("ship_year")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_extendedprice")).alias("sum_price"),
    )


@register(
    "read_delta_log",
    _gov_replay_sql(
        "SELECT version, add.path AS add_path, remove.path AS remove_path, "
        "commitInfo.operation AS operation FROM log"
    ),
)
def read_delta_log_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: raw log actions (metadata is never ACL-filtered)."""
    eng = governed_engine(spark, sf_dir)
    log = eng.read_delta_log(GOV_ALIAS)
    return log.select(
        "version",
        F.col("add.path").alias("add_path"),
        F.col("remove.path").alias("remove_path"),
        F.col("commitInfo.operation").alias("operation"),
    )


def _file_surface_oracle() -> str:
    base = os.path.join(_oracle_fixture_base(), GOV_ALIAS)
    glob = os.path.join(base, "_delta_log", "*.json")
    proto = (
        f"SELECT protocol FROM read_json_auto('{glob}', filename=true, "
        "format='newline_delimited') WHERE protocol IS NOT NULL "
        "ORDER BY CAST(regexp_extract(filename, '(\\d+)\\.json$', 1) AS BIGINT) "
        "DESC LIMIT 1"
    )
    return _gov_replay_sql(
        f"""
        , p1 AS (SELECT key, size, modificationTime FROM live
                 WHERE key LIKE '{GOV_ALIAS}/l_returnflag=%'
                 ORDER BY key ASC LIMIT 2),
        p2 AS (SELECT key, size, modificationTime FROM live
               WHERE key > (SELECT max(key) FROM p1)
               ORDER BY key ASC LIMIT 2),
        p3 AS (SELECT DISTINCT
                 '{GOV_ALIAS}/' || split_part(substr(key, {len(GOV_ALIAS) + 2}), '/', 1) || '/' AS key,
                 CAST(NULL AS BIGINT) AS size,
                 CAST(NULL AS BIGINT) AS modificationTime,
                 true AS is_common_prefix
               FROM live WHERE key LIKE '{GOV_ALIAS}/%'),
        u AS (SELECT key, size, modificationTime, false AS is_common_prefix FROM p1
              UNION ALL
              SELECT key, size, modificationTime, false AS is_common_prefix FROM p2
              UNION ALL SELECT * FROM p3),
        listing AS (
          SELECT key, size, make_timestamp(modificationTime * 1000) AS last_modified,
                 is_common_prefix,
                 CASE WHEN is_common_prefix THEN 'prefix' ELSE 'object' END AS entry_kind,
                 CAST(NULL AS VARCHAR) AS detail
          FROM u),
        cat AS (
          SELECT 'datalake://{GOV_ALIAS}' AS key,
                 (SELECT CAST(SUM(size) AS BIGINT) FROM live) AS size,
                 CAST(NULL AS TIMESTAMP) AS last_modified,
                 false AS is_common_prefix,
                 'table' AS entry_kind,
                 'parquet:r'
                   || CAST((SELECT CAST(protocol.minReaderVersion AS INT) FROM ({proto})) AS VARCHAR)
                   || 'w'
                   || CAST((SELECT CAST(protocol.minWriterVersion AS INT) FROM ({proto})) AS VARCHAR)
                   || ':files=' || CAST((SELECT COUNT(*) FROM live) AS VARCHAR) AS detail)
        SELECT * FROM listing UNION ALL SELECT * FROM cat
        """
    )()


@register("file_surface", _file_surface_oracle)
def file_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ListObjectsV2 + HEAD + catalog surface in one row (S1-S5, S10,
    P1, P5, O1-O2, J8): page 1 is a prefix-filtered, key-ordered,
    max-keys-limited listing; the continuation token (last key of page 1,
    strictly-after semantics, ref src/main.rs:251-262) drives page 2;
    page 3 is a ``delimiter='/'`` listing whose CommonPrefixes groups
    discover the partition directories (ref src/main.rs:307-317, golden
    src/main.rs:1286-1294); each content key carries its HEAD-equivalent
    size + last-modified metadata, in the ALIAS key namespace the engine
    rewrites from physical paths (P5). The catalog leg (folded in from
    the retired ``catalog_surface`` row, round 16) crosses the virtual
    namespace with its table listing and DESCRIBE DETAIL facts — live
    file count, total logged bytes, protocol versions — that the oracle
    independently re-derives from its own log replay; the crossJoin is
    broadcast-sized (J8, plan-pinned in test_plans)."""
    eng = governed_engine(spark, sf_dir)
    page1 = eng.list_files(GOV_ALIAS, prefix=f"{GOV_ALIAS}/l_returnflag=", max_keys=2)
    rows = page1.select("key").collect()
    token = rows[-1]["key"] if rows else None
    page2 = eng.list_files(GOV_ALIAS, continuation_token=token, max_keys=2)
    page3 = eng.list_files(GOV_ALIAS, prefix=f"{GOV_ALIAS}/", delimiter="/")
    listing = (
        page1.unionByName(page2)
        .withColumn("is_common_prefix", F.lit(False))
        .unionByName(page3)
        .select(
            "key",
            "size",
            F.timestamp_millis(F.col("modificationTime")).alias("last_modified"),
            "is_common_prefix",
            F.when(F.col("is_common_prefix"), F.lit("prefix"))
            .otherwise(F.lit("object"))
            .alias("entry_kind"),
            F.lit(None).cast("string").alias("detail"),
        )
    )
    detail = eng.describe_table(GOV_ALIAS).select(
        "format", "numFiles", "sizeInBytes",
        "minReaderVersion", "minWriterVersion",
    )
    cat = (
        eng.list_catalogs()
        .crossJoin(F.broadcast(eng.list_tables()))
        .crossJoin(F.broadcast(detail))
        .select(
            F.concat(
                F.col("catalog_name"), F.lit("://"), F.col("table_name")
            ).alias("key"),
            F.col("sizeInBytes").cast("long").alias("size"),
            F.lit(None).cast("timestamp").alias("last_modified"),
            F.lit(False).alias("is_common_prefix"),
            F.lit("table").alias("entry_kind"),
            F.concat(
                F.col("format"),
                F.lit(":r"),
                F.col("minReaderVersion").cast("string"),
                F.lit("w"),
                F.col("minWriterVersion").cast("string"),
                F.lit(":files="),
                F.col("numFiles").cast("string"),
            ).alias("detail"),
        )
    )
    return listing.unionByName(cat)


@register("hist_rollup_quantiles", HIST_QUANTILES_SQL)
def hist_rollup_quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governed histogram rollup quantiles, driver-oracle-checked through
    the FULL maintenance cycle (A6/X4 at scale, r16 rotation part 2): the
    fixture builds the rollup, appends a second corpus copy, DELETES every
    seventh event id, and refreshes — so the rollup holds positive AND
    NEGATIVE partials whose element-wise merge must equal a rebuild over
    the live rows. The row certifies per ACL-visible group the exact
    merged ``n_rows`` and three quantiles, each re-derived by the DuckDB
    oracle from raw parquet with the identical bin/cumulative/midpoint
    arithmetic (power-of-two bin geometry keeps every double exact).
    Replaced the retired ``governed_source_read`` row (still
    pytest-oracle-gated; S14's Python DataSource stays driver-green via
    governed_stream_read — the same GovernedDataSource, stream leg)."""
    paths = hist_fixture(spark, sf_dir)
    user = "metrics_reader"
    perms = spark.createDataFrame(
        [
            (i + 1, user, EVENTS_HIST_ALIAS, json.dumps({"event_type": t}))
            for i, t in enumerate(SKETCH_EVENT_TYPES)
        ],
        "id int, user_id string, table_name string, partition_filters string",
    )
    eng = Engine(
        spark,
        EngineConfig(table_mapping=paths, read_only=True),
        permissions_df=perms,
    )
    return eng.hist_rollup_quantiles(
        EVENTS_HIST, quantiles=HIST_QUANTILES, user=user
    )


GOVERNED_SOURCE_READ_SQL = f"""
    SELECT l_returnflag, COUNT(*) AS n_rows, {_sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_returnflag
    """


def governed_source_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The format("governed") Python Data Source: the reference's FILE-level
    allowed-file-set serving (forbidden files never become input partitions)
    read through Spark's DataSource API and hash-checked against SQL.
    Retired from the pinned driver window in round 16 (slot for
    hist_rollup_quantiles; the same GovernedDataSource's STREAM leg stays
    driver-green via governed_stream_read); oracle-gated by
    test_retired_queries_match_oracle."""
    import json as _json

    from .session import ensure_engine_confs
    from .sources.governed import GovernedDataSource

    # the reader implements pushFilters, which Spark gates behind a conf —
    # set explicitly (a warm fixture skips load_table's conf pass)
    ensure_engine_confs(spark)
    try:
        spark.dataSource.register(GovernedDataSource)
    except Exception:
        pass  # already registered in this session
    path = governed_fixture(spark, sf_dir)
    df = (
        spark.read.format("governed")
        .option("path", path)
        .option("dnf", _json.dumps([{"l_returnflag": "A"}]))
        .load()
    )
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum(F.col("l_quantity")).alias("sum_qty")
    )


@register(
    "governed_write_roundtrip",
    f"""
    SELECT l_returnflag, COUNT(*) AS n_rows, {_sql_dsum('l_quantity')} AS sum_qty,
           true AS write_blocked
    FROM lineitem WHERE l_orderkey % 7 = 0 GROUP BY l_returnflag
    """,
)
def governed_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 positive path + G2 negative path under one driver row.

    Positive: a deterministic lineitem slice goes through the full write
    path (staging + move + Delta commit, partitioned), is read back through
    the governed read, and aggregated — hash-checked against a SQL
    reconstruction of the same slice. Negative: the same write against a
    read-only engine must raise ReadOnlyError; the ``write_blocked`` column
    carries that fact into the hash."""
    import shutil as _sh
    import tempfile as _tf

    src = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 7 == 0)
    ro = governed_engine(spark, sf_dir, read_only=True)
    try:
        ro.write_table(GOV_ALIAS, src.limit(5), mode="append")
        blocked = False
    except ReadOnlyError:
        blocked = True
    scratch = os.path.join(_tf.mkdtemp(prefix="graft_gwrt_"), "t")
    eng = Engine(spark, EngineConfig(table_mapping={"t": scratch}, read_only=False))
    eng.write_table("t", src, mode="overwrite", partition_by=["l_returnflag"])
    out = (
        eng.read_table("t")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
        )
        .withColumn("write_blocked", F.lit(blocked))
    )
    rows = out.collect()
    _sh.rmtree(os.path.dirname(scratch), ignore_errors=True)
    return local_df(spark, rows, out.schema)


@register(
    "compact_table",
    """
    SELECT CAST(COUNT(DISTINCT l_returnflag) AS INT) AS files_before,
           CAST(2 * COUNT(DISTINCT l_returnflag) AS INT) AS files_fragmented,
           CAST(COUNT(DISTINCT l_returnflag) AS INT) AS files_after,
           CAST(2 * COUNT(*) AS INT) AS n_rows
    FROM lineitem
    """,
)
def compact_table_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9 compaction on a scratch copy: file count per partition before/after.

    Oracle: the compacted fixture holds one file per l_returnflag partition,
    the self-append doubles both files and rows, and compaction returns to
    one file per partition — all derivable from the data."""
    import shutil
    import tempfile as _tf

    src = governed_fixture(spark, sf_dir)
    scratch = os.path.join(_tf.mkdtemp(prefix="graft_compact_"), "t")
    shutil.copytree(src, scratch)
    eng = Engine(
        spark,
        EngineConfig(table_mapping={"scratch": scratch}, read_only=False),
    )
    before = eng.snapshot_files("scratch").count()
    # fragment: append the same data once so partitions have >1 file
    eng.write_table("scratch", eng.read_table("scratch"), mode="append")
    fragmented = eng.snapshot_files("scratch").count()
    eng.compact_table("scratch", files_per_partition=1)
    after = eng.snapshot_files("scratch").count()
    rows = eng.read_table("scratch").count()
    shutil.rmtree(os.path.dirname(scratch), ignore_errors=True)
    return local_df(
        spark,
        [(int(before), int(fragmented), int(after), int(rows))],
        "files_before int, files_fragmented int, files_after int, n_rows int",
    )


@register(
    "merge_upsert",
    """
    WITH src_keys AS (
      SELECT l_orderkey, l_linenumber FROM lineitem
      GROUP BY l_orderkey, l_linenumber
      HAVING COUNT(*) = 1 AND MAX(l_returnflag) = 'A'
      ORDER BY l_orderkey ASC, l_linenumber ASC LIMIT 5
    ),
    merged AS (
      SELECT CASE WHEN EXISTS (SELECT 1 FROM src_keys k
                               WHERE k.l_orderkey = l.l_orderkey
                                 AND k.l_linenumber = l.l_linenumber)
                  THEN 999.0 ELSE l.l_quantity END AS l_quantity
      FROM lineitem l
      UNION ALL SELECT 1.5 AS l_quantity
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CASE WHEN l_quantity = 999.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
    FROM merged
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta MERGE (upsert) on a scratch copy: 5 deterministic updates + 1
    insert, verified against a SQL reconstruction of the merged state."""
    import shutil as _sh
    import tempfile as _tf

    src_path = governed_fixture(spark, sf_dir)
    scratch = os.path.join(_tf.mkdtemp(prefix="graft_merge_"), "t")
    _sh.copytree(src_path, scratch)
    eng = Engine(spark, EngineConfig(table_mapping={"t": scratch}, read_only=False))
    target = eng.read_table("t")
    unique_keys = (
        target.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("_n"), F.max("l_returnflag").alias("_fl"))
        .filter((F.col("_n") == 1) & (F.col("_fl") == "A"))
        .orderBy(F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .limit(5)
        .select("l_orderkey", "l_linenumber")
    )
    updates = target.join(unique_keys, ["l_orderkey", "l_linenumber"]).withColumn(
        "l_quantity", F.lit(999.0)
    )
    insert = eng.read_table("t").limit(1).withColumns(
        {"l_orderkey": F.lit(10**9).cast("long"), "l_linenumber": F.lit(1), "l_quantity": F.lit(1.5)}
    )
    eng.merge("t", updates.unionByName(insert), on=["l_orderkey", "l_linenumber"])
    out = eng.read_table("t").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
        F.sum(F.when(F.col("l_quantity") == 999.0, 1).otherwise(0))
        .cast("long")
        .alias("n_updated"),
    )
    rows = out.collect()
    _sh.rmtree(os.path.dirname(scratch), ignore_errors=True)
    return local_df(spark, rows, out.schema)


@register(
    "table_history",
    _gov_replay_sql(
        """
        , versions AS (SELECT DISTINCT version AS v FROM log),
        pairs AS (
          SELECT v.v, a.path, a.is_add,
                 row_number() OVER (PARTITION BY v.v, a.path
                                    ORDER BY a.version DESC, a.is_add ASC) AS rn
          FROM actions a JOIN versions v ON a.version <= v.v
        ),
        counts AS (
          SELECT v AS version,
                 COUNT(*) FILTER (WHERE rn = 1 AND is_add) AS n_files
          FROM pairs GROUP BY v
        ),
        hist AS (
          SELECT version, max(commitInfo.operation) AS operation,
                 make_timestamp(max(commitInfo.timestamp) * 1000) AS timestamp,
                 count(add) AS n_added, count(remove) AS n_removed
          FROM log GROUP BY version
        )
        SELECT h.version, h.operation, h.timestamp, h.n_added, h.n_removed,
               COALESCE(c.n_files, 0) AS n_files
        FROM hist h LEFT JOIN counts c ON c.version = h.version
        """
    ),
)
def table_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit history + time travel in one row (S6 versioned replay):
    DeltaTable.history analog per version, joined with the live file count
    AT that version (``snapshot_files(version=v)`` semantics — the oracle
    independently replays every version's adds-minus-removes), so the row
    set certifies both the history surface and versioned log replay."""
    from pyspark.sql import Window

    eng = governed_engine(spark, sf_dir)
    log = eng.read_delta_log(GOV_ALIAS)
    versions = log.select("version").distinct()
    actions = log.select(
        F.coalesce("add.path", "remove.path").alias("path"),
        F.col("add").isNotNull().alias("is_add"),
        "version",
    ).filter(F.col("add").isNotNull() | F.col("remove").isNotNull())
    pairs = actions.alias("a").join(
        F.broadcast(versions.alias("v")), F.col("a.version") <= F.col("v.version")
    )
    w = Window.partitionBy("v.version", "a.path").orderBy(
        F.col("a.version").desc(), F.col("a.is_add").asc()
    )
    live = pairs.withColumn("rn", F.row_number().over(w)).filter(
        (F.col("rn") == 1) & F.col("a.is_add")
    )
    counts = live.groupBy(F.col("v.version").alias("version")).agg(
        F.count(F.lit(1)).alias("n_files")
    )
    return (
        eng.history(GOV_ALIAS)
        .join(counts, "version", "left")
        .na.fill(0, ["n_files"])
    )


@register(
    "table_changes",
    f"""
    WITH base AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      FROM lineitem WHERE l_orderkey % 7 = 0
    )
    SELECT 'delete' AS _change_type, CAST(2 AS BIGINT) AS _commit_version,
           COUNT(*) AS n_rows, {_sql_dsum('l_quantity')} AS sum_qty
    FROM base WHERE l_returnflag = 'A'
    UNION ALL
    SELECT 'update_preimage', CAST(3 AS BIGINT),
           COUNT(*), {_sql_dsum('l_quantity')}
    FROM base WHERE l_returnflag = 'N'
    UNION ALL
    SELECT 'update_postimage', CAST(3 AS BIGINT),
           COUNT(*), {_sql_dsum('l_quantity * 2')}
    FROM base WHERE l_returnflag = 'N'
    """,
)
def table_changes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9 change data feed — REAL Delta CDF (round-7 upgrade from the
    file-granular analog): a scratch table is created (v0), CDF is enabled
    (v1 — SET TBLPROPERTIES plus the writer-4 protocol upgrade Delta
    demands), then a DELETE (v2) and an UPDATE (v3) write row-exact change
    files under ``_change_data/``. ``table_changes(1, 3)`` serves the
    deleted rows and the update pre/post images FROM THOSE FILES, stamped
    with their commit versions; the oracle reconstructs all three change
    sets from the base table. Compaction and other dataChange=false
    rewrites contribute nothing (pytest-pinned)."""
    import tempfile as _tf

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .filter(F.col("l_orderkey") % 7 == 0)
    )
    scratch = os.path.join(_tf.mkdtemp(prefix="graft_cdf_"), "t")
    write_governed_table(spark, li.repartition(2), scratch, [])
    eng = Engine(
        spark, EngineConfig(table_mapping={"cdf_t": scratch}, read_only=False)
    )
    eng.set_table_properties("cdf_t", {"delta.enableChangeDataFeed": "true"})
    eng.delete("cdf_t", F.col("l_returnflag") == "A")
    eng.update(
        "cdf_t",
        F.col("l_returnflag") == "N",
        {"l_quantity": F.col("l_quantity") * 2},
    )
    cdf = eng.table_changes("cdf_t", from_version=1, to_version=3)
    return cdf.groupBy("_change_type", "_commit_version").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
    )


@register(
    "pipeline_clean_corpus",
    f"""
    WITH corpus AS ({_DUP_UNION_SQL}),
    hashed AS (
      SELECT doc_id, text,
             sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h,
             row_number() OVER (PARTITION BY sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
                                ORDER BY doc_id ASC) AS rn
      FROM corpus
    ),
    survivors AS (SELECT doc_id, text, lower(text) AS lt FROM hashed WHERE rn = 1),
    scored AS (
      SELECT doc_id,
        CAST(len(regexp_extract_all(lt, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INT) AS n_tokens,
        round(0.5 * least(CAST(len(regexp_extract_all(lt, '\\b(the|and|of|to|in|is|that|with)\\b')) AS DOUBLE)
                          / greatest(len(regexp_extract_all(lt, '[a-z0-9]+')), 1) * 4, 1.0)
            + 0.3 * (CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) / greatest(length(text), 1))
            + 0.2 * (1.0 - least(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                                 / greatest(length(text), 1) * 10, 1.0)), 6) AS quality_score
      FROM survivors
    )
    SELECT doc_id, n_tokens, quality_score FROM scored WHERE quality_score >= 0.5
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline composition: dedup (X1) ->
    quality scoring (X4) -> quality gate -> token counting — each stage the
    already-verified operator, chained as one declarative plan (one shuffle
    for the dedup window, everything else map-side)."""
    corpus = _docs_with_dups(spark, sf_dir)
    survivors = dedup.exact_dedup(corpus, text_col="text", id_col="doc_id").select(
        "doc_id", "text"
    )
    stats = text.text_stats(survivors)
    return stats.filter(F.col("quality_score") >= 0.5).select(
        "doc_id", "n_tokens", "quality_score"
    )


# Exact all-pairs word-shingle Jaccard in SQL — the oracle's pair relation
# for BOTH dedup_near_minhash (pairs + scores) and dedup_components
# (transitive closure over the same pairs).
_JACCARD_PAIR_CTES = f"""corpus AS ({_DUP_UNION_SQL}),
    norm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
             FROM corpus),
    words AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    sh AS (
      SELECT DISTINCT doc_id,
             w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2] AS s
      FROM (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w)-2, 1))) AS i
            FROM words)
      WHERE len(w) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    jpairs AS (
      SELECT id_a, id_b,
             round(CAST(n AS DOUBLE) / (sa.sz + sb.sz - n), 6) AS jaccard
      FROM inter JOIN sizes sa ON sa.doc_id = id_a
                 JOIN sizes sb ON sb.doc_id = id_b
      WHERE round(CAST(n AS DOUBLE) / (sa.sz + sb.sz - n), 6) >= 0.6
    )"""


@register(
    "dedup_near_minhash",
    f"""
    WITH {_JACCARD_PAIR_CTES}
    SELECT id_a, id_b, jaccard FROM jpairs
    """,
)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 MinHash-LSH near-dup candidates with exact-Jaccard verification.

    Oracle: ALL-pairs exact word-shingle Jaccard >= threshold in SQL. The
    LSH result is by construction a subset (banding only prunes candidates;
    verification is exact), so hash equality certifies recall 1.0 on this
    corpus — verified at sf0.001, sf0.01 AND sf0.1 (the sf0.1 sweep caught
    the old b=4/r=8 banding missing pairs at jaccard 0.89-0.95; the default
    is now calibrated with its S-curve center below the threshold — see
    minhash_near_duplicates)."""
    corpus = _docs_with_dups(spark, sf_dir)
    return dedup.minhash_near_duplicates(corpus, threshold=0.6)


@register(
    "dedup_components",
    f"""
    WITH RECURSIVE {_JACCARD_PAIR_CTES},
    edges AS (
      SELECT id_a AS u, id_b AS v FROM jpairs
      UNION SELECT id_b AS u, id_a AS v FROM jpairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u
    )
    SELECT u AS id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
    """,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 transitive-closure dedup clustering: connected components over
    the verified MinHash near-dup pair graph — ``(id, component)`` with
    ``component`` = the smallest id reachable through any chain of pairs
    (the survivor each clustered doc deduplicates to).

    Spark side: alternating large-star/small-star contraction
    (O(log n) rounds over the PAIR relation only — the corpus is never
    iterated; see ``functions/dedup.py:connected_components``). Oracle:
    DuckDB recursive-CTE transitive closure over the same exact-Jaccard
    pair relation — hash equality certifies the contraction reaches the
    true closure, not just a fixpoint."""
    corpus = _docs_with_dups(spark, sf_dir)
    pairs = dedup.minhash_near_duplicates(corpus, threshold=0.6)
    return dedup.connected_components(pairs)


@register(
    "dedup_near_simhash",
    f"""
    WITH corpus AS ({_DUP_UNION_SQL}),
    norm AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
      FROM corpus
    ),
    tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(t, ' ')) AS tk FROM norm
    ),
    hashed AS (
      SELECT doc_id,
             CAST(('0x' || substring(sha256(tk), 1, 15)) AS BIGINT) AS h
      FROM tok
    ),
    votes AS (
      SELECT doc_id, j.j AS j, COUNT(*) AS n, SUM((h >> j.j) & 1) AS ones
      FROM hashed, (SELECT unnest(generate_series(0, 59)) AS j) j
      GROUP BY doc_id, j.j
    ),
    sig AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN ones * 2 >= n
                           THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
                  AS BIGINT) AS sig
      FROM votes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, sig, b.b AS band, (sig >> (b.b * 21)) & 2097151 AS bucket
      FROM sig, (SELECT unnest([0, 1, 2]) AS b) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                      a.sig AS sa, b2.sig AS sb
      FROM banded a
      JOIN banded b2
        ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 2
    """,
)
def dedup_near_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 SimHash near-dup pairs (Hamming <= 2 over 60-bit signatures).

    The token hash is sha2-derived (top 15 hex digits as a 60-bit int), so
    the ENTIRE pipeline — tokenize, bit votes, signature packing, pigeonhole
    banding, Hamming verify — reproduces in the DuckDB oracle bit-for-bit."""
    corpus = _docs_with_dups(spark, sf_dir)
    return dedup.simhash_near_duplicates(corpus, max_hamming=2)


_LSH_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{p + 1}] > 0 THEN {1 << p} ELSE 0 END)" for p in range(6)
)

@register(
    "similarity_lsh",
    f"""
    WITH b AS (SELECT vec_id, embedding, {_LSH_BUCKET_SQL} AS bucket FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
             a.embedding AS ea, b2.embedding AS eb
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    ),
    idx AS (SELECT id_a, id_b, ea, eb,
                   unnest(generate_series(1, len(ea))) AS i
            FROM pairs),
    scored AS (
      SELECT id_a, id_b,
             round(SUM(CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))
                   / (sqrt(SUM(CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE)))
                      * sqrt(SUM(CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)))), 6) AS cosine
      FROM idx GROUP BY id_a, id_b
    )
    SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.2
    """,
)
def similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path: sign-LSH near-neighbor pairs with exact-cosine verify.

    Uses axis-aligned sign planes (equivalent projection family for
    direction-unbiased embeddings) so the bucketed candidate set — not just
    the cosine math — is reproduced independently by the DuckDB oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_near_neighbors(
        emb, dim=64, num_planes=6, threshold=0.2, axis_planes=True
    )


@register("similarity_ivf", lambda: ORACLES["similarity_topk"])
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 IVFPQ probed top-k against the MATERIALIZED index (round-10 IVF,
    upgraded to the full IVFPQ composition in round 11), run at full probe
    (n_probe == num_centroids) with a corpus-wide ADC shortlist.

    ``ivf_pq_build`` trains the PQ codebook, assigns every vector once,
    and writes the corpus ``_cid``-partitioned with its codes;
    ``ivf_pq_probe`` pushes ``_cid IN (...)`` into the scan (partition
    pruning bounds per-query IO by the probe), ranks the survivors by the
    ADC lookup table, and exact-reranks the shortlist. At full probe +
    corpus-wide shortlist the whole pipeline is provably equal to the
    exact brute-force top-k — the invariant that pins the codebook /
    encoding / assignment / probe / ADC / rerank machinery under the
    driver's hash gate. The approximate trades (n_probe < num_centroids,
    tight shortlists) are exercised in pytest
    (test_ivf_build_probe_prunes_partitions, test_ivf_pq_build_probe)."""
    idx = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_fixtures",
        os.path.basename(os.path.abspath(sf_dir)),
        "ivfpq_index",
    )
    if not os.path.exists(os.path.join(idx, "_pq_codebook.json")):
        emb = load_table(spark, sf_dir, "embeddings")
        similarity.ivf_pq_build(
            emb, idx, num_centroids=8, m=4, pq_k=16, lloyd_iters=1, pq_iters=1
        )
    # shortlist must COVER the corpus for the exactness invariant, but stay
    # bounded: TakeOrdered sizes its priority queue by the limit, so an
    # astronomically large shortlist is a driver OOM, not a no-op
    return similarity.ivf_pq_probe(
        spark, idx, _query_vector(spark, sf_dir), k=10, n_probe=8,
        shortlist=1_000_000,
    )


def multimodal_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: binary media columns -> Arrow-batched feature extraction -> rollup.

    The corpus is ASCII, so the stub decoder's strided byte means
    (positions 1, 9, 17, ... are feature 0) reproduce with character math.
    Retired from the pinned 50-query driver window in round 7 (X5 stays
    certified via ``multimodal_decode``; this rollup is pinned by
    ``tests/test_llm_ops.py`` and still benchmarked)."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_media(docs)
    feats = multimodal.extract_features(media)
    return multimodal.multimodal_summary(feats)


@register(
    "multimodal_decode",
    """
    WITH d8 AS (SELECT unnest(generate_series(0, 7)) AS v),
    img AS (
      SELECT doc_id,
             CAST(8 AS DOUBLE) AS f1, CAST(8 AS DOUBLE) AS f2,
             CAST(SUM((doc_id*11 + y.v*5 + x.v*3) % 256) AS DOUBLE) AS f3,
             CAST(SUM((doc_id*11 + y.v*5 + x.v*3 + 7) % 256) AS DOUBLE) AS f4
      FROM documents CROSS JOIN d8 y CROSS JOIN d8 x
      WHERE doc_id % 3 = 0 GROUP BY doc_id
    ),
    aud AS (
      SELECT doc_id,
             CAST(256 AS DOUBLE) AS f1,
             CAST(SUM(v) AS DOUBLE) AS f2,
             CAST(SUM(v * v) AS DOUBLE) AS f3,
             CAST(MIN(v) AS DOUBLE) AS f4
      FROM (SELECT doc_id, ((doc_id * 31 + k.v * 7) % 65536) - 32768 AS v
            FROM documents
            CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS v) k
            WHERE doc_id % 3 = 1)
      GROUP BY doc_id
    ),
    vid AS (
      SELECT doc_id,
             CAST(6 AS DOUBLE) AS f1, CAST(3 AS DOUBLE) AS f2,
             CAST(SUM(yv) AS DOUBLE) AS f3,
             CAST(SUM(yv * yv) AS DOUBLE) AS f4
      FROM (SELECT doc_id, (doc_id*7 + f.v*13 + y.v*3 + x.v) % 256 AS yv
            FROM documents
            CROSS JOIN (SELECT unnest([0, 2, 4]) AS v) f
            CROSS JOIN d8 y CROSS JOIN d8 x
            WHERE doc_id % 3 = 2)
      GROUP BY doc_id
    )
    SELECT doc_id, 'image' AS modality, f1, f2, f3, f4 FROM img
    UNION ALL SELECT doc_id, 'audio', f1, f2, f3, f4 FROM aud
    UNION ALL SELECT doc_id, 'video', f1, f2, f3, f4 FROM vid
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 REAL decode path (decode_stub=False) for ALL THREE modalities: each
    document gets a synthetic payload in its id%3 modality — binary PPM
    image, RIFF PCM16 WAV audio, or YUV4MPEG2 video (all pixel/sample
    formulas are public — see synth_media_corpus) — built in ONE corpus scan,
    decoded by the pure-numpy container parsers (video additionally
    frame-samples at stride VIDEO_FRAME_STEP), and reduced to exact integer
    features. The oracle recomputes every feature from the formulas alone, so
    hash equality certifies each encoder -> container bytes -> parser
    round-trip."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = multimodal.synth_media_corpus(docs)
    feats = multimodal.extract_features(media, n_features=6, decode_stub=False)
    return feats.select(
        "doc_id",
        "modality",
        F.element_at("feature", 1).alias("f1"),
        F.element_at("feature", 2).alias("f2"),
        F.element_at("feature", 3).alias("f3"),
        F.element_at("feature", 4).alias("f4"),
    )


def _catalog_surface_oracle() -> str:
    path = os.path.join(_oracle_fixture_base(), GOV_ALIAS)
    # the protocol is DERIVED, not hardcoded: since round 11 a created
    # table's version-0 protocol declares whatever its schema's types
    # demand (lineitem's TIMESTAMP_NTZ column -> reader 3 / writer 7 with
    # timestampNtz), so the oracle replays the latest protocol action from
    # the raw log exactly like a conforming client
    glob = os.path.join(path, "_delta_log", "*.json")
    proto = (
        f"SELECT protocol FROM read_json_auto('{glob}', filename=true, "
        "format='newline_delimited') WHERE protocol IS NOT NULL "
        "ORDER BY CAST(regexp_extract(filename, '(\\d+)\\.json$', 1) AS BIGINT) "
        "DESC LIMIT 1"
    )
    body = (
        f"SELECT 'datalake' AS catalog_name, '{GOV_ALIAS}' AS table_name, "
        f"'{path}' AS location, 'parquet' AS format, "
        "CAST(COUNT(*) AS BIGINT) AS num_files, "
        "CAST(SUM(size) AS BIGINT) AS size_in_bytes, "
        f"(SELECT CAST(protocol.minReaderVersion AS INT) FROM ({proto})) "
        "AS min_reader_version, "
        f"(SELECT CAST(protocol.minWriterVersion AS INT) FROM ({proto})) "
        "AS min_writer_version "
        "FROM live"
    )
    return _gov_replay_sql(body)()


@register("sketch_rollup_estimate", SKETCH_ROLLUP_SQL)
def sketch_rollup_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governed HLL sketch rollup, driver-oracle-checked through a REAL
    incremental cycle (A2 at scale): the fixture builds the rollup,
    appends a deterministic second corpus copy, and refreshes — so each
    group holds TWO partial sketches that must union-merge to the
    full-corpus estimate. The row certifies, per ACL-visible group:
    exact row accounting (``n_rows`` — summed across partials), the
    exact distinct count re-derived from the governed SOURCE under the
    same restricted user, the estimate landing within HLL error bounds
    of it (``within_bounds``), and the partial-row count (``n_partials``
    = 2, i.e. the refresh really appended instead of rebuilding). The
    DuckDB oracle replays base + append from raw parquet. Replaced the
    retired ``catalog_surface`` row in round 16 (still pytest-gated;
    S1/S2/J8 fold into file_surface's catalog leg)."""
    paths = events_fixture(spark, sf_dir)
    user = "metrics_reader"
    perms = spark.createDataFrame(
        [
            (i + 1, user, EVENTS_ALIAS, json.dumps({"event_type": t}))
            for i, t in enumerate(SKETCH_EVENT_TYPES)
        ],
        "id int, user_id string, table_name string, partition_filters string",
    )
    eng = Engine(
        spark,
        EngineConfig(table_mapping=paths, read_only=True),
        permissions_df=perms,
    )
    est = eng.sketch_rollup_estimate(EVENTS_SKETCH, user=user)
    exact = (
        eng.read_table(EVENTS_ALIAS, user=user)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    roll = eng.read_table(EVENTS_SKETCH, user=user)
    pred = eng.acl_predicate(EVENTS_ALIAS, user)
    if pred is not None:
        roll = roll.filter(pred)
    partials = roll.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_partials")
    )
    return (
        est.join(F.broadcast(exact), "event_type")
        .join(F.broadcast(partials), "event_type")
        .select(
            "event_type",
            "n_rows",
            "exact_distinct",
            (
                F.abs(
                    F.col("approx_distinct").cast("double")
                    / F.col("exact_distinct")
                    - 1.0
                )
                <= 0.05
            ).alias("within_bounds"),
            "n_partials",
        )
    )


def catalog_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S2 catalog surface + DESCRIBE DETAIL in one query: the
    virtual bucket namespace crossed with its table listing, enriched with
    ``describe_table`` facts the oracle independently derives from its own
    log replay (live file count, total logged bytes) plus the protocol
    constants this engine emits. Retired from the pinned driver window in
    round 16 (slot for sketch_rollup_estimate; S1/S2/J8 stay driver-green
    via file_surface's catalog leg); oracle-gated by
    test_retired_catalog_surface_matches_oracle."""
    eng = governed_engine(spark, sf_dir)
    detail = eng.describe_table(GOV_ALIAS).select(
        "format",
        F.col("numFiles").alias("num_files"),
        F.col("sizeInBytes").alias("size_in_bytes"),
        F.col("minReaderVersion").alias("min_reader_version"),
        F.col("minWriterVersion").alias("min_writer_version"),
    )
    return eng.list_catalogs().crossJoin(eng.list_tables()).crossJoin(detail)


# ---------------------------------------------------------------------------
# Sequence packing + PII scrubbing (round 7 — training-data pipeline depth)
# ---------------------------------------------------------------------------


@register(
    "sequence_pack",
    """
    WITH sized AS (
      SELECT doc_id, doc_id % 8 AS grp, n_chars,
             SUM(n_chars) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id ASC) AS cum
      FROM documents
    ),
    packed AS (
      SELECT grp, CAST(FLOOR((cum - n_chars) / 4096.0) AS BIGINT) AS bin, n_chars
      FROM sized
    )
    SELECT grp, bin, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS pack_tokens,
           round(CAST(SUM(n_chars) AS DOUBLE) / 4096.0, 6) AS fill
    FROM packed GROUP BY grp, bin
    """,
)
def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (concat-and-pack): documents are split into
    8 deterministic modular groups, packed contiguously against a 4096-char
    budget with ONE per-group window cumsum (pure codegen, no Python), and
    rolled up per pack. The oracle replays the identical window in DuckDB.
    The tighter first-fit-decreasing variant (``functions.packing
    .pack_first_fit``) strictly respects the budget and is pytest-certified
    against this one's fill rate."""
    from .functions import packing

    docs = load_table(spark, sf_dir, "documents")
    return packing.pack_summary(
        packing.pack_contiguous(docs, "n_chars", budget=4096, num_groups=8),
        "n_chars",
        budget=4096,
    )


_PII_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.0.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.7 ssn 123-45-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' call +1 555 0142'"
)


def _pii_oracle() -> str:
    from .functions.text import PII_PATTERNS

    red = "t"
    for _name, (pat, repl) in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    counts = ", ".join(
        f"len(regexp_extract_all(t, '{pat}')) AS n_{name}"
        for name, (pat, _repl) in PII_PATTERNS.items()
    )
    sums = ", ".join(
        f"CAST(SUM(n_{name}) AS BIGINT) AS n_{name}" for name in PII_PATTERNS
    )
    return f"""
    WITH aug AS (SELECT doc_id, lang, {_PII_AUG_SQL} AS t FROM documents),
    c AS (SELECT lang, {counts}, length({red}) AS red_len FROM aug)
    SELECT lang, {sums}, CAST(SUM(red_len) AS BIGINT) AS redacted_chars
    FROM c GROUP BY lang
    """


@register("pii_scrub", _pii_oracle)
def pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the corpus (emails, IPv4, SSN-shaped,
    phone numbers — RE2-compatible patterns shared verbatim with the DuckDB
    oracle). The corpus is deterministically AUGMENTED with synthetic PII
    derived from doc_id so every pattern class actually fires; counts are
    taken against the original text, redaction applies the replace chain,
    and the rollup is per language. One codegen projection, no shuffle
    before the tiny rollup."""
    from .functions import text as text_fns

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 ssn 123-45-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" call +1 555 0142"),
        ).alias("text"),
    )
    scrubbed = text_fns.pii_scrub(docs, keep=("lang",))
    return scrubbed.groupBy("lang").agg(
        *[
            F.sum(f"n_{name}").cast("long").alias(f"n_{name}")
            for name in text_fns.PII_PATTERNS
        ],
        F.sum(F.length("redacted")).cast("long").alias("redacted_chars"),
    )


def bpe_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 BPE: train a small merge table on the corpus (ONE distributed
    corpus scan into the word-frequency vocab, then the in-memory
    incremental trainer — r17: ``bpe_train_collected``, pinned
    merge-for-merge equal to the distributed rounds, which paid 2+ driver
    round-trip jobs per merge for a vocab that is driver-sized by
    definition) and encode every document with it. Unregistered (the
    merge list is pinned EQUAL to a from-scratch Sennrich reference in
    test_llm_ops); benchmarked under SPARK_GRAFT_BENCH_EXTENDED."""
    from .functions import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.bpe_train_collected(docs, num_merges=12)
    return bpe.bpe_encode(docs, merges).select("doc_id", "n_tokens")


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 DSIR importance weights with the high-quality tier as the target
    seed (the standard bootstrap when no external target corpus exists).
    Unregistered companion of lm_perplexity; benchmarked under
    SPARK_GRAFT_BENCH_EXTENDED, model pinned in test_llm_ops."""
    docs = load_table(spark, sf_dir, "documents")
    # r17: carry text THROUGH the stats projection (extra_cols passthrough)
    # instead of joining stats back to the corpus on doc_id — the old shape
    # scanned documents twice and paid a doc⋈doc shuffle join just to attach
    # the quality gate to the text it was computed from.
    stats = text.text_stats(docs, extra_cols=(F.col("text"),))
    joined = stats.withColumn("_tgt", F.col("quality_score") >= 0.55)
    return text.dsir_importance_weights(joined, F.col("_tgt"))


def decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 benchmark decontamination: treat every ~97th document as a held-
    out eval set and find training documents sharing a 13-gram with it
    (text.ngram_contamination — corpus-side map-only gram hashing,
    broadcast eval side). Unregistered (pair output is brute-force-oracled
    in test_llm_ops); benchmarked under SPARK_GRAFT_BENCH_EXTENDED."""
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.pmod(F.col("doc_id"), F.lit(97)) == 0)
    train = docs.filter(F.pmod(F.col("doc_id"), F.lit(97)) != 0)
    return text.ngram_contamination(train, ev, n=13)


def mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 domain-mix resampling: derive a 3-way pseudo-domain from the
    hash of doc_id and resample to a 50/30/20 target with the stable hash
    coin (packing.sample_to_mix). Unregistered (proportions/determinism
    pinned in test_llm_ops); benchmarked under
    SPARK_GRAFT_BENCH_EXTENDED."""
    from .functions import packing

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "_dom",
        F.element_at(
            F.array(F.lit("web"), F.lit("code"), F.lit("wiki")),
            (F.pmod(F.xxhash64("doc_id"), F.lit(3)) + 1).cast("int"),
        ),
    )
    out = packing.sample_to_mix(
        docs, {"web": 0.5, "code": 0.3, "wiki": 0.2}, domain_col="_dom"
    )
    return out.groupBy("_dom").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))


def gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 Gopher quality + repetition rules over the documents table: the
    published Rae et al. 2021 A1.1 filter — quality rules and repetition
    verdict composed in ONE map-side projection (r17:
    ``quality.gopher_filter``; the old two-half join scanned the corpus
    four times and shuffled it three times for document-local
    arithmetic). Unregistered (both halves are Python-oracled in
    test_llm_ops incl. on real fixture docs); benchmarked under
    SPARK_GRAFT_BENCH_EXTENDED."""
    from .functions import quality

    # single-file fixture -> one scan task; the verdict is a heavy per-row
    # projection, so spread it (gated: at 100 TB the scan has thousands of
    # splits and the chain stays shuffle-free)
    docs = spread_if_narrow(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        F.col("doc_id"),
    )
    return quality.gopher_filter(docs)


def hamming_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 daily-ingest Hamming dedup (r13): SimHash-fingerprint ~90% of the
    corpus into the persisted signature index, then pair the remaining
    ~10% "new batch" against it — index build (one corpus scan) + the
    (band, bucket) join + exact popcount verify, the full incremental
    path. Unregistered (union-equality and corruption-invariance pinned
    in test_llm_ops/test_udfs); benchmarked under
    SPARK_GRAFT_BENCH_EXTENDED.

    r17: signatures are computed in ONE pass over the full table and
    split by the ingest predicate afterwards (signatures are per-doc
    deterministic, so ``sigs(corpus) == sigs(docs).filter(corpus)``) —
    the old shape ran the tokenize + 61-aggregate signature pipeline
    twice, once per side, for one underlying scan's worth of work. The
    persist is a query-local intermediate materialized eagerly (both
    join sides read the cache; lazy, the two concurrent upstream stages
    would each recompute it) and FIFO-retired via the module's persist
    registry — not a cross-run cache."""
    from .functions import dedup
    from .functions._persist_cache import cache_persisted

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = dedup.simhash_signatures(docs).persist()
    sigs.count()
    cache_persisted(sigs)
    new = F.pmod(F.col("doc_id"), F.lit(10)) == 0
    idx = dedup.hamming_signature_index(sigs.filter(~new))
    return dedup.hamming_near_duplicates_incremental(sigs.filter(new), idx)


def line_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 daily-ingest C4 line dedup (r13): line-hash index over ~90% of
    the corpus (24 B/line state), incremental trim of the ~10% batch
    against it. Unregistered (batch-on-union equality pinned in
    test_llm_ops); benchmarked under SPARK_GRAFT_BENCH_EXTENDED."""
    from .functions import dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0)
    idx = dedup.line_hash_index(corpus)
    return dedup.dedupe_repeated_lines_incremental(batch, idx)


def _ivf_batch_fixture(spark: SparkSession, sf_dir: str):
    """A cached plain IVF index over the embeddings table plus an Engine
    that serves it — shared by the batch-probe and probe-loop bench rows
    so both pay zero build cost in the timed region."""
    from .engine import Engine
    from .config import EngineConfig

    idx = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_fixtures",
        os.path.basename(os.path.abspath(sf_dir)),
        "ivf_batch_index",
    )
    if not os.path.exists(os.path.join(idx, "_ivf_centroids.json")):
        emb = load_table(spark, sf_dir, "embeddings")
        similarity.ivf_build(emb, idx, num_centroids=8, lloyd_iters=1)
    eng = Engine(spark, EngineConfig(table_mapping={"emb__ivfb": idx}))
    return eng, "emb__ivfb", idx


def _probe_queries(spark: SparkSession, sf_dir: str, n: int = 16) -> DataFrame:
    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < n)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def ivf_probe_batch16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 batched multi-query IVF probe (r14): 16 query vectors answered
    in ONE plan — Arrow centroid ranking, union-of-cids pruned scan, one
    join, per-query window top-k. Compare with :func:`ivf_probe_loop16`
    (the same 16 queries as 16 single-probe plan branches) for the
    sub-linear claim. Unregistered (per-query equality with single probes
    pinned in test_llm_ops); benchmarked under
    SPARK_GRAFT_BENCH_EXTENDED."""
    eng, alias, _ = _ivf_batch_fixture(spark, sf_dir)
    return eng.ivf_probe_batch(
        alias, _probe_queries(spark, sf_dir), k=10, n_probe=2
    )


def ivf_probe_loop16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The comparison floor for :func:`ivf_probe_batch16`: the SAME 16
    queries as a union of 16 single-probe branches (each its own pruned
    scan + TakeOrdered — and this is still the CHEAP loop: a real driver
    loop would also pay 16 job submissions)."""
    _eng, _alias, idx = _ivf_batch_fixture(spark, sf_dir)
    qs = [
        (r["query_id"], list(r["embedding"]))
        for r in _probe_queries(spark, sf_dir).collect()
    ]
    out = None
    for qid, v in qs:
        one = similarity.ivf_probe(spark, idx, v, k=10, n_probe=2).withColumn(
            "query_id", F.lit(qid).cast("long")
        )
        out = one if out is None else out.unionByName(one)
    return out


def byte_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 byte-level BPE (r13): train 24 GPT-2-style byte merges (one
    Arrow corpus pass + driver trainer) and encode every document to
    token ids. Unregistered (merge list and ids pinned against an
    independent byte-level reference in test_llm_ops); benchmarked under
    SPARK_GRAFT_BENCH_EXTENDED."""
    from .functions import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.bpe_train_bytes(docs, num_merges=24)
    return bpe.bpe_encode_bytes(docs, merges).select("doc_id", "n_tokens")


def _bm25_batch_fixture(spark: SparkSession, sf_dir: str):
    """A cached governed copy of the documents table plus its BM25
    posting index, shared by the bm25 bench rows so both pay zero
    build cost in the timed region (the _ivf_batch_fixture pattern)."""
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_fixtures",
        os.path.basename(os.path.abspath(sf_dir)),
    )
    srcp = os.path.join(base, "bm25_docs_governed")
    idxp = os.path.join(base, "bm25_index")
    eng = Engine(
        spark,
        EngineConfig(
            table_mapping={"bm_docs": srcp, "bm_docs__bm25": idxp},
            read_only=False,
        ),
    )
    if not os.path.exists(os.path.join(srcp, "_delta_log")):
        write_governed_table(
            spark,
            load_table(spark, sf_dir, "documents").select("doc_id", "text"),
            srcp,
            [],
        )
    if not os.path.exists(os.path.join(idxp, "_delta_log")):
        eng.build_bm25_index("bm_docs", idxp)
    return eng, "bm_docs__bm25"


_BM25_QUERY_POOL = [
    "the", "and", "data", "model", "learning", "spark", "test", "value",
    "time", "work", "system", "result", "word", "code", "line", "point",
]


def _bm25_queries(spark: SparkSession, n: int = 16):
    pool = _BM25_QUERY_POOL
    return [
        (i, [pool[i % len(pool)], pool[(i + 3) % len(pool)]])
        for i in range(n)
    ]


def bm25_probe_batch16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 batched BM25 probe (r15): 16 term queries answered in ONE plan
    against the governed posting index — union-of-terms pruned posting
    scan, shared per-term df, per-query window top-k. Compare with
    :func:`bm25_scan_loop16` (the same 16 queries each re-tokenizing the
    corpus — the no-index floor). Unregistered (per-query equality with
    single probes pinned in test_llm_ops); benchmarked under
    SPARK_GRAFT_BENCH_EXTENDED.

    r17: the batch is built as a JVM-literal relation
    (``functions._local_relation.id_terms_relation`` — the serving-request
    shape) so the probe's driver-resident fast path gates in: prep runs
    with zero Spark jobs and no Python-RDD round trips. Values identical
    to the previous ``createDataFrame`` batch (pinned equal in
    test_llm_ops)."""
    from .functions import _local_relation as _lr

    eng, idx = _bm25_batch_fixture(spark, sf_dir)
    queries = _lr.id_terms_relation(
        spark, _bm25_queries(spark), "query_id", "terms"
    )
    return eng.bm25_probe_batch(idx, queries, k=10)


def bm25_scan_loop16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The no-index comparison floor for :func:`bm25_probe_batch16`: the
    SAME 16 queries as 16 `text.bm25_topk` branches, each tokenizing the
    whole corpus — what serving lexical retrieval without the posting
    index costs."""
    from .functions import text as _tx

    _bm25_batch_fixture(spark, sf_dir)  # same fixture cost parity
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = None
    for qid, terms in _bm25_queries(spark):
        one = _tx.bm25_topk(docs, terms, k=10).withColumn(
            "query_id", F.lit(qid).cast("int")
        )
        out = one if out is None else out.unionByName(one)
    return out


def _hybrid_queries(n: int = 16):
    pool = _BM25_QUERY_POOL
    return [
        (
            i,
            [pool[i % len(pool)], pool[(i + 5) % len(pool)]],
            [
                float((((i + 1) * (d + 3) * 29) % 17) - 8) / 8.0
                for d in range(64)
            ],
        )
        for i in range(n)
    ]


def hybrid_batch16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16 hybrid queries in ONE composed plan (r16): batched BM25 probe +
    batched IVF probe + per-query RRF over the round-16 retrieval fixture
    (one governed corpus, both indexes). Compare :func:`hybrid_loop16` —
    the same 16 queries as 16 separate hybrid_search plans (a per-request
    serving loop). Unregistered (batch == single pinned in
    test_llm_ops.test_hybrid_search_batch_equals_single); benchmarked
    under SPARK_GRAFT_BENCH_EXTENDED.

    r17: the batch is built as a JVM-literal relation
    (``functions._local_relation.id_terms_vec_relation``, float32 vector
    parity with the previous ``createDataFrame`` schema) so BOTH probe
    legs' driver-resident fast paths gate in — zero prep jobs, no
    Python-RDD round trips. Values identical (pinned in test_llm_ops)."""
    from .functions import _local_relation as _lr

    eng = retrieval_engine(spark, sf_dir)
    q = _lr.id_terms_vec_relation(
        spark, _hybrid_queries(), "query_id", "terms", "embedding",
        vec_sql_type="ARRAY<FLOAT>",
    )
    return eng.hybrid_search_batch(DOCS_BM25, DOCS_IVF, q, k=10, n_probe=2)


def hybrid_loop16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-request comparison floor for :func:`hybrid_batch16`: the
    SAME 16 hybrid queries as 16 independent two-probe plans."""
    eng = retrieval_engine(spark, sf_dir)
    out = None
    for qid, terms, vec in _hybrid_queries():
        one = eng.hybrid_search(
            DOCS_BM25, DOCS_IVF, terms, vec, k=10, n_probe=2
        ).withColumn("query_id", F.lit(qid).cast("int"))
        out = one if out is None else out.unionByName(one)
    return out
