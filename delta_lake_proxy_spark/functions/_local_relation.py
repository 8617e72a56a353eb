"""Driver-resident query relations for the batch-probe fast path.

The batch probes (``Engine.ivf_probe_batch`` / ``Engine.bm25_probe_batch``)
accept ANY query DataFrame. When the relation is genuinely distributed (an
ingest scan), the distributed prep — persisted centroid ranking, dup-check
job, term-union collect — is the right plan. But the SERVING shape is a
driver-built batch of a few dozen requests, and there the same prep is pure
fixed overhead: on ``local[32]`` a 16-row batch paid ~0.8 s of tiny Spark
jobs before the first posting was scored (r17 phase profile), and a
plain ``spark.createDataFrame`` batch is a 32-partition Python-RDD relation
that pays Python-worker round trips on EVERY consume (the r17 A/B/A that
rejected the first fast-path attempt measured 0.93 s vs 0.64 s per
evaluation).

This module provides the two primitives that make a zero-job fast path
safe:

- :func:`driver_resident_rows` — the GATE. Returns the batch rows only when
  the analyzed plan proves the data already lives in the driver JVM (every
  leaf is a ``LocalRelation`` / ``OneRowRelation``), so the collect is free
  or a single 1-partition JVM task — never a distributed evaluation.
- :func:`int_relation` / :func:`string_pair_relation` /
  :func:`vec_relation` — JVM-literal relations built through STRING-BLOB
  parameters: one ``spark.sql`` call with CSV/hex/semicolon blobs decoded by
  foldable ``split``/``cast``/``unhex`` expressions. One py4j call per blob
  (measured 0.03 s for 16x64 doubles warm), no SQL-parser literal storm
  (0.47 s for the same batch as inline-table literals), no per-element
  ``F.lit`` py4j round trips (0.6 s), and no escaping risk (strings travel
  hex-encoded). Every decode is exact: ``repr(float)`` -> ``CAST(s AS
  DOUBLE)`` round-trips bit-for-bit (Java correctly-rounded parse of the
  shortest round-trip decimal), verified over 20k values including
  subnormals.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

# Plan-size guardrails: above these the distributed path is the right plan
# anyway (its prep overhead is FIXED, so big batches amortize it), and a
# literal channel would bloat the plan tree. 4096 rows is the serving cap
# the r16 batch-probe design documented; 262144 vector cells keeps the
# decoded literal under ~2 MiB (341 queries at 768 dims, 4096 at 64).
MAX_DRIVER_ROWS = 4096
MAX_VEC_CELLS = 262144
MAX_PAIR_ROWS = 65536

_DRIVER_LEAVES = {"LocalRelation", "OneRowRelation"}


def driver_resident_rows(df: DataFrame, max_rows: int = MAX_DRIVER_ROWS):
    """Return ``df.collect()`` when the ANALYZED plan proves the relation is
    driver-resident (every leaf a ``LocalRelation``/``OneRowRelation`` —
    inline tables, literal relations from this module, ``OneRowRelation``
    generators), else ``None``. A parquet scan, a Delta read or a
    ``createDataFrame`` Python-RDD relation all keep their distributed
    plan. Empty and over-``max_rows`` batches also return ``None``: the
    distributed path already handles both, and a cap keeps the literal
    relations the caller builds from the rows plan-size-safe."""
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        n = leaves.size()
        if n == 0:
            return None
        for i in range(n):
            if leaves.apply(i).getClass().getSimpleName() not in _DRIVER_LEAVES:
                return None
    except Exception:  # py4j / connect-mode surface differences: stay distributed
        return None
    rows = df.collect()
    if not rows or len(rows) > max_rows:
        return None
    return rows


def _int_csv(vals) -> str:
    return ",".join(str(int(v)) for v in vals)


def _hex_csv(vals) -> str:
    return ",".join(v.encode("utf-8").hex() for v in vals)


def _float_csv(vals) -> str:
    # repr() is the shortest round-trip decimal; CAST parses it back to the
    # identical double. Callers must pre-check finiteness (all_finite).
    return ",".join(repr(float(v)) for v in vals)


def all_finite(vecs) -> bool:
    """True when every element of every vector is a finite number — the
    literal channel's precondition (``repr`` of nan/inf does not round-trip
    through CAST, and non-finite query vectors are caller bugs the
    distributed path surfaces the same way)."""
    try:
        return all(
            v is not None and all(x is not None and math.isfinite(x) for x in v)
            for v in vecs
        )
    except TypeError:
        return False


_INT_SQL_TYPES = {
    "tinyint": True, "smallint": True, "int": True, "bigint": True,
}


def id_sql_type(dtype) -> str | None:
    """The SQL cast target for a query-id column, or ``None`` when the type
    has no literal channel here (callers fall back to the distributed
    path). Integral ids travel as CSV ints; string ids travel hex."""
    s = dtype.simpleString()
    if s in _INT_SQL_TYPES or s == "string":
        return s
    return None


def _id_decode(param: str, sql_type: str) -> str:
    if sql_type == "string":
        return f"transform(split({param}, ','), s -> CAST(unhex(s) AS STRING))"
    return f"transform(split({param}, ','), s -> CAST(s AS {sql_type}))"


def _id_blob(ids, sql_type: str) -> str:
    return _hex_csv(ids) if sql_type == "string" else _int_csv(ids)


def string_pair_relation(
    spark: SparkSession, ids, strs, id_col: str, str_col: str,
    id_type: str,
) -> DataFrame:
    """A JVM-literal two-column relation of ``(id, string)`` pairs —
    the exploded (query_id, term) shape. Both columns travel as one blob
    each (ids CSV-or-hex per ``id_type``, strings hex), so arbitrary string
    content is safe and construction is two py4j calls."""
    return spark.sql(
        f"SELECT element_at(i, pos + 1) AS `{id_col}`,"
        f"       CAST(unhex(t) AS STRING) AS `{str_col}` "
        f"FROM (SELECT {_id_decode(':ids', id_type)} AS i,"
        f"             posexplode(split(:strs, ',')) AS (pos, t))",
        args={"ids": _id_blob(ids, id_type), "strs": _hex_csv(strs)},
    )


def id_vec_cid_relation(
    spark: SparkSession, ids, vecs, cids, id_col: str, vec_col: str,
    cid_col: str, id_type: str,
) -> DataFrame:
    """A JVM-literal three-column relation ``(id, vec array<double>,
    cid bigint)`` — the batch probe's per-(query, probed-list) shape, built
    from three blobs (ids, semicolon/comma vector matrix, cids). Rows align
    positionally; the caller repeats ``ids``/``vecs`` per probed cid."""
    return spark.sql(
        f"SELECT element_at(i, pos + 1) AS `{id_col}`,"
        f"       v AS `{vec_col}`,"
        f"       element_at(c, pos + 1) AS `{cid_col}` "
        f"FROM (SELECT {_id_decode(':ids', id_type)} AS i,"
        f"             transform(split(:cids, ','), s -> CAST(s AS BIGINT)) AS c,"
        f"             posexplode(transform(split(:vecs, ';'),"
        f"                 r -> transform(split(r, ','),"
        f"                      x -> CAST(x AS DOUBLE)))) AS (pos, v))",
        args={
            "ids": _id_blob(ids, id_type),
            "cids": _int_csv(cids),
            "vecs": ";".join(_float_csv(v) for v in vecs),
        },
    )


def id_terms_relation(
    spark: SparkSession, rows, id_col: str, terms_col: str,
) -> DataFrame:
    """A JVM-literal query-batch relation ``(id int, terms
    array<string>)`` — the lexical serving request shape, for callers that
    hold the batch as plain Python ``(id, [terms...])`` data. Terms travel
    hex inside a two-level blob ('|' joins a query's terms — safe, the
    terms are hex). Queries must carry at least one term (a zero-term
    query has no blob encoding here — keep such batches on
    ``createDataFrame``)."""
    ids, termss = zip(*rows)
    return spark.sql(
        f"SELECT element_at(i, pos + 1) AS `{id_col}`,"
        f"       transform(split(t, '\\\\|'), h -> CAST(unhex(h) AS STRING))"
        f"           AS `{terms_col}` "
        f"FROM (SELECT transform(split(:ids, ','), s -> CAST(s AS INT)) AS i,"
        f"             posexplode(split(:terms, ',')) AS (pos, t))",
        args={
            "ids": _int_csv(ids),
            "terms": ",".join(
                "|".join(t.encode("utf-8").hex() for t in ts) for ts in termss
            ),
        },
    )


def id_terms_vec_relation(
    spark: SparkSession, rows, id_col: str, terms_col: str, vec_col: str,
    vec_sql_type: str = "ARRAY<FLOAT>",
) -> DataFrame:
    """A JVM-literal query-batch relation ``(id int, terms array<string>,
    vec)`` — the hybrid serving request shape, for callers that hold the
    batch as plain Python data. Terms travel hex inside a two-level blob
    ('|' joins a query's terms — safe, the terms are hex), vectors as the
    semicolon/comma matrix cast to ``vec_sql_type`` (``ARRAY<FLOAT>``
    reproduces a ``createDataFrame(..., 'array<float>')`` batch exactly:
    double -> float is the same IEEE rounding both ways)."""
    ids, termss, vecss = zip(*rows)
    return spark.sql(
        f"SELECT element_at(i, pos + 1) AS `{id_col}`,"
        f"       transform(split(t, '\\\\|'), h -> CAST(unhex(h) AS STRING))"
        f"           AS `{terms_col}`,"
        f"       CAST(element_at(v, pos + 1) AS {vec_sql_type}) AS `{vec_col}` "
        f"FROM (SELECT transform(split(:ids, ','), s -> CAST(s AS INT)) AS i,"
        f"             transform(split(:vecs, ';'),"
        f"                 r -> transform(split(r, ','),"
        f"                      x -> CAST(x AS DOUBLE))) AS v,"
        f"             posexplode(split(:terms, ',')) AS (pos, t))",
        args={
            "ids": _int_csv(ids),
            "terms": ",".join(
                "|".join(t.encode("utf-8").hex() for t in ts) for ts in termss
            ),
            "vecs": ";".join(_float_csv(v) for v in vecss),
        },
    )
