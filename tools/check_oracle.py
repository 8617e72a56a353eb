"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` (when present) at
a given scale factor and compares row count, sorted column names, and values
(floats to 1e-9 relative). Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from delta_lake_proxy_spark.io import TABLES  # noqa: E402
from delta_lake_proxy_spark.session import build_session  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 9)
        if isinstance(v, dict):
            return tuple(sorted(v.items()))
        if isinstance(v, list):
            return tuple(v)
        return v

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(name: str, spark, con, sf_dir: str) -> str:
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    t0 = time.time()
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    t_spark = time.time() - t0
    if sql is None:
        return f"ROWS-ONLY  rows={len(srows)} ({t_spark:.1f}s)"
    t0 = time.time()
    res = con.sql(sql)
    ocols = res.columns
    orows = res.fetchall()
    t_duck = time.time() - t0
    if len(srows) != len(orows):
        return f"FAIL rowcount spark={len(srows)} duck={len(orows)}"
    if sorted(scols) != sorted(ocols):
        return f"FAIL schema spark={sorted(scols)} duck={sorted(ocols)}"
    ns, no = normalize(srows, scols), normalize(orows, ocols)
    mismatches = [(a, b) for a, b in zip(ns, no) if a != b]
    if mismatches:
        return (
            f"FAIL values ({len(mismatches)}/{len(ns)} rows) "
            f"first: spark={mismatches[0][0]} duck={mismatches[0][1]}"
        )
    return f"OK rows={len(srows)} (spark {t_spark:.1f}s, duck {t_duck:.1f}s)"


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    # fixture-path-dependent oracles resolve their SQL lazily from this
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    names = [a for a in args if "/" not in a] or list(entry_mod.queries())
    spark = build_session("oracle-check")
    con = duck_connection(sf_dir)
    failed = []
    for name in names:
        try:
            verdict = compare(name, spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            verdict = f"ERROR {type(e).__name__}: {str(e)[:800]}"
        status_fail = verdict.startswith(("FAIL", "ERROR"))
        if status_fail:
            failed.append(name)
        print(f"{name:28s} {verdict}")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed; failing: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
