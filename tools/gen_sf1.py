"""Deterministic local sf1-scale fixture for scale-posture spot checks
(r18, verdict r17 next #3: "give scale claims teeth").

The driver's fixtures stop at sf0.1 (read-only; never regenerated). This
tool derives a 10x corpus from sf0.1 with DuckDB — NOT a replacement for
driver data, only a local perf probe for ``tools/bench_sf1.py``:

- documents: 10 replicas. Replica 0 is sf0.1 verbatim; replica r prefixes
  every whitespace-token with ``r{r}`` so replicas share NO word shingles —
  the near-duplicate pair structure of sf0.1 is preserved exactly per
  replica (pairs scale linearly, not quadratically) while tokenize/shingle
  work scales 10x.
- lineitem / orders / customer: 10 replicas with key shifts that keep the
  join graph intact (l_orderkey<->o_orderkey, o_custkey<->c_custkey) and
  nationkeys unchanged so the ASIA dimension filter keeps its selectivity.
- nation / region: copied verbatim.

Everything is a pure function of the sf0.1 inputs (no RNG) — re-running
reproduces byte-identical content. Output: ``/root/sf1_local/``.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/sf1_local")
REPLICAS = 10
KEY_SHIFT = 100_000_000  # far above any sf0.1 key


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    def write(name: str, sql: str) -> None:
        out = os.path.join(DST, f"{name}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{name}: {n} rows -> {out}", flush=True)

    for t in ("nation", "region"):
        write(t, f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

    legs = []
    for r in range(REPLICAS):
        text = (
            "text"
            if r == 0
            else rf"regexp_replace(text, '(\S+)', 'r{r}\1', 'g')"
        )
        legs.append(
            f"SELECT doc_id + {r * KEY_SHIFT} AS doc_id, {text} AS text, "
            "lang, source, length(" + text + ") AS n_chars "
            f"FROM read_parquet('{SRC}/documents.parquet')"
        )
    write("documents", " UNION ALL ".join(legs))

    write(
        "customer",
        " UNION ALL ".join(
            f"SELECT c_custkey + {r * KEY_SHIFT} AS c_custkey, "
            "c_name, c_nationkey, c_acctbal, c_mktsegment "
            f"FROM read_parquet('{SRC}/customer.parquet')"
            for r in range(REPLICAS)
        ),
    )
    write(
        "orders",
        " UNION ALL ".join(
            f"SELECT o_orderkey + {r * KEY_SHIFT} AS o_orderkey, "
            f"o_custkey + {r * KEY_SHIFT} AS o_custkey, "
            "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
            f"FROM read_parquet('{SRC}/orders.parquet')"
            for r in range(REPLICAS)
        ),
    )
    write(
        "lineitem",
        " UNION ALL ".join(
            f"SELECT l_orderkey + {r * KEY_SHIFT} AS l_orderkey, "
            "* EXCLUDE (l_orderkey) "
            f"FROM read_parquet('{SRC}/lineitem.parquet')"
            for r in range(REPLICAS)
        ),
    )
    con.close()


if __name__ == "__main__":
    sys.exit(main())
