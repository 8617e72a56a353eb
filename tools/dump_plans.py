"""Dump .explain("formatted") for declared queries to plans/<round>/.

Usage:
    python tools/dump_plans.py <out_dir> <suffix> [name ...]

Writes ``<out_dir>/<name>_<suffix>.txt`` for every requested query (default:
every registry entry plus the bench-local names). The judge reads these files
to verify plan-shape claims (Exchange count, join strategy, PushedFilters,
BatchEvalPython absence) without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from delta_lake_proxy_spark.session import build_session  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("spark-graft-plans")
    qs = entry_mod.queries()
    if not names:
        names = list(qs)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            from delta_lake_proxy_spark import queries as Q

            fn = getattr(Q, name, None)
        if fn is None:
            print(f"# {name}: not found, skipped", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # plan capture must not kill the sweep
            plan = f"ERROR capturing plan: {exc!r}"
        with open(
            os.path.join(out_dir, f"{name}_{suffix}.txt"), "w", encoding="utf-8"
        ) as f:
            f.write(plan)
        print(f"# wrote {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
