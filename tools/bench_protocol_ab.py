"""A/B the protocol bench rows across two repo trees on one machine,
back-to-back — the experiment VERDICT r15 asked for: `checkpoint_replay`
and `read_delta_log` doubled r14->r15 on code the judge verified unchanged
(zero diff to deltalog.py), so either the environment drifted between the
two driver sessions or something nonlocal regressed. Running both trees'
protocol rows in ONE session window separates the two: parity here = the
swing was driver-session drift; a gap here = a real (nonlocal) regression
to hunt.

Usage:
    python tools/bench_protocol_ab.py TREE_A TREE_B [SF_DIR]

Each tree runs in its own subprocess (fresh JVM, fresh modules), same
machine, same minute; the first tree runs AGAIN at the end so
ordering/page-cache effects are visible. Prints one JSON line:
{"trees": {...}, "order": [...], "sf_dir": ...}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROWS = ["dv_read", "table_changes", "table_history", "read_delta_log"]

# checkpoint_replay is a bench-local micro-bench, not a registry row —
# inlined here so trees whose bench.py predates it still A/B it.
CHILD = r"""
import gc, glob, json, os, sys, time
sys.path.insert(0, sys.argv[1])
sf_dir = sys.argv[2]
from delta_lake_proxy_spark import deltalog, queries as Q
from delta_lake_proxy_spark.session import build_session

spark = build_session("protocol-ab")
path = Q.governed_fixture(spark, sf_dir)
from delta_lake_proxy_spark.io import load_all
for df in load_all(spark, sf_dir).values():
    df.write.mode("overwrite").format("noop").save()


def checkpoint_replay(spark, sf_dir):
    v = deltalog.latest_version(path)
    if not glob.glob(os.path.join(path, "_delta_log", f"{v:020d}.checkpoint*")):
        deltalog.write_checkpoint(spark, path)
    return deltalog.snapshot_files(spark, path).select(
        "path", "size", "partitionValues"
    )


rows = json.loads(sys.argv[3])
out = {}
for name in rows + ["checkpoint_replay"]:
    fn = Q.QUERIES.get(name) or getattr(Q, name, None) or locals()[name]
    rs = []
    for _ in range(5):
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        rs.append(round(time.time() - t0, 3))
    out[name] = {"min": min(rs), "runs": rs}
print("AB_RESULT " + json.dumps(out))
spark.stop()
"""


def run_tree(tree: str, sf_dir: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", CHILD, os.path.abspath(tree), sf_dir,
         json.dumps(ROWS)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"tree {tree}: no result line\nstdout:\n{p.stdout[-2000:]}\n"
        f"stderr:\n{p.stderr[-2000:]}"
    )


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    order = [("A", tree_a), ("B", tree_b), ("A2", tree_a)]
    results = {}
    for label, tree in order:
        results[label] = run_tree(tree, sf_dir)
        print(f"# {label} ({tree}): "
              + ", ".join(f"{k}={v['min']}" for k, v in results[label].items()),
              file=sys.stderr)
    print(json.dumps({
        "trees": {"A": tree_a, "B": tree_b},
        "order": [label for label, _ in order],
        "results": results,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
