"""A/B/A the batch-probe bench rows across two repo trees, back-to-back —
the bench_protocol_ab.py pattern applied to the r17 serving fast path:
this VM drifts 30-60% between driver sessions (NOTES_r16 calibration), so
the ONLY trustworthy before/after for the JVM-literal batch-probe channel
is both trees in one session window, A run again last so ordering and
page-cache effects are visible. `text_stats` rides along as an
untouched-code drift control.

Usage:
    python tools/bench_batch_ab.py TREE_A TREE_B [SF_DIR]

Each tree runs in its own subprocess (fresh JVM, fresh modules). The
shared /tmp/spark_graft_fixtures indexes are pre-warmed by an untimed
first call per row, so run 1 never pays a build. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROWS = [
    "ivf_probe_batch16",
    "bm25_probe_batch16",
    "hybrid_batch16",
    "text_stats",  # drift control: code identical in both trees
]

CHILD = r"""
import gc, json, sys, time
sys.path.insert(0, sys.argv[1])
sf_dir = sys.argv[2]
from delta_lake_proxy_spark import queries as Q
from delta_lake_proxy_spark.session import build_session

spark = build_session("batch-ab")
rows = json.loads(sys.argv[3])
out = {}
for name in rows:
    fn = Q.QUERIES.get(name) or getattr(Q, name)
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
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
        capture_output=True, text=True, timeout=2400,
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
