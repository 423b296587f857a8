"""Scaling-efficiency evidence (BASELINE.json north_rule): run the
identical PageRank job at two parallelism levels (local[8] vs local[32])
on the same input and report throughput at both + efficiency.

Each level runs in a fresh subprocess (one JVM per SparkSession — a
restarted session in-process would inherit the old executor pool).
Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from graphanalytics_spark import graph
from graphanalytics_spark.operators import pagerank
from graphanalytics_spark.session import get_spark

cpus = int(sys.argv[1]); sf_dir = sys.argv[2]
spark = get_spark(app_name=f"ga-scale-{cpus}", cpus=cpus, shuffle_partitions=cpus)
lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
edges = graph.copurchase_edges(lineitem)
sym = graph.symmetrize(edges)
# warm the scan cache out of the measurement
sym.count()
m = pagerank.IterationMetrics()
t0 = time.monotonic()
ranks = pagerank.pagerank(spark, sym, tol=1e-6, max_iter=60, metrics=m)
checksum = ranks.agg(F.sum("rank")).first()[0]
wall = time.monotonic() - t0
print(json.dumps({
    "cpus": cpus, "wall_s": wall, "iterations": m.iterations,
    "edges_traversed": m.total_edges_traversed,
    "eps": m.total_edges_traversed / wall, "rank_sum": checksum,
}))
spark.stop()
"""


def run_level(cpus: int, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD % {"repo": REPO}, str(cpus), sf_dir],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from cpus={cpus}: {out.stderr[-2000:]}")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo_n, hi_n = 8, 32
    lo = run_level(lo_n, sf_dir)
    hi = run_level(hi_n, sf_dir)
    speedup = hi["eps"] / lo["eps"]
    efficiency = speedup / (hi_n / lo_n)
    report = {
        "sf_dir": sf_dir,
        f"local[{lo_n}]": lo,
        f"local[{hi_n}]": hi,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(report, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH baseline — scaling evidence

North rule: throughput scaling efficiency ≥ 0.8 between cluster sizes N and
4N executors. Sandbox proxy (no real cluster): the identical converged-
PageRank job (damping 0.85, tol 1e-6) on the same input
(`{sf_dir}` co-purchase graph) at local[{lo_n}] vs local[{hi_n}].

| parallelism | wall (s) | iterations | edges traversed | edges/sec |
|---|---|---|---|---|
| local[{lo_n}] | {lo["wall_s"]:.2f} | {lo["iterations"]} | {lo["edges_traversed"]:,} | {lo["eps"]:,.0f} |
| local[{hi_n}] | {hi["wall_s"]:.2f} | {hi["iterations"]} | {hi["edges_traversed"]:,} | {hi["eps"]:,.0f} |

- speedup {lo_n}→{hi_n} cores: **{speedup:.2f}×** (ideal 4×)
- scaling efficiency: **{efficiency:.2f}**
- identical result at both levels: rank_sum {lo["rank_sum"]:.12f} vs {hi["rank_sum"]:.12f}

Caveats: local mode shares one JVM and one driver; shuffle goes through
local disk, so parallel efficiency here is a lower-bound proxy for
multi-executor scaling where the per-iteration shuffle parallelizes across
machines. The job's plan (persisted static link table partitioned on src;
per-iteration state join + hash aggregation) scales with partition count —
the same plan at 1000 executors shuffles only the vertex-state table.
"""
        )
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
