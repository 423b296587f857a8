"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE COMPACT JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Artifact-size contract (r4 verdict #1): the driver records only the last
~2000 characters of stdout, so the final line must stay under that
budget. Per-run raw walls, per-query minima, and the Louvain per-phase
table are written to ``BENCH/bench_detail.json`` instead of the stdout
line; the line carries the medians and the headline throughput numbers
only.

Methodology (r3 verdict #1): this sandbox's single-shot walls swing 2-5x
between identical runs, so every headline query is timed THREE times and
the artifact carries the per-query MEDIAN (in ``queries`` — the canonical
round-over-round number) plus the MIN (``queries_min``, the contention
floor) and the raw runs (``queries_runs``). ``value`` is the sum of
medians.

Headline metric: edges-traversed/sec during converged PageRank (Σ over
iterations of symmetrized edge count / PR wall time) — BASELINE.json's
authoritative throughput number. Two scale rows run once each (work
dominates scheduling there, so single walls are meaningful):
``pagerank_20iter_x24`` (the ×24 replicated graph, ~28.7 M edges) and
``louvain`` (multi-phase on the sparse graph with per-phase metrics).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from graphanalytics_spark import graph
    from graphanalytics_spark.functions import dedup, similarity
    from graphanalytics_spark.operators import (
        components,
        labelprop,
        louvain as louvain_mod,
        pagerank,
        triangles,
    )
    from graphanalytics_spark.session import get_spark

    spark = get_spark(app_name="ga-bench", cpus=cpus, shuffle_partitions=cpus)
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    runs: dict[str, list[float]] = {}

    def bench(name: str, fn, n: int = N_RUNS) -> None:
        walls = []
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            walls.append(time.monotonic() - t0)
        runs[name] = [round(w, 3) for w in walls]

    # warm the parquet scan + derivation JIT once, outside any timing
    lineitem.count()
    bench("edge_derivation", lambda: graph.copurchase_edges(lineitem).count())

    edges = graph.copurchase_edges(lineitem).persist()
    n_edges = edges.count()
    sym = graph.symmetrize(edges)

    # headline: converged PageRank throughput (deterministic iteration
    # count — metrics captured on run 1, walls 3x total)
    m = pagerank.IterationMetrics()
    t0 = time.monotonic()
    pagerank.pagerank(spark, sym, tol=1e-6, max_iter=60, metrics=m).agg(
        F.sum("rank")
    ).collect()
    w_pr_first = time.monotonic() - t0
    bench(
        "pagerank",
        lambda: pagerank.pagerank(spark, sym, tol=1e-6, max_iter=60)
        .agg(F.sum("rank"))
        .collect(),
        n=max(N_RUNS - 1, 1),
    )
    runs["pagerank"] = [round(w_pr_first, 3)] + runs["pagerank"]
    edges_traversed = m.total_edges_traversed

    # steady-state throughput: fixed 20 gather-scatter iterations (immune
    # to how fast this particular graph converges; the static link side is
    # cached, so this measures the per-iteration join+agg pipeline)
    m20 = pagerank.IterationMetrics()
    t0 = time.monotonic()
    pagerank.pagerank(spark, sym, tol=0.0, max_iter=20, metrics=m20).agg(
        F.sum("rank")
    ).collect()
    w20_first = time.monotonic() - t0
    bench(
        "pagerank_20iter",
        lambda: pagerank.pagerank(spark, sym, tol=0.0, max_iter=20)
        .agg(F.sum("rank"))
        .collect(),
        n=max(N_RUNS - 1, 1),
    )
    runs["pagerank_20iter"] = [round(w20_first, 3)] + runs["pagerank_20iter"]

    sparse = edges.filter(F.col("weight") >= 2)

    bench(
        "connected_components",
        lambda: components.connected_components(spark, sparse)
        .select(F.countDistinct("component"))
        .collect(),
    )

    n_tri_box = []
    bench(
        "triangle_count",
        lambda: n_tri_box.append(triangles.triangle_count(spark, edges).first()[0]),
    )
    n_tri = n_tri_box[-1]

    bench(
        "label_propagation",
        lambda: labelprop.label_propagation(spark, sparse, max_iter=10)
        .select(F.countDistinct("label"))
        .collect(),
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench(
        "minhash_lsh",
        lambda: dedup.minhash_lsh_pairs(spark, docs, num_perm=16, bands=4).count(),
    )

    from graphanalytics_spark.functions.pipeline import corpus_clean

    bench(
        "corpus_clean",
        lambda: corpus_clean(spark, docs, lang="en", min_quality=0.88).count(),
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    target = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    bench(
        "cosine_topk",
        lambda: similarity.cosine_topk(spark, emb, target, k=20).collect(),
    )

    bench(
        "knn_join_lsh",
        lambda: similarity.knn_join_lsh(
            spark, emb, emb, k=3, exclude_self=True
        ).count(),
    )

    # --- scale rows (single runs; work dominates the scheduling floor) ---

    # Louvain at real size with real structure: a planted ring of K
    # 16-cliques so per-phase (Q, NV, NE, rounds, wall) exhibits the
    # geometric shrink the phase loop exists for (r3 verdict #4). The
    # co-purchase graph is the WRONG subject for this row: TPC-H assigns
    # parts to orders uniformly at random, so its projection is
    # quasi-random — measured Q after 10 phases is 0.019 with near-zero
    # contraction (20000→10128 vertices, ~70 s/phase; probed 2026-08-17).
    # Louvain legitimately finds nothing there; structure recovery is
    # gated by louvain_q / louvain_islands_q instead. K=500 with capped
    # phases/rounds keeps the row's wall in bench budget (K=2000
    # uncapped measured 781 s — phase 1 alone 19 rounds/486 s — without
    # changing the economics the row exists to show); K is env-tunable
    # for deeper offline probes.
    K, S = int(os.environ.get("SPARK_GRAFT_BENCH_LOUVAIN_K", "500")), 16
    verts = spark.range(K * S).select(
        F.col("id").alias("vid"), (F.col("id") / S).cast("long").alias("c")
    )
    a, b = verts.alias("a"), verts.alias("b")
    cliques = a.join(
        b, (F.col("a.c") == F.col("b.c")) & (F.col("a.vid") < F.col("b.vid"))
    ).select(
        F.col("a.vid").alias("src"),
        F.col("b.vid").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    bridges = spark.range(K).select(
        (F.col("id") * S + S - 1).alias("src"),
        (((F.col("id") + 1) % K) * S).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    ring = graph.canonicalize(cliques.unionByName(bridges)).persist()
    n_ring = ring.count()
    lv_metrics: list[dict] = []
    t0 = time.monotonic()
    louvain_mod.louvain(
        spark, ring, max_phases=5, max_rounds_per_phase=8, metrics=lv_metrics
    ).count()
    louvain_wall = time.monotonic() - t0
    ring.unpersist()
    louvain_row = {
        "graph": f"planted ring of {K} cliques of {S} ({n_ring} edges)",
        "wall_sec": round(louvain_wall, 3),
        "best_q": round(max(p["Q"] for p in lv_metrics), 6) if lv_metrics else None,
        "phases": [
            {
                "phase": p["phase"],
                "Q": round(p["Q"], 6),
                "n_vertices": p["n_vertices"],
                "n_edges": p["n_edges"],
                "rounds": p["rounds"],
                "wall_s": round(p["wall_s"], 3),
            }
            for p in lv_metrics
        ],
    }

    # fixed-20 PageRank on the ×24 replicated graph (~24x edges): measures
    # per-iteration throughput where per-task work dominates (r3 verdict
    # #6). Same deterministic replication as tools/bench_scaling.py: K
    # offset copies chained by one cross-edge per adjacent copy.
    replicate = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "24"))
    n_vid = edges.select(F.greatest(F.max("src"), F.max("dst"))).first()[0] + 1
    copies = [
        edges.select(
            (F.col("src") + k * n_vid).alias("src"),
            (F.col("dst") + k * n_vid).alias("dst"),
            "weight",
        )
        for k in range(replicate)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.union(c)
    if replicate > 1:
        cross = spark.createDataFrame(
            [(k * n_vid, (k + 1) * n_vid, 1.0) for k in range(replicate - 1)],
            "src long, dst long, weight double",
        )
        big = big.union(cross)
    big_sym = graph.symmetrize(big).persist()
    n_big = big_sym.count()  # materialize outside the measurement
    mx = pagerank.IterationMetrics()
    t0 = time.monotonic()
    pagerank.pagerank(spark, big_sym, tol=0.0, max_iter=20, metrics=mx).agg(
        F.sum("rank")
    ).collect()
    x24_wall = time.monotonic() - t0
    big_sym.unpersist()
    # two throughput bases: end-to-end wall (includes planning + the
    # final agg) and the summed per-iteration walls — the basis
    # BENCH/BASELINE.md's scaling table uses (one-time costs amortize
    # over hundreds of iterations in a real run)
    iter_wall = sum(r["wall_s"] for r in mx.rows)
    x24_row = {
        "wall_sec": round(x24_wall, 3),
        "iter_wall_sec": round(iter_wall, 3),
        "n_edges_sym": n_big,
        "edges_traversed": mx.total_edges_traversed,
        "edges_traversed_per_sec": round(mx.total_edges_traversed / x24_wall, 1)
        if x24_wall > 0
        else 0.0,
        "edges_traversed_per_iter_sec": round(
            mx.total_edges_traversed / iter_wall, 1
        )
        if iter_wall > 0
        else 0.0,
        "replicate": replicate,
    }

    # planted mega-hub similar_vertices row (r4 verdict #4): a degree-12000
    # star glued to a 12000-ring. The capped run (hub dropped from the
    # candidate join sides — the at-scale default) is timed EVERY round as
    # the regression guard; the uncapped quadratic side costs ~195 s
    # (measured r5: 9.3 s capped vs 195.3 s uncapped = 21x at d=12000;
    # 26x at d=20000 — BENCH/BASELINE.md §hub) so it only reruns under
    # SPARK_GRAFT_BENCH_HUB_UNCAPPED=1.
    hub_d, ring_n = 12000, 12000
    star = spark.range(hub_d).select(
        F.lit(ring_n).cast("long").alias("src"),
        F.col("id").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    ringe = spark.range(ring_n).select(
        F.col("id").alias("src"),
        ((F.col("id") + 1) % ring_n).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    hub_graph = graph.canonicalize(star.unionByName(ringe)).persist()
    hub_graph.count()
    t0 = time.monotonic()
    graph.similar_vertices(hub_graph, k=5, max_degree=64).count()
    hub_capped_s = time.monotonic() - t0
    if os.environ.get("SPARK_GRAFT_BENCH_HUB_UNCAPPED") == "1":
        t0 = time.monotonic()
        graph.similar_vertices(hub_graph, k=5, max_degree=None).count()
        hub_uncapped_s: float | None = time.monotonic() - t0
    else:
        hub_uncapped_s = None  # static measurement: BENCH/BASELINE.md §hub
    hub_graph.unpersist()

    med = {k: round(statistics.median(v), 3) for k, v in runs.items()}
    mins = {k: round(min(v), 3) for k, v in runs.items()}
    total = sum(med.values())
    pr_med = med["pagerank"]
    pr20_med = med["pagerank_20iter"]
    louvain_compact = {
        "wall_sec": louvain_row["wall_sec"],
        "best_q": louvain_row["best_q"],
        "n_phases": len(louvain_row["phases"]),
    }
    x24_compact = {
        k: x24_row[k]
        for k in ("iter_wall_sec", "edges_traversed_per_iter_sec", "n_edges_sym")
    }
    result = {
        "metric": "headline_queries_wall_median_of_3",
        "value": round(total, 3),
        "unit": "sec",
        "queries": med,
        "pagerank_edges_traversed_per_sec": round(edges_traversed / pr_med, 1)
        if pr_med > 0
        else 0.0,
        "pagerank20_edges_traversed_per_sec": round(
            m20.total_edges_traversed / pr20_med, 1
        )
        if pr20_med > 0
        else 0.0,
        "louvain": louvain_compact,
        "pagerank_20iter_x24": x24_compact,
        "hub_cap": {
            "capped_s": round(hub_capped_s, 3),
            "uncapped_s": round(hub_uncapped_s, 3)
            if hub_uncapped_s is not None
            else None,
        },
        "sf": sf_dir,
        "cpus": cpus,
        "n_edges": n_edges,
        "pagerank_iterations": m.iterations,
        "n_triangles": int(n_tri),
        "detail": "BENCH/bench_detail.json",
    }
    detail = {
        "queries_min": mins,
        "queries_runs": runs,
        "louvain": louvain_row,
        "pagerank_20iter_x24": x24_row,
        "pagerank_edges_traversed": edges_traversed,
        "hub_cap": {
            "hub_degree": hub_d,
            "ring_n": ring_n,
            "capped_max_degree": 64,
            "capped_s": round(hub_capped_s, 3),
            "uncapped_s": round(hub_uncapped_s, 3)
            if hub_uncapped_s is not None
            else None,
        },
        "sf": sf_dir,
        "cpus": cpus,
    }
    detail_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(detail_dir, exist_ok=True)
    with open(os.path.join(detail_dir, "bench_detail.json"), "w") as fh:
        json.dump(detail, fh, indent=1)
    line = json.dumps(result)
    # hard guard on the driver's tail-capture budget
    assert len(line) < 1900, f"bench line too long ({len(line)} chars)"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
