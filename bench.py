"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline metric: edges-traversed/sec during converged PageRank (Σ over
iterations of symmetrized edge count / PR wall time) — BASELINE.json's
authoritative throughput number — plus per-query wall times.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from graphanalytics_spark import graph
    from graphanalytics_spark.functions import dedup, similarity
    from graphanalytics_spark.operators import components, labelprop, pagerank, triangles
    from graphanalytics_spark.session import get_spark

    spark = get_spark(app_name="ga-bench", cpus=cpus, shuffle_partitions=cpus)
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    timings: dict[str, float] = {}
    t0 = time.monotonic()
    edges = graph.copurchase_edges(lineitem).persist()
    n_edges = edges.count()
    timings["edge_derivation"] = time.monotonic() - t0

    sym = graph.symmetrize(edges)

    # headline: converged PageRank throughput
    m = pagerank.IterationMetrics()
    t0 = time.monotonic()
    ranks = pagerank.pagerank(spark, sym, tol=1e-6, max_iter=60, metrics=m)
    ranks.agg(F.sum("rank")).collect()
    pr_wall = time.monotonic() - t0
    timings["pagerank"] = pr_wall
    edges_traversed = m.total_edges_traversed
    eps = edges_traversed / pr_wall if pr_wall > 0 else 0.0

    # steady-state throughput: fixed 20 gather-scatter iterations (immune
    # to how fast this particular graph converges; the static link side is
    # cached, so this measures the per-iteration join+agg pipeline)
    m20 = pagerank.IterationMetrics()
    t0 = time.monotonic()
    r20 = pagerank.pagerank(spark, sym, tol=0.0, max_iter=20, metrics=m20)
    r20.agg(F.sum("rank")).collect()
    pr20_wall = time.monotonic() - t0
    timings["pagerank_20iter"] = pr20_wall
    eps20 = m20.total_edges_traversed / pr20_wall if pr20_wall > 0 else 0.0
    # variance probe: this sandbox shows 2-5x wall swings between identical
    # runs (BENCH/BASELINE.md); a second identical 20-iter run is recorded
    # SEPARATELY (headline methodology unchanged — `queries` keeps run 1)
    # so round-over-round comparisons can be read against observed noise
    t0 = time.monotonic()
    pagerank.pagerank(spark, sym, tol=0.0, max_iter=20).agg(F.sum("rank")).collect()
    pr20_wall_run2 = time.monotonic() - t0

    sparse = edges.filter(F.col("weight") >= 2)

    t0 = time.monotonic()
    components.connected_components(spark, sparse).select(
        F.countDistinct("component")
    ).collect()
    timings["connected_components"] = time.monotonic() - t0

    t0 = time.monotonic()
    n_tri = triangles.triangle_count(spark, edges).first()[0]
    timings["triangle_count"] = time.monotonic() - t0

    t0 = time.monotonic()
    labelprop.label_propagation(spark, sparse, max_iter=10).select(
        F.countDistinct("label")
    ).collect()
    timings["label_propagation"] = time.monotonic() - t0

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.monotonic()
    dedup.minhash_lsh_pairs(spark, docs, num_perm=16, bands=4).count()
    timings["minhash_lsh"] = time.monotonic() - t0

    from graphanalytics_spark.functions.pipeline import corpus_clean

    t0 = time.monotonic()
    corpus_clean(spark, docs, lang="en", min_quality=0.88).count()
    timings["corpus_clean"] = time.monotonic() - t0

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    target = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    t0 = time.monotonic()
    similarity.cosine_topk(spark, emb, target, k=20).collect()
    timings["cosine_topk"] = time.monotonic() - t0

    t0 = time.monotonic()
    similarity.knn_join_lsh(spark, emb, emb, k=3, exclude_self=True).count()
    timings["knn_join_lsh"] = time.monotonic() - t0

    total = sum(timings.values())
    result = {
        "metric": "headline_queries_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "pagerank_edges_traversed_per_sec": round(eps, 1),
        "pagerank20_edges_traversed_per_sec": round(eps20, 1),
        "pagerank_20iter_run2_sec": round(pr20_wall_run2, 3),
        "pagerank20_run2_edges_traversed_per_sec": round(
            m20.total_edges_traversed / pr20_wall_run2, 1
        )
        if pr20_wall_run2 > 0
        else 0.0,
        "sf": sf_dir,
        "cpus": cpus,
        "n_edges": n_edges,
        "pagerank_iterations": m.iterations,
        "pagerank_edges_traversed": edges_traversed,
        "n_triangles": int(n_tri),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
