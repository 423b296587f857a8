"""Extra instrumentation benches for the optimization round (guide §1).

NOT the frozen driver bench — bench.py stays the measurement of record.
This file isolates the expensive queries with the noop sink and phase
timers so each optimization's before/after evidence is attributable:

  python bench_extra.py pagerank_phases     # setup vs per-iteration split
  python bench_extra.py louvain_rounds      # per-round walls on the bench ring
  python bench_extra.py corpus_stages       # annotate/dedup/neardup split
  python bench_extra.py noop <query...>     # noop-sink isolation per query
  python bench_extra.py plans [out_dir]     # explain("formatted") captures

Reads the same env contract as bench.py ($SPARK_GRAFT_SF_DIR,
$SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _setup():
    from graphanalytics_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ga-bench-extra", cpus=cpus, shuffle_partitions=cpus)
    return spark, sf_dir


def pagerank_phases():
    """Split pagerank wall into: links prep, verts/dangling setup, per-iter."""
    from pyspark.sql import functions as F

    from graphanalytics_spark import graph
    from graphanalytics_spark.operators import pagerank

    spark, sf_dir = _setup()
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = graph.copurchase_edges(lineitem).persist()
    edges.count()
    sym = graph.symmetrize(edges)

    out = {}
    for tag, tol, it in (("converged", 1e-6, 60), ("fixed20", 0.0, 20)):
        spark.sparkContext.setJobDescription(f"pagerank-{tag}")
        m = pagerank.IterationMetrics()
        t0 = time.monotonic()
        pagerank.pagerank(spark, sym, tol=tol, max_iter=it, metrics=m).agg(
            F.sum("rank")
        ).collect()
        wall = time.monotonic() - t0
        iters = [round(r["wall_s"], 3) for r in m.rows]
        out[tag] = {
            "wall": round(wall, 3),
            "n_iter": len(iters),
            "iter_walls": iters,
            "iter_sum": round(sum(iters), 3),
            "setup_plus_final": round(wall - sum(iters), 3),
        }
    print(json.dumps(out, indent=1))


def louvain_rounds():
    from pyspark.sql import functions as F

    from graphanalytics_spark import graph
    from graphanalytics_spark.operators import louvain as louvain_mod

    spark, _ = _setup()
    K, S = 500, 16
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
    ring.count()
    lv_metrics: list[dict] = []
    t0 = time.monotonic()
    louvain_mod.louvain(
        spark, ring, max_phases=5, max_rounds_per_phase=8, metrics=lv_metrics
    ).count()
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "wall": round(wall, 3),
                "best_q": round(max(p["Q"] for p in lv_metrics), 6),
                "phases": [
                    {
                        "phase": p["phase"],
                        "Q": round(p["Q"], 6),
                        "nv": p["n_vertices"],
                        "rounds": p["rounds"],
                        "wall_s": round(p["wall_s"], 3),
                    }
                    for p in lv_metrics
                ],
            },
            indent=1,
        )
    )


def corpus_stages():
    from pyspark.sql import functions as F

    from graphanalytics_spark.functions import dedup
    from graphanalytics_spark.functions.pipeline import _annotate, corpus_clean

    spark, sf_dir = _setup()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()
    out = {}

    t0 = time.monotonic()
    _noop(_annotate(docs))
    out["annotate"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _noop(dedup.minhash_signatures(docs))
    out["minhash_signatures"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _noop(dedup.shingle_table(docs))
    out["shingle_table"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _noop(dedup.minhash_lsh_pairs(spark, docs, num_perm=16, bands=4))
    out["minhash_lsh_pairs"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _noop(dedup.near_dup_verified(spark, docs, num_perm=16, bands=4, threshold=0.4))
    out["near_dup_verified"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _noop(corpus_clean(spark, docs, lang="en", min_quality=0.88))
    out["corpus_clean"] = round(time.monotonic() - t0, 3)
    print(json.dumps(out, indent=1))


def _headline_dfs(spark, sf_dir):
    """The bench.py headline queries as (name -> lazy DataFrame thunk)."""
    from pyspark.sql import functions as F

    from graphanalytics_spark import graph
    from graphanalytics_spark.functions import dedup, similarity
    from graphanalytics_spark.functions.pipeline import corpus_clean
    from graphanalytics_spark.operators import (
        components,
        labelprop,
        pagerank,
        triangles,
    )

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    edges = graph.copurchase_edges(lineitem)
    sym = graph.symmetrize(edges)
    sparse = edges.filter(F.col("weight") >= 2)

    def target():
        return [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
        ]

    return {
        "edge_derivation": lambda: graph.copurchase_edges(lineitem),
        "pagerank": lambda: pagerank.pagerank(spark, sym, tol=1e-6, max_iter=60),
        "pagerank_20iter": lambda: pagerank.pagerank(
            spark, sym, tol=0.0, max_iter=20
        ),
        "connected_components": lambda: components.connected_components(
            spark, sparse
        ),
        "triangle_count": lambda: triangles.triangle_count(spark, edges),
        "label_propagation": lambda: labelprop.label_propagation(
            spark, sparse, max_iter=10
        ),
        "minhash_lsh": lambda: dedup.minhash_lsh_pairs(
            spark, docs, num_perm=16, bands=4
        ),
        "corpus_clean": lambda: corpus_clean(spark, docs, lang="en", min_quality=0.88),
        "cosine_topk": lambda: similarity.cosine_topk(spark, emb, target(), k=20),
        "knn_join_lsh": lambda: similarity.knn_join_lsh(
            spark, emb, emb, k=3, exclude_self=True
        ),
    }


def noop_bench(names):
    spark, sf_dir = _setup()
    dfs = _headline_dfs(spark, sf_dir)
    out = {}
    for name in names or list(dfs):
        spark.sparkContext.setJobDescription(f"noop:{name}")
        t0 = time.monotonic()
        _noop(dfs[name]())
        out[name] = round(time.monotonic() - t0, 3)
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out, indent=1))


def plans(out_dir="plans/r06", suffix="before"):
    spark, sf_dir = _setup()
    dfs = _headline_dfs(spark, sf_dir)
    os.makedirs(out_dir, exist_ok=True)
    for name, thunk in dfs.items():
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        with open(p, "w") as fh:
            fh.write(thunk()._jdf.queryExecution().explainString(mode))
        print(p)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "noop"
    if cmd == "pagerank_phases":
        pagerank_phases()
    elif cmd == "louvain_rounds":
        louvain_rounds()
    elif cmd == "corpus_stages":
        corpus_stages()
    elif cmd == "noop":
        noop_bench(sys.argv[2:])
    elif cmd == "plans":
        plans(*sys.argv[2:])
    else:
        raise SystemExit(f"unknown command {cmd}")
