"""Deterministic random walks + sampled-pivot harmonic centrality.

Two sampling-flavoured graph operators a link-graph training pipeline
needs at 100 TB:

- ``random_walks``: one fixed-length walk per start vertex, the corpus
  generator for DeepWalk/node2vec-style graph embeddings. The "random"
  next-neighbor choice is a hash of (walk id, step) — a seeded LCG-style
  mix over plain int64 arithmetic, so the walk set is reproducible across
  engines (the cross-engine oracle discipline; same rationale as the MIS
  hash priority, operators/mis.py) and across retries (a speculative
  re-execution of a task regenerates identical rows — no RNG state).
  Scale shape: each step is two hash-partitioned equi-joins against
  static tables (degree lookup, then (vertex, index) → neighbor); the
  walk-state table is the only thing that moves, exactly like the
  PageRank loop. No per-row Python.

- ``harmonic_centrality``: Σ_seeds 1/dist(seed, v) over an explicit
  pivot set — the standard sampled approximation of harmonic closeness
  at web scale (one multi-round BFS per pivot; HyperBall-style HLL
  sketch union is the alternative when pivot counts grow). Exact
  per-pivot distances come from ``bfs.bfs_levels``; per-term reciprocals
  are rounded and summed as exact DECIMALs so the result is
  shuffle-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from graphanalytics_spark.graph import symmetrize

# LCG-ish mixing constants (Knuth multiplicative hashing over a Mersenne
# prime modulus): idx = ((vid mod M)·A + step·B + (walk mod M)·C + seed)
# mod M mod deg. Plain int64 arithmetic — no engine-specific hash builtin,
# so the DuckDB oracle reproduces walks bit-for-bit. Operands are reduced
# mod M BEFORE multiplying: (M−1)·A ≈ 5.7e18 stays inside int64, whereas
# raw 10^12-scale vids would overflow (silent wrap in the JVM, a hard
# error in DuckDB).
_WALK_A = 2654435761
_WALK_B = 40503
_WALK_C = 69069
_WALK_M = 2147483647


def indexed_adjacency(edges_canon: DataFrame) -> DataFrame:
    """Symmetrized adjacency with a dense per-vertex neighbor index:
    (src, dst, idx, deg), idx ∈ [0, deg) ordered by dst — the lookup
    table a walk step joins against. The window partitions by src (V-way
    parallel, each partition one vertex's neighbor list)."""
    sym = symmetrize(edges_canon).select("src", "dst")
    w = Window.partitionBy("src").orderBy("dst")
    return sym.select(
        "src",
        "dst",
        (F.row_number().over(w) - 1).alias("idx"),
        F.count("*").over(Window.partitionBy("src")).alias("deg"),
    )


def random_walks(
    spark: SparkSession,
    edges_canon: DataFrame,
    walk_length: int = 4,
    seed: int = 1,
) -> DataFrame:
    """One deterministic walk of ``walk_length`` steps per vertex over
    the symmetrized graph: DataFrame(walk_id, step, vid) with step 0 at
    the start vertex (walk_id = start vid). Every vertex of an undirected
    graph has deg ≥ 1, so walks never strand."""
    # eager localCheckpoint, not persist: the indexed adjacency feeds
    # walk_length joins + the degree lookup in one lazy result plan, and
    # this function never sees the caller's action, so a cache entry
    # could not be unpersisted without recomputing (triangles.py r3
    # discipline — checkpoint blocks are ContextCleaner-reclaimed)
    adj = indexed_adjacency(edges_canon).localCheckpoint(eager=True)
    # per-vertex degree lookup (V rows) — joined first so the neighbor
    # join below is a two-column equi-join on (vertex, idx): a hub of
    # degree d costs ONE probe per walk, not d filtered candidates
    degs = adj.groupBy(F.col("src").alias("vid")).agg(F.max("deg").alias("deg"))
    state = adj.select(F.col("src").alias("walk_id")).distinct().select(
        "walk_id", F.lit(0).alias("step"), F.col("walk_id").alias("vid")
    )
    out = state
    for t in range(1, walk_length + 1):
        pick = F.pmod(
            (
                (F.col("vid") % F.lit(_WALK_M)) * F.lit(_WALK_A)
                + F.lit(t * _WALK_B)
                + (F.col("walk_id") % F.lit(_WALK_M)) * F.lit(_WALK_C)
                + F.lit(seed)
            )
            % F.lit(_WALK_M),
            F.col("deg"),
        )
        picked = state.join(degs, "vid").select(
            "walk_id", F.col("vid").alias("cur"), pick.alias("pick")
        )
        nxt = picked.join(
            adj,
            (picked.cur == adj.src) & (picked.pick == adj.idx),
        ).select(
            "walk_id",
            F.lit(t).alias("step"),
            F.col("dst").alias("vid"),
        )
        out = out.unionByName(nxt)
        state = nxt
    return out


def distance_histogram(
    spark: SparkSession,
    edges_canon: DataFrame,
    seeds: list[int],
    max_depth: int = 64,
) -> DataFrame:
    """Exact (seed → vertex) distance distribution from a pivot set:
    DataFrame(dist, n_pairs) for dist ≥ 1 — the pivot-sampled estimator of
    the graph's distance distribution, whose cumulative form gives the
    effective diameter (smallest d with ≥90% of reachable pairs).
    Same per-pivot BFS machinery as ``harmonic_centrality``; one row per
    distance value, so the result is tiny regardless of graph size."""
    if not seeds:
        raise ValueError("distance_histogram needs a non-empty pivot set")
    per_seed = []
    from graphanalytics_spark.operators.bfs import bfs_levels

    for p in seeds:
        seed_df = spark.createDataFrame([(int(p),)], "vid long")
        lv = bfs_levels(spark, edges_canon, seeds=seed_df, max_depth=max_depth)
        per_seed.append(lv.filter(F.col("level") > 0).select("level"))
    alld = per_seed[0]
    for d in per_seed[1:]:
        alld = alld.unionByName(d)
    return (
        alld.groupBy(F.col("level").cast("long").alias("dist"))
        .agg(F.count("*").alias("n_pairs"))
    )


def harmonic_centrality(
    spark: SparkSession,
    edges_canon: DataFrame,
    seeds: list[int],
    max_depth: int = 64,
) -> DataFrame:
    """Sampled harmonic centrality: (vid, harmonic) with
    harmonic = round(Σ_{p ∈ seeds, d(p,v)>0} round(1/d(p,v), 12), 9) —
    per-term rounding + exact DECIMAL summation keeps the value
    independent of shuffle order (cross-engine oracle discipline).
    Vertices unreachable from every seed are absent. One BFS per pivot —
    the estimator's cost is |seeds| × O(diameter) rounds by design."""
    if not seeds:
        raise ValueError("harmonic_centrality needs a non-empty pivot set")
    from graphanalytics_spark.operators.bfs import bfs_levels

    per_seed = []
    for p in seeds:
        seed_df = spark.createDataFrame([(int(p),)], "vid long")
        lv = bfs_levels(spark, edges_canon, seeds=seed_df, max_depth=max_depth)
        per_seed.append(lv.filter(F.col("level") > 0).select("vid", "level"))
    alld = per_seed[0]
    for d in per_seed[1:]:
        alld = alld.unionByName(d)
    return (
        alld.select(
            "vid",
            F.round(F.lit(1.0) / F.col("level"), 12)
            .cast("decimal(24,12)")
            .alias("term"),
        )
        .groupBy("vid")
        .agg(F.round(F.sum("term").cast("double"), 9).alias("harmonic"))
    )
