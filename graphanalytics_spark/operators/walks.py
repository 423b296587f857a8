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
  at web scale (HyperBall-style HLL sketch union is the alternative when
  pivot counts grow, operators/hyperball.py). Exact per-pivot distances
  come from ONE tagged multi-seed frontier loop
  (``bfs.bfs_levels_tagged`` — O(max-eccentricity) rounds total, not
  |seeds| separate loops); per-term reciprocals
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


def indexed_adjacency(
    edges_canon: DataFrame, hub_safe: bool = False
) -> DataFrame:
    """Symmetrized adjacency with a dense per-vertex neighbor index:
    (src, dst, idx, deg), idx ∈ [0, deg) ordered by dst — the lookup
    table a walk step joins against.

    Default path: one window partitioned by src (V-way parallel, each
    window partition one vertex's neighbor list). Hub bound: a vertex's
    whole list sorts in ONE task, so the default is right while
    max-degree rows fit a task (~10⁷ neighbors ≈ 160 MB); past that pass
    ``hub_safe=True``.

    ``hub_safe`` path (the dense_ids two-pass prefix specialized to
    per-src ranges, r4 verdict #9): range-partition + sort by (src, dst)
    so every storage partition holds a contiguous slice of the order,
    take per-(partition, src) counts (≤ V + P rows), prefix-sum them into
    base offsets with a window over the ≤P partitions spanning each src,
    and add the within-(partition, src) local rank. Every window
    partition is bounded by the STORAGE partition size
    (maxPartitionBytes), never by hub degree — a 10⁸-degree hub's list
    spans many range partitions, each indexed independently. Costs two
    extra shuffles of E, which is why it is opt-in rather than the
    default. Identical output to the default path (same (src, dst)
    order), asserted by test."""
    sym = symmetrize(edges_canon).select("src", "dst")
    if not hub_safe:
        w = Window.partitionBy("src").orderBy("dst")
        return sym.select(
            "src",
            "dst",
            (F.row_number().over(w) - 1).alias("idx"),
            F.count("*").over(Window.partitionBy("src")).alias("deg"),
        )
    spark = sym.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    # eager localCheckpoint: the pid column must stay consistent between
    # the counts pass and the final join (dense_ids discipline)
    srt = (
        sym.repartitionByRange(n_part, "src", "dst")
        .sortWithinPartitions("src", "dst")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    cnt = srt.groupBy("pid", "src").agg(F.count("*").alias("n"))
    # range partitions are numbered in key order, so pid ascending is
    # (src, dst) ascending: base = rows of this src in earlier partitions
    w_base = Window.partitionBy("src").orderBy("pid")
    base = cnt.select(
        "pid",
        "src",
        (F.sum("n").over(w_base) - F.col("n")).alias("base"),
    )
    deg = cnt.groupBy("src").agg(F.sum("n").alias("deg"))
    w_local = Window.partitionBy("pid", "src").orderBy("dst")
    return (
        srt.join(base, ["pid", "src"])
        .join(deg, "src")
        .select(
            "src",
            "dst",
            (F.row_number().over(w_local) - 1 + F.col("base")).alias("idx"),
            "deg",
        )
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


def node2vec_walks(
    spark: SparkSession,
    edges_canon: DataFrame,
    walk_length: int = 4,
    p: int = 1,
    q: int = 2,
    seed: int = 1,
) -> DataFrame:
    """Second-order (node2vec-biased) deterministic walks: one walk per
    vertex, DataFrame(walk_id, step, vid). Grover–Leskovec bias relative
    to the previous vertex: returning to it weighs 1/p, moving to a
    common neighbor of (prev, cur) weighs 1, moving outward weighs 1/q.
    ``p``/``q`` must be positive INTEGERS so the weights scale to exact
    ints (back=q, common=p·q, forward=p) and the cumulative-weight pick —
    the same seeded-LCG mix as ``random_walks``, reduced mod the walk's
    total weight — replays bit-for-bit in the DuckDB oracle. Step 1 has
    no previous vertex and is the uniform first-order pick.

    Scale shape: each step expands the current frontier against the
    indexed adjacency (one row per candidate neighbor — Σ deg(cur) rows,
    avg-degree × #walks), classifies candidates with ONE equi-join probe
    of the edge set on (prev, candidate), and resolves the pick with a
    per-walk window (partition = one walk's candidate list, bounded by
    deg(cur) — a walk standing on a mega-hub sorts that hub's list in one
    task, the inherent cost of exact second-order bias; cap hubs upstream
    with isolate_vertices if that bound matters). The state that moves
    per step is 3 longs per walk."""
    if p < 1 or q < 1:
        raise ValueError("p and q must be positive integers")
    w_back, w_common, w_forward = q, p * q, p
    adj = indexed_adjacency(edges_canon).localCheckpoint(eager=True)
    degs = adj.groupBy(F.col("src").alias("vid")).agg(F.max("deg").alias("deg"))
    starts = adj.select(F.col("src").alias("walk_id")).distinct()
    out = starts.select("walk_id", F.lit(0).alias("step"), F.col("walk_id").alias("vid"))

    # step 1: uniform first-order pick (no prev), identical to random_walks
    pick1 = F.pmod(
        (
            (F.col("vid") % F.lit(_WALK_M)) * F.lit(_WALK_A)
            + F.lit(1 * _WALK_B)
            + (F.col("walk_id") % F.lit(_WALK_M)) * F.lit(_WALK_C)
            + F.lit(seed)
        )
        % F.lit(_WALK_M),
        F.col("deg"),
    )
    s1 = (
        out.join(degs, "vid")
        .select("walk_id", F.col("vid").alias("cur"), pick1.alias("pick"))
        .join(adj, (F.col("cur") == adj.src) & (F.col("pick") == adj.idx))
        .select(
            "walk_id",
            F.col("cur").alias("prev"),
            F.col("dst").alias("cur2"),
        )
        .withColumnRenamed("cur2", "cur")
    )
    out = out.unionByName(
        s1.select("walk_id", F.lit(1).alias("step"), F.col("cur").alias("vid"))
    )
    state = s1

    epairs = adj.select(
        F.col("src").alias("p_src"), F.col("dst").alias("p_dst")
    ).withColumn("is_common", F.lit(1))
    w_cum = Window.partitionBy("walk_id").orderBy("idx")
    w_tot = Window.partitionBy("walk_id")
    for t in range(2, walk_length + 1):
        cands = state.join(adj, state.cur == adj.src).select(
            "walk_id", "prev", "cur", "dst", "idx"
        )
        cands = cands.join(
            epairs,
            (cands.prev == epairs.p_src) & (cands.dst == epairs.p_dst),
            "left",
        ).select(
            "walk_id",
            "prev",
            "cur",
            "dst",
            "idx",
            F.when(F.col("dst") == F.col("prev"), F.lit(w_back))
            .when(F.col("is_common").isNotNull(), F.lit(w_common))
            .otherwise(F.lit(w_forward))
            .alias("w"),
        )
        r = (
            (F.col("cur") % F.lit(_WALK_M)) * F.lit(_WALK_A)
            + F.lit(t * _WALK_B)
            + (F.col("walk_id") % F.lit(_WALK_M)) * F.lit(_WALK_C)
            + F.lit(seed)
        ) % F.lit(_WALK_M)
        scored = cands.select(
            "walk_id",
            "cur",
            "dst",
            "w",
            F.sum("w").over(w_cum).alias("cum"),
            F.pmod(r, F.sum("w").over(w_tot)).alias("r"),
        )
        nxt = scored.filter(
            (F.col("r") >= F.col("cum") - F.col("w")) & (F.col("r") < F.col("cum"))
        ).select(
            "walk_id", F.col("cur").alias("prev"), F.col("dst").alias("cur")
        )
        out = out.unionByName(
            nxt.select("walk_id", F.lit(t).alias("step"), F.col("cur").alias("vid"))
        )
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
    Same tagged multi-seed BFS as ``harmonic_centrality``; one row per
    distance value, so the result is tiny regardless of graph size."""
    if not seeds:
        raise ValueError("distance_histogram needs a non-empty pivot set")
    from graphanalytics_spark.operators.bfs import bfs_levels_tagged

    seed_df = spark.createDataFrame([(int(p),) for p in seeds], "vid long")
    lv = bfs_levels_tagged(spark, edges_canon, seed_df, max_depth=max_depth)
    return (
        lv.filter(F.col("level") > 0)
        .groupBy(F.col("level").cast("long").alias("dist"))
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
    Vertices unreachable from every seed are absent. One tagged
    multi-seed BFS loop covers the whole pivot set."""
    if not seeds:
        raise ValueError("harmonic_centrality needs a non-empty pivot set")
    from graphanalytics_spark.operators.bfs import bfs_levels_tagged

    seed_df = spark.createDataFrame([(int(p),) for p in seeds], "vid long")
    alld = bfs_levels_tagged(
        spark, edges_canon, seed_df, max_depth=max_depth
    ).filter(F.col("level") > 0).select("vid", "level")
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
