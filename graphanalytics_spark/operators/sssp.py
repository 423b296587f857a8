"""Weighted single-source shortest paths — frontier Bellman–Ford.

Hop-based traversal (operators/bfs.py, nhop.py) answers "how many
links away"; this answers "how far by edge length" — the weighted
companion every link-graph toolbox needs (cost-weighted reachability,
weighted eccentricity, routing-style queries). The reference's nHop
kernel carries the same frontier-expansion shape without weights
(/root/reference/L2/nHop); SURVEY §2.3.

Algorithm: synchronous frontier relaxation (the distributed Bellman–Ford
specialization that behaves like delta-stepping when edge weights are
similar): round i relaxes ONLY edges leaving vertices whose tentative
distance improved in round i−1 —

    cand_i  = frontier_{i-1} ⋈ adjacency → (dst, dist + w)
    best_i  = min per dst (map-side combine)
    improved = best_i < state.dist (or state missing)
    state   = min-merge; frontier_i = improved

Rounds ≤ the hop count of the longest shortest path (≤ V−1 always, in
practice O(diameter)); each round is one equi-join + one hash
aggregation + one merge join, only the frontier and the V-sized state
table move. The improved-count is the round's single driver action and
the loop's stop test; lineage is truncated per round. Negative weights
are rejected up front (Bellman–Ford would need V−1 full-edge rounds and
a negative-cycle check — out of scope for link-graph lengths, which are
counts or reciprocal affinities).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession, functions as F

from graphanalytics_spark.graph import symmetrize
from graphanalytics_spark.plans.truncate import LineageTruncator


def sssp(
    spark: SparkSession,
    edges: DataFrame,
    source: int,
    directed: bool = False,
    max_rounds: int = 200,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Shortest weighted distance from ``source``: DataFrame(vid, dist)
    over reachable vertices (dist(source) = 0). Undirected by default
    (edges symmetrized); weights must be non-negative."""
    adj = (
        edges.select("src", "dst", "weight")
        if directed
        else symmetrize(edges).select("src", "dst", "weight")
    ).persist()
    if adj.filter(F.col("weight") < 0).limit(1).count() > 0:
        adj.unpersist()
        raise ValueError("sssp requires non-negative edge weights")
    truncator = LineageTruncator(spark, hard_every=checkpoint_every or 4)

    state = spark.createDataFrame(
        [(int(source), 0.0)], "vid long, dist double"
    ).localCheckpoint(eager=True)
    frontier = state
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        cand = (
            frontier.join(adj, frontier.vid == adj.src)
            .select(
                F.col("dst").alias("vid"),
                (F.col("dist") + F.col("weight")).alias("nd"),
            )
            .groupBy("vid")
            .agg(F.min("nd").alias("nd"))
        )
        merged = state.join(cand, "vid", "full_outer").select(
            "vid",
            F.least(
                F.coalesce(F.col("dist"), F.lit(float("inf"))),
                F.coalesce(F.col("nd"), F.lit(float("inf"))),
            ).alias("dist"),
            (
                F.col("dist").isNull() | (F.col("nd") < F.col("dist"))
            ).alias("_improved"),
        )
        merged = truncator.truncate(merged, rounds, stream="sssp")
        improved = merged.filter(
            F.coalesce(F.col("_improved"), F.lit(False))
        ).select("vid", "dist")
        n_improved = improved.count()
        state = merged.select("vid", "dist")
        if n_improved == 0:
            break
        frontier = improved
    else:
        # the loop exhausted max_rounds with relaxations still improving:
        # distances are an overestimate (same loud-truncation contract as
        # kcore/ktruss — r5 ADVICE #1)
        warnings.warn(
            f"sssp stopped at max_rounds={max_rounds} before the relaxation "
            "fixed point: returned distances are UPPER BOUNDS, not exact "
            "shortest distances. Raise max_rounds.",
            RuntimeWarning,
            stacklevel=2,
        )
    adj.unpersist()
    return state
