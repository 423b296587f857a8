"""Maximal independent set — distributed Luby's algorithm.

From-scratch Spark implementation of the reference's MIS product
(/root/reference/mis/src/mis.cpp:334-370): a vertex joins the set iff it
has no higher-priority *active* neighbor; selected vertices and their
neighbors deactivate; rounds repeat until no active vertices remain
(expected O(log n) rounds).

Priority: the reference uses a degree-biased random priority
``aveDeg/(aveDeg+deg+r)*8191`` (/root/reference/mis/src/mis.cpp:220-231).
We use the same degree bias with a deterministic hash in place of the RNG —
``xxhash64(vid, seed)`` — so runs are replayable; ties break on vid, making
the priority a total order (required for a deterministic result).

The per-round core is a join + anti-condition aggregation
(min-priority-neighbor vs own priority) — semi/anti join shapes that AQE
plans; no coloring or locking is needed because rounds are synchronous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graphanalytics_spark.graph import symmetrize
from graphanalytics_spark.plans.truncate import LineageTruncator


def maximal_independent_set(
    spark: SparkSession,
    edges_canon: DataFrame,
    seed: int = 42,
    max_iter: int = 100,
) -> DataFrame:
    """Returns DataFrame(vid: long) — a maximal independent set of the
    undirected graph. Deterministic for a given seed."""
    sym = symmetrize(edges_canon).select("src", "dst").persist()
    deg = sym.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
    avg_deg = deg.agg(F.avg("deg")).first()[0]
    if avg_deg is None:  # empty graph
        sym.unpersist()
        return spark.createDataFrame([], "vid long")
    # degree-biased deterministic priority; lower = stronger claim.
    # struct(prio, vid) is a total order.
    active = deg.select(
        "vid",
        (
            F.pmod(F.xxhash64("vid", F.lit(seed)), F.lit(1 << 20)).cast("double")
            / F.lit(float(1 << 20))
            * (F.col("deg") + F.lit(float(avg_deg)))
            / F.lit(float(avg_deg))
        ).alias("prio"),
    ).persist()

    truncator = LineageTruncator(spark, hard_every=4)
    selected_parts = []
    for it in range(1, max_iter + 1):
        # a vertex wins if no active neighbor has (smaller prio, tie smaller vid)
        lhs = active.select(
            F.col("vid").alias("v"), F.col("prio").alias("p")
        )
        rhs = active.select(
            F.col("vid").alias("u"), F.col("prio").alias("q")
        )
        nbr = (
            sym.join(lhs, sym.src == lhs.v)
            .join(rhs, sym.dst == rhs.u)
            .groupBy("v", "p")
            .agg(F.min(F.struct("q", "u")).alias("best_nbr"))
        )
        winners = nbr.filter(
            (F.col("p") < F.col("best_nbr.q"))
            | ((F.col("p") == F.col("best_nbr.q")) & (F.col("v") < F.col("best_nbr.u")))
        ).select(F.col("v").alias("vid"))
        # isolated-in-subgraph actives (no active neighbor) also win
        isolated = active.join(
            sym.join(active.select(F.col("vid").alias("u")), sym.dst == F.col("u"))
            .select(F.col("src").alias("vid")),
            "vid",
            "left_anti",
        ).select("vid")
        # eager localCheckpoint each round: MIS rounds stack two joins per
        # round on the state lineage — without truncation the plan depth is
        # quadratic in rounds and analysis time dominates (O(log n) rounds,
        # so checkpoint cost is bounded).
        round_sel = truncator.truncate(winners.union(isolated).distinct(), it)
        n_sel = round_sel.count()
        if n_sel == 0:
            break
        selected_parts.append(round_sel)
        # deactivate winners and their neighbors
        nbrs_of_sel = (
            sym.join(round_sel, sym.src == round_sel.vid).select(
                F.col("dst").alias("vid")
            )
        )
        dead = round_sel.select("vid").union(nbrs_of_sel).distinct()
        new_active = truncator.truncate(
            active.join(dead, "vid", "left_anti"), it, stream="active"
        )
        # no per-round count of the surviving set (one driver action per
        # round saved — guide §1.2): an emptied active set just makes the
        # next round's winner count 0, which breaks the loop; the lazy
        # truncation finalizes with that round's first action
        active.unpersist()
        active = new_active
    sym.unpersist()
    if not selected_parts:
        return spark.createDataFrame([], "vid long")
    result = selected_parts[0]
    for p in selected_parts[1:]:
        result = result.union(p)
    return result.distinct()


def verify_mis(spark: SparkSession, edges_canon: DataFrame, mis: DataFrame) -> dict:
    """Invariant verification mirroring ``MisImpl::verifyMis``
    (/root/reference/mis/src/mis.cpp:371-400): independence (no selected
    vertex has a selected neighbor) and maximality (every unselected vertex
    has a selected neighbor)."""
    sym = symmetrize(edges_canon).select("src", "dst")
    m = mis.select("vid")
    viol_indep = (
        sym.join(m, sym.src == m.vid, "left_semi")
        .join(m.withColumnRenamed("vid", "v2"), F.col("dst") == F.col("v2"), "left_semi")
        .count()
    )
    verts = sym.select(F.col("src").alias("vid")).distinct()
    unselected = verts.join(m, "vid", "left_anti")
    covered = (
        sym.join(m, sym.dst == m.vid, "left_semi")
        .select(F.col("src").alias("vid"))
        .distinct()
    )
    viol_maximal = unselected.join(covered, "vid", "left_anti").count()
    return {"independence_violations": viol_indep, "maximality_violations": viol_maximal}
