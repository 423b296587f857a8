"""Synchronous label propagation (community detection).

The Louvain move rule stripped of the modularity term: each vertex adopts
the label with the maximum total incident edge weight among its neighbors,
with the reference's deterministic tie rules — higher weight wins, equal
weight → smaller label id (argmax tie-breaking per
/root/reference/grappolo/src/utilityClusteringFunctions.cpp:115-151 and the
GSQL MaxAccum<move> encoding in
/root/reference/plugin/tigergraph/comdetect/examples/comdetect/query/louvain_distributed_q_cpu.gsql:77-95).

Synchronous (Jacobi) sweeps make the iteration race-free without the
reference's graph coloring (SURVEY.md §4); determinism comes entirely from
the total-order tie rule, encoded as ``max(struct(weight, -label))`` so a
single hash aggregation resolves the argmax (no window sort needed).

Scale: per sweep = one join on the persisted symmetrized edge table + one
aggregation keyed by (dst). Hub skew is absorbed by map-side partial
aggregation of the struct-max (max is algebraic).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from graphanalytics_spark.graph import symmetrize
from graphanalytics_spark.plans.truncate import LineageTruncator


def label_propagation(
    spark: SparkSession,
    edges_canon: DataFrame,
    max_iter: int = 20,
    checkpoint_every: int = 8,
    partitions: int | None = None,
    metrics=None,
    initial_state: DataFrame | None = None,
    checkpointer=None,
    check_every: int = 2,
) -> DataFrame:
    """Returns DataFrame(vid: long, label: long). Labels initialized to
    vid; converges when no label changes in a sweep or max_iter reached.
    ``initial_state``/``checkpointer`` give kill-and-resume semantics.
    ``check_every``: the no-change stop test runs every k sweeps (sweeps
    are idempotent on a converged labeling, so semantics are unchanged —
    same driver-action economics as pagerank/components)."""
    sym = symmetrize(edges_canon)
    if partitions is None:
        try:
            partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            partitions = spark.sparkContext.defaultParallelism
    if partitions:
        # static side partitioned on the gather key once (pagerank policy)
        sym = sym.repartition(partitions, "src")
    sym = sym.persist()
    n_edges = sym.count()
    # hard cadence 8 (was 5): the every-2-sweep stop-test count already
    # finalizes the lazy localCheckpoints; order-balanced 5-vs-8 A/B had
    # 8 faster in all four pairs (3.0-3.2 vs 3.2-4.0 s warm at sf0.1)
    truncator = LineageTruncator(spark, hard_every=checkpoint_every or 4)
    check_every = max(1, check_every)

    if initial_state is not None:
        state = initial_state.select("vid", "label").persist()
    else:
        state = (
            sym.select(F.col("src").alias("vid"))
            .distinct()
            .select("vid", F.col("vid").alias("label"))
            .persist()
        )
    init_state = state

    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        # gather: per (vertex, neighbor-label) summed weight, then argmax
        # with ties to the smaller label via max(struct(w, -label)).
        nbr = (
            sym.join(state, sym.src == state.vid)
            .groupBy(F.col("dst").alias("v"), F.col("label").alias("nlabel"))
            .agg(F.sum("weight").alias("w"))
        )
        best = nbr.groupBy(F.col("v").alias("vid")).agg(
            F.max(F.struct(F.col("w"), (-F.col("nlabel")).alias("neg"))).alias("m")
        ).select("vid", (-F.col("m.neg")).alias("new_label"))
        new_state = (
            state.join(best, "vid", "left")
            .select(
                "vid",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).alias("changed"),
            )
        )
        # per-iteration lineage truncation (see plans/truncate.py)
        new_state = truncator.truncate(new_state, it, stream="state")
        n_changed = -1
        if it % check_every == 0 or it == max_iter:
            n_changed = new_state.filter("changed").count()
        state = new_state.drop("changed")
        if metrics is not None:
            metrics.add(it, float(n_changed), n_edges, time.monotonic() - t0)
        if checkpointer is not None:
            checkpointer.maybe_save(it, state, float(n_changed))
        if n_changed == 0:
            break
    init_state.unpersist()
    sym.unpersist()
    return state.select("vid", "label")
