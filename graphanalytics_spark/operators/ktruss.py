"""k-truss extraction by synchronous support peeling.

The k-truss of an undirected graph is the maximal subgraph in which every
edge participates in at least k−2 triangles — the edge-level density
refinement above the vertex-level k-core (every k-truss is inside the
(k−1)-core), and the standard link-spam / boilerplate-mesh pruner: an
edge survives only if its endpoints share enough common neighbors. The
reference reaches the same neighborhoods through its nHop adjacency
hash-probe (/root/reference/L2/nHop — the wedge-intersection pattern the
triangle counter reuses, operators/triangles.py); here the whole fixed
point is declarative:

    round i: tri_i  = triangles of the surviving edge set
             sup_i(e) = # triangles containing e  (0 if none)
             edges_{i+1} = { e : sup_i(e) ≥ k−2 }

Each round is one triangle enumeration (two equi-joins on the canonical
a<b<c edge table) plus a hash aggregation and a semi-join — all on an
edge set that only ever shrinks. Rounds are synchronous (all weak edges
of a round drop together), so the result is the true k-truss regardless
of round order and a converged state is a fixed point — which makes the
fixed-round SQL unroll in ``__spark_entry__`` an exact oracle (the kcore
technique, operators/kcore.py).

Scale shape: the enumeration joins the canonical table to itself on the
shared endpoint — quadratic only within one vertex's higher-id
neighborhood, the same bound as the oriented wedge join in
``triangles.triangle_count`` (sqrt(m) orientation there; id-orientation
here keeps every triangle enumerated exactly once as a<b<c, which the
per-edge support attribution needs). Termination is edge-count based
(no edges dropped ⇒ supports unchanged ⇒ fixed point); exhausting
``max_rounds`` first warns loudly and returns the supergraph.
"""

from __future__ import annotations

import time
import warnings

from pyspark.sql import DataFrame, SparkSession, functions as F

from graphanalytics_spark.plans.truncate import LineageTruncator


def _support(active: DataFrame) -> DataFrame:
    """Per-edge triangle support of a canonical (src<dst) edge set:
    DataFrame(src, dst, support) covering every active edge (0 rows for
    edges in no triangle are absent — callers left-join)."""
    a = active.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    b = active.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    c = active.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = (
        a.join(b, "b")
        .join(c, ["a", "c"])  # a<b<c: each triangle exactly once
    )
    sides = (
        tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(tri.select(F.col("b").alias("src"), F.col("c").alias("dst")))
        .unionAll(tri.select(F.col("a").alias("src"), F.col("c").alias("dst")))
    )
    return sides.groupBy("src", "dst").agg(F.count("*").alias("support"))


def ktruss(
    spark: SparkSession,
    edges_canon: DataFrame,
    k: int,
    max_rounds: int = 50,
    checkpoint_every: int = 4,
    metrics=None,
) -> DataFrame:
    """Edges of the k-truss with their within-truss support:
    DataFrame(src, dst, support). Empty when the graph has no k-truss.
    ``edges_canon`` is the canonical undirected-once table (src < dst).
    ``metrics`` rows carry (round, edges_dropped, surviving_edges,
    wall_s)."""
    if k < 2:
        raise ValueError("k must be >= 2 (k=2 keeps every edge)")
    need = k - 2
    truncator = LineageTruncator(spark, hard_every=checkpoint_every or 4)
    active = edges_canon.select("src", "dst").persist()
    n_edges = active.count()
    first = active
    converged = n_edges == 0 or need == 0

    for rnd in range(1, max_rounds + 1):
        if converged:
            break
        t0 = time.monotonic()
        sup = _support(active)
        nxt = (
            active.join(sup, ["src", "dst"], "left")
            .filter(F.coalesce(F.col("support"), F.lit(0)) >= need)
            .select("src", "dst")
        )
        nxt = truncator.truncate(nxt, rnd, stream="ktruss")
        n_next = nxt.count()
        if metrics is not None:
            metrics.add(
                rnd, float(n_edges - n_next), n_next, time.monotonic() - t0
            )
        converged = n_next == n_edges
        n_edges = n_next
        active = nxt
    if not converged:
        warnings.warn(
            f"ktruss(k={k}) stopped at max_rounds={max_rounds} before the "
            "peel fixed point: the result is a SUPERGRAPH of the true "
            "k-truss. Raise max_rounds.",
            RuntimeWarning,
            stacklevel=2,
        )

    sup = _support(active)
    result = active.join(sup, ["src", "dst"], "left").select(
        "src",
        "dst",
        F.coalesce(F.col("support"), F.lit(0)).alias("support"),
    )
    first.unpersist()
    return result
