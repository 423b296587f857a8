"""Modularity of a partition — standalone quality metric.

The FeatureLV::ComputeQ analog
(/root/reference/louvainmod/src/partitionLouvain.cpp:1608-1674):
Q = Σ_c (in_c / 2m) − Σ_c (tot_c / 2m)² where in_c is twice the weight of
intra-community edges (each counted from both endpoints, matching the
reference's doubled-CSR convention) and tot_c the summed weighted degree of
the community. Computed as two hash aggregations over one edge↔label join —
the same two parallel sum-reductions the reference runs
(/root/reference/grappolo/src/parallelLouvainMethod.cpp:186-194).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graphanalytics_spark.graph import symmetrize


def modularity(
    spark: SparkSession, edges_canon: DataFrame, labels: DataFrame
) -> float:
    """labels: DataFrame(vid, label). Returns Q as a Python float.
    Self-loops in the canonical table are excluded by construction
    (graph.canonicalize drops them)."""
    sym = symmetrize(edges_canon)
    lsrc = labels.select(F.col("vid").alias("src"), F.col("label").alias("c_src"))
    ldst = labels.select(F.col("vid").alias("dst"), F.col("label").alias("c_dst"))
    joined = sym.join(lsrc, "src").join(ldst, "dst")
    two_m = sym.agg(F.sum("weight")).first()[0]
    if not two_m:
        return 0.0
    in_w = (
        joined.filter(F.col("c_src") == F.col("c_dst"))
        .agg(F.sum("weight"))
        .first()[0]
        or 0.0
    )
    tot = (
        joined.groupBy("c_src")
        .agg(F.sum("weight").alias("tot_c"))
        .agg(F.sum(F.col("tot_c") * F.col("tot_c")))
        .first()[0]
        or 0.0
    )
    return float(in_w / two_m - tot / (two_m * two_m))
