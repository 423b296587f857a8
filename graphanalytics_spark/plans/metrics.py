"""Iteration metrics as tables — the FeatureLV/TimeLv analog
(/root/reference/louvainmod/include/xilinxlouvainInternal.h:93-133,235-253):
per-iteration (delta, edges_traversed, wall_s) records collected by every
iterative operator, persistable next to checkpoints for convergence audit.

``IterationMetrics`` itself lives in operators/pagerank.py (it predates
this module); this module re-exports it and adds the table sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from graphanalytics_spark.operators.pagerank import IterationMetrics  # noqa: F401


def metrics_df(spark: SparkSession, metrics: IterationMetrics) -> DataFrame:
    """Materialize collected metrics as a DataFrame
    (iteration, delta, edges_traversed, wall_s)."""
    if not metrics.rows:
        return spark.createDataFrame(
            [], "iteration int, delta double, edges_traversed long, wall_s double"
        )
    return spark.createDataFrame(
        [
            (r["iteration"], float(r["delta"]), int(r["edges_traversed"]), float(r["wall_s"]))
            for r in metrics.rows
        ],
        "iteration int, delta double, edges_traversed long, wall_s double",
    )


def write_metrics(
    spark: SparkSession, metrics: IterationMetrics, path: str
) -> None:
    """Append-style metrics sink (parquet dir) — one file per run."""
    metrics_df(spark, metrics).write.mode("append").parquet(path)
