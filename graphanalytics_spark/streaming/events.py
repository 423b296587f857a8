"""Streaming event aggregation + incremental edge ingestion.

Batch parity: each streaming query's transformation is the same DataFrame
expression the batch path uses, so results converge to the batch answer
when run with ``trigger(availableNow=True)`` over a static directory —
which is how tests exercise this without a live source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_events_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream over a parquet events directory."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-(event_type, window) counts + value sums with late-data
    watermarking — the canonical streaming aggregation shape."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → event time
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_event_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch twin of ``windowed_event_counts`` (no watermark — complete
    input), used for batch-parity testing."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_to_completion(stream_df: DataFrame, tmpdir: str) -> DataFrame:
    """Drain a file-backed stream with availableNow into an in-memory sink
    and return the result as a batch DataFrame (test/bench harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName("ga_stream_result")
        .outputMode("complete")
        .option("checkpointLocation", tmpdir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql("SELECT * FROM ga_stream_result")
