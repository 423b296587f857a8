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


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Custom stateful operator: per-user sessionization via
    ``applyInPandasWithState`` (Arrow-batched, no per-row Python) — the
    'custom stateful streaming operator' capability. A session closes after
    ``gap_s`` seconds of inactivity; state carries (last_ts, n_sessions,
    n_events) per user across micro-batches.

    Within a micro-batch, the group's events are sorted by event time
    before folding; across batches the fold assumes micro-batches arrive in
    event-time order (true for file sources reading time-partitioned
    drops; for out-of-order sources pair with a watermark-sized gap).
    Output mode: update — one row per user per batch with running totals.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        ts_all = []
        for pdf in pdfs:
            ts_all.append(pdf["ts_epoch"])
        if ts_all:
            ts = pd.concat(ts_all).sort_values().to_numpy()
            for t in ts:
                t = float(t)
                if last_ts is None or t - last_ts > gap_s:
                    n_sessions += 1
                last_ts = t
                n_events += 1
        state.update((last_ts, int(n_sessions), int(n_events)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    prepared = events.withColumn(
        "ts_epoch", F.unix_timestamp(F.col("ts").cast("timestamp")).cast("double")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_sessions bigint, n_events bigint",
        stateStructType="last_ts double, n_sessions bigint, n_events bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_update_sink(stream_df: DataFrame, tmpdir: str, name: str) -> DataFrame:
    """Drain an update-mode stream (stateful operators cannot run in
    complete mode) with availableNow into a memory sink."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tmpdir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


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


def enriched_event_counts(
    events: DataFrame,
    customer_dim: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream–static join enrichment: each streaming event is joined
    against a static dimension table BEFORE the windowed aggregation, so
    counts roll up by customer segment. The static side is broadcast per
    micro-batch (Spark re-plans the batch side each trigger — dimension
    updates are picked up without restarting the query); the stateful
    aggregation keys on (window, segment), so state size is bounded by
    segments × open windows, independent of stream volume.

    customer_dim: (c_custkey, c_mktsegment) — the driver's customer table
    shape. Works identically on a batch DataFrame — the batch-parity test
    runs the same function both ways.
    """
    dim = customer_dim.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .join(F.broadcast(dim), "user_id", "left")
        .fillna({"segment": "UNKNOWN"})
        .groupBy(F.window("ts", window).alias("w"), "segment")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "n_events",
            "sum_value",
        )
    )
