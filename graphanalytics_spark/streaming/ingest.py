"""Incremental (streaming) edge ingestion: repos file-stream → link deltas.

The streaming twin of ``ingest.extract_links`` (Stage A of the reference's
pipeline, SURVEY §3.1): each micro-batch of repo files has its links
extracted with the same vectorized mapInPandas regex, pre-aggregated
map-side, and APPENDED as a delta parquet (one directory, files accumulate
across batches). The queryable edge table is the delta-compaction view —
``read_link_table`` groups the deltas and sums weights.

Append-only deltas + compacting reads is the log-structured pattern that
scales: no read-modify-write of a growing table per batch (which would be
O(table) per micro-batch), and the delta directory is exactly what an
Iceberg/Delta table's append commit would be on a real cluster. A periodic
offline compaction (rewrite the summed table, truncate deltas) bounds read
amplification; at 10^12 files the deltas partition naturally by ingest
time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graphanalytics_spark.ingest import extract_links


def read_repos_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream over a parquet repos directory."""
    return spark.readStream.schema(schema).parquet(path)


def incremental_link_ingest(
    repos_stream: DataFrame, delta_dir: str, checkpoint_dir: str
):
    """Start the ingestion query: per micro-batch, extract links and append
    the batch's (src_repo, dst_repo, weight) delta. Returns the
    StreamingQuery (caller owns trigger/termination)."""

    def append_delta(batch_df: DataFrame, batch_id: int) -> None:
        delta = (
            extract_links(batch_df)
            .groupBy("src_repo", "dst_repo")
            .agg(F.count("*").cast("double").alias("weight"))
        )
        # idempotent per micro-batch: each batch OVERWRITES its own
        # batch_id-keyed subdirectory, so a batch replayed after a crash
        # between the parquet write and the checkpoint commit replaces its
        # previous partial output instead of double-counting — the
        # exactly-once contract an Iceberg/Delta append commit gives
        delta.write.mode("overwrite").parquet(f"{delta_dir}/batch={batch_id}")

    return (
        repos_stream.writeStream.foreachBatch(append_delta)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_link_table(spark: SparkSession, delta_dir: str) -> DataFrame:
    """Delta-compaction view: the current weighted link table
    (src_repo, dst_repo, weight) — sum over the batch=N delta partitions.

    Refuses a delta_dir holding legacy flat part-files (the pre-batch_id
    append layout): mixed layouts break partition discovery, and flat rows
    carry no batch key so replay-dedup can never apply to them — rebuild
    the delta dir (re-run ingestion from a fresh checkpoint) to upgrade."""
    import os

    if os.path.isdir(delta_dir):
        flat = [
            f
            for f in os.listdir(delta_dir)
            if f.startswith("part-") and not f.endswith(".crc")
        ]
        if flat:
            raise ValueError(
                f"{delta_dir} contains {len(flat)} legacy flat delta files "
                "(pre-batch_id layout); rebuild the delta directory by "
                "re-running ingestion with a fresh checkpoint before reading"
            )
    return (
        spark.read.parquet(delta_dir)
        .select("src_repo", "dst_repo", "weight")  # drop the batch key
        .groupBy("src_repo", "dst_repo")
        .agg(F.sum("weight").alias("weight"))
    )
