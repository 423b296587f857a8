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


def _manifest_path(delta_dir: str) -> str:
    import os

    return os.path.join(delta_dir, "_compaction.json")


def _read_manifest(delta_dir: str) -> dict:
    import json
    import os

    p = _manifest_path(delta_dir)
    if not os.path.exists(p):
        return {"version": 0, "folded": []}
    with open(p) as f:
        return json.load(f)


def _base_dir(delta_dir: str, version: int) -> str:
    import os

    return os.path.join(os.path.dirname(delta_dir) or ".",
                        os.path.basename(delta_dir) + f"_base-{version}")


def read_link_table(spark: SparkSession, delta_dir: str) -> DataFrame:
    """Delta-compaction view: the current weighted link table
    (src_repo, dst_repo, weight) = compacted base (if any) + the batch=N
    delta partitions the base has not folded yet (per the atomic
    ``_compaction.json`` manifest — see ``compact_link_deltas``).

    Refuses a delta_dir holding legacy flat part-files (the pre-batch_id
    append layout): mixed layouts break partition discovery, and flat rows
    carry no batch key so replay-dedup can never apply to them — rebuild
    the delta dir (re-run ingestion from a fresh checkpoint) to upgrade."""
    import os

    flat = []
    batches = []
    if os.path.isdir(delta_dir):
        for f in os.listdir(delta_dir):
            if f.startswith("part-") and not f.endswith(".crc"):
                flat.append(f)
            elif f.startswith("batch="):
                batches.append(int(f.split("=")[1]))
    if flat:
        raise ValueError(
            f"{delta_dir} contains {len(flat)} legacy flat delta files "
            "(pre-batch_id layout); rebuild the delta directory by "
            "re-running ingestion with a fresh checkpoint before reading"
        )
    man = _read_manifest(delta_dir)
    folded = set(man["folded"])
    live = [b for b in batches if b not in folded]
    return _assemble_link_table(spark, delta_dir, man["version"], live)


def _assemble_link_table(
    spark: SparkSession, delta_dir: str, base_version: int, batch_ids: list[int]
) -> DataFrame:
    """base (if any) + the EXPLICIT batch list, summed. Taking the batch
    list as a parameter (instead of re-listing the directory) is what lets
    ``compact_link_deltas`` fold exactly the set it records in the
    manifest — no listdir race between 'what we folded' and 'what we
    wrote'."""
    import os

    parts = []
    if base_version > 0:
        parts.append(spark.read.parquet(_base_dir(delta_dir, base_version)))
    for b in sorted(batch_ids):
        parts.append(
            spark.read.parquet(os.path.join(delta_dir, f"batch={b}")).select(
                "src_repo", "dst_repo", "weight"
            )
        )
    if not parts:
        return spark.createDataFrame(
            [], "src_repo string, dst_repo string, weight double"
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df.groupBy("src_repo", "dst_repo").agg(F.sum("weight").alias("weight"))


def compact_link_deltas(spark: SparkSession, delta_dir: str) -> dict:
    """Fold the current live batch=N deltas (plus any previous base) into
    a new compacted base table — the offline compaction that bounds read
    amplification of the log-structured layout (an Iceberg rewrite commit
    restated on a plain filesystem).

    Crash safety is manifest-ordered, never in-place:
    1. write the new base dir ``<delta_dir>_base-<V+1>`` (additive — old
       base and deltas untouched);
    2. atomically replace ``_compaction.json`` (tmp + os.replace) to point
       readers at base V+1 with the folded batch set;
    3. garbage-collect the old base and folded batch dirs — safe at any
       time after step 2, and a crash between steps leaves only ignorable
       garbage (readers follow the manifest, not directory listing alone).
    A micro-batch replayed AFTER its batch was folded rewrites its
    batch=N dir; the manifest marks N folded, so the replayed copy is
    correctly ignored — exactly-once is preserved across compactions.

    The delta directory is listed ONCE; the fold reads exactly that batch
    set (``_assemble_link_table``), so a batch appended concurrently with
    compaction is neither double-counted (folded into the base but left
    out of the manifest) nor lost — it simply stays live for the next
    compaction or read. GC of replaced dirs is still not safe against a
    *reader* concurrently holding the previous manifest — run compaction
    when no query planned against the old base is mid-flight (on a real
    cluster, Iceberg snapshot expiry with a retention window covers this).
    Returns the new manifest."""
    import json
    import os
    import shutil

    man = _read_manifest(delta_dir)
    folded = set(man["folded"])
    live = sorted(
        int(f.split("=")[1])
        for f in os.listdir(delta_dir)
        if f.startswith("batch=") and int(f.split("=")[1]) not in folded
    )
    if not live and man["version"] > 0:
        return man  # nothing to fold
    new_version = man["version"] + 1
    current = _assemble_link_table(spark, delta_dir, man["version"], live)
    new_base = _base_dir(delta_dir, new_version)
    current.write.mode("overwrite").parquet(new_base)
    new_man = {"version": new_version, "folded": sorted(folded | set(live))}
    tmp = _manifest_path(delta_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(new_man, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_path(delta_dir))
    # GC (best-effort; crash here leaves garbage, not corruption)
    if man["version"] > 0:
        shutil.rmtree(_base_dir(delta_dir, man["version"]), ignore_errors=True)
    for b in live:
        shutil.rmtree(os.path.join(delta_dir, f"batch={b}"), ignore_errors=True)
    return new_man
