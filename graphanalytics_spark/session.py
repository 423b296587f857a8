"""SparkSession factory tuned for the engine.

Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
same builder settings apply (AQE on, Arrow on, shuffle partitions sized to
the parallelism). Nothing here is local-mode-specific except the master URL.

At 100 TB scale the knobs that matter are set declaratively so Catalyst/AQE
do the physical planning:
- ``spark.sql.adaptive.enabled`` + ``skewJoin`` — runtime re-planning and
  skew-split of hub-vertex shuffles (the reference hand-codes ghost pruning
  for the same problem; see /root/reference/louvainmod/src/partitionLouvain.cpp:988).
- ``spark.sql.shuffle.partitions`` — sized to total cores; AQE coalesces
  down when partitions are small.
- Arrow execution for every pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "graphanalytics_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cpus`` controls local-mode parallelism; ``shuffle_partitions``
    defaults to the same value so one shuffle round fills the cores
    exactly (AQE coalesces small partitions at runtime anyway).
    """
    n = cpus or DEFAULT_CPUS
    sp = shuffle_partitions or n
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # shuffle/spill scratch: prefer tmpfs when the host has one (local-mode
    # shuffle is filesystem-bound; on a cluster each executor sets its own
    # local dirs and this default is irrelevant)
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
