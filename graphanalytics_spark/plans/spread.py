"""Scan-parallelism guard for under-split inputs.

A parquet row group is the unit of scan parallelism: a table written as
one row group is read by ONE task no matter how many cores the session
has, and every per-row expression upstream of the first exchange then
runs single-threaded (measured: the shingle build over a 1-row-group
documents table spent 6.5 s on one core of a 32-core session). At
warehouse scale inputs arrive well-split and this helper is a no-op; on
small/under-split inputs it hash-repartitions by the given key to the
session parallelism so the expensive per-row work (regex, HOF shingles,
hyperplane dots) parallelizes. Guide §2.5 'input skew' / §6 'input split
size' — fixed at the operator because the row-group layout cannot be
re-split at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def spread(df: DataFrame, *keys: str, partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` by ``keys`` to the session parallelism ONLY when
    its planned partition count is below it (cheap driver-side plan probe,
    no job). Keyed repartition keeps the placement deterministic under
    task retries (guide §2.5: never round-robin on non-deterministic
    input); callers pass a unique key (doc_id / vec_id) so the spread is
    even."""
    sess = df.sparkSession
    p = partitions or sess.sparkContext.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - planning failure falls through
        return df
    if cur >= p:
        return df
    if keys:
        return df.repartition(p, *[F.col(k) for k in keys])
    return df.repartition(p)
