"""Cosine similarity top-K and approximate nearest neighbor search.

The reference's CosineSim product computes top-K cosine similarity of a
target vector against N population vectors, fanned across devices and
k-way-merged (/root/reference/cosinesim/src/cosinesim.cpp:589-680; CPU
oracle /root/reference/cosinesim/tests/cosinesim_test.cpp:128-177). Here:

- ``cosine_topk`` — exact brute force: dot/norm as built-in array
  expressions (``F.aggregate``/``F.zip_with``, JVM-side, no Python), then a
  global top-K. This is the oracle-backed baseline; at 100 TB it is one
  full scan with no shuffle except the final K-row reduction (Spark's
  TakeOrderedAndProject — exactly the reference's per-card top-K + k-way
  merge, chosen automatically).
- ``ann_lsh_topk`` — the scale path: random-hyperplane LSH buckets
  (SimHash for cosine); candidates share ≥1 band bucket with the target,
  then exact re-rank within candidates. Reduces the scan to the bucketed
  candidate set; the bucket table can be precomputed and stored
  partitioned-by-bucket so probes are partition-pruned scans.
- ``knn_join_lsh`` — all-pairs variant: bucket-join two embedding tables
  and re-rank per left row.

Similarities are rounded to 8 decimals before ranking so ordering (and the
driver's cross-engine value hash) is stable across summation orders.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def _dot_norm_expr(col_a, col_b):
    """JVM-side dot product and norms via F.zip_with + F.aggregate —
    deterministic left-fold summation order."""
    prod = F.zip_with(col_a, col_b, lambda x, y: x * y)
    dot = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(col_a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(col_b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot, na, nb


def cosine_sim_col(col_a, col_b):
    """Cosine similarity column expression over two array<numeric> columns."""
    dot, na, nb = _dot_norm_expr(col_a, col_b)
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_norms(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-vector L2 norm (the reference's norm kernel,
    /root/reference/L1/include/hw/similarity/dense_similarity_int.hpp:781-860)."""
    arr = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return embeddings.select(
        "vec_id",
        F.round(
            F.sqrt(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x)), 8
        ).alias("norm"),
    )


def cosine_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    target: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-K by cosine similarity against a literal target vector.
    Returns (vec_id, sim) with sim rounded to 8 decimals; ties broken by
    vec_id asc (total order — required for deterministic K)."""
    tgt = F.array(*[F.lit(float(x)) for x in target])
    arr = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sim = F.round(cosine_sim_col(arr, tgt), 8)
    return (
        embeddings.select(F.col(id_col).alias("vec_id"), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_topk_batch(
    spark: SparkSession,
    embeddings: DataFrame,
    targets: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_id: str = "target_id",
    target_vec: str = "target_embedding",
) -> DataFrame:
    """Top-K per target for a (small) table of target vectors — the
    reference plugin's batch cosine mode (one kernel pass matches many
    patient vectors, /root/reference/plugin/tigergraph/recomengine).

    Plan: broadcast the target table, cross-join against the population
    (each population row evaluates all targets in one scan), rank within
    target via a window. One population scan total, independent of the
    number of targets.
    """
    from pyspark.sql.window import Window

    t = targets.select(
        F.col(target_id).alias("target_id"),
        F.transform(F.col(target_vec), lambda x: x.cast("double")).alias("tv"),
    )
    pop = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("pv"),
    )
    scored = pop.crossJoin(F.broadcast(t)).select(
        "target_id",
        "vec_id",
        F.round(cosine_sim_col(F.col("pv"), F.col("tv")), 8).alias("sim"),
    )
    w = Window.partitionBy("target_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("target_id", "vec_id", "sim", "rn")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_expr(vec_col, planes: np.ndarray):
    """Sign-pattern bucket id from random hyperplanes, as a pure column
    expression: bit i = (v · h_i) >= 0."""
    bits = []
    for i, h in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in h])
        dot = F.aggregate(
            F.zip_with(vec_col, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_lsh_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    target: list[float],
    k: int = 10,
    n_planes: int = 8,
    n_bands: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-K: candidates = vectors sharing ≥1 of ``n_bands``
    hyperplane-sign buckets with the target; exact cosine re-rank within.

    At scale the bucket columns are precomputed once and the table stored
    partitioned by (band, bucket) — a probe is then a partition-pruned
    scan of ~N/2^n_planes rows per band instead of the full corpus.
    """
    dim = len(target)
    tnp = np.asarray(target, dtype=float)
    cand_filter = None
    df = embeddings
    for band in range(n_bands):
        planes = _hyperplanes(dim, n_planes, seed + band)
        tgt_bucket = int(sum((1 << i) for i, h in enumerate(planes) if tnp @ h >= 0))
        bcol = f"_b{band}"
        df = df.withColumn(bcol, lsh_bucket_expr(F.col(vec_col), planes))
        cond = F.col(bcol) == tgt_bucket
        cand_filter = cond if cand_filter is None else (cand_filter | cond)
    candidates = df.filter(cand_filter)
    return cosine_topk(spark, candidates, target, k, vec_col, id_col)
