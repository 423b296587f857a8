"""Fuzzy string matching — banded Levenshtein percent similarity.

The reference's FuzzyMatch product scores pattern strings against a query
as ``100 − 100·editDistance/max(len)`` and accepts matches above a
similarity threshold, with a band cutoff
``maxDistance = (100−threshold)·maxLen/100``
(/root/reference/fuzzymatch/src/fuzzymatch_utils.cpp:238-270).

Spark-first: ``F.levenshtein`` (JVM-side) plus arithmetic; the band
pre-filter ``abs(len(a)−len(b)) <= maxDistance`` prunes the candidate
space *before* the quadratic-cost distance evaluates — at corpus scale
the pre-filter also gates the pair generation (length-bucketed self-join)
so the cross product never materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def similarity_expr(a, b):
    """Percent similarity 100·(1 − lev(a,b)/greatest(len(a),len(b)))."""
    mx = F.greatest(F.length(a), F.length(b))
    return F.when(mx == 0, F.lit(100.0)).otherwise(
        100.0 * (1.0 - F.levenshtein(a, b) / mx.cast("double"))
    )


def fuzzy_match(
    spark: SparkSession,
    patterns: DataFrame,
    query: str,
    threshold: float = 90.0,
    id_col: str = "id",
    text_col: str = "pattern",
) -> DataFrame:
    """Match a single query string against a pattern table
    (/root/reference/fuzzymatch/include/fuzzymatch.hpp:153-171 shape:
    (string, int64 id)). Returns (id, similarity) above threshold."""
    qlen = len(query)
    max_dist = F.ceil((100.0 - threshold) * F.greatest(F.length(text_col), F.lit(qlen)) / 100.0)
    band = F.abs(F.length(text_col) - qlen) <= max_dist
    sim = similarity_expr(F.col(text_col), F.lit(query))
    return (
        patterns.filter(band)
        .select(F.col(id_col).alias("id"), F.round(sim, 6).alias("similarity"))
        .filter(F.col("similarity") >= threshold)
    )


def fuzzy_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    threshold: float = 90.0,
    left_id: str = "id",
    left_text: str = "text",
    right_id: str = "id",
    right_text: str = "text",
    length_bucket: int = 8,
) -> DataFrame:
    """All-pairs fuzzy match between two string tables.

    Length-bucketed band join: strings can only match within
    ``maxDistance`` of each other's length, so we join on coarse length
    buckets (each left row probes its own bucket ± 1) instead of a cross
    join — the distributed analog of the reference's band cutoff.
    Returns (left_id, right_id, similarity ≥ threshold).
    """
    lb = left.select(
        F.col(left_id).alias("lid"),
        F.col(left_text).alias("ltext"),
        (F.length(left_text) / length_bucket).cast("long").alias("lbucket"),
    )
    rb = right.select(
        F.col(right_id).alias("rid"),
        F.col(right_text).alias("rtext"),
        (F.length(right_text) / length_bucket).cast("long").alias("rbucket"),
    )
    probes = lb.select(
        "lid", "ltext", F.explode(
            F.array(F.col("lbucket") - 1, F.col("lbucket"), F.col("lbucket") + 1)
        ).alias("rbucket")
    )
    pairs = probes.join(rb, "rbucket")
    max_dist = F.ceil(
        (100.0 - threshold)
        * F.greatest(F.length("ltext"), F.length("rtext"))
        / 100.0
    )
    banded = pairs.filter(F.abs(F.length("ltext") - F.length("rtext")) <= max_dist)
    sim = similarity_expr(F.col("ltext"), F.col("rtext"))
    return (
        banded.select("lid", "rid", F.round(sim, 6).alias("similarity"))
        .filter(F.col("similarity") >= threshold)
    )
