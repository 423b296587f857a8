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


def similarity_expr(a, b, threshold: float | None = None):
    """Percent similarity 100·(1 − lev(a,b)/greatest(len(a),len(b))).

    With ``threshold`` known, the per-pair distance cutoff
    ``floor((100−threshold)·maxLen/100)`` is passed to Spark's 3-arg
    ``levenshtein`` so the DP band-exits early — the true analog of the
    reference's banded DP (fuzzymatch_utils.cpp:238-270). Distances beyond
    the cutoff return −1, mapped to similarity −1 (below any threshold):
    the boundary is exact because lev > floor(c·maxLen) ⟺ sim < threshold
    for integer lev."""
    mx = F.greatest(F.length(a), F.length(b))
    if threshold is None:
        lev = F.levenshtein(a, b).cast("double")
    else:
        # call_function: the F.levenshtein wrapper only takes a literal int
        # threshold, but the SQL function accepts a per-row expression
        cutoff = F.floor((100.0 - threshold) * mx / 100.0).cast("int")
        lev = F.call_function("levenshtein", a, b, cutoff).cast("double")
    sim = F.when(lev >= 0, 100.0 * (1.0 - lev / mx.cast("double"))).otherwise(
        F.lit(-1.0)
    )
    return F.when(mx == 0, F.lit(100.0)).otherwise(sim)


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
    sim = similarity_expr(F.col(text_col), F.lit(query), threshold=threshold)
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

    Length-bucketed band join: a pair can only reach ``threshold`` when
    |len_l − len_r| ≤ (100−threshold)·max(len)/100, which bounds the valid
    right lengths to [len_l·threshold/100, len_l·100/threshold]. Each left
    row probes exactly the right-side buckets covering that interval
    (derived from the band, NOT a fixed ±1 — a fixed radius silently drops
    long-string matches), so the cross product never materializes.
    Returns (left_id, right_id, similarity ≥ threshold).
    """
    if not 0 < threshold <= 100:
        raise ValueError("threshold must be in (0, 100]")
    lb = left.select(
        F.col(left_id).alias("lid"),
        F.col(left_text).alias("ltext"),
    )
    rb = right.select(
        F.col(right_id).alias("rid"),
        F.col(right_text).alias("rtext"),
        F.floor(F.length(right_text) / length_bucket).cast("long").alias("rbucket"),
    )
    # right lengths compatible with this left row's length under the band
    lo_len = F.floor(F.length("ltext") * threshold / 100.0)
    hi_len = F.floor(F.length("ltext") * 100.0 / threshold)
    probes = lb.select(
        "lid",
        "ltext",
        F.explode(
            F.sequence(
                F.floor(lo_len / length_bucket).cast("long"),
                F.floor(hi_len / length_bucket).cast("long"),
            )
        ).alias("rbucket"),
    )
    pairs = probes.join(rb, "rbucket")
    max_dist = F.ceil(
        (100.0 - threshold)
        * F.greatest(F.length("ltext"), F.length("rtext"))
        / 100.0
    )
    banded = pairs.filter(F.abs(F.length("ltext") - F.length("rtext")) <= max_dist)
    sim = similarity_expr(F.col("ltext"), F.col("rtext"), threshold=threshold)
    return (
        banded.select("lid", "rid", F.round(sim, 6).alias("similarity"))
        .filter(F.col("similarity") >= threshold)
    )
