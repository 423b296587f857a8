"""End-to-end corpus-cleaning pipeline for training-data preparation.

Composes the engine's text-analysis and dedup tiers into the standard
LLM-data cleaning sequence, as ONE declarative DataFrame program:

  1. language filter      (functions/text.py:language_id)
  2. quality floor        (functions/text.py:quality_score)
  3. exact dedup          keep the smallest doc_id per sha256(normalized)
  4. near-dup removal     MinHash-LSH candidates → exact n-gram Jaccard
                          verify (functions/dedup.py:near_dup_verified);
                          of each verified pair among survivors the larger
                          doc_id is dropped

Each signal is per-document (MinHash signatures and shingle sets do not
depend on the rest of the corpus), so running stage 4 on the stage-3
survivors yields exactly the full-corpus pair set restricted to survivors —
the pipeline's result is order-composable and therefore cross-engine
oracle-checkable.

Scale shape (100 TB): stages 1-3 are one scan + one hash aggregation;
stage 4 is the LSH-bucketed candidate join measured in BENCH/FUZZY.md.
Nothing here collects to the driver; the whole pipeline is a single lazy
plan and can be written incrementally per input partition.

The reference has no corpus pipeline (it is a graph/similarity library);
this module is the brief-mandated training-data layer built on the same
kernels the reference accelerates (MinHash/Jaccard ≈ its cosine/fuzzy
products' candidate-then-verify economics,
/root/reference/fuzzymatch/src/fuzzymatch_utils.cpp:238-270).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graphanalytics_spark.functions import text
from graphanalytics_spark.functions.dedup import near_dup_verified, normalized_text


def _annotate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One pass of per-document signals: (doc_id, text, lang_pred,
    quality). Shared by corpus_clean and corpus_clean_report so the
    text-analysis scan runs once.

    Both signals are pure column expressions over the same normalized
    text, so they are fused into ONE projection — the previous
    three-way self-join (docs ⋈ language_id ⋈ quality_score) scanned the
    corpus three times and shuffled it twice for values computable
    row-locally (guide §2.4: remove shuffles outright)."""
    from graphanalytics_spark.functions.dedup import normalized_text as _norm
    from graphanalytics_spark.plans.spread import spread

    norm = _norm(F.col(text_col))
    return spread(docs, "doc_id").select(
        "doc_id",
        text_col,
        text.language_id_expr(norm).alias("lang_pred"),
        text.quality_score_expr(norm).alias("quality"),
    )


def corpus_clean(
    spark: SparkSession,
    docs: DataFrame,
    lang: str | None = "en",
    min_quality: float = 0.0,
    jaccard_threshold: float = 0.4,
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    text_col: str = "text",
    annotated: DataFrame | None = None,
) -> DataFrame:
    """Clean a document corpus; returns the survivors as
    (doc_id, lang_pred, quality). ``lang=None`` skips the language filter.
    ``annotated`` lets a caller (corpus_clean_report) pass a precomputed
    ``_annotate`` table so the signal scan is not repeated."""
    base = annotated if annotated is not None else _annotate(docs, text_col)
    kept = base
    if lang is not None:
        kept = kept.filter(F.col("lang_pred") == lang)
    kept = kept.filter(F.col("quality") >= min_quality)

    # exact dedup: keep the smallest doc_id per content hash (one hash agg
    # + a semi join — no window over potentially huge hash groups)
    h = F.sha2(normalized_text(F.col(text_col)), 256).alias("_h")
    hashed = kept.select("doc_id", text_col, "lang_pred", "quality", h)
    keepers = hashed.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
    kept = hashed.join(keepers, ["_h", "doc_id"]).drop("_h")

    # The survivor table feeds the near-dup stage (which reads it from
    # several plan branches) AND the final anti-join; without a
    # materialization Catalyst re-derives the whole annotate+dedup
    # subtree in each branch (measured: a 128-Exchange plan for the
    # composed pipeline). One eager localCheckpoint caps the upstream
    # work at a single pass (guide §3.3: materialize to truncate
    # duplicated subtrees / planning blowup).
    kept = kept.localCheckpoint(eager=True)

    # near-dup removal among survivors: larger id of each verified pair drops
    pairs = near_dup_verified(
        spark,
        kept.select("doc_id", text_col),
        n=n,
        num_perm=num_perm,
        bands=bands,
        threshold=jaccard_threshold,
        text_col=text_col,
    )
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return kept.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "lang_pred", "quality"
    )


def corpus_clean_report(
    spark: SparkSession,
    docs: DataFrame,
    **kwargs,
) -> dict:
    """Stage-by-stage funnel counts (total, after language filter, after
    quality floor, after exact dedup, final) — the pipeline observability a
    100 TB run needs before committing to a full pass. Runs the same plan
    as ``corpus_clean`` with counts at each stage boundary."""
    lang = kwargs.get("lang", "en")
    min_quality = kwargs.get("min_quality", 0.0)
    base = _annotate(docs, kwargs.get("text_col", "text")).persist()
    total = base.count()
    after_lang = (
        base.filter(F.col("lang_pred") == lang).count() if lang is not None else total
    )
    after_quality = (
        base.filter(
            ((F.col("lang_pred") == lang) if lang is not None else F.lit(True))
            & (F.col("quality") >= min_quality)
        ).count()
    )
    # the funnel's final stage reuses the SAME persisted annotation table —
    # the whole report is one text-analysis pass over the corpus
    final = corpus_clean(spark, docs, annotated=base, **kwargs).count()
    base.unpersist()
    return {
        "total": total,
        "after_language": after_lang,
        "after_quality": after_quality,
        "final": final,
    }
