"""Deterministic corpus sampling — the mixture-rebalancing step of a
training-data pipeline.

Web-scale corpora are rebalanced by downsampling over-represented strata
(language, source domain) to target proportions. Doing that with
``DataFrame.sample`` would be irreproducible across retries and engines;
here the keep/drop decision is a pure function of the document id:

    mix(id) = ((id mod M)·A + seed) mod M        (uniform-ish in [0, M))
    keep    ⇔ mix(id) < floor(rate · M)          (integer compare)

— the same seeded-LCG discipline as the random-walk neighbor pick
(operators/walks.py) and the MIS hash priority (operators/mis.py): no
RNG state, so a speculative task retry, a pipeline re-run, and the
cross-engine oracle all select the identical document set, and the
filter is a codegen integer expression the scan can evaluate at full
speed (no shuffle, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SAMPLE_A = 2654435761
_SAMPLE_M = 2147483647


def mix_expr(id_col, seed: int = 1):
    """The deterministic per-row mix value in [0, M); plain int64
    arithmetic, operands reduced mod M before multiplying (no overflow at
    10^12-scale ids, no engine-specific hash builtin)."""
    return (
        (F.col(id_col) % F.lit(_SAMPLE_M)) * F.lit(_SAMPLE_A) + F.lit(seed)
    ) % F.lit(_SAMPLE_M)


def threshold(rate: float) -> int:
    """Integer keep-threshold for a sampling rate (exact cross-engine
    compare — no float comparison at the row level)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * _SAMPLE_M)


def deterministic_sample(
    docs: DataFrame, rate: float, seed: int = 1, id_col: str = "doc_id"
) -> DataFrame:
    """Uniform deterministic sample: keep ≈ ``rate`` of rows, selected by
    id hash (reproducible across runs/retries/engines)."""
    return docs.filter(mix_expr(id_col, seed) < F.lit(threshold(rate)))


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    strata_col: str = "lang",
    seed: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling — downsample over-represented
    strata to target rates (e.g. ``{"en": 0.5, "de": 0.25}``), keep the
    rest at ``default_rate``. The per-row threshold is a small CASE chain
    (rates dicts are O(#languages), never data-sized), so the whole
    operator is one codegen filter on the scan."""
    thr = F.lit(threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(threshold(rate))
        ).otherwise(thr)
    return docs.filter(mix_expr(id_col, seed) < thr)


def sample_report(
    docs: DataFrame,
    sampled: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum funnel: (stratum, n_total, n_sampled, achieved_rate) —
    the audit table a rebalancing run ships with (corpus_clean_report
    style). One aggregation per side + a broadcast-sized join on the
    stratum key."""
    tot = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n_total")
    )
    smp = sampled.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n_sampled")
    )
    return (
        tot.join(smp, "stratum", "left")
        .select(
            "stratum",
            "n_total",
            F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
            F.round(
                F.coalesce(F.col("n_sampled"), F.lit(0)) / F.col("n_total"), 9
            ).alias("achieved_rate"),
        )
    )
