"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All pure column expressions (whole-stage codegen; nothing leaves the JVM),
so they run at scan speed over a 100 TB documents table and are
DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphanalytics_spark.functions.dedup import normalized_text

# tiny per-language stopword marker sets for the n-gram/stopword heuristic;
# deterministic and reproducible in SQL.
_LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}


def token_count_expr(text_col):
    """Whitespace token count: number of \\S+ runs."""
    return F.size(F.regexp_extract_all(text_col, F.lit(r"\S+"), 0))


def bpe_ish_token_count_expr(text_col):
    """A BPE-ish subword proxy: count of word-piece matches
    (letter-runs, digit-runs, or single punctuation) — the standard
    pre-tokenizer regex shape."""
    return F.size(
        F.regexp_extract_all(text_col, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0)
    )


def _count_occurrences(text_col, word: str):
    """Occurrences of a word with word boundaries."""
    return F.size(
        F.regexp_extract_all(text_col, F.lit(r"\b" + word + r"\b"), 0)
    )


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics: whitespace tokens, subword tokens,
    chars, mean word length."""
    norm = normalized_text(F.col(text_col))
    n_tok = token_count_expr(norm)
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        bpe_ish_token_count_expr(norm).alias("n_subwords"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.round(
            F.when(n_tok > 0, F.length(norm) / n_tok.cast("double")).otherwise(0.0), 6
        ).alias("mean_token_len"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1] from length / punctuation ratio /
    stopword ratio — the standard cheap pre-filter for training corpora.

    score = 0.4·len_ok + 0.3·(1 − punct_ratio clipped) + 0.3·stop_ratio_ok
    """
    norm = normalized_text(F.col(text_col))
    n_tok = token_count_expr(norm).cast("double")
    n_punct = F.size(F.regexp_extract_all(norm, F.lit(r"[^\w\s]"), 0)).cast("double")
    n_chars = F.length(norm).cast("double")
    stop_hits = None
    for w in _LANG_MARKERS["en"]:
        c = _count_occurrences(norm, w).cast("double")
        stop_hits = c if stop_hits is None else stop_hits + c
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(
        F.least(n_tok / 10.0, F.lit(1.0))
    )
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(0.0)
    score = (
        0.4 * len_ok
        + 0.3 * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0)))
        + 0.3 * F.least(stop_ratio * 10.0, F.lit(1.0))
    )
    return docs.select("doc_id", F.round(score, 6).alias("quality"))


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language heuristic: argmax over per-language marker
    hit counts; 'und' (undetermined) when all counts are 0. Deterministic
    ties by language code order."""
    norm = normalized_text(F.col(text_col))
    scores = []
    for lang, words in sorted(_LANG_MARKERS.items()):
        hits = None
        for w in words:
            c = _count_occurrences(norm, w)
            hits = c if hits is None else hits + c
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # max struct picks highest hits; ties → lexicographically larger lang,
    # so negate via reverse alphabet trick is avoided by ordering input —
    # instead use greatest of structs with (hits, neg index) … simpler:
    # array_max over structs of (hits, -idx, lang)
    arr = F.array(
        *[
            F.struct(
                s["hits"].alias("hits"),
                F.lit(-i).alias("neg_idx"),
                s["lang"].alias("lang"),
            )
            for i, s in enumerate(scores)
        ]
    )
    best = F.array_max(arr)
    return docs.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "lang_pred"
        ),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: 64-bit-hex prefix of md5 over normalized text
    (whitespace-insensitive content identity — the cheap 'rolling hash'
    key used for shard-local dedup and incremental re-crawls)."""
    return docs.select(
        "doc_id",
        F.substring(F.md5(normalized_text(F.col(text_col))), 1, 16).alias(
            "fingerprint"
        ),
    )
