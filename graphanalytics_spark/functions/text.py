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
    """Whitespace token count: number of \\S+ runs.

    Every call site passes whitespace-collapsed text (``normalized_text``:
    trimmed, runs of whitespace → one space), so the count equals the
    single-char split count — computed without the regex engine, which at
    corpus scale is the difference between a memchr scan and a
    backtracking-matcher pass per document (guide §1.2 'per-task work').
    The empty string is the one divergence (split yields ['']) and is
    guarded explicitly."""
    return F.when(F.length(text_col) == 0, F.lit(0)).otherwise(
        F.size(F.split(text_col, " "))
    )


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


def _count_marker_hits(text_col, words: list[str]):
    """Total occurrences of any marker word, word-bounded — ONE
    alternation regex pass instead of one regex pass per word.

    Equals Σ_w _count_occurrences(w): marker words are distinct and both
    sides of every match are anchored on \\b, so no occurrence is counted
    twice and the alternation (with backtracking across the trailing \\b)
    finds exactly the union of the per-word match sets. Cuts language_id
    from 20 regex scans per document to 4 and quality_score's stopword
    term from 5 to 1 (guide §1.2: per-task work after the plan shape)."""
    pat = r"\b(?:" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(text_col, F.lit(pat), 0))


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


def quality_score_expr(norm_col):
    """Quality score as a pure column expression over NORMALIZED text, so
    callers (corpus_clean's annotate pass) can fuse it with other signals
    in one projection instead of a per-signal self-join.

    score = 0.4·len_ok + 0.3·(1 − punct_ratio clipped) + 0.3·stop_ratio_ok
    """
    n_tok = token_count_expr(norm_col).cast("double")
    n_punct = F.size(
        F.regexp_extract_all(norm_col, F.lit(r"[^\w\s]"), 0)
    ).cast("double")
    n_chars = F.length(norm_col).cast("double")
    # single alternation pass; numerically identical to the per-word sum
    # (integer counts, summed exactly — see _count_marker_hits)
    stop_hits = _count_marker_hits(norm_col, _LANG_MARKERS["en"]).cast("double")
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
    return F.round(score, 6)


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1] from length / punctuation ratio /
    stopword ratio — the standard cheap pre-filter for training corpora."""
    return docs.select(
        "doc_id",
        quality_score_expr(normalized_text(F.col(text_col))).alias("quality"),
    )


def language_id_expr(norm_col):
    """Language prediction as a pure column expression over NORMALIZED
    text (see quality_score_expr for the fusion rationale): argmax over
    per-language marker hit counts; 'und' when all counts are 0.
    Deterministic ties by language code order."""
    scores = [
        (lang, _count_marker_hits(norm_col, words))
        for lang, words in sorted(_LANG_MARKERS.items())
    ]
    # array_max over structs of (hits, -idx, lang): highest hits wins,
    # ties resolved toward the earlier language code
    arr = F.array(
        *[
            F.struct(
                hits.alias("hits"),
                F.lit(-i).alias("neg_idx"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, hits) in enumerate(scores)
        ]
    )
    best = F.array_max(arr)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language heuristic: argmax over per-language marker
    hit counts; 'und' (undetermined) when all counts are 0. Deterministic
    ties by language code order."""
    return docs.select(
        "doc_id",
        language_id_expr(normalized_text(F.col(text_col))).alias("lang_pred"),
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
