"""Sequence packing — group documents into fixed token-budget training
sequences.

LLM pre-training consumes documents concatenated into fixed-length
sequences; the packing step assigns each document a (shard, seq) slot so
every sequence's token total stays within the budget while wasting as
little budget as possible. Exact bin packing is NP-hard and inherently
sequential, so at 100 TB the standard shape is shard-parallel greedy:

1. shard documents by a deterministic id hash (the seeded-LCG mix of
   ``functions/sampling.py`` — reproducible across retries/engines);
2. within each shard, walk documents in doc_id order and open a new
   sequence exactly when the running total would exceed the budget:

       seq(first)  = 0,           running = tokens(first)
       step: running + t > budget ? (seq+1, running=t)
                                  : (seq,  running+=t)

   A document alone larger than the budget therefore occupies its own
   sequence (it must — splitting is the tokenizer's job, not packing's).

The per-shard walk is a first-order recurrence, so it runs inside one
``applyInPandas`` Arrow batch per shard (shards are budget-sized slices
of the corpus — the parallelism knob), and the identical recurrence is
expressible as a recursive CTE, which is how the driver oracle replays
the packing exactly (``pack_sequences_q``). Token counts are the same
whitespace-token expression the ``doc_token_stats`` gate already proves
cross-engine (functions/text.py:token_count_expr over normalized text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphanalytics_spark.functions.dedup import normalized_text
from graphanalytics_spark.functions.sampling import mix_expr
from graphanalytics_spark.functions.text import token_count_expr


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 1,
) -> DataFrame:
    """Greedy shard-parallel sequence packing:
    DataFrame(doc_id, shard, seq, n_tokens). Deterministic — doc_id-hash
    sharding + doc_id-ordered greedy fill, no RNG state anywhere."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (mix_expr(id_col, seed) % F.lit(n_shards)).alias("shard"),
        token_count_expr(normalized_text(F.col(text_col))).alias("n_tokens"),
    )

    def pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs = []
        seq, running = 0, 0
        first = True
        for t in pdf["n_tokens"]:
            t = int(t)
            if first:
                seq, running, first = 0, t, False
            elif running + t > budget:
                seq, running = seq + 1, t
            else:
                running += t
            seqs.append(seq)
        pdf["seq"] = seqs
        return pdf[["doc_id", "shard", "seq", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(
        pack, schema="doc_id long, shard long, seq long, n_tokens long"
    )


def packing_report(packed: DataFrame, budget: int) -> DataFrame:
    """Per-shard packing audit: sequences used, total tokens, fill ratio
    (tokens / (n_seqs · budget)) and the count of oversize documents —
    the waste metric a packing run is judged by."""
    per_seq = packed.groupBy("shard", "seq").agg(
        F.sum("n_tokens").alias("seq_tokens")
    )
    return (
        per_seq.groupBy("shard")
        .agg(
            F.count("*").alias("n_seqs"),
            F.sum("seq_tokens").alias("total_tokens"),
            F.sum(
                F.when(F.col("seq_tokens") > budget, 1).otherwise(0)
            ).alias("n_oversize"),
        )
        .select(
            "shard",
            "n_seqs",
            "total_tokens",
            "n_oversize",
            F.round(
                F.col("total_tokens") / (F.col("n_seqs") * F.lit(budget)), 9
            ).alias("fill_ratio"),
        )
    )
