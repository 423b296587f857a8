"""Corpus-scale fuzzy-match benchmark (VERDICT r1 #7).

Edit-distance joins are inherently near-quadratic inside a length band —
with a same-length corpus the band prunes nothing, which is a property of
the problem, not the plan. The 100 TB answer is composition: LSH candidates
first, exact banded-Levenshtein verify second — both engine operators. This
tool times that pipeline on a 10^5-string corpus derived deterministically
from the driver's ``documents`` table (each doc expanded into 20
near-duplicate variants via fixed truncation edits), plus the direct banded
``fuzzy_join`` on a 10^4 subset for comparison.

Prints one JSON line with stage timings; progress goes to stderr.

Usage: python tools/bench_fuzzy.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphanalytics_spark.functions import dedup, fuzzymatch
from graphanalytics_spark.session import get_spark


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def variants(docs, per_doc: int = 20):
    """Deterministic near-duplicate corpus: variant v of a doc drops v%7
    trailing chars and appends v%3 'x's — edit distance ≤ 9 within a
    cluster, large across clusters."""
    v = F.explode(F.sequence(F.lit(0), F.lit(per_doc - 1))).alias("v")
    mutated = F.concat(
        F.expr("substring(text, 1, length(text) - (v % 7))"),
        F.expr("repeat('x', v % 3)"),
    )
    return docs.select("doc_id", "text", v).select(
        (F.col("doc_id") * 100 + F.col("v")).alias("doc_id"),
        mutated.alias("text"),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(app_name="bench-fuzzy", cpus=cpus, shuffle_partitions=cpus * 4)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    corpus = variants(docs).persist()
    n = corpus.count()
    log(f"corpus: {n}")

    # stage 1: LSH candidates (hot-bucket guard on — boilerplate clusters
    # are exactly what the cap is for)
    t0 = time.monotonic()
    cand = dedup.minhash_lsh_pairs(
        spark, corpus, n=3, num_perm=16, bands=4, max_bucket_size=5000
    ).persist()
    n_cand = cand.count()
    lsh_s = time.monotonic() - t0
    log(f"lsh candidates: {n_cand} in {lsh_s:.1f}s")

    # stage 2: exact banded-Levenshtein verify on candidates only
    t0 = time.monotonic()
    a = corpus.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    b = corpus.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    sim = fuzzymatch.similarity_expr(F.col("ta"), F.col("tb"), threshold=80.0)
    verified = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", F.round(sim, 6).alias("similarity"))
        .filter(F.col("similarity") >= 80.0)
    )
    n_ver = verified.count()
    verify_s = time.monotonic() - t0
    log(f"verified: {n_ver} in {verify_s:.1f}s")

    # comparison: banded fuzzy_join directly on a 5k subset (threshold 90
    # keeps the probe radius ±~11% of each length; on a same-length corpus
    # that prunes little, so this stage is intentionally the quadratic
    # baseline — measured 135 s at 5k on local[8])
    sub = corpus.filter(F.col("doc_id") % 25 == 0).persist()
    n_sub = sub.count()
    t0 = time.monotonic()
    bj = fuzzymatch.fuzzy_join(
        spark,
        sub.withColumnRenamed("doc_id", "id"),
        sub.withColumnRenamed("doc_id", "id"),
        threshold=90.0,
        left_text="text",
        right_text="text",
    ).filter(F.col("lid") < F.col("rid"))
    n_bj = bj.count()
    banded_s = time.monotonic() - t0
    log(f"banded join: {n_bj} pairs over {n_sub} rows in {banded_s:.1f}s")

    print(json.dumps({
        "corpus": n, "candidates": n_cand, "verified": n_ver,
        "lsh_s": round(lsh_s, 2), "verify_s": round(verify_s, 2),
        "banded_subset": n_sub, "banded_pairs": n_bj,
        "banded_join_s": round(banded_s, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
