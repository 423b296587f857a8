"""Document deduplication operators for training-data pipelines.

Four tiers, all shuffle-lean and expressed over the ``documents`` table
(doc_id, text, ...):

- ``exact_dedup`` — hash-groupBy on sha256(text): one aggregation, the
  canonical first pass at any corpus scale.
- ``ngram_jaccard_pairs`` — exact n-gram (word-shingle) Jaccard via an
  inverted-index self-join on shingles: explode → distinct → join on
  shingle → pair-count / union-size. Exact but quadratic within a shingle
  bucket; at 100 TB you run it only on MinHash-LSH candidates.
- ``minhash_lsh_pairs`` — MinHash signatures banded into LSH buckets;
  candidate pairs share ≥1 band. The universal near-dup scale path: cost
  is linear in corpus size + bucket-local pair generation.
- ``simhash`` — 64-bit SimHash fingerprints (sign of weighted hyperplane
  sums over token hashes); near-dups differ in few bits. One pass, no
  joins; pairs found by banding the fingerprint.

Hashes are md5-derived (first 15 hex chars → int) so the DuckDB oracle can
reproduce them bit-for-bit; everything stays in built-in SQL expressions
(higher-order array functions) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Mersenne-prime modulus keeps (a*h+b) % P well distributed; constants are
# fixed so runs (and the DuckDB oracle) are reproducible. Shingle hashes are
# 32-bit (8 md5 hex chars) and multipliers < 2^30, so a*h + b < 2^63 —
# no int64 overflow under ANSI arithmetic.
_MERSENNE = (1 << 61) - 1
_MINHASH_A = [1073741789, 536870909, 268435399, 134217689, 67108859,
              33554393, 16777213, 8388593, 4194301, 2097143,
              1048573, 524287, 262139, 131071, 65521, 32749]
_MINHASH_B = [998244353, 1000000007, 754974721, 167772161, 469762049,
              104857601, 919999999, 377777777, 212345677, 87654321,
              192837465, 564738291, 102938475, 678901234, 43210987, 13579]


def normalized_text(col):
    """Lowercase, collapse whitespace — the canonical text key."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_dedup(spark: SparkSession, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by sha256 of normalized text: returns
    (content_hash, keep_doc_id = min doc_id, n_dupes)."""
    h = F.sha2(normalized_text(F.col(text_col)), 256)
    return (
        docs.select(F.col("doc_id"), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dupes"))
    )


def tokens_expr(text_col):
    """Whitespace tokens of RAW text as array<string>: normalize (trim,
    collapse whitespace runs to one space) then split on the single
    space — one regexp_replace instead of a backtracking
    regexp_extract_all(\\S+) pass, identical token arrays (the empty
    string, where split yields [''], is guarded)."""
    norm = normalized_text(text_col)
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def shingles_expr(text_col, n: int = 3):
    """Distinct word n-gram shingles as an array<string> column: tokens via
    whitespace split of normalized text, shingle i = tokens[i..i+n-1]
    joined by space."""
    toks = tokens_expr(text_col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    # guard: fewer than n tokens → no shingles (Spark's sequence(0, neg)
    # would otherwise count downward)
    return F.when(F.size(toks) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_table(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) exploded distinct-shingle table.

    The shingle build (tokenize + per-position slice/concat + distinct)
    is the corpus pipelines' per-row hot spot, so an under-split input is
    spread across the session's cores first (plans/spread.py — no-op on
    well-split inputs)."""
    from graphanalytics_spark.plans.spread import spread

    return spread(docs, "doc_id").select(
        "doc_id", F.explode(shingles_expr(F.col(text_col), n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    spark: SparkSession,
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact shingle-Jaccard similar pairs (a < b): inverted-index
    self-join. Returns (doc_a, doc_b, jaccard ≥ threshold), jaccard rounded
    to 6 decimals.

    ``max_shingle_df`` is the inverted-index hot-key guard: a shingle with
    document frequency d contributes d(d-1)/2 join pairs, so one
    boilerplate shingle shared corpus-wide is quadratic. Shingles above
    the cap are dropped from the JOIN side only — sizes keep counting them,
    so the Jaccard denominator stays exact and the result is a subset
    (possible under-count of n_inter → candidates-only semantics, exactly
    how this operator is meant to run at scale: on LSH candidates).
    None (default) disables the guard for exact oracle parity."""
    st = shingle_table(docs, n, text_col)
    sizes = st.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    joinable = st
    if max_shingle_df is not None:
        keep = (
            st.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        joinable = st.join(keep, "shingle", "left_semi")
    a = joinable.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = joinable.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def _shingle_hash(shingle_col):
    """md5(shingle) → first 8 hex chars → int64 (32 bits). Reproducible in
    any engine with md5 + hex parsing; 32 bits keeps the minhash affine
    transform inside int64."""
    return F.conv(F.substring(F.md5(shingle_col), 1, 8), 16, 10).cast("long")


def minhash_signatures(
    docs: DataFrame,
    n: int = 3,
    num_perm: int = 16,
    text_col: str = "text",
    shingle_tbl: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, sig: array<long>[num_perm]) — sig[i] = min over shingles of
    (a_i·h + b_i) mod M61 where h = md5-derived shingle hash.
    ``shingle_tbl`` lets a caller that also needs the exploded
    (doc_id, shingle) table (near_dup_verified) pass a materialized copy so
    the shingle extraction runs once, not once per consumer."""
    assert num_perm <= len(_MINHASH_A)
    st = (
        shingle_tbl if shingle_tbl is not None else shingle_table(docs, n, text_col)
    ).select("doc_id", _shingle_hash(F.col("shingle")).alias("h"))
    mins = st.groupBy("doc_id").agg(
        *[
            F.min(
                (F.col("h") * F.lit(_MINHASH_A[i]) + F.lit(_MINHASH_B[i]))
                % F.lit(_MERSENNE)
            ).alias(f"m{i}")
            for i in range(num_perm)
        ]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    spark: SparkSession,
    docs: DataFrame,
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    text_col: str = "text",
    max_bucket_size: int | None = None,
    shingle_tbl: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (doc_a < doc_b) sharing at least one
    LSH band bucket (rows per band = num_perm // bands). Follow with
    ``ngram_jaccard_pairs`` on the candidates for exact filtering.
    ``shingle_tbl``: optional pre-materialized (doc_id, shingle) table
    (see minhash_signatures).

    ``max_bucket_size`` guards the quadratic bucket-local pair blowup: a
    bucket with B members emits B(B−1)/2 candidates, so one pathological
    bucket (boilerplate shingles shared corpus-wide) can dominate the
    output at scale. Buckets above the cap are dropped via one extra
    window count — their members are near-duplicates of *everything* and
    belong to an exact-dedup pass, not pairwise verification. None (the
    default) disables the guard for exact oracle parity."""
    rows = num_perm // bands
    sigs = minhash_signatures(docs, n, num_perm, text_col, shingle_tbl)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",", *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    from graphanalytics_spark.functions.similarity import cap_bucket_size

    banded = cap_bucket_size(banded, max_bucket_size)
    l = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    r = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def near_dup_verified(
    spark: SparkSession,
    docs: DataFrame,
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The composed scale pipeline as one operator: MinHash-LSH candidate
    pairs → exact n-gram Jaccard verify ≥ threshold. Linear candidate
    generation + candidates-only quadratic verify — the shape measured in
    BENCH/FUZZY.md (100k docs in ~6 min where the direct pairwise join
    extrapolates to ~15 h). Returns (doc_a, doc_b, jaccard).

    The exploded (doc_id, shingle) table feeds THREE consumers (the
    minhash signatures, and each side of the intersection join), so it is
    materialized once with an eager localCheckpoint — shingle extraction
    is the pipeline's per-row hot spot and recomputing it per consumer
    tripled the scan work (guide §5: reuse > recompute when the
    intermediate is the expensive part; blocks are executor-local and
    reclaimed by the ContextCleaner when the result is dropped)."""
    st = shingle_table(docs, n, text_col).localCheckpoint(eager=True)
    cand = minhash_lsh_pairs(
        spark, docs, n, num_perm, bands, text_col, max_bucket_size, shingle_tbl=st
    )
    sizes = st.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = st.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = st.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def simhash(
    docs: DataFrame, bits: int = 64, text_col: str = "text", as_hex: bool = False
) -> DataFrame:
    """64-bit SimHash over unigram tokens: bit j of the fingerprint is the
    sign of Σ_tokens (±1 depending on bit j of md5-hash(token)).

    Token bits come from two 32-bit md5 halves (bits 0-31 from hex chars
    1-8, bits 32-63 from chars 9-16) and the fingerprint is assembled as
    two 32-bit words — shifts never exceed 31, so the construction is
    reproducible in engines with checked shift overflow (DuckDB oracle).
    Output: (doc_id, simhash: long) or, with as_hex, the 16-hex-char
    string '%08x%08x' % (hi, lo).
    """
    assert bits == 64
    from graphanalytics_spark.plans.spread import spread

    toks = F.explode(
        F.array_distinct(tokens_expr(F.col(text_col)))
    ).alias("tok")
    md5c = F.md5(F.col("tok"))
    h_lo = F.conv(F.substring(md5c, 1, 8), 16, 10).cast("long")
    h_hi = F.conv(F.substring(md5c, 9, 8), 16, 10).cast("long")
    th = spread(docs, "doc_id").select("doc_id", toks).select(
        "doc_id", h_lo.alias("hlo"), h_hi.alias("hhi")
    )

    def vote(col, j):
        return F.sum(
            F.when(F.shiftright(col, j).bitwiseAND(1) == 1, 1).otherwise(-1)
        )

    votes = th.groupBy("doc_id").agg(
        *[vote(F.col("hlo"), j).alias(f"v{j}") for j in range(32)],
        *[vote(F.col("hhi"), j).alias(f"v{32 + j}") for j in range(32)],
    )

    def word(offset):
        w = None
        for j in range(32):
            bit = F.when(F.col(f"v{offset + j}") > 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            term = F.shiftleft(bit, j)
            w = term if w is None else w.bitwiseOR(term)
        return w

    lo, hi = word(0), word(32)
    if as_hex:
        out = F.format_string("%08x%08x", hi, lo)
    else:
        out = F.shiftleft(hi, 32).bitwiseOR(lo)
    return votes.select("doc_id", out.alias("simhash"))


def simhash_near_pairs(
    spark: SparkSession,
    docs: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    text_col: str = "text",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into
    ``bands`` chunks (pigeonhole: hamming ≤ bands−1 ⇒ some chunk equal),
    join on equal chunks, verify hamming distance ≤ max_hamming via
    bit_count (built-in).

    ``max_bucket_size`` caps the per-(band, chunk-value) population before
    the join (similarity.cap_bucket_size) — a degenerate chunk value (e.g.
    near-zero vote sums over boilerplate vocabulary) is quadratic in its
    population, the same hot-bucket failure mode as every banded pair
    generator here. None (default) keeps exact oracle parity."""
    from graphanalytics_spark.functions.similarity import cap_bucket_size

    fp = simhash(docs, 64, text_col)
    chunk = 64 // bands
    banded = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * chunk)
                        .bitwiseAND((1 << chunk) - 1)
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("simhash"), "bb.band", "bb.bucket")
    banded = cap_bucket_size(banded, max_bucket_size)
    l = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fa"), "band", "bucket"
    )
    r = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fb"), "band", "bucket"
    )
    pairs = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "fa", "fb")
        .distinct()
    )
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return pairs.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def embedding_near_dup(
    spark: SparkSession,
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_bands: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket_size: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the semantic-dedup tier of
    the training-data pipeline (the reference's cosine top-K capability
    applied corpus-vs-itself, /root/reference/cosinesim/src/cosinesim.cpp:589-680).

    Candidates = vector pairs sharing ≥1 random-hyperplane LSH band bucket
    (the same hyperplanes as the ANN path in functions/similarity.py);
    verify = exact cosine ≥ threshold. Returns canonical pairs
    (id_a < id_b, sim rounded to 8 decimals). Never a cross product: the
    pair stream is a (band, bucket) equi-join, quadratic only within a
    bucket, and the exact re-rank touches candidates only — the identical
    economics to MinHash-LSH → Jaccard-verify for text.

    ``max_bucket_size`` is the hot-bucket guard (similarity.cap_bucket_size)
    — one degenerate sign-pattern bucket (boilerplate-direction vectors) is
    quadratic in its population without it. ``dim`` skips the driver probe
    of the first row when the caller already knows the dimensionality.
    """
    from graphanalytics_spark.functions.similarity import (
        ann_band_buckets,
        cap_bucket_size,
        cosine_sim_col,
        embedding_dim,
    )

    if dim is None:
        dim = embedding_dim(embeddings, vec_col)
    if dim == 0:
        # empty input (or empty vectors): no pairs, and hyperplane
        # generation over dim=0 would be meaningless
        return spark.createDataFrame([], "id_a long, id_b long, sim double")
    b = cap_bucket_size(
        ann_band_buckets(embeddings, dim, n_planes, n_bands, seed, vec_col, id_col),
        max_bucket_size,
    )
    l = b.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "band", "bucket"
    )
    r = b.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "band", "bucket"
    )
    # score before the pair dedup (see similarity.knn_join_lsh): duplicate
    # (id_a, id_b) rows from different shared bands carry identical va/vb,
    # hence identical rounded sim, so deduping the slim scored rows is
    # result-identical and replaces the Sort + SortAggregate over full
    # vector payloads with a hash aggregate
    sim = F.round(cosine_sim_col(F.col("va"), F.col("vb")), 8)
    pairs = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.filter(F.col("sim") >= threshold)
