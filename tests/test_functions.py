"""Similarity / fuzzymatch / dedup / text / multimodal function tests."""

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from graphanalytics_spark.functions import dedup, fuzzymatch, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s", 44),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s", 44),  # exact dup
        (2, "the quick brown fox leaps over the lazy dog", "en", "s", 44),  # near dup
        (3, "a completely different document about graphs and spark", "en", "s", 55),
        (4, "der hund und die katze und das pferd ist gross", "de", "s", 47),
        (5, "xy", "en", "s", 2),  # shorter than shingle width
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(16).astype(float).tolist(), i % 3) for i in range(50)]
    # vector 49 = exact copy of vector 0 → cosine 1
    rows[49] = (49, rows[0][1], 0)
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_cosine_topk_exact(spark, emb):
    rows = {r.vec_id: r.embedding for r in emb.collect()}
    target = rows[0]
    got = similarity.cosine_topk(spark, emb, target, k=5).collect()
    assert [r.vec_id for r in got][:2] == [0, 49]
    assert got[0].sim == 1.0 and got[1].sim == 1.0
    # verify third against numpy
    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    expected3 = sorted(
        ((round(cos(v, target), 8), k) for k, v in rows.items()), key=lambda t: (-t[0], t[1])
    )[2]
    assert (got[2].sim, got[2].vec_id) == expected3


def test_ann_lsh_recalls_identical_vector(spark, emb):
    rows = {r.vec_id: r.embedding for r in emb.collect()}
    got = similarity.ann_lsh_topk(spark, emb, rows[0], k=5, n_planes=6, n_bands=4)
    ids = [r.vec_id for r in got.collect()]
    assert 0 in ids and 49 in ids  # identical vectors always share all buckets


def test_embedding_norms(spark, emb):
    rows = {r.vec_id: r.embedding for r in emb.collect()}
    got = {r.vec_id: r.norm for r in similarity.embedding_norms(emb).collect()}
    for vid in (0, 7, 23):
        assert got[vid] == pytest.approx(float(np.linalg.norm(rows[vid])), abs=1e-7)


def test_fuzzy_match_semantics(spark, docs):
    pats = docs.select(F.col("doc_id").alias("id"), F.col("text").alias("pattern"))
    q = "the quick brown fox jumps over the lazy dog"
    got = {r.id: r.similarity for r in fuzzymatch.fuzzy_match(spark, pats, q, 80.0).collect()}
    assert got[0] == 100.0 and got[1] == 100.0
    # one word changed (jumps→leaps): lev=3, len=43 → 100*(1-3/43)
    assert got[2] == pytest.approx(100 * (1 - 3 / 43), abs=1e-4)
    assert 3 not in got


def test_fuzzy_join_finds_near_pairs(spark, docs):
    l = docs.select(F.col("doc_id").alias("id"), F.col("text"))
    got = fuzzymatch.fuzzy_join(spark, l, l, threshold=90.0,
                                left_id="id", left_text="text",
                                right_id="id", right_text="text")
    pairs = {(r.lid, r.rid) for r in got.collect() if r.lid < r.rid}
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs


def test_exact_dedup_groups(spark, docs):
    got = dedup.exact_dedup(spark, docs)
    dupes = got.filter("n_dupes > 1").collect()
    assert len(dupes) == 1 and dupes[0].keep_doc_id == 0 and dupes[0].n_dupes == 2


def test_minhash_finds_near_dups(spark, docs):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(spark, docs, num_perm=16, bands=4).collect()
    }
    assert (0, 1) in pairs  # exact dup always collides in all bands


def test_jaccard_exact_values(spark, docs):
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(spark, docs, n=3, threshold=0.1).collect()
    }
    assert got[(0, 1)] == 1.0
    # doc2 differs by one word: 7 shingles each, 3-gram window of changed
    # word kills 3 shingles → inter=4, union=10 → 0.4
    assert got[(0, 2)] == pytest.approx(0.4, abs=1e-6)


def test_short_doc_has_no_shingles(spark, docs):
    st = dedup.shingle_table(docs.filter("doc_id = 5"), n=3)
    assert st.count() == 0


def test_simhash_near_pairs(spark, docs):
    fp = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(fp[0], fp[1]) == 0
    assert ham(fp[0], fp[2]) < ham(fp[0], fp[3])
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_near_pairs(spark, docs, max_hamming=10).collect()
    }
    assert (0, 1) in pairs


def test_token_stats_and_quality(spark, docs):
    ts = {r.doc_id: r for r in text.token_stats(docs).collect()}
    assert ts[0].n_tokens == 9
    assert ts[5].n_tokens == 1
    q = {r.doc_id: r.quality for r in text.quality_score(docs).collect()}
    assert 0.0 <= min(q.values()) and max(q.values()) <= 1.0
    assert q[0] > q[5]  # tiny doc scores worse


def test_language_id(spark, docs):
    got = {r.doc_id: r.lang_pred for r in text.language_id(docs).collect()}
    assert got[0] == "en" and got[4] == "de" and got[5] == "und"


def test_fingerprint_whitespace_insensitive(spark):
    d = spark.createDataFrame(
        [(0, "hello   world"), (1, "Hello world "), (2, "other")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fingerprint for r in text.fingerprint(d).collect()}
    assert fp[0] == fp[1] != fp[2]


def test_multimodal_plumbing(spark):
    media = multimodal.synthetic_media(spark, 24)
    stats = multimodal.payload_stats(media)
    assert stats.filter(F.length("payload_sha256") != 64).count() == 0
    feats = multimodal.extract_features(media, feature_dim=8)
    pdf = feats.toPandas()
    assert len(pdf) == 24 and all(len(f) == 8 for f in pdf.features)
    # deterministic fake: histogram sums to ~1
    assert all(abs(sum(f) - 1.0) < 1e-9 for f in pdf.features)
    plan = multimodal.frame_sample_plan(media, every_ms=5000)
    assert plan.filter("ts_ms % 5000 != 0").count() == 0
    with pytest.raises(multimodal.DecodeUnavailable):
        multimodal.decode_image(b"xx")


def test_fuzzy_join_long_strings_wide_length_gap(spark):
    """Regression (ADVICE r1): the probe radius must derive from the band —
    long strings with a length gap far beyond one bucket are still valid
    matches at lower thresholds and must not be dropped."""
    from graphanalytics_spark.functions import fuzzymatch

    base = "abcdefghij" * 20               # 200 chars
    longer = base + "x" * 40               # 240 chars: gap 40 > 3 buckets
    left = spark.createDataFrame([(1, base)], "id long, text string")
    right = spark.createDataFrame([(2, longer), (3, "zz")], "id long, text string")
    got = fuzzymatch.fuzzy_join(spark, left, right, threshold=80.0).collect()
    assert [(r.lid, r.rid) for r in got] == [(1, 2)]
    # sim = 100*(1 - 40/240)
    assert got[0].similarity == pytest.approx(round(100 * (1 - 40 / 240), 6))


def test_fuzzy_match_cutoff_boundary(spark):
    """3-arg levenshtein early-cutoff must be exact at the threshold
    boundary: sim == threshold is kept, one more edit is dropped."""
    from graphanalytics_spark.functions import fuzzymatch

    # query length 10; threshold 80 → max_dist = 2 exactly
    pats = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghXY"), (3, "abcdefgXYZ")],
        "id long, pattern string",
    )
    got = {r.id: r.similarity for r in
           fuzzymatch.fuzzy_match(spark, pats, "abcdefghij", threshold=80.0).collect()}
    assert got == {1: 100.0, 2: 80.0}


def test_corpus_clean_funnel_and_invariants(spark):
    """corpus_clean: stage monotonicity, near-dup drop correctness (the
    larger id of every surviving verified pair is gone), and report parity.
    """
    from graphanalytics_spark.functions import dedup
    from graphanalytics_spark.functions.pipeline import corpus_clean, corpus_clean_report

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = corpus_clean(
        spark, docs, lang="en", min_quality=0.8, jaccard_threshold=0.4
    )
    rows = out.collect()
    assert rows, "pipeline removed everything"
    for r in rows:
        assert r.lang_pred == "en" and r.quality >= 0.8
    # no verified near-dup pair can survive intact
    ids = {r.doc_id for r in rows}
    kept_docs = docs.filter(F.col("doc_id").isin(list(ids)))
    residual = dedup.near_dup_verified(spark, kept_docs, threshold=0.4)
    leftover = [
        (r.doc_a, r.doc_b)
        for r in residual.collect()
        if r.doc_a in ids and r.doc_b in ids
    ]
    assert leftover == []
    rep = corpus_clean_report(
        spark, docs, lang="en", min_quality=0.8, jaccard_threshold=0.4
    )
    assert rep["total"] >= rep["after_language"] >= rep["after_quality"] >= rep["final"]
    assert rep["final"] == len(rows)


def test_simhash_and_jaccard_hot_key_guards(spark):
    """Every banded/inverted pair generator carries a hot-key cap: 120
    identical docs share all simhash chunks and all shingles — unguarded
    that is 7140 quadratic pairs; guarded, zero (they belong to exact
    dedup, which catches them in one hash agg)."""
    from graphanalytics_spark.functions import dedup

    docs = spark.createDataFrame(
        [(i, "common boilerplate text repeated verbatim in every document") for i in range(120)],
        "doc_id long, text string",
    )
    assert dedup.simhash_near_pairs(spark, docs).count() == 120 * 119 // 2
    assert (
        dedup.simhash_near_pairs(spark, docs, max_bucket_size=50).count() == 0
    )
    assert (
        dedup.ngram_jaccard_pairs(spark, docs, threshold=0.9).count()
        == 120 * 119 // 2
    )
    assert (
        dedup.ngram_jaccard_pairs(
            spark, docs, threshold=0.9, max_shingle_df=50
        ).count()
        == 0
    )
    # and exact dedup reduces the same corpus to ONE keeper
    d = dedup.exact_dedup(spark, docs).collect()
    assert len(d) == 1 and d[0].n_dupes == 120


def test_png_codec_roundtrip_all_filters():
    """encode_png -> decode_image reproduces source pixels for every
    channel count x every PNG row filter (the 5 unfilter paths)."""
    import numpy as np

    for i in range(4):
        px = multimodal._synthetic_pixels(i)
        for ft in range(5):
            back = multimodal.decode_image(multimodal.encode_png(px, filter_type=ft))
            assert back.shape == px.shape
            assert np.array_equal(back, px), (i, ft)


def test_png_palette_and_unsupported():
    import struct
    import zlib

    import numpy as np

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    raw = b"".join(bytes([0]) + idx[y].tobytes() for y in range(2))
    png = (
        multimodal._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = multimodal.decode_image(png)
    assert out.shape == (2, 3, 3) and tuple(out[0, 0]) == (255, 0, 0)
    import pytest as _pt

    with _pt.raises(multimodal.DecodeUnavailable):
        multimodal.decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")
    # corrupted CRC must be rejected, not mis-decoded
    bad = bytearray(multimodal.encode_png(idx))
    bad[-5] ^= 0xFF
    with _pt.raises(multimodal.DecodeUnavailable):
        multimodal.decode_image(bytes(bad))


def test_png_decode_stats_distributed(spark):
    """The mapInPandas decode path: planted PNGs in, per-image pixel shas
    out, matching shas computed directly from the source pixels."""
    import hashlib

    media = multimodal.synthetic_png_media(spark, n=8)
    got = {r.media_id: r for r in multimodal.png_decode_stats(media).collect()}
    assert len(got) == 8
    for i in range(8):
        px = multimodal._synthetic_pixels(i)
        r = got[i]
        assert (r.height, r.width, r.channels) == px.shape
        assert r.pixel_sha256 == hashlib.sha256(px.tobytes()).hexdigest()


def test_deterministic_sample_reproducible(spark):
    from graphanalytics_spark.functions import sampling

    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(300)], "doc_id long, lang string"
    )
    a = {r["doc_id"] for r in sampling.deterministic_sample(docs, 0.4).collect()}
    b = {r["doc_id"] for r in sampling.deterministic_sample(docs, 0.4).collect()}
    assert a == b and 0 < len(a) < 300
    # rate=1 keeps everything, rate=0 nothing
    assert sampling.deterministic_sample(docs, 1.0).count() == 300
    assert sampling.deterministic_sample(docs, 0.0).count() == 0
    # monotone: a lower rate selects a subset of a higher rate
    c = {r["doc_id"] for r in sampling.deterministic_sample(docs, 0.2).collect()}
    assert c <= a


def test_mixture_sample_rates_and_report(spark):
    from graphanalytics_spark.functions import sampling

    docs = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(3000)],
        "doc_id long, lang string",
    )
    sampled = sampling.mixture_sample(docs, {"en": 0.5, "de": 0.1})
    rep = {
        r["stratum"]: r
        for r in sampling.sample_report(docs, sampled).collect()
    }
    assert rep["fr"]["n_sampled"] == rep["fr"]["n_total"]  # default rate 1.0
    assert abs(rep["en"]["achieved_rate"] - 0.5) < 0.06
    assert abs(rep["de"]["achieved_rate"] - 0.1) < 0.04
    # python replay of the integer rule selects the identical set
    from graphanalytics_spark.functions.sampling import (
        _SAMPLE_A,
        _SAMPLE_M,
        threshold,
    )

    def keep(i, lang):
        thr = {"en": threshold(0.5), "de": threshold(0.1)}.get(lang, threshold(1.0))
        return ((i % _SAMPLE_M) * _SAMPLE_A + 1) % _SAMPLE_M < thr

    expected = {i for i in range(3000) if keep(i, ["en", "de", "fr"][i % 3])}
    assert {r["doc_id"] for r in sampled.collect()} == expected


def test_pack_sequences_greedy_invariants(spark):
    from graphanalytics_spark.functions import packing

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (7 + (i * 13) % 40))) for i in range(200)],
        "doc_id long, text string",
    )
    packed = packing.pack_sequences(docs, budget=100, n_shards=4).collect()
    assert len(packed) == 200
    # replay the greedy recurrence per shard
    by_shard = {}
    for r in sorted(packed, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        seq, running = 0, 0
        first = True
        for r in rows:
            t = r["n_tokens"]
            assert t == 7 + (r["doc_id"] * 13) % 40
            if first:
                seq, running, first = 0, t, False
            elif running + t > 100:
                seq, running = seq + 1, t
            else:
                running += t
            assert r["seq"] == seq, (shard, r["doc_id"])
    # every sequence fits the budget (no doc here exceeds it alone)
    from collections import defaultdict

    totals = defaultdict(int)
    for r in packed:
        totals[(r["shard"], r["seq"])] += r["n_tokens"]
    assert all(v <= 100 for v in totals.values())
    rep = packing.packing_report(
        packing.pack_sequences(docs, budget=100, n_shards=4), budget=100
    ).collect()
    assert sum(r["total_tokens"] for r in rep) == sum(r["n_tokens"] for r in packed)
    assert all(r["n_oversize"] == 0 for r in rep)
    assert all(0 < r["fill_ratio"] <= 1.0 for r in rep)


def test_pack_sequences_oversize_doc_gets_own_sequence(spark):
    from graphanalytics_spark.functions import packing

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, " ".join(["w"] * 50)), (2, "d e")],
        "doc_id long, text string",
    )
    packed = {
        r["doc_id"]: r
        for r in packing.pack_sequences(docs, budget=10, n_shards=1).collect()
    }
    # doc 1 (50 tokens > budget) sits alone in its own sequence
    assert packed[1]["seq"] not in (packed[0]["seq"], packed[2]["seq"])
    rep = packing.packing_report(
        packing.pack_sequences(docs, budget=10, n_shards=1), budget=10
    ).first()
    assert rep["n_oversize"] == 1
