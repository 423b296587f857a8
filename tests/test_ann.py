"""ANN index build/probe + knn_join_lsh: recall against exact brute force,
probe partition pruning asserted in the plan, and probe==one-shot parity
(the population-load/match split of the reference,
/root/reference/cosinesim/include/cosinesim.hpp:412-418,497)."""

import numpy as np
import pyspark.sql.functions as F

from graphanalytics_spark.functions import similarity

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _target(spark):
    return [float(x) for x in _emb(spark).filter(F.col("vec_id") == 0).first()["embedding"]]


def test_ann_probe_matches_one_shot(spark, tmp_path):
    emb, target = _emb(spark), _target(spark)
    path = str(tmp_path / "ann_index")
    similarity.write_ann_index(emb, path)
    got_probe = [(r.vec_id, r.sim) for r in similarity.ann_probe(spark, path, target, k=12).collect()]
    got_oneshot = [
        (r.vec_id, r.sim) for r in similarity.ann_lsh_topk(spark, emb, target, k=12).collect()
    ]
    assert got_probe == got_oneshot
    # the target itself is its own nearest neighbor (sim 1.0)
    assert got_probe[0] == (0, 1.0)


def test_ann_probe_is_partition_pruned(spark, tmp_path):
    emb, target = _emb(spark), _target(spark)
    path = str(tmp_path / "ann_index")
    similarity.write_ann_index(emb, path)
    probe = similarity.ann_probe(spark, path, target, k=5)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the (band, bucket) predicate must be a partition filter on the scan,
    # not a post-scan filter over the full index
    assert "PartitionFilters" in plan and "band" in plan.split("PartitionFilters")[1][:400]


def test_knn_join_lsh_recall_vs_exact(spark):
    emb = _emb(spark).filter(F.col("vec_id") < 120)
    got = similarity.knn_join_lsh(
        spark, emb, emb, k=3, n_planes=3, n_bands=6, exclude_self=True
    )
    rows = got.collect()
    by_left = {}
    for r in rows:
        by_left.setdefault(r.lid, []).append((r.rn, r.rid, r.sim))
    assert set(by_left) == set(range(120))  # every left id got neighbors
    # exact oracle in numpy for a sample of left ids
    pdf = emb.orderBy("vec_id").toPandas()
    mat = np.array([np.asarray(v, dtype=float) for v in pdf["embedding"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    hits = total = 0
    for lid in range(0, 120, 10):
        order = np.argsort(-np.round(sims[lid], 8), kind="stable")
        exact_top = [int(i) for i in order if i != lid][:3]
        approx = [rid for _, rid, _ in sorted(by_left[lid])]
        hits += len(set(exact_top) & set(approx))
        total += 3
    assert hits / total >= 0.5, f"recall too low: {hits}/{total}"
    # within the candidate set, ranking is exact: each returned sim must
    # equal the brute-force cosine
    for _, rid, sim in by_left[0]:
        assert abs(sim - round(float(sims[0, rid]), 8)) < 1e-6


# --- IVF (inverted-file) path ---

def test_ivf_topk_target_first_and_exact_within_cells(spark):
    emb, target = _emb(spark), _target(spark)
    got = similarity.ivf_topk(spark, emb, target, k=10, n_cells=8, nprobe=3)
    rows = got.collect()
    assert rows[0].vec_id == 0 and rows[0].sim == 1.0
    # sims are exact cosines (verify against numpy for each returned id)
    pdf = emb.toPandas().set_index("vec_id")
    t = np.asarray(target, dtype=float)
    for r in rows:
        v = np.asarray(pdf.loc[r.vec_id, "embedding"], dtype=float)
        exact = float(t @ v / (np.linalg.norm(t) * np.linalg.norm(v)))
        assert abs(r.sim - round(exact, 8)) < 1e-6


def test_ivf_probe_matches_one_shot(spark, tmp_path):
    emb, target = _emb(spark), _target(spark)
    path = str(tmp_path / "ivf_index")
    similarity.write_ivf_index(emb, path, n_cells=8)
    got_probe = [
        (r.vec_id, r.sim)
        for r in similarity.ivf_probe(spark, path, target, k=10, nprobe=3).collect()
    ]
    got_oneshot = [
        (r.vec_id, r.sim)
        for r in similarity.ivf_topk(
            spark, emb, target, k=10, n_cells=8, nprobe=3
        ).collect()
    ]
    assert got_probe == got_oneshot


def test_ivf_probe_is_partition_pruned(spark, tmp_path):
    emb, target = _emb(spark), _target(spark)
    path = str(tmp_path / "ivf_index")
    similarity.write_ivf_index(emb, path, n_cells=8)
    probe = similarity.ivf_probe(spark, path, target, k=5, nprobe=2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert (
        "PartitionFilters" in plan
        and "cell" in plan.split("PartitionFilters")[1][:400]
    )


def test_ivf_lloyd_refine_improves_or_holds_quantization(spark):
    emb = _emb(spark)
    seeds = similarity.seed_centroids(emb, 8)
    refined = similarity.lloyd_refine(spark, emb, seeds, iters=2)
    assert refined.count() == 8

    def mean_best_sim(cent):
        asg = similarity.assign_cells(emb, cent)
        joined = asg.join(
            cent.withColumnRenamed("cid", "cell"), "cell"
        ).select(
            similarity.cosine_sim_col(F.col("embedding"), F.col("cv")).alias("s")
        )
        return joined.agg(F.avg("s")).first()[0]

    # Lloyd iterations cannot make the mean member→centroid similarity
    # meaningfully worse (monotone for L2; near-monotone for cosine here)
    assert mean_best_sim(refined) >= mean_best_sim(seeds) - 1e-6


def test_embedding_near_dup_finds_planted_variants(spark):
    from graphanalytics_spark.functions import dedup

    emb = _emb(spark).filter(F.col("vec_id") < 200)
    # plant variants: tail 8 of 64 dims zeroed → sim ≈ sqrt(56/64) ≈ 0.93
    variants = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.slice(F.transform("embedding", lambda x: x.cast("double")), 1, 56),
            F.array_repeat(F.lit(0.0), 8),
        ).alias("embedding"),
    )
    aug = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    ).unionByName(variants)
    pairs = dedup.embedding_near_dup(spark, aug, threshold=0.85).collect()
    planted = {(r.id_a, r.id_b) for r in pairs if r.id_b == r.id_a + 100000}
    assert len(planted) >= 100  # LSH recall over 200 planted pairs
    for r in pairs:
        assert r.sim >= 0.85


def test_hot_bucket_guard_bounds_pair_blowup(spark):
    """Planted hot bucket: 300 near-identical vectors land in one LSH
    sign-pattern bucket per band. Unguarded that is ~45k quadratic pairs;
    with max_bucket_size the degenerate bucket is dropped entirely (its
    members belong to exact dedup, not pairwise verify)."""
    from graphanalytics_spark.functions import dedup

    base = [1.0] * 16
    rows = [(i, [x + 1e-9 * i for x in base]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    unguarded = dedup.embedding_near_dup(spark, emb, threshold=0.5, n_planes=4)
    assert unguarded.count() == 300 * 299 // 2
    guarded = dedup.embedding_near_dup(
        spark, emb, threshold=0.5, n_planes=4, max_bucket_size=50
    )
    assert guarded.count() == 0


def test_knn_join_hot_bucket_guard(spark):
    from graphanalytics_spark.functions import similarity

    base = [1.0] * 16
    hot = [(i, [x + 1e-9 * i for x in base]) for i in range(200)]
    # a handful of well-spread vectors that keep their own small buckets
    cold = [(1000 + i, [float((i >> b) & 1) * 2 - 1 for b in range(16)]) for i in range(8)]
    emb = spark.createDataFrame(hot + cold, "vec_id long, embedding array<double>")
    guarded = similarity.knn_join_lsh(
        spark, emb, emb, k=3, n_planes=4, exclude_self=True, max_bucket_size=50
    )
    rows = guarded.collect()
    # no pair may originate from the hot bucket's quadratic interior
    assert all(r.lid >= 1000 or r.rid >= 1000 for r in rows) or len(rows) == 0
    # and the guarded plan's output stays far below the quadratic count
    assert len(rows) < 200


def test_embedding_near_dup_empty_input(spark):
    from graphanalytics_spark.functions import dedup

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert dedup.embedding_near_dup(spark, emb).collect() == []
    from graphanalytics_spark.functions import similarity

    assert similarity.knn_join_lsh(spark, emb, emb).collect() == []


def test_multiprobe_is_superset_rerank(spark):
    """Multi-probe candidates are a superset of the plain probe's, and the
    re-rank is exact — so the k-th best sim can only improve (or tie)."""
    emb, target = _emb(spark), _target(spark)
    plain = similarity.ann_lsh_topk(spark, emb, target, k=10).collect()
    mp = similarity.ann_lsh_topk(spark, emb, target, k=10, multiprobe=3).collect()
    assert len(mp) >= len(plain)
    if len(plain) == 10 and len(mp) == 10:
        assert mp[-1].sim >= plain[-1].sim
    # multiprobe=0 path is byte-identical to the plain bucket set
    mp0 = similarity.ann_lsh_topk(spark, emb, target, k=10, multiprobe=0).collect()
    assert [(r.vec_id, r.sim) for r in mp0] == [(r.vec_id, r.sim) for r in plain]


def test_ann_probe_multiprobe_matches_one_shot(spark, tmp_path):
    emb, target = _emb(spark), _target(spark)
    path = str(tmp_path / "ann_index_mp")
    similarity.write_ann_index(emb, path)
    got_probe = [
        (r.vec_id, r.sim)
        for r in similarity.ann_probe(spark, path, target, k=12, multiprobe=2).collect()
    ]
    got_oneshot = [
        (r.vec_id, r.sim)
        for r in similarity.ann_lsh_topk(spark, emb, target, k=12, multiprobe=2).collect()
    ]
    assert got_probe == got_oneshot
    # still a partition-pruned read, just more (band,bucket) pairs
    probe = similarity.ann_probe(spark, path, target, k=5, multiprobe=2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
