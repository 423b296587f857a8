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
