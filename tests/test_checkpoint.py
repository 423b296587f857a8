"""Checkpoint/lineage/resume tests — the SaveGLVBin/LoadGLVBin analog
(BASELINE.md: mid-run restart reproduces identical final output)."""

import numpy as np

from graphanalytics_spark import fixtures, graph
from graphanalytics_spark.operators import pagerank
from graphanalytics_spark.plans.checkpoint import CheckpointManager


def _graph(spark):
    # irregular: ring + chords on every third vertex + a hub, so PageRank
    # does NOT converge immediately (a regular graph is stationary at init)
    edges, n = [], 40
    for i in range(n):
        edges.append((i, (i + 1) % n))
        if i % 3 == 0:
            edges.append((i, (i + 7) % n))
        if i % 5 == 0:
            edges.append((i, 0))
    return graph.symmetrize(
        graph.canonicalize(fixtures.edges_df(spark, edges))
    )


def test_checkpoint_lineage_written(spark, tmp_path):
    sym = _graph(spark)
    cm = CheckpointManager(spark, str(tmp_path / "ckpt"), every=2)
    pagerank.pagerank(spark, sym, tol=1e-6, max_iter=6, checkpointer=cm)
    snaps = cm.snapshots()
    assert len(snaps) >= 2
    for s in snaps:
        assert s["complete"] and s["n_rows"] == 40
        assert "metric" in s and s["metric"] >= 0
        assert sum(s["rows_per_partition"].values()) == 40


def test_cc_kill_and_resume_identical(spark, tmp_path):
    from graphanalytics_spark.operators import components

    edges = [(i, (i + 1)) for i in range(0, 60, 2)]  # 30 tiny chains... no:
    # build two long paths so CC needs several iterations
    edges = [(i, i + 1) for i in range(0, 29)] + [(i, i + 1) for i in range(30, 59)]
    ec = fixtures.edges_df(spark, edges)
    full = {
        r.vid: r.component
        for r in components.connected_components(spark, ec).collect()
    }
    cm = CheckpointManager(spark, str(tmp_path / "cc_ckpt"), every=1)
    components.connected_components(spark, ec, max_iter=2, checkpointer=cm)
    state, lineage = cm.load()
    assert lineage["iteration"] == 2
    resumed = {
        r.vid: r.component
        for r in components.connected_components(
            spark, ec, initial_state=state
        ).collect()
    }
    assert resumed == full


def test_lpa_kill_and_resume_identical(spark, tmp_path):
    from graphanalytics_spark.operators import labelprop

    sym_src = _graph(spark)  # symmetrized; LPA wants canonical — rebuild
    edges = [(i, (i + 1) % 40) for i in range(40)] + [
        (i, (i + 7) % 40) for i in range(0, 40, 3)
    ]
    ec = fixtures.edges_df(spark, edges)
    full = {
        r.vid: r.label
        for r in labelprop.label_propagation(spark, ec, max_iter=12).collect()
    }
    cm = CheckpointManager(spark, str(tmp_path / "lpa_ckpt"), every=1)
    labelprop.label_propagation(spark, ec, max_iter=3, checkpointer=cm)
    state, lineage = cm.load()
    assert lineage["iteration"] == 3
    resumed = {
        r.vid: r.label
        for r in labelprop.label_propagation(
            spark, ec, max_iter=9, initial_state=state
        ).collect()
    }
    assert resumed == full


def test_kill_and_resume_identical(spark, tmp_path):
    """Run to convergence; run again but 'killed' after 4 iterations, then
    resume from the latest snapshot — final ranks must match."""
    sym = _graph(spark)
    full = pagerank.pagerank(spark, sym, tol=1e-9, max_iter=40)
    fd = {r.vid: r["rank"] for r in full.collect()}

    cm = CheckpointManager(spark, str(tmp_path / "ckpt2"), every=2)
    pagerank.pagerank(spark, sym, tol=1e-9, max_iter=4, checkpointer=cm)

    state, lineage = cm.load()
    assert lineage["iteration"] == 4
    resumed = pagerank.pagerank(
        spark, sym, tol=1e-9, max_iter=40, initial_state=state
    )
    rd = {r.vid: r["rank"] for r in resumed.collect()}
    assert np.allclose(
        [fd[i] for i in sorted(fd)], [rd[i] for i in sorted(rd)], atol=1e-8
    )
