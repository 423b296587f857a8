"""Louvain community detection tests: known-optimum tiny graph + planted
islands recovery (the reference's louvain_test.cpp strategy: assert
modularity of the result, /root/reference/louvainmod/tests/louvain_test.cpp:17-40
with the islands generator islands.h:19-52)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from graphanalytics_spark import fixtures, graph
from graphanalytics_spark.operators import louvain, modularity


def test_louvain_two_triangles(spark):
    ec = graph.canonicalize(fixtures.edges_df(spark, fixtures.TWO_TRIANGLES_BRIDGE))
    mets = []
    comm = louvain.louvain(spark, ec, metrics=mets)
    labels = {r.vid: r.community for r in comm.collect()}
    # optimal split: the two triangles
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5]
    assert labels[0] != labels[3]
    q = modularity.modularity(
        spark, ec, comm.select("vid", F.col("community").alias("label"))
    )
    assert q == pytest.approx(0.35714285714, abs=1e-6)


def _islands(n_islands=6, size=8, p_in=0.9, seed=11):
    """Planted-community generator (islands.h analog): dense intra-island
    edges, one ring of weak bridges between islands."""
    rng = np.random.default_rng(seed)
    edges = []
    for isl in range(n_islands):
        base = isl * size
        for i in range(size):
            for j in range(i + 1, size):
                if rng.random() < p_in:
                    edges.append((base + i, base + j))
        # one bridge to the next island
        edges.append((base, ((isl + 1) % n_islands) * size))
    return edges, n_islands, size


def test_louvain_recovers_islands(spark):
    pairs, n_islands, size = _islands()
    ec = graph.canonicalize(fixtures.edges_df(spark, pairs))
    mets = []
    comm = louvain.louvain(spark, ec, metrics=mets)
    labels = {r.vid: r.community for r in comm.collect()}
    # each island should be a single community
    for isl in range(n_islands):
        base = isl * size
        island_labels = {labels[base + i] for i in range(size)}
        assert len(island_labels) == 1, f"island {isl} split: {island_labels}"
    # and distinct islands get distinct communities (bridges are weak)
    assert len({labels[isl * size] for isl in range(n_islands)}) == n_islands
    # Q improves monotonically across recorded phases up to the best
    assert mets[0]["Q"] > 0.5
