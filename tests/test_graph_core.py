"""Edge-model and graph-utility unit tests (tiny literal oracles,
FIXTURES.md §3)."""

import pyspark.sql.functions as F

from graphanalytics_spark import fixtures, graph


def test_canonicalize_dedup_selfloop(spark):
    e = fixtures.edges_df(spark, [(0, 1), (1, 0), (2, 2), (0, 1), (1, 2)])
    got = sorted(tuple(r) for r in graph.canonicalize(e).collect())
    assert got == [(0, 1, 3.0), (1, 2, 1.0)]


def test_symmetrize_doubles_edges(spark):
    ec = graph.canonicalize(fixtures.edges_df(spark, fixtures.TWO_TRIANGLES_BRIDGE))
    assert graph.symmetrize(ec).count() == 2 * ec.count()


def test_degrees_and_stats(spark):
    ec = graph.canonicalize(fixtures.edges_df(spark, fixtures.TWO_TRIANGLES_BRIDGE))
    d = {r.vid: r.degree for r in graph.degrees(graph.symmetrize(ec)).collect()}
    assert d == {0: 2, 1: 2, 2: 3, 3: 3, 4: 2, 5: 2}
    s = graph.degree_stats(graph.symmetrize(ec)).first()
    assert s.n_vertices == 6 and s.n_edges == 7
    assert s.min_degree == 2 and s.max_degree == 3


def test_isolate_vertices(spark):
    ec = graph.canonicalize(fixtures.edges_df(spark, fixtures.TWO_TRIANGLES_BRIDGE))
    removed = spark.createDataFrame([(2,)], "vid long")
    left = graph.isolate_vertices(ec, removed)
    assert left.filter((F.col("src") == 2) | (F.col("dst") == 2)).count() == 0
    assert left.count() == 4


def test_vertex_following_degree1(spark):
    # path 0-1-2 plus leaf 3 off vertex 1
    ec = graph.canonicalize(fixtures.edges_df(spark, [(0, 1), (1, 2), (1, 3)]))
    reps = {r.vid: r.rep for r in graph.vertex_following(ec).collect()}
    assert reps[0] == 1 and reps[2] == 1 and reps[3] == 1  # leaves merge into 1
    assert reps[1] == 1  # hub stays


def test_subgraph_range_prunes(spark):
    ec = graph.canonicalize(fixtures.edges_df(spark, fixtures.TWO_TRIANGLES_BRIDGE))
    sub = graph.subgraph_range(ec, 0, 3)
    assert sorted((r.src, r.dst) for r in sub.collect()) == [(0, 1), (0, 2), (1, 2)]
