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


def test_vertex_following_isolated_pair(spark):
    """Both endpoints of an isolated edge have degree 1: the smaller id
    stays, the larger merges — never a 2-cycle of mutual merges."""
    ec = graph.canonicalize(fixtures.edges_df(spark, [(7, 9), (0, 1), (1, 2)]))
    reps = {r.vid: r.rep for r in graph.vertex_following(ec).collect()}
    assert reps[7] == 7 and reps[9] == 7


def test_vertex_following_prepass_louvain_equivalence(spark):
    """The reference applies vertexFollowing before Louvain and composes
    back (grappolo vertexFollowing.cpp:46-88): communities over the
    original graph must be the same partition with or without the
    pre-pass on a pendant-heavy fixture."""
    from graphanalytics_spark.operators import louvain as louvain_mod

    # two triangles + bridge, with a pendant chain hanging off each side
    pairs = list(fixtures.TWO_TRIANGLES_BRIDGE) + [(0, 6), (6, 7), (5, 8)]
    ec = graph.canonicalize(fixtures.edges_df(spark, pairs))

    from graphanalytics_spark.operators.modularity import modularity

    plain = louvain_mod.louvain(spark, ec, seed=7)
    collapsed, v2c = graph.vertex_following_contract(spark, ec)
    comm_c = louvain_mod.louvain(spark, collapsed, seed=7)
    composed = graph.compose_through(
        v2c, comm_c.select("vid", F.col("community")), "community"
    )

    labels = {r.vid: r.community for r in composed.collect()}
    # every original vertex is mapped, pendants sit with their reps
    assert set(labels) == set(range(9))
    assert labels[7] == labels[6] and labels[8] == labels[5]
    # the triangles stay separate communities
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5]
    assert labels[0] != labels[3]
    # Louvain is a heuristic: with/without the pre-pass may land in
    # different local optima (observed: 0.415 plain vs 0.395 composed on
    # this fixture — the pre-pass forces the {pendant-chain} supervertex to
    # choose between merging or not under different intermediate totals).
    # The guaranteed invariants are composition correctness (above) and
    # that the composed partition is still a high-quality one.
    q_plain = modularity(spark, ec, plain.select("vid", F.col("community").alias("label")))
    q_comp = modularity(spark, ec, composed.select("vid", F.col("community").alias("label")))
    assert q_plain > 0.3 and q_comp > 0.3
    # the collapsed graph is genuinely smaller (pendants folded)
    n_orig = ec.select("src").union(ec.select("dst")).distinct().count()
    n_coll = collapsed.select("src").union(collapsed.select("dst")).distinct().count()
    assert n_coll < n_orig


def test_bipartite_project_and_stats(spark):
    """One-mode projection (graphNew.sVertices analog): s-vertices share an
    edge iff they share a t-neighbor, weight = shared count."""
    st = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (1, 11), (2, 11), (4, 12)],
        "s long, t long",
    )
    got = sorted(tuple(r) for r in graph.bipartite_project(st).collect())
    assert got == [(1, 2, 2.0), (1, 3, 1.0), (2, 3, 1.0)]
    stats = graph.bipartite_stats(st).first()
    assert (stats.n_s, stats.n_t, stats.n_edges) == (4, 3, 6)
    # min_weight keeps only the doubly-shared pair
    strong = graph.bipartite_project(st, min_weight=2).collect()
    assert [(r.src, r.dst, r.weight) for r in strong] == [(1, 2, 2.0)]


def test_bipartite_project_hub_guard(spark):
    """A ubiquitous t (shared by all 50 s) would emit 1225 pairs; with
    max_t_degree it is dropped and only the discriminative t's project."""
    rows = [(s, 999) for s in range(50)] + [(0, 1), (1, 1)]
    st = spark.createDataFrame(rows, "s long, t long")
    unguarded = graph.bipartite_project(st)
    assert unguarded.count() == 50 * 49 // 2  # pair (0,1) merges into hub pairs
    guarded = graph.bipartite_project(st, max_t_degree=10)
    assert [(r.src, r.dst) for r in guarded.collect()] == [(0, 1)]


def test_copurchase_is_bipartite_projection(spark):
    """copurchase_edges == bipartite_project of (part, order)."""
    li = spark.createDataFrame(
        [(100, 1), (100, 2), (100, 2), (101, 2), (101, 3)],
        "l_orderkey long, l_partkey long",
    )
    a = sorted(tuple(r) for r in graph.copurchase_edges(li).collect())
    b = sorted(
        tuple(r)
        for r in graph.bipartite_project(
            li.select(F.col("l_partkey").alias("s"), F.col("l_orderkey").alias("t"))
        ).collect()
    )
    assert a == b and (1, 2, 2.0) in a  # part 2 listed twice in order 100


def test_similar_vertices_tiny_oracle(spark):
    """Hand-computed Jaccard/cosine over neighbor sets (the sparse half of
    the reference's general-similarity kernel). Graph:
    0-1, 0-2, 1-2, 1-3, 2-3, 3-4; N(0)={1,2} N(1)={0,2,3} N(2)={0,1,3}
    N(3)={1,2,4} N(4)={3}."""
    ec = graph.canonicalize(
        fixtures.edges_df(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4)])
    )
    jac = {
        (r.src, r.dst): (r.common, r.sim)
        for r in graph.similar_vertices(ec, k=10, metric="jaccard").collect()
        if r.src < r.dst
    }
    assert jac[(0, 3)] == (2, round(2 / 3, 8))   # share {1,2}
    assert jac[(1, 2)] == (2, 0.5)               # share {0,3}
    assert jac[(0, 1)] == (1, 0.25)
    assert jac[(1, 4)] == (1, round(1 / 3, 8))   # share {3}
    assert (3, 4) not in jac                     # adjacent but no common nbr
    cos = {
        (r.src, r.dst): r.sim
        for r in graph.similar_vertices(ec, k=10, metric="cosine").collect()
        if r.src < r.dst
    }
    assert cos[(0, 3)] == round(2 / (2 * 3) ** 0.5, 8)
    assert cos[(1, 2)] == round(2 / 3, 8)


def test_similar_vertices_weighted_cosine(spark):
    """Weighted sparse-row cosine: adjacency rows with edge weights as
    vector components. Edges (0,1,w2) (0,2,w1) (1,2,w1) (1,3,w3)
    (2,3,w1) (3,4,w1): ‖row0‖²=5, ‖row1‖²=14, ‖row2‖²=3, ‖row3‖²=11."""
    ec = graph.canonicalize(
        spark.createDataFrame(
            [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0), (1, 3, 3.0),
             (2, 3, 1.0), (3, 4, 1.0)],
            "src long, dst long, weight double",
        )
    )
    got = {
        (r.src, r.dst): (r.common, r.sim)
        for r in graph.similar_vertices(
            ec, k=10, metric="weighted_cosine"
        ).collect()
        if r.src < r.dst
    }
    # (0,3) share {1,2}: dot = 2*3 + 1*1 = 7
    assert got[(0, 3)] == (2, round(7 / (5 * 11) ** 0.5, 8))
    # (1,2) share {0,3}: dot = 2*1 + 3*1 = 5
    assert got[(1, 2)] == (2, round(5 / (14 * 3) ** 0.5, 8))


def test_similar_vertices_hub_guard_and_topk(spark):
    """A degree-50 hub makes every pendant pair a candidate (1225 pairs);
    max_degree drops the hub from the JOIN SIDE only, so capped output
    keeps just the discriminative shared neighbor while degrees (the
    denominators) stay exact."""
    rows = [(i, 999) for i in range(50)] + [(0, 100), (1, 100)]
    ec = graph.canonicalize(fixtures.edges_df(spark, rows))
    un = graph.similar_vertices(ec, k=100, metric="jaccard")
    # 1225 hub-induced pairs + (100,999) sharing {0,1}; both directions
    assert un.count() == 2 * (50 * 49 // 2 + 1)
    # per-vertex truncation: each of 0..49 has 49 candidates, keeps k
    k3 = graph.similar_vertices(ec, k=3, metric="jaccard")
    per_src = {r.src: r.cnt for r in k3.groupBy("src").agg(
        F.count("*").alias("cnt")).collect()}
    assert per_src[0] == 3 and per_src[25] == 3
    capped = graph.similar_vertices(ec, k=100, metric="jaccard", max_degree=10)
    got = {(r.src, r.dst): (r.common, r.sim) for r in capped.collect()}
    # hub paths gone: only (0,1) via 100 and (100,999) via {0,1} remain
    assert set(got) == {(0, 1), (1, 0), (100, 999), (999, 100)}
    # exact uncapped degrees in the denominator: deg(0)=deg(1)=2, common
    # capped to the surviving path -> 1/(2+2-1)
    assert got[(0, 1)] == (1, round(1 / 3, 8))
    assert got[(100, 999)] == (2, round(2 / (2 + 50 - 2), 8))


def test_similar_vertices_bad_metric(spark):
    ec = graph.canonicalize(fixtures.edges_df(spark, [(0, 1)]))
    try:
        graph.similar_vertices(ec, metric="euclid")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
