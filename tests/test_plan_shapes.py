"""Physical-plan regression tests: the scale-design claims of
BENCH/PLANS.md are asserted, not just documented — column pruning reaches
the scan, top-K compiles to TakeOrderedAndProject, and the flagship graph
derivation does partial aggregation before its exchange."""

import pyspark.sql.functions as F

from graphanalytics_spark import graph
from graphanalytics_spark.functions import similarity

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_copurchase_scan_is_column_pruned(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plan = _plan(graph.copurchase_edges(li))
    # only the join/group keys are read from an 11-column table
    assert "l_orderkey" in plan and "l_partkey" in plan
    for unused in ("l_extendedprice", "l_shipdate", "l_comment", "l_quantity"):
        assert unused not in plan, f"column {unused} not pruned from scan"


def test_cosine_topk_uses_take_ordered(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(similarity.cosine_topk(spark, emb, [0.5] * 64, k=10))
    assert "TakeOrderedAndProject" in plan
    # no exchange: top-K merges per-partition heaps on the driver
    assert "Exchange" not in plan


def test_filter_pushdown_reaches_parquet(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    plan = _plan(df)
    assert "PushedFilters" in plan and "GreaterThan(l_quantity" in plan


def test_partial_aggregation_before_exchange(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plan = _plan(graph.copurchase_edges(li))
    # partial + final hash aggregate: map-side combine absorbs hub skew
    first_agg = plan.index("HashAggregate")
    assert "HashAggregate" in plan[first_agg + 10 :]


def test_fuzzy_join_has_no_cartesian_product(spark):
    from graphanalytics_spark.functions import fuzzymatch

    left = spark.createDataFrame([(1, "abcdef")], "id long, text string")
    right = spark.createDataFrame([(2, "abcdeg")], "id long, text string")
    plan = _plan(fuzzymatch.fuzzy_join(spark, left, right, threshold=80.0))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_join_lsh_is_bucket_equijoin(spark):
    from graphanalytics_spark.functions import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(similarity.knn_join_lsh(spark, emb, emb, k=3, exclude_self=True))
    # candidates come from an equi-join on (band, bucket) — any hash or
    # sort-merge strategy is fine, but never a cross product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_edges_aggregate_and_join_exchange_free(spark, tmp_path):
    """A bucketed-on-src edge table must feed per-src aggregation and a
    src-keyed self-join WITHOUT any Exchange: the co-location contract
    that makes iterative gathers shuffle-only-the-state at cluster scale."""
    from graphanalytics_spark import fixtures, graph
    from graphanalytics_spark.sources import writers

    edges = graph.canonicalize(
        fixtures.edges_df(spark, [(i, (i * 7 + 1) % 50) for i in range(200)])
    )
    writers.write_bucketed_edges(edges, "edges_bucketed_test", buckets=8)
    try:
        t = writers.read_bucketed_edges(spark, "edges_bucketed_test")
        agg = t.groupBy("src").agg(F.sum("weight").alias("w"))
        agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # force the shuffle-join path (a tiny test table would otherwise be
        # broadcast, which bypasses bucketing entirely): a bucketed merge
        # join must read both sides co-located with NO Exchange
        j = t.alias("a").hint("merge").join(t.alias("b").hint("merge"), "src")
        j.count()
        jplan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in jplan, jplan
        assert "Bucketed: true" in jplan
    finally:
        spark.sql("DROP TABLE IF EXISTS edges_bucketed_test")


def test_bipartite_project_guard_is_semijoin(spark):
    """The max_t_degree hub guard must compile to a semi-join filter on t,
    never a cartesian shape; the projection itself is an equi-join on t."""
    st = spark.createDataFrame(
        [(s, s % 7) for s in range(100)], "s long, t long"
    )
    plan = _plan(graph.bipartite_project(st, max_t_degree=10))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
    # partial+final agg pair: map-side combine before the pair exchange
    first_agg = plan.index("HashAggregate")
    assert "HashAggregate" in plan[first_agg + 10 :]


def test_nhop_pairs_is_equijoin(spark):
    from graphanalytics_spark import fixtures
    from graphanalytics_spark.operators import nhop

    ec = graph.canonicalize(
        fixtures.edges_df(spark, [(i, i + 1) for i in range(6)])
    )
    pairs = spark.createDataFrame([(0, 2), (0, 5)], "src long, dst long")
    plan = _plan(nhop.n_hop_pairs(spark, ec, pairs, hops=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_similar_vertices_is_bucket_equijoin(spark):
    """The common-neighbor generator is a neighbor-keyed equi-join (never a
    cross product) and the hub cap compiles to a semi-join, exactly like
    bipartite_project's guard."""
    ec = graph.canonicalize(
        spark.createDataFrame([(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double")
    )
    plan = _plan(graph.similar_vertices(ec, k=3, max_degree=10))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan  # hub cap applied join-side
    # the cap is ON BY DEFAULT (r4 verdict #4): calling with no max_degree
    # must still compile the semi-join guard
    default_plan = _plan(graph.similar_vertices(ec, k=3))
    assert "LeftSemi" in default_plan
    # and only an explicit None disables it
    uncapped_plan = _plan(graph.similar_vertices(ec, k=3, max_degree=None))
    assert "LeftSemi" not in uncapped_plan


def test_ktruss_round_is_equijoin_only(spark):
    """One support-peel round = a<b<c triangle equi-joins + hash agg +
    left join filter — never a cartesian shape."""
    from graphanalytics_spark.operators.ktruss import ktruss

    ec = graph.canonicalize(
        spark.createDataFrame(
            [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 1.0)],
            "src long, dst long, weight double",
        )
    )
    plan = _plan(ktruss(spark, ec, k=3, max_rounds=1))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kcore_round_is_semijoin_pair(spark):
    """One peel round = degree hash-agg + two left-semi filters on the
    edge set — never a cartesian shape."""
    from graphanalytics_spark.operators.kcore import kcore

    ec = graph.canonicalize(
        spark.createDataFrame(
            [(i, i + 1, 1.0) for i in range(8)] + [(0, 2, 1.0), (1, 3, 1.0)],
            "src long, dst long, weight double",
        )
    )
    plan = _plan(kcore(spark, ec, k=2, max_rounds=1))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_random_walk_step_is_two_column_equijoin(spark):
    """The neighbor probe joins on (vertex, idx) — one probe per walk,
    no candidate amplification, no cartesian shape, no Python."""
    from graphanalytics_spark.operators import walks

    ec = graph.canonicalize(
        spark.createDataFrame(
            [(i, (i + 1) % 6, 1.0) for i in range(6)],
            "src long, dst long, weight double",
        )
    )
    plan = _plan(walks.random_walks(spark, ec, walk_length=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan


def test_assortativity_single_aggregation(spark):
    """Five DECIMAL moment sums travel through ONE aggregation pair —
    no per-moment re-scan of the edge table."""
    ec = graph.canonicalize(
        spark.createDataFrame(
            [(i, i + 1, 1.0) for i in range(10)],
            "src long, dst long, weight double",
        )
    )
    plan = _plan(graph.degree_assortativity(graph.symmetrize(ec)))
    assert "CartesianProduct" not in plan
    # one partial+final HashAggregate pair carrying all five sums
    assert plan.count("sum(") >= 5
