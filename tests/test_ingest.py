"""Ingest-path tests: sha256 invariant (BASELINE.json:input_hint), link
extraction, planted graph structure recovery."""

import pyspark.sql.functions as F
import pytest

from graphanalytics_spark import fixtures, graph, ingest
from graphanalytics_spark.operators import components, triangles


@pytest.fixture(scope="module")
def repos_pdf():
    return fixtures.generate_repos_pdf(
        n_repos=40, files_per_repo=8, n_clusters=2, clique_size=5
    )


@pytest.fixture(scope="module")
def repos(spark, repos_pdf):
    return spark.createDataFrame(repos_pdf).cache()


def test_sha256_invariant(spark, repos, repos_pdf):
    got = ingest.with_sha256(repos).select("repo", "path", "content_sha256").toPandas()
    expected = repos_pdf.assign(exp=fixtures.expected_sha256(repos_pdf))
    merged = expected.merge(got, on=["repo", "path"])
    assert len(merged) == len(repos_pdf)
    assert (merged["exp"] == merged["content_sha256"]).all()


def test_extract_links_vectorized(spark, repos):
    links = ingest.extract_links(repos)
    assert links.count() > 0
    # no self-links, all targets are repo names
    assert links.filter(F.col("src_repo") == F.col("dst_repo")).count() == 0
    assert links.filter(~F.col("dst_repo").rlike(r"^repo\d{5}$")).count() == 0


def test_planted_components(spark, repos):
    edges, dim = ingest.build_edges(repos)
    ec = graph.canonicalize(edges)
    comp = components.connected_components(spark, ec)
    # 2 planted clusters; the isolated repo has no edges at all
    assert comp.select("component").distinct().count() == 2
    n_in_graph = graph.vertices(ec).count()
    assert n_in_graph == dim.count() - 1  # isolated repo absent


def test_planted_clique_triangles(spark, repos):
    edges, _ = ingest.build_edges(repos)
    ec = graph.canonicalize(edges)
    tri = triangles.triangle_count(spark, ec).first()[0]
    assert tri >= 10  # C(5,3) from the planted 5-clique


def test_vertex_dimension_dense(spark, repos):
    _, dim = ingest.build_edges(repos)
    ids = sorted(r.vid for r in dim.collect())
    assert ids == list(range(len(ids)))
