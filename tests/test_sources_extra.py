"""Round-trip tests for the remaining format readers/sinks + attribute
communities + salted aggregation."""

import numpy as np
import pyspark.sql.functions as F

from graphanalytics_spark import fixtures, graph
from graphanalytics_spark.operators import components
from graphanalytics_spark.sources import readers, writers


def test_read_dimacs1(spark, tmp_path):
    p = tmp_path / "g.col"
    p.write_text("c clique file\np edge 4 3\ne 1 2\ne 2 3\ne 1 3\n")
    got = sorted((r.src, r.dst) for r in readers.read_dimacs1(spark, str(p)).collect())
    assert got == [(0, 1), (0, 2), (1, 2)]


def test_read_power_grid_kv(spark, tmp_path):
    p = tmp_path / "grid.txt"
    p.write_text("0 1 2.5 110.0\n1 2 1.0 110.0\n2 3 1.0 220.0\n")
    df = readers.read_power_grid_kv(spark, str(p))
    rows = sorted(tuple(r) for r in df.collect())
    assert rows[0] == (0, 1, 2.5, 110.0)
    assert df.columns == ["src", "dst", "weight", "voltage"]


def test_edge_list_binary_roundtrip(spark, tmp_path):
    arr = np.array([[0, 1], [1, 2], [0, 2], [2, 3]], dtype="<i8")
    p = tmp_path / "edges.bin"
    arr.tofile(str(p))
    got = sorted((r.src, r.dst) for r in readers.read_edge_list_binary(spark, str(p)).collect())
    assert got == [(0, 1), (0, 2), (1, 2), (2, 3)]


def test_csr_binary_roundtrip(spark, tmp_path):
    ec = graph.canonicalize(fixtures.edges_df(spark, fixtures.TWO_TRIANGLES_BRIDGE))
    rp, ci = str(tmp_path / "rowPtr.bin"), str(tmp_path / "colIdx.bin")
    writers.write_csr_binary(ec, rp, ci)
    back = graph.canonicalize(readers.read_csr_binary(spark, rp, ci))
    assert sorted((r.src, r.dst) for r in back.collect()) == sorted(
        (min(a, b), max(a, b)) for a, b in fixtures.TWO_TRIANGLES_BRIDGE
    )


def test_attribute_communities(spark):
    """Voltage flood fill: path 0-1-2-3 where {0,1} are 110kV and {2,3}
    are 220kV → two attribute communities despite full connectivity."""
    ec = graph.canonicalize(fixtures.edges_df(spark, [(0, 1), (1, 2), (2, 3)]))
    attrs = spark.createDataFrame(
        [(0, 110.0), (1, 110.0), (2, 220.0), (3, 220.0)], "vid long, voltage double"
    )
    got = {
        r.vid: r.component
        for r in components.attribute_communities(spark, ec, attrs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 2, 3: 2}


def test_salted_sum_matches_plain(spark):
    """Skew path: two-stage salted aggregation must equal the plain
    groupBy sum (weights are exact integers-as-doubles)."""
    e = graph.symmetrize(
        graph.canonicalize(fixtures.edges_df(spark, fixtures.STAR_HUB, weight=2.0))
    )
    plain = {
        r.src: r.s
        for r in e.groupBy("src").agg(F.sum("weight").alias("s")).collect()
    }
    salted = {
        r.src: r.s
        for r in graph.salted_sum(e, "src", "weight", "s", salt_buckets=8).collect()
    }
    assert salted == plain
    assert salted[0] == 40.0  # hub degree 20 × weight 2
