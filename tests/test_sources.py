"""Reader/writer round-trip tests for the graph file formats."""

import numpy as np
import pytest

from graphanalytics_spark import graph
from graphanalytics_spark.sources import readers, writers

EDGES = [(0, 1, 2.0), (1, 2, 1.0), (0, 2, 1.5), (2, 3, 1.0)]


def test_read_matrix_market(spark, tmp_path):
    p = tmp_path / "g.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "% comment\n"
        "4 4 4\n"
        "1 2 2.0\n2 3 1.0\n1 3 -1.5\n3 4 1.0\n"
    )
    got = sorted(tuple(r) for r in readers.read_matrix_market(spark, str(p)).collect())
    assert got == [(0, 1, 2.0), (0, 2, 1.5), (1, 2, 1.0), (2, 3, 1.0)]


def test_read_pajek(spark, tmp_path):
    p = tmp_path / "g.net"
    p.write_text("*Vertices 4\n*Edges\n1 2 2.0\n2 3 1.0\n1 3 1.5\n3 4 1.0\n")
    got = sorted(tuple(r) for r in readers.read_pajek(spark, str(p)).collect())
    assert got == [(0, 1, 2.0), (0, 2, 1.5), (1, 2, 1.0), (2, 3, 1.0)]


def test_read_snap(spark, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("# SNAP graph\n0\t1\n1\t2\n0\t2\n2\t3\n")
    got = readers.read_snap(spark, str(p))
    assert got.count() == 4 and got.first().weight == 1.0


def test_read_dimacs9(spark, tmp_path):
    p = tmp_path / "g.gr"
    p.write_text("c comment\np sp 4 3\na 1 2 5\na 2 3 7\na 1 3 2\n")
    got = sorted(tuple(r) for r in readers.read_dimacs9(spark, str(p)).collect())
    assert got == [(0, 1, 5.0), (0, 2, 2.0), (1, 2, 7.0)]


def test_read_metis(spark, tmp_path):
    p = tmp_path / "g.metis"
    # 4 vertices, 4 edges; line i = neighbors of vertex i (1-based)
    p.write_text("4 4\n2 3\n1 3\n1 2 4\n3\n")
    got = readers.read_metis(spark, str(p))
    canon = graph.canonicalize(got)
    assert sorted((r.src, r.dst) for r in canon.collect()) == [
        (0, 1), (0, 2), (1, 2), (2, 3),
    ]


def test_read_csr_binary(spark, tmp_path):
    rp = np.array([0, 2, 3, 4], dtype="<i4")
    ci = np.array([1, 2, 2, 0], dtype="<i4")
    (tmp_path / "rowPtr.bin").write_bytes(rp.tobytes())
    (tmp_path / "colIdx.bin").write_bytes(ci.tobytes())
    got = readers.read_csr_binary(
        spark, str(tmp_path / "rowPtr.bin"), str(tmp_path / "colIdx.bin")
    )
    assert sorted((r.src, r.dst) for r in got.collect()) == [
        (0, 1), (0, 2), (1, 2), (2, 0),
    ]


@pytest.fixture()
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long, weight double")


def test_write_read_edge_list_roundtrip(spark, tmp_path, edges_df):
    out = str(tmp_path / "out_el")
    writers.write_edge_list(edges_df, out)
    back = readers.read_edge_list(spark, out)
    assert sorted(tuple(r) for r in back.collect()) == sorted(EDGES)


def test_write_read_pajek_roundtrip(spark, tmp_path, edges_df):
    out = str(tmp_path / "out_pajek")
    writers.write_pajek(edges_df, out)
    back = readers.read_pajek(spark, out)
    assert sorted(tuple(r) for r in back.collect()) == sorted(EDGES)


def test_write_metis(spark, tmp_path, edges_df):
    out = str(tmp_path / "out_metis")
    writers.write_metis(edges_df, out)
    back = readers.read_metis(spark, out)
    assert sorted((r.src, r.dst) for r in graph.canonicalize(back).collect()) == [
        (0, 1), (0, 2), (1, 2), (2, 3),
    ]


def test_write_vertex_state_parquet(spark, tmp_path):
    st = spark.createDataFrame([(0, 1), (1, 1)], "vid long, label long")
    out = str(tmp_path / "state")
    writers.write_vertex_state(st, out)
    assert spark.read.parquet(out).count() == 2


def test_read_csr_binary_chunked(spark, tmp_path):
    """Distributed decode path: tiny chunk size forces multiple range
    tasks; union of chunk outputs must equal the whole-file decode."""
    rng = np.random.default_rng(7)
    deg = rng.integers(0, 4, size=9)
    rp = np.concatenate([[0], np.cumsum(deg)]).astype("<i4")
    ci = rng.integers(0, 9, size=int(rp[-1])).astype("<i4")
    (tmp_path / "rp.bin").write_bytes(rp.tobytes())
    (tmp_path / "ci.bin").write_bytes(ci.tobytes())
    got = readers.read_csr_binary(
        spark, str(tmp_path / "rp.bin"), str(tmp_path / "ci.bin"), chunk_vertices=2
    )
    expect = sorted(
        (int(s), int(d))
        for s in range(9)
        for d in ci[rp[s] : rp[s + 1]].tolist()
        for d in [d]
    )
    assert sorted((r.src, r.dst) for r in got.collect()) == expect


def test_read_edge_list_binary_chunked(spark, tmp_path):
    arr = np.array([[0, 1], [1, 2], [2, 3], [3, 4], [4, 0]], dtype="<i8")
    (tmp_path / "e.bin").write_bytes(arr.tobytes())
    got = readers.read_edge_list_binary(spark, str(tmp_path / "e.bin"), chunk_edges=2)
    assert sorted((r.src, r.dst) for r in got.collect()) == [
        (0, 1), (1, 2), (2, 3), (3, 4), (4, 0),
    ]


def test_write_metis_multichunk_with_gap_vertex(spark, tmp_path):
    """>1 write task + a gap vertex (id 2 has no edges): the chunked
    writer must keep line alignment by emitting empty lines for gaps."""
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (3, 4, 1.0), (4, 5, 1.0), (0, 5, 1.0)],
        "src long, dst long, weight double",
    )
    out = str(tmp_path / "gap_metis")
    writers.write_metis(edges, out, chunk_partitions=3)
    txt = (tmp_path / "gap_metis" / "part-00000").read_text().splitlines()
    assert txt[0] == "6 4"
    assert len(txt) == 7 and txt[3] == ""  # vertex 2's empty line
    back = readers.read_metis(spark, out)
    assert sorted((r.src, r.dst) for r in graph.canonicalize(back).collect()) == [
        (0, 1), (0, 5), (3, 4), (4, 5),
    ]
