"""Graph file-format readers → canonical edge DataFrame (src, dst, weight).

Spark-first restatements of the reference's parser suite
(/root/reference/grappolo/src/parseInputFiles.cpp, dispatch in
driverForGraphClustering.cpp:76-118): each reader is a ``spark.read``
pipeline — text/csv scan, comment/header filtering, column casts — so
Catalyst handles splitting, predicate pushdown, and parallel ingest of
arbitrarily large files (the reference parsers are single-threaded fscanf
loops; Spark's text source splits by HDFS block).

All readers return directed/raw edges; pipe through
``graph.canonicalize`` for the undirected-once form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _split_cols(df, n):
    parts = F.split(F.trim(F.col("value")), r"\s+")
    # F.get (not getItem): pattern-format lines may omit trailing columns
    # (e.g. weightless MatrixMarket rows) — out-of-bounds must yield NULL,
    # which the callers coalesce to a default, not an ANSI index error.
    return df.select(*[F.get(parts, i).alias(f"c{i}") for i in range(n)])


def read_matrix_market(spark: SparkSession, path: str, one_based: bool = True) -> DataFrame:
    """MatrixMarket coordinate format: '%' comments, first non-comment line
    is the size header, then 'row col [weight]' lines; symmetric files are
    expanded by the caller via graph.symmetrize. Pattern files (no weight)
    get weight 1.0; weights pass through fabs() like the reference's
    symmetric branch (parse_MatrixMarket_Sym_AsGraph)."""
    # Positional header drop (not set-difference: EXCEPT DISTINCT would
    # dedup repeated body lines, losing parallel-edge multiplicity, and
    # limit(1) on a distributed scan is not guaranteed to be line 1).
    # zipWithIndex preserves file order; the header is the non-comment line
    # with the smallest index. One tiny agg job, then a pure filter — no
    # shuffle, duplicates preserved.
    lines = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(lines, "value string, lineno long")
    noncomment = df.filter(
        ~F.col("value").startswith("%") & (F.trim(F.col("value")) != "")
    )
    hdr_idx = noncomment.agg(F.min("lineno")).first()[0]
    body = noncomment.filter(F.col("lineno") > (hdr_idx if hdr_idx is not None else -1))
    c = _split_cols(body, 3)
    off = 1 if one_based else 0
    return c.select(
        (F.col("c0").cast("long") - off).alias("src"),
        (F.col("c1").cast("long") - off).alias("dst"),
        F.abs(F.coalesce(F.col("c2").cast("double"), F.lit(1.0))).alias("weight"),
    )


def read_pajek(spark: SparkSession, path: str) -> DataFrame:
    """Pajek format (*Vertices N / *Edges then 1-based edge lines) — the
    header style of the reference's .mtx test fixtures
    (/root/reference/louvainmod/tests/small.mtx:1-2)."""
    raw = spark.read.text(path)
    body = raw.filter(
        ~F.lower(F.col("value")).startswith("*")
        & ~F.col("value").startswith("%")
        & (F.trim(F.col("value")) != "")
    )
    c = _split_cols(body, 3)
    return c.select(
        (F.col("c0").cast("long") - 1).alias("src"),
        (F.col("c1").cast("long") - 1).alias("dst"),
        F.abs(F.coalesce(F.col("c2").cast("double"), F.lit(1.0))).alias("weight"),
    )


def read_snap(spark: SparkSession, path: str) -> DataFrame:
    """SNAP edge list: '#' comments, 'src dst' per line, 0-based."""
    raw = spark.read.text(path).filter(
        ~F.col("value").startswith("#") & (F.trim(F.col("value")) != "")
    )
    c = _split_cols(raw, 2)
    return c.select(
        F.col("c0").cast("long").alias("src"),
        F.col("c1").cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )


def read_edge_list(
    spark: SparkSession, path: str, weighted: bool = True, sep: str = r"\s+"
) -> DataFrame:
    """Plain (possibly doubled) edge list 'src dst [w]'
    (parse_DoulbedEdgeList analog)."""
    raw = spark.read.text(path).filter(F.trim(F.col("value")) != "")
    c = _split_cols(raw, 3 if weighted else 2)
    w = (
        F.abs(F.coalesce(F.col("c2").cast("double"), F.lit(1.0)))
        if weighted
        else F.lit(1.0)
    )
    return c.select(
        F.col("c0").cast("long").alias("src"),
        F.col("c1").cast("long").alias("dst"),
        w.alias("weight"),
    )


def read_dimacs9(spark: SparkSession, path: str) -> DataFrame:
    """DIMACS-9 ('a src dst weight' arc lines; 'c' comments, 'p' problem
    line) — parse_Dimacs9FormatDirectedNewD analog; 1-based ids."""
    raw = spark.read.text(path).filter(F.col("value").startswith("a "))
    c = _split_cols(raw, 4)
    return c.select(
        (F.col("c1").cast("long") - 1).alias("src"),
        (F.col("c2").cast("long") - 1).alias("dst"),
        F.abs(F.coalesce(F.col("c3").cast("double"), F.lit(1.0))).alias("weight"),
    )


def read_metis(spark: SparkSession, path: str) -> DataFrame:
    """Metis/DIMACS#10 adjacency format: line i (1-based, after the header)
    lists the neighbors of vertex i. Needs line numbers → zipWithIndex via
    a small RDD step (inherently line-ordered format), then posexplode of
    the adjacency tokens — the only reader that can't be purely declarative.
    """
    lines = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(lines, "value string, lineno long")
    body = df.filter(
        (F.col("lineno") > 0)
        & ~F.col("value").startswith("%")
        & (F.trim(F.col("value")) != "")
    )
    toks = F.split(F.trim(F.col("value")), r"\s+")
    return (
        body.select(
            (F.col("lineno") - 1).alias("src"), F.explode(toks).alias("dst_s")
        )
        .filter(F.col("dst_s") != "")
        .select(
            "src",
            (F.col("dst_s").cast("long") - 1).alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )


def read_csr_binary(
    spark: SparkSession,
    row_ptr_path: str,
    col_idx_path: str,
    chunk_vertices: int = 1 << 20,
) -> DataFrame:
    """Raw little-endian int32 rowPtr.bin/colIdx.bin CSR pair — the MIS
    demo's input format (/root/reference/mis/examples/python/misdemo.py:24).

    Distributed decode (no whole-file driver read): the driver touches
    only file *metadata* (sizes) to plan ``chunk_vertices``-sized vertex
    ranges; each executor task then seeks into its rowPtr slice (with a
    one-entry overlap for the closing offset) and reads exactly the
    colIdx byte range [rp[lo]*4, rp[hi]*4) that slice addresses — the
    rowPtr prefix IS the chunk index, so tasks never overlap and never
    scan. Requires the files on a filesystem every executor can open
    (local FS in local mode, NFS/object-store mount on a cluster) — the
    same visibility contract the distributed CSR *writer* already uses
    for its chunk staging (writers.py:write_csr_binary)."""
    import os

    n_v = os.path.getsize(row_ptr_path) // 4 - 1
    if n_v <= 0:
        return spark.createDataFrame([], "src long, dst long, weight double")
    bounds = [
        (lo, min(lo + chunk_vertices, n_v)) for lo in range(0, n_v, chunk_vertices)
    ]
    cdf = spark.createDataFrame(bounds, "lo long, hi long").repartition(len(bounds))

    def decode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                lo, hi = int(lo), int(hi)
                with open(row_ptr_path, "rb") as f:
                    f.seek(lo * 4)
                    rp = np.frombuffer(
                        f.read((hi - lo + 1) * 4), dtype="<i4"
                    ).astype(np.int64)
                e0, e1 = int(rp[0]), int(rp[-1])
                with open(col_idx_path, "rb") as f:
                    f.seek(e0 * 4)
                    ci = np.frombuffer(f.read((e1 - e0) * 4), dtype="<i4").astype(
                        np.int64
                    )
                src = np.repeat(np.arange(lo, hi, dtype=np.int64), np.diff(rp))
                yield pd.DataFrame(
                    {"src": src, "dst": ci, "weight": np.ones(len(ci))}
                )

    return cdf.mapInPandas(decode, "src long, dst long, weight double")


def read_dimacs1(spark: SparkSession, path: str) -> DataFrame:
    """DIMACS-1 / clique format ('p edge N M' header, 'e u v' edge lines,
    'c' comments) — parse_Dimacs1Format analog; 1-based ids, weight 1."""
    raw = spark.read.text(path).filter(F.col("value").startswith("e "))
    c = _split_cols(raw, 3)
    return c.select(
        (F.col("c1").cast("long") - 1).alias("src"),
        (F.col("c2").cast("long") - 1).alias("dst"),
        F.lit(1.0).alias("weight"),
    )


def read_power_grid_kv(spark: SparkSession, path: str) -> DataFrame:
    """4-column power-grid KV format 'src dst weight voltage'
    (parse_MultiKvPowerGridGraph analog,
    /root/reference/grappolo — defs.h:169): returns edges plus the
    node-attribute column the reference uses for voltage-based community
    grouping (buildCommunityBasedOnVoltages)."""
    raw = spark.read.text(path).filter(
        ~F.col("value").startswith("#") & (F.trim(F.col("value")) != "")
    )
    c = _split_cols(raw, 4)
    return c.select(
        F.col("c0").cast("long").alias("src"),
        F.col("c1").cast("long").alias("dst"),
        F.abs(F.coalesce(F.col("c2").cast("double"), F.lit(1.0))).alias("weight"),
        F.col("c3").cast("double").alias("voltage"),
    )


def read_edge_list_binary(
    spark: SparkSession, path: str, chunk_edges: int = 1 << 22
) -> DataFrame:
    """Fixed-width binary edge records (parse_EdgeListBinary analog):
    little-endian int64 (src, dst) pairs, 16 bytes per record.

    Fixed-width records make the file trivially splittable at any record
    boundary — the driver plans byte-range chunks from the file size
    alone (metadata, no read) and each executor task seeks + decodes its
    own slice. Same executor-visible-filesystem contract as
    ``read_csr_binary``."""
    import os

    n_e = os.path.getsize(path) // 16
    if n_e == 0:
        return spark.createDataFrame([], "src long, dst long, weight double")
    bounds = [(lo, min(lo + chunk_edges, n_e)) for lo in range(0, n_e, chunk_edges)]
    cdf = spark.createDataFrame(bounds, "lo long, hi long").repartition(len(bounds))

    def decode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                lo, hi = int(lo), int(hi)
                with open(path, "rb") as f:
                    f.seek(lo * 16)
                    arr = np.frombuffer(
                        f.read((hi - lo) * 16), dtype="<i8"
                    ).reshape(-1, 2)
                yield pd.DataFrame(
                    {
                        "src": arr[:, 0],
                        "dst": arr[:, 1],
                        "weight": np.ones(len(arr)),
                    }
                )

    return cdf.mapInPandas(decode, "src long, dst long, weight double")
