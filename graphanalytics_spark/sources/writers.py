"""Graph sinks: result and graph re-export writers (SURVEY.md §2.1).

The reference writes 'vertexId  communityId' text results
(host_writeOut, /root/reference/louvainmod — xilinxlouvainInternal.h:447)
and re-exports graphs in Pajek/Metis/edge-list layouts
(/root/reference/grappolo — defs.h:134,144-147). Spark-first: every sink is
``df.write`` with layout-shaping expressions; parquet is the default
production sink (columnar, splittable), text layouts exist for interop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_vertex_state(state: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Result sink for any (vid, value) vertex-state table — the
    host_writeOut analog. fmt: parquet (default) | csv."""
    if fmt == "parquet":
        state.write.mode("overwrite").parquet(path)
    else:
        state.write.mode("overwrite").option("sep", "\t").csv(path)


def write_edge_list(edges: DataFrame, path: str, weighted: bool = True) -> None:
    """'src dst [weight]' text re-export (writeEdgeListToFile analog)."""
    cols = [
        F.col("src").cast("string"),
        F.col("dst").cast("string"),
    ] + ([F.col("weight").cast("string")] if weighted else [])
    edges.select(F.concat_ws(" ", *cols).alias("value")).write.mode(
        "overwrite"
    ).text(path)


def write_pajek(edges: DataFrame, path: str) -> None:
    """Pajek re-export (writeGraphPajekFormat analog): a header part-file
    plus 1-based edge lines. Distributed body; tiny driver-side header."""
    n_v = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst")))
        .distinct()
        .count()
    )
    body = edges.select(
        F.concat_ws(
            " ",
            (F.col("src") + 1).cast("string"),
            (F.col("dst") + 1).cast("string"),
            F.col("weight").cast("string"),
        ).alias("value")
    )
    header = body.sparkSession.createDataFrame(
        [(f"*Vertices {n_v}",), ("*Edges",)], "value string"
    )
    header.coalesce(1).union(body).write.mode("overwrite").text(path)


def write_metis(edges_canon: DataFrame, path: str) -> None:
    """Metis adjacency re-export (writeGraphMetisSimpleFormat analog):
    line i = neighbors of vertex i (1-based). Adjacency lists built with
    collect_list per vertex; ordered output via repartitionByRange+sort —
    valid for graphs whose vertex ids are dense 0..NV-1."""
    from graphanalytics_spark.graph import symmetrize

    sym = symmetrize(edges_canon)
    n_v = sym.select("src").distinct().count()
    n_e = edges_canon.count()
    adj = (
        sym.groupBy("src")
        .agg(F.sort_array(F.collect_list(F.col("dst") + 1)).alias("nbrs"))
        .select(
            "src",
            F.concat_ws(" ", F.transform("nbrs", lambda x: x.cast("string"))).alias(
                "line"
            ),
        )
        .repartitionByRange(1, "src")
        .sortWithinPartitions("src")
        .select(F.col("line").alias("value"))
    )
    header = adj.sparkSession.createDataFrame([(f"{n_v} {n_e}",)], "value string")
    header.coalesce(1).union(adj).write.mode("overwrite").text(path)


def write_csr_binary(edges_canon: DataFrame, row_ptr_path: str, col_idx_path: str) -> None:
    """Binary CSR re-export (writeGraphBinaryFormat / MIS rowPtr+colIdx
    analog): little-endian int32 arrays. The reference caps this format at
    2^26 vertices per file (xilinxlouvainInternal.h:44), so a driver-side
    numpy assembly matches its contract; ids must be dense 0..NV-1."""
    import numpy as np

    from graphanalytics_spark.graph import symmetrize

    pdf = (
        symmetrize(edges_canon)
        .select("src", "dst")
        .toPandas()
        .sort_values(["src", "dst"])
    )
    n_v = int(max(pdf["src"].max(), pdf["dst"].max())) + 1 if len(pdf) else 0
    counts = np.bincount(pdf["src"].values, minlength=n_v)
    row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype("<i4")
    col_idx = pdf["dst"].values.astype("<i4")
    row_ptr.tofile(row_ptr_path)
    col_idx.tofile(col_idx_path)
