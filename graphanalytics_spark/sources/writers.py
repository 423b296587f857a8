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


def write_edge_list_binary(edges: DataFrame, path: str) -> None:
    """Fixed-width binary edge re-export — the sink twin of
    ``readers.read_edge_list_binary`` (parse_EdgeListBinary analog):
    little-endian int64 (src, dst), 16 bytes per record, record order not
    part of the format.

    Distributed: each partition streams its records into an executor-local
    staging chunk (no sort — unordered records need no range partitioning,
    unlike Metis lines), acks the chunk name, and the driver concatenates
    acked chunks byte-for-byte with O(1) memory. Only acked names are
    folded in, so a speculated/retried task's orphan chunk is ignored."""
    import os
    import shutil

    import numpy as np
    import pandas as pd

    staging = path + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging, exist_ok=True)

    def dump(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        fname = f"chunk-{tc.partitionId():05d}-{tc.taskAttemptId()}.bin"
        n = 0
        with open(os.path.join(staging, fname), "wb") as f:
            for pdf in batches:
                if len(pdf):
                    arr = np.empty((len(pdf), 2), dtype="<i8")
                    arr[:, 0] = pdf["src"].to_numpy(dtype=np.int64)
                    arr[:, 1] = pdf["dst"].to_numpy(dtype=np.int64)
                    f.write(arr.tobytes())
                    n += len(pdf)
        if n == 0:
            os.remove(os.path.join(staging, fname))
            fname = None
        yield pd.DataFrame({"name": [fname], "n": [n]})

    acks = edges.select("src", "dst").mapInPandas(
        dump, "name string, n long"
    ).collect()
    with open(path, "wb") as out:
        for name in sorted(r["name"] for r in acks if r["name"] is not None):
            with open(os.path.join(staging, name), "rb") as f:
                shutil.copyfileobj(f, out)
    shutil.rmtree(staging)


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


def write_metis(
    edges_canon: DataFrame, path: str, chunk_partitions: int | None = None
) -> None:
    """Metis adjacency re-export (writeGraphMetisSimpleFormat analog,
    /root/reference/grappolo defs.h:144-147): header 'NV NE', then line i =
    space-joined 1-based neighbors of vertex i-1; ids must be dense
    0..NV-1 (vertices with no edges get an empty line).

    Distributed assembly, same shape as ``write_csr_binary``: the
    adjacency lines are built JVM-side (collect_list + concat_ws), range-
    partitioned + sorted on src, and each partition streams its lines into
    a chunk file (gap vertices inside a range filled vectorized); the
    driver concatenates the chunks in range order with bounded memory and
    fills the between-range gaps from the per-chunk (lo, hi) acks. The
    line-ordered text format forces an ordered concat *somewhere*; this
    keeps it O(NV/chunks) per task + a streaming driver merge instead of
    one total-sort task."""
    import os
    import shutil

    import numpy as np
    import pandas as pd

    from graphanalytics_spark.graph import symmetrize

    spark = edges_canon.sparkSession
    sym = symmetrize(edges_canon)
    n_e = edges_canon.count()
    mx = sym.agg(F.max("src").alias("m")).first()["m"]
    n_v = int(mx) + 1 if mx is not None else 0
    n_part = chunk_partitions or spark.sparkContext.defaultParallelism

    adj = (
        sym.groupBy("src")
        .agg(F.sort_array(F.collect_list(F.col("dst") + 1)).alias("nbrs"))
        .select(
            "src",
            F.concat_ws(" ", F.transform("nbrs", lambda x: x.cast("string"))).alias(
                "line"
            ),
        )
        .repartitionByRange(n_part, "src")
        .sortWithinPartitions("src")
    )

    staging = path + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging, exist_ok=True)

    def dump(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId()
        srcs, lines = [], []
        for pdf in batches:
            if len(pdf):
                srcs.append(pdf["src"].to_numpy(dtype=np.int64))
                lines.append(pdf["line"].to_numpy(dtype=object))
        name, lo, hi = None, None, None
        if srcs:
            srcs = np.concatenate(srcs)
            lines = np.concatenate(lines)
            lo, hi = int(srcs[0]), int(srcs[-1])
            full = np.full(hi - lo + 1, "", dtype=object)
            full[srcs - lo] = lines
            name = f"part-{pid:05d}-{tc.taskAttemptId()}.txt"
            with open(os.path.join(staging, name), "w") as f:
                f.write("\n".join(full) + "\n")
        yield pd.DataFrame({"pid": [pid], "lo": [lo], "hi": [hi], "name": [name]})

    acks = sorted(
        (r["pid"], r["lo"], r["hi"], r["name"])
        for r in adj.mapInPandas(dump, "pid int, lo long, hi long, name string").collect()
    )
    os.makedirs(path, exist_ok=True)
    out_path = os.path.join(path, "part-00000")
    prev_hi = -1
    with open(out_path, "w") as out:
        out.write(f"{n_v} {n_e}\n")
        for _, lo, hi, name in acks:
            if name is None:
                continue
            if lo > prev_hi + 1:
                out.write("\n" * (lo - prev_hi - 1))
            with open(os.path.join(staging, name)) as f:
                shutil.copyfileobj(f, out)
            prev_hi = hi
        if n_v > prev_hi + 1:
            out.write("\n" * (n_v - prev_hi - 1))
    shutil.rmtree(staging)


def write_csr_binary(
    edges_canon: DataFrame,
    row_ptr_path: str,
    col_idx_path: str,
    chunk_partitions: int | None = None,
) -> None:
    """Binary CSR re-export (writeGraphBinaryFormat / MIS rowPtr+colIdx
    analog): little-endian int32 arrays; ids must be dense 0..NV-1.

    Distributed assembly (never collects the edge table to the driver):

    1. ``col_idx``: range-partition + sort the symmetrized edges on
       (src, dst); each partition streams its Arrow batches straight into a
       per-partition binary chunk file (shared staging dir — local FS in
       local mode, network FS / object store on a cluster); the driver then
       concatenates the chunk files in range order with bounded-memory
       ``copyfileobj``. Only O(#partitions) ack rows ever reach the driver.
    2. ``row_ptr``: classic two-pass distributed prefix sum over the degree
       table — pass 1 collects per-range (edge-count, vid-range) acks
       (tiny), the driver computes base offsets, pass 2 writes each range's
       absolute row_ptr chunk (gap vertices filled via searchsorted).

    The reference caps the format at 2^26 vertices per file
    (xilinxlouvainInternal.h:44); this writer has no such driver-memory
    cliff — the cap is only honored as the format's own contract."""
    import os
    import shutil

    import numpy as np
    import pandas as pd

    from graphanalytics_spark.graph import symmetrize

    spark = edges_canon.sparkSession
    sym = symmetrize(edges_canon).select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    n_part = chunk_partitions or spark.sparkContext.defaultParallelism

    def _concat_chunks(
        staging: str, names: list[str], out_path: str, lead: bytes = b""
    ) -> None:
        """Concatenate exactly the chunk files the WINNING task attempts
        reported (in partition order) — files from losing speculative /
        zombie attempts may coexist in the staging dir and are ignored."""
        with open(out_path, "wb") as out:
            out.write(lead)
            for name in names:
                with open(os.path.join(staging, name), "rb") as f:
                    shutil.copyfileobj(f, out)
        shutil.rmtree(staging)

    # --- col_idx: sorted edge stream → per-range chunks ---
    staging_ci = col_idx_path + ".staging"
    os.makedirs(staging_ci, exist_ok=True)
    srt = sym.repartitionByRange(n_part, "src", "dst").sortWithinPartitions(
        "src", "dst"
    )

    def dump_colidx(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId()
        # attempt-unique filename: under speculative execution / zombie
        # retries two attempts of the same partition may write
        # concurrently; each writes its own file and the driver
        # concatenates only the files the winning attempts reported
        name = f"part-{pid:05d}-{tc.taskAttemptId()}.bin"
        path = os.path.join(staging_ci, name)
        n = 0
        with open(path, "wb") as f:
            for pdf in batches:
                pdf["dst"].to_numpy(dtype=np.int64).astype("<i4").tofile(f)
                n += len(pdf)
        if n == 0:
            os.remove(path)
            name = None
        yield pd.DataFrame({"pid": [pid], "n": [n], "name": [name]})

    ci_acks = sorted(
        (r["pid"], r["name"])
        for r in srt.mapInPandas(dump_colidx, "pid int, n long, name string").collect()
    )
    _concat_chunks(
        staging_ci, [n for _, n in ci_acks if n], col_idx_path
    )

    # --- row_ptr: two-pass distributed prefix sum over degrees ---
    deg = sym.groupBy("src").agg(F.count("*").alias("cnt"))
    mx = sym.agg(F.max("src").alias("m")).first()["m"]
    n_v = int(mx) + 1 if mx is not None else 0
    dsrt = deg.repartitionByRange(n_part, "src").sortWithinPartitions("src").persist()

    def ack(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tot, lo, hi = 0, None, None
        for pdf in batches:
            if len(pdf):
                tot += int(pdf["cnt"].sum())
                lo = int(pdf["src"].iloc[0]) if lo is None else lo
                hi = int(pdf["src"].iloc[-1])
        yield pd.DataFrame({"pid": [pid], "tot": [tot], "lo": [lo], "hi": [hi]})

    acks = sorted(
        (r["pid"], r["tot"], r["lo"], r["hi"])
        for r in dsrt.mapInPandas(ack, "pid int, tot long, lo long, hi long").collect()
    )
    # per-partition absolute edge base + the vid floor (previous range's max)
    base, floor = {}, {}
    cum, prev_hi = 0, -1
    for pid, tot, lo, hi in acks:
        base[pid], floor[pid] = cum, prev_hi
        cum += tot
        if hi is not None:
            prev_hi = hi
    total_edges, last_vid = cum, prev_hi

    staging_rp = row_ptr_path + ".staging"
    os.makedirs(staging_rp, exist_ok=True)

    def dump_rowptr(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId()
        srcs, cnts = [], []
        for pdf in batches:
            srcs.append(pdf["src"].to_numpy(dtype=np.int64))
            cnts.append(pdf["cnt"].to_numpy(dtype=np.int64))
        srcs = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
        name = None
        if len(srcs):
            cnts = np.concatenate(cnts)
            # row_ptr[v+1] = base + Σ cnt over src ≤ v, for v in (floor, hi]
            vids = np.arange(floor[pid] + 1, srcs[-1] + 1, dtype=np.int64)
            csum = np.concatenate([[0], np.cumsum(cnts)])
            vals = base[pid] + csum[np.searchsorted(srcs, vids, side="right")]
            name = f"part-{pid:05d}-{tc.taskAttemptId()}.bin"
            vals.astype("<i4").tofile(os.path.join(staging_rp, name))
        yield pd.DataFrame({"pid": [pid], "name": [name]})

    rp_acks = sorted(
        (r["pid"], r["name"])
        for r in dsrt.mapInPandas(dump_rowptr, "pid int, name string").collect()
    )
    dsrt.unpersist()
    # leading row_ptr[0]=0; trailing fill for any dense ids past the last
    # src (cannot occur after symmetrize, kept as a guard)
    _concat_chunks(
        staging_rp,
        [n for _, n in rp_acks if n],
        row_ptr_path,
        lead=np.zeros(1, "<i4").tobytes(),
    )
    if n_v > last_vid + 1:
        with open(row_ptr_path, "ab") as f:
            np.full(n_v - last_vid - 1, total_edges, "<i4").tofile(f)


def write_bucketed_edges(
    edges: DataFrame, table_name: str, buckets: int = 32
) -> None:
    """Persist an edge table BUCKETED + sorted on src — the co-location
    contract for iterative gather joins at cluster scale: a scan of this
    table reports hash(src) bucket distribution, so per-src aggregations
    (degrees, link-fraction build) and src-keyed equi-joins read it
    Exchange-free; only the vertex-state side of an iteration ever
    shuffles. This is the storage-level analog of the reference's
    contiguous-range partition files (.par per server,
    /root/reference/louvainmod/src/xilinxlouvain.cpp:373-393) — the
    partitioning lives with the data instead of being rebuilt per run.

    Spark bucketing requires a catalog table (saveAsTable); pass a
    qualified name to target a real metastore/Iceberg catalog on a
    cluster — in local mode the in-memory catalog + spark-warehouse dir
    exercise the identical plan paths."""
    (
        edges.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "src")
        .sortBy("src", "dst")
        .saveAsTable(table_name)
    )


def read_bucketed_edges(spark, table_name: str) -> DataFrame:
    """Read a bucketed edge table back with its bucket metadata intact."""
    return spark.table(table_name)
