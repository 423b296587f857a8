"""Streaming batch-parity test: windowed aggregation drained with
availableNow equals the batch expression over the same files."""

import pyspark.sql.functions as F

from graphanalytics_spark.streaming import events as sev


def test_windowed_counts_batch_parity(spark, tmp_path):
    # the file stream source wants a directory: stage the parquet into one
    import shutil

    src_dir = tmp_path / "events_dir"
    src_dir.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", src_dir / "part-0.parquet"
    )
    batch = spark.read.parquet(str(src_dir))
    stream = sev.read_events_stream(spark, str(src_dir), batch.schema)
    agg = sev.windowed_event_counts(stream, window="1 hour")
    got = sev.run_to_completion(agg, str(tmp_path / "ckpt")).toPandas()

    expected = (
        sev.windowed_event_counts_batch(batch, window="1 hour")
        .toPandas()
    )
    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    expected = expected.sort_values(key).reset_index(drop=True)
    assert len(got) == len(expected)
    assert (got["n_events"].values == expected["n_events"].values).all()


def test_sessionize_stream_batch_parity(spark, tmp_path):
    """applyInPandasWithState sessionization drained with availableNow must
    equal the batch window/lag sessionizer over the same events."""
    import shutil

    from pyspark.sql.window import Window

    src_dir = tmp_path / "events_dir2"
    src_dir.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", src_dir / "part-0.parquet"
    )
    batch = spark.read.parquet(str(src_dir))
    stream = sev.read_events_stream(spark, str(src_dir), batch.schema)
    got = (
        sev.run_to_update_sink(
            sev.sessionize_stream(stream, gap_s=1800),
            str(tmp_path / "ckpt2"),
            "ga_sessions",
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp(F.col("ts").cast("timestamp")) - F.unix_timestamp(
        F.lag(F.col("ts").cast("timestamp")).over(w)
    )
    expected = (
        batch.withColumn(
            "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        .groupBy("user_id")
        .agg(F.sum("is_new").alias("n_sessions"), F.count("*").alias("n_events"))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(expected)
    assert (got["n_sessions"].values == expected["n_sessions"].values).all()
    assert (got["n_events"].values == expected["n_events"].values).all()


def test_incremental_link_ingest_batch_parity(spark, tmp_path):
    """Streaming link ingestion (append-only deltas + compacting read) must
    equal the one-shot batch extraction over the same repos files."""
    from graphanalytics_spark import fixtures, ingest
    from graphanalytics_spark.streaming import ingest as sing

    repos_pdf = fixtures.generate_repos_pdf(n_repos=20)
    src_dir = tmp_path / "repos_dir"
    src_dir.mkdir()
    # two separate files → the availableNow drain sees multiple input files
    spark.createDataFrame(repos_pdf.iloc[:100]).write.mode("overwrite").parquet(
        str(src_dir / "p0")
    )
    spark.createDataFrame(repos_pdf.iloc[100:]).write.mode("overwrite").parquet(
        str(src_dir / "p1")
    )
    batch = spark.read.parquet(str(src_dir / "p0"), str(src_dir / "p1"))

    stream = sing.read_repos_stream(spark, f"{src_dir}/*", batch.schema)
    q = sing.incremental_link_ingest(
        stream, str(tmp_path / "deltas"), str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    got = {
        (r.src_repo, r.dst_repo): r.weight
        for r in sing.read_link_table(spark, str(tmp_path / "deltas")).collect()
    }
    expected = {
        (r.src_repo, r.dst_repo): r.weight
        for r in ingest.extract_links(batch)
        .groupBy("src_repo", "dst_repo")
        .agg(F.count("*").cast("double").alias("weight"))
        .collect()
    }
    assert got == expected and len(got) > 10


def test_enriched_counts_stream_static_join_parity(spark, tmp_path):
    """Stream-static join enrichment: the streaming (events ⋈ customer-dim
    → windowed agg by segment) drained with availableNow equals the same
    function applied to the batch DataFrame (watermark is a no-op in
    batch)."""
    import shutil

    src_dir = tmp_path / "events_dir"
    src_dir.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", src_dir / "part-0.parquet"
    )
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    batch = spark.read.parquet(str(src_dir))
    stream = sev.read_events_stream(spark, str(src_dir), batch.schema)

    agg = sev.enriched_event_counts(stream, customer, window="1 hour")
    got = sev.run_to_completion(agg, str(tmp_path / "ckpt2")).toPandas()
    expected = sev.enriched_event_counts(batch, customer, window="1 hour").toPandas()

    key = ["window_start", "segment"]
    got = got.sort_values(key).reset_index(drop=True)
    expected = expected.sort_values(key).reset_index(drop=True)
    assert len(got) == len(expected) > 0
    assert set(got["segment"]) - {"UNKNOWN"} <= {
        "MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"
    }
    assert (got["n_events"].values == expected["n_events"].values).all()
    assert (abs(got["sum_value"].values - expected["sum_value"].values) < 1e-9).all()


def test_incremental_ingest_batch_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (crash between parquet write and checkpoint
    commit) must not double-count: batch deltas are keyed by batch_id and
    overwritten on retry."""
    import pandas as pd

    from graphanalytics_spark.streaming import ingest as sing

    pdf = pd.DataFrame(
        {
            "repo": ["repo00001", "repo00002"],
            "path": ["a.py", "b.py"],
            "commit": ["c1", "c2"],
            "lang": ["py", "py"],
            "content": [
                "import repo00002/lib.py and repo00002/util.py",
                "see repo00001/a.py",
            ],
        }
    )
    repos = spark.createDataFrame(pdf)
    delta_dir = str(tmp_path / "deltas")

    # simulate foreachBatch running the same batch twice (replay after a
    # crash that lost the checkpoint commit): same batch_id, same data
    from graphanalytics_spark.ingest import extract_links
    from pyspark.sql import functions as F

    def write_batch(batch_id):
        delta = (
            extract_links(repos)
            .groupBy("src_repo", "dst_repo")
            .agg(F.count("*").cast("double").alias("weight"))
        )
        delta.write.mode("overwrite").parquet(f"{delta_dir}/batch={batch_id}")

    write_batch(0)
    once = {
        (r.src_repo, r.dst_repo): r.weight
        for r in sing.read_link_table(spark, delta_dir).collect()
    }
    write_batch(0)  # replay
    twice = {
        (r.src_repo, r.dst_repo): r.weight
        for r in sing.read_link_table(spark, delta_dir).collect()
    }
    assert once == twice and once  # no double counting
    # a genuinely NEW batch does accumulate
    write_batch(1)
    after_new = {
        (r.src_repo, r.dst_repo): r.weight
        for r in sing.read_link_table(spark, delta_dir).collect()
    }
    assert after_new == {k: v * 2 for k, v in once.items()}


def test_compaction_preserves_table_and_replay_safety(spark, tmp_path):
    """compact_link_deltas folds live batches into a base via an atomic
    manifest: the compacting read is unchanged before/after, further
    deltas keep accumulating, and a batch REPLAYED after being folded is
    ignored (exactly-once across compaction)."""
    from graphanalytics_spark.streaming import ingest as sing

    delta_dir = str(tmp_path / "cdeltas")
    rows0 = [("a", "b", 2.0), ("a", "c", 1.0)]
    rows1 = [("a", "b", 3.0), ("d", "e", 1.0)]
    spark.createDataFrame(rows0, "src_repo string, dst_repo string, weight double") \
        .write.mode("overwrite").parquet(f"{delta_dir}/batch=0")
    spark.createDataFrame(rows1, "src_repo string, dst_repo string, weight double") \
        .write.mode("overwrite").parquet(f"{delta_dir}/batch=1")

    def table():
        return {
            (r.src_repo, r.dst_repo): r.weight
            for r in sing.read_link_table(spark, delta_dir).collect()
        }

    before = table()
    assert before == {("a", "b"): 5.0, ("a", "c"): 1.0, ("d", "e"): 1.0}
    man = sing.compact_link_deltas(spark, delta_dir)
    assert man["version"] == 1 and man["folded"] == [0, 1]
    assert table() == before
    # new delta after compaction accumulates on top of the base
    spark.createDataFrame([("a", "b", 1.0)], "src_repo string, dst_repo string, weight double") \
        .write.mode("overwrite").parquet(f"{delta_dir}/batch=2")
    assert table()[("a", "b")] == 6.0
    # a zombie replay of folded batch 1 rewrites its dir — must be ignored
    spark.createDataFrame(rows1, "src_repo string, dst_repo string, weight double") \
        .write.mode("overwrite").parquet(f"{delta_dir}/batch=1")
    assert table()[("a", "b")] == 6.0
    # second compaction folds the new live batch only
    man2 = sing.compact_link_deltas(spark, delta_dir)
    assert man2["version"] == 2 and man2["folded"] == [0, 1, 2]
    assert table()[("a", "b")] == 6.0
