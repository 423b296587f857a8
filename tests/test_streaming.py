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
