"""Structured Streaming equivalence: draining the file-replay stream
through the SAME windowed transform must reproduce the batch result
(Spark's definition of streaming correctness)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from exceldatatransform_py_spark.sources.readers import read_table
from exceldatatransform_py_spark.streaming.windows import (
    stream_tumbling_counts,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark):
    """Stage the events table as a normal-timestamp parquet directory
    (the raw file's TIMESTAMP(NANOS) needs the read_table conversion,
    and readStream needs a directory source)."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    ev = read_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expected = {
        (r["window_start"], r["window_end"], r["event_type"]):
            (r["n_events"], r["sum_value"])
        for r in tumbling_counts(batch, duration="5 minutes").collect()
    }

    stream = stream_tumbling_counts(
        spark, events_dir, schema=batch.schema, duration="5 minutes"
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_stream")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["window_start"], r["window_end"], r["event_type"]):
                (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM t_stream").collect()
        }
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    assert got == expected
