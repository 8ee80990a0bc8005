"""Structured Streaming: the hourly rollup must produce the same buckets
as its batch twin when the stream is drained with availableNow."""

import os

from pyspark.sql import functions as F

from manifold_spark.queries import read_events
from manifold_spark.streaming.jobs import hourly_rollup, streaming_hourly_rollup


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    # Stage the events (with proper timestamps) as a parquet "stream" dir.
    events = read_events(spark, sf_dir)
    src = str(tmp_path / "stream-src")
    events.write.parquet(src)

    batch = {
        (r["hour_start"], r["event_type"]): r["n_events"]
        for r in hourly_rollup(events).collect()
    }

    stream_df = streaming_hourly_rollup(spark, src, events.schema)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("hourly_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        (r["hour_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM hourly_test").collect()
    }
    assert streamed == batch
    assert len(streamed) > 0
