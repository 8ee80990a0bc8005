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


def test_streaming_session_window(spark, sf_dir, tmp_path):
    """Stateful streaming sessionization via session_window: same gap
    semantics as the batch `sessionize`, drained with availableNow."""
    from pyspark.sql import functions as F

    events = read_events(spark, sf_dir).limit(2000)
    src = str(tmp_path / "sess-src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    sessions = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT user_id, n_events FROM sessions_test").collect()
    assert len(out) > 0
    # Total events across sessions == input events (no loss, no dup)
    assert sum(r["n_events"] for r in out) == events.count()


def test_stateful_spend_alerts(spark, sf_dir, tmp_path):
    """applyInPandasWithState: threshold alerts fire exactly once per
    (user, threshold) and agree with the batch cumulative computation."""
    from manifold_spark.streaming.stateful import spend_alerts_batch, spend_alerts_stream

    events = read_events(spark, sf_dir).filter("user_id < 50")
    src = str(tmp_path / "alerts-src")
    # Multiple files + maxFilesPerTrigger=1 → several micro-batches, so the
    # state genuinely carries across batches (one file would be one batch
    # and the test would never exercise resumed state).
    events.repartition(4).write.parquet(src)

    batch = {
        (r["user_id"], r["threshold"]) for r in spend_alerts_batch(events).collect()
    }

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        spend_alerts_stream(stream)
        .writeStream.format("memory")
        .queryName("alerts_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM alerts_test").collect()
    streamed = {(r["user_id"], r["threshold"]) for r in rows}
    assert len(rows) == len(streamed)  # exactly-once per (user, threshold)
    assert streamed == batch
    assert len(streamed) > 0


def test_streaming_listing_ingest(spark, listings_weeks, tmp_path):
    """The SAME cleaning chain runs under readStream: stream the raw
    listing JSON through clean_listings and match the batch result."""
    from manifold_spark.clean import clean_listings
    from manifold_spark.ingest import load_json_listings, timestep_path
    from manifold_spark.schema import LISTING_SCHEMA

    path = timestep_path(listings_weeks["root"], listings_weeks["week1"])
    batch = clean_listings(load_json_listings(spark, path))
    expected = sorted(map(repr, batch.collect()))

    stream = spark.readStream.schema(LISTING_SCHEMA).json(path)
    cleaned = clean_listings(stream)
    q = (
        cleaned.writeStream.format("memory")
        .queryName("ingest_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(repr, spark.sql("SELECT * FROM ingest_stream").collect()))
    assert got == expected
    assert len(got) == listings_weeks["week1_rows"]
