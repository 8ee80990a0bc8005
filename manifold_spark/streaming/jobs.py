"""Event-stream operators, batch + Structured Streaming.

The reference has no streaming surface (SURVEY §2.9) — its "incremental"
story is weekly path-partitioned batch. A Spark-native engine gets real
streams nearly for free: the SAME transformations run under `readStream`.
Each transform below is written against a plain DataFrame so it serves
three masters: the batch query (+ DuckDB oracle), the streaming job, and
tests.

Scale: tumbling-window aggregation is the canonical streaming shuffle —
partial aggregation per micro-batch, state keyed by (window, group).
Sessionization in batch is a window-function pass (one shuffle by user);
in streaming it maps to `session_window` with a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from manifold_spark.functions.numeric import decimal_sum


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour aggregate per event_type: count + exact value sum.
    (`date_trunc` rather than `window()` so the identical expression is
    SQL-portable; `window(ts, '1 hour')` produces the same buckets.)"""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            decimal_sum(F.col("value")).alias("total_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event of the same user exceeds `gap_minutes`. Returns one row
    per session: (user_id, session_id, n_events, session_start,
    session_end) with times as ISO strings.

    One shuffle (partition by user), two window passes — the classic
    lag + cumulative-sum session assignment."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000  # microseconds: exact integer math
    with_break = events.withColumn(
        "new_session",
        F.when(
            F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(by_user) > gap_us,
            F.lit(1),
        )
        .otherwise(F.lit(0)),
    )
    with_sid = with_break.withColumn(
        "session_id",
        F.sum("new_session").over(by_user.rowsBetween(Window.unboundedPreceding, 0)) + 1,
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
        .withColumn("session_id", F.col("session_id").cast("long"))
    )


def streaming_hourly_rollup(
    spark,
    source_path: str,
    schema,
    watermark: str = "2 hours",
):
    """The same hourly rollup as a Structured Streaming query over a file
    source: watermarked event-time tumbling windows, late rows beyond the
    watermark dropped. Returns the streaming DataFrame; caller attaches
    the sink (`writeStream`)."""
    stream = spark.readStream.schema(schema).parquet(source_path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # same decimal_sum as the batch twin — totals must agree with
            # the oracle-gated batch rollup regardless of micro-batch order
            decimal_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_sessionize(
    stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """The streaming twin of `sessionize`: stateful sessionization via
    `session_window` + watermark. State per open session is one (window,
    user) row, evicted once the watermark passes the session end — the
    lag+cumsum batch formulation has no streaming equivalent (it would
    need the user's full history), which is exactly what `session_window`
    exists for.

    Output is the batch contract minus the per-user ordinal `session_id`
    (a global ordinal is meaningless on an unbounded stream):
    (user_id, n_events, session_start, session_end) with event-time
    min/max as ISO strings — pinned row-equal to the batch operator in
    tests/test_streaming.py on the availableNow harness.

    Boundary semantics: `session_window` starts a NEW session at a gap of
    exactly ``gap_minutes`` (half-open [ts, ts+gap) windows), while the
    batch `lag` comparison (`gap > g`) keeps it in the SAME session. The
    two differ only for events separated by the gap to the microsecond;
    pick the batch side's oracle semantics when reconciling such rows."""
    gap = f"{gap_minutes} minutes"
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
        .select("user_id", "n_events", "session_start", "session_end")
    )


def dedup_stream(
    stream: DataFrame,
    id_cols: list[str],
    watermark_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exactly-once deduplication by key: each key is emitted on
    first sight and duplicates arriving within the watermark horizon are
    dropped (`dropDuplicatesWithinWatermark` — state for a key is evicted
    once the watermark passes it, so state size tracks the horizon, not
    the stream's lifetime; an unbounded `dropDuplicates` would grow state
    forever at 100 TB/day ingest rates).

    Contract: duplicates separated by more than the watermark horizon are
    NOT caught — pick the horizon from the source's real redelivery window
    (e.g. a Kafka producer's retry ceiling). Batch twin for verification:
    `df.dropDuplicates(id_cols)` over the same rows."""
    return stream.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


def first_seen_upsert(
    batch: DataFrame,
    state: DataFrame | None,
    key_cols: list[str],
    order_col: str = "event_id",
) -> DataFrame:
    """One micro-batch of incremental first-seen deduplication — the body
    a `foreachBatch` sink runs per trigger: keep each key's minimum-order
    row within the batch, drop keys the accumulated state already holds
    (anti-join), append the rest. Exactly-once layering: re-running a
    batch against state that already contains its keys is a no-op.

    Scale shape: the batch-internal pick is one map-side-combined min-agg
    + an equi self-join on (key, order) — `order_col` is unique per row
    (event ids), so the join re-attaches exactly one payload row. The
    state probe is a key-only anti-join: at 100 TB state lives in a
    bucketed/Delta table keyed on `key_cols`, so the probe prunes to the
    buckets the batch touches."""
    picked = batch.join(
        batch.groupBy(*key_cols).agg(F.min(order_col).alias(order_col)),
        [*key_cols, order_col],
    )
    if state is None:
        return picked
    return state.unionByName(
        picked.join(state.select(*key_cols).distinct(), key_cols, "left_anti")
    )


def incremental_first_seen(
    events: DataFrame,
    key_cols: list[str],
    order_col: str = "event_id",
    n_batches: int = 4,
) -> DataFrame:
    """Run the `first_seen_upsert` foreachBatch body over a DETERMINISTIC
    micro-batch split of a bounded input: batch i = rows with
    ``order_col % n_batches == i``, processed in i-order. The split is a
    worst case on purpose — arrival order is uncorrelated with event
    order, so later batches constantly probe state for already-seen keys
    (exactly what a redelivering source does).

    The final state is SQL-checkable: a key's surviving row is the
    min-order row of the FIRST batch (by i) containing that key. The
    real-stream twin (`writeStream.foreachBatch` + availableNow over
    per-batch files) is pinned equal in tests/test_streaming.py."""
    state: DataFrame | None = None
    for i in range(n_batches):
        batch = events.filter(F.col(order_col) % n_batches == i)
        state = first_seen_upsert(batch, state, key_cols, order_col)
    assert state is not None
    return state


def contamination_stream(
    doc_stream: DataFrame,
    benchmark_shingles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
) -> DataFrame:
    """Streaming decontamination: incoming documents checked against a
    STATIC benchmark shingle set as they arrive (stream-static join —
    Spark broadcasts/rescans the static side per micro-batch; no state
    beyond the aggregation). The batch twin is
    `dedup.contamination_check`; same (doc_id, n_shared) contract.

    `benchmark_shingles` is a static DataFrame with one `shingle` column
    (distinct) — at scale, precompute and persist it once; benchmarks are
    tiny next to the corpus."""
    from manifold_spark.operators.dedup import shingle_rows

    tr = shingle_rows(doc_stream, text_col, id_col, shingle_n)
    return (
        tr.join(benchmark_shingles, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def nb_classify_sink(
    model: DataFrame,
    class_table: DataFrame,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """foreachBatch body factory for streaming text classification: score
    each arriving micro-batch of documents under a PRETRAINED NB model
    (`classifier.train_nb` output — the fit-on-seed, apply-to-the-stream
    curation setup) and append the scored rows to a parquet sink.

    Stateless stream-static scoring: the model/class tables broadcast
    against each batch and no state spans triggers, so the union of all
    emitted batches equals the one-shot `score_nb` over the same rows
    (id-disjoint batches) — pinned in tests/test_streaming.py. Per-batch
    cost is the batch's own tokenize+hash+fold; independent of stream
    history. r8; the repetition/LM scorers stream the same way (stateless
    projections + broadcast joins) via the identical foreachBatch shape."""
    from manifold_spark.operators.classifier import score_nb
    from manifold_spark.operators.dedup import operator_cache_scope

    def sink(batch: DataFrame, batch_id: int) -> None:
        # score_nb persists the batch's tf relation via the shared
        # operator-cache registry; the parquet append below is the only
        # consumer, so scope the cache to the trigger — without this a
        # long-running stream accumulates one persisted frame per
        # micro-batch until someone calls release_shingle_caches().
        with operator_cache_scope():
            score_nb(
                batch, model, class_table, text_col=text_col, id_col=id_col
            ).write.mode("append").parquet(out_path)

    return sink
