"""Custom stateful streaming operator via `applyInPandasWithState`.

The built-in streaming aggregations cover windows and sessions; what they
can't express is arbitrary per-key state machines. The canonical example
here: a per-user cumulative-spend monitor that emits an alert row the
moment the running total crosses each configured threshold — the row must
be emitted exactly once per threshold regardless of how events split
across micro-batches, which requires carried state.

State is one (cumulative_total, n_thresholds_fired) pair per user —
Arrow-batched in and out, so Python touches columnar chunks, never rows
one at a time. At scale the state store shards by the grouping key like
any streaming aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Alert emitted when a user's cumulative value crosses a threshold.
ALERT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("threshold", T.DoubleType()),
        T.StructField("cumulative", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.DoubleType()),
        T.StructField("fired", T.IntegerType()),
    ]
)

DEFAULT_THRESHOLDS = [100.0, 500.0, 1000.0]


def _monitor(thresholds: list[float]):
    ts = sorted(thresholds)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        total, fired = state.get if state.exists else (0.0, 0)
        out = []
        # Concatenate ALL Arrow chunks before sorting: a per-chunk sort
        # would process chunks in arrival order and make the cumulative at
        # each alert depend on how the micro-batch happened to split.
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(["ts", "event_id"])
            for v in batch["value"]:
                total += float(v)
                while fired < len(ts) and total >= ts[fired]:
                    out.append((int(user_id), ts[fired], total))
                    fired += 1
        state.update((total, fired))
        yield pd.DataFrame(out, columns=["user_id", "threshold", "cumulative"])

    return fn


def spend_alerts_stream(
    events_stream: DataFrame, thresholds: list[float] | None = None
) -> DataFrame:
    """Attach the stateful monitor to a streaming events DataFrame.
    Each alert appears exactly once across the stream's lifetime.

    Ordering contract: events are sorted by (ts, event_id) WITHIN each
    micro-batch only. Equivalence with `spend_alerts_batch` therefore
    requires event-time-ordered arrival ACROSS batches as well as
    non-negative values — an event arriving in a later batch with an
    earlier timestamp folds into the cumulative out of event-time order,
    so the `cumulative` stamped on an alert can differ from the batch
    twin's. Exact cross-batch ordering would need watermark-buffered
    folding (hold events until the watermark passes, then fold in event
    time) at the cost of alert latency; this operator keeps the
    low-latency fold and documents the contract instead."""
    thresholds = DEFAULT_THRESHOLDS if thresholds is None else thresholds
    return (
        events_stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _monitor(thresholds),
            outputStructType=ALERT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


#: State for the watermark-buffered monitor: the fold totals plus the
#: not-yet-finalized events (parallel arrays — Arrow-serializable and
#: O(events inside the watermark delay) per key, not O(history)).
WM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.DoubleType()),
        T.StructField("fired", T.IntegerType()),
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_val", T.ArrayType(T.DoubleType())),
    ]
)


def _monitor_watermarked(thresholds: list[float]):
    ts_list = sorted(thresholds)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            total, fired, buf_ts, buf_eid, buf_val = state.get
            buf = list(zip(buf_ts, buf_eid, buf_val))
        else:
            total, fired, buf = 0.0, 0, []
        for pdf in pdfs:  # empty iterator on a timeout invocation
            for t, e, v in zip(pdf["ts"], pdf["event_id"], pdf["value"]):
                buf.append(
                    (int(pd.Timestamp(t).value // 1_000_000), int(e), float(v))
                )
        wm = state.getCurrentWatermarkMs()
        buf.sort()
        # Strictly-before-watermark events are FINAL (anything arriving
        # later with a smaller ts is dropped by the watermark filter), so
        # folding them in (ts, event_id) order is the event-time order —
        # an event AT the watermark could still gain same-ts siblings, so
        # it stays buffered until the watermark passes it.
        ready = [x for x in buf if x[0] < wm]
        pending = [x for x in buf if x[0] >= wm]
        out = []
        for _, _, v in ready:
            total += v
            while fired < len(ts_list) and total >= ts_list[fired]:
                out.append((int(user_id), ts_list[fired], total))
                fired += 1
        state.update(
            (
                total,
                int(fired),
                [x[0] for x in pending],
                [x[1] for x in pending],
                [x[2] for x in pending],
            )
        )
        if pending:
            # wake this key as soon as the watermark passes its earliest
            # buffered event (must be > current watermark to be legal)
            state.setTimeoutTimestamp(max(pending[0][0], wm + 1))
        yield pd.DataFrame(out, columns=["user_id", "threshold", "cumulative"])

    return fn


def spend_alerts_stream_watermarked(
    events_stream: DataFrame,
    thresholds: list[float] | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Watermark-buffered twin of `spend_alerts_stream`: events are held
    in per-key state until the watermark passes them, then folded in
    EVENT-TIME order — so the alerts (including the stamped `cumulative`)
    equal `spend_alerts_batch` even when events arrive out of order
    across micro-batches, as long as disorder stays within ``delay``.
    The price is alert latency ≥ the watermark delay (the low-latency
    arrival-order fold remains available as `spend_alerts_stream`).

    Mechanics: EventTimeTimeout wakes keys whose buffer head falls behind
    the advancing watermark (no-data micro-batches run these flushes —
    `spark.sql.streaming.noDataMicroBatches.enabled` is on by default);
    state carries O(delay-window) events per key, never history."""
    thresholds = DEFAULT_THRESHOLDS if thresholds is None else thresholds
    return (
        events_stream.withWatermark("ts", delay)
        .select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _monitor_watermarked(thresholds),
            outputStructType=ALERT_SCHEMA,
            stateStructType=WM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def spend_alerts_batch(events: DataFrame, thresholds: list[float] | None = None) -> DataFrame:
    """Batch twin for verification: the same alerts from a cumulative
    window pass (first event where the running total reaches each
    threshold).

    Equivalence with the stream holds for NON-NEGATIVE values: the stream
    fires each threshold at most once (monotone `fired` index), while this
    batch pass emits one row per crossing — with refunds/negative values a
    re-crossed threshold appears again here but not in the stream."""
    from pyspark.sql import Window

    thresholds = DEFAULT_THRESHOLDS if thresholds is None else thresholds
    if not thresholds:
        return events.sparkSession.createDataFrame([], ALERT_SCHEMA)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = events.withColumn("cumulative", F.sum("value").over(w))
    prev = F.col("cumulative") - F.col("value")
    out = None
    for t in sorted(thresholds):
        crossed = cum.filter((prev < t) & (F.col("cumulative") >= t)).select(
            "user_id", F.lit(t).alias("threshold"), "cumulative"
        )
        out = crossed if out is None else out.unionByName(crossed)
    return out


#: Streaming EWMA output/state — the streaming twin of
#: `operators/sequential.ewma_by_user`.
EWMA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType([T.StructField("ewma", T.DoubleType())])


def _ewma_fn(alpha: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        prev = state.get[0] if state.exists else None
        batch = pd.concat(list(pdfs), ignore_index=True)
        out = []
        if len(batch):
            batch = batch.sort_values(["ts", "event_id"])
            for _, row in batch.iterrows():
                v = float(row["value"])
                prev = v if prev is None else alpha * v + (1.0 - alpha) * prev
                out.append((int(user_id), int(row["event_id"]), v, prev))
        if prev is not None:
            state.update((prev,))
        yield pd.DataFrame(out, columns=["user_id", "event_id", "value", "ewma"])

    return fn


def ewma_stream(events_stream: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Per-user EWMA carried ACROSS micro-batches via
    `applyInPandasWithState` — the recurrence state is one double per
    user, so state size is O(active users) regardless of event volume
    (the batch twin `operators/sequential.ewma_by_user` needs each key's
    whole history in one group; this needs only the last value).

    Same ordering contract as `spend_alerts_stream`: rows sort by
    (ts, event_id) within a micro-batch, so batch/stream equivalence
    requires event-time-ordered arrival across batches."""
    return (
        events_stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _ewma_fn(alpha),
            outputStructType=EWMA_OUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
