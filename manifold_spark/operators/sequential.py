"""Sequential per-key computations via grouped-map `applyInPandas`.

Window functions cover anything expressible as a frame aggregate; what
they cannot express is a RECURRENCE — state threading row to row, like
an exponentially weighted moving average (ewma_t = α·x_t + (1−α)·ewma_{t−1}).
That is the legitimate use of `applyInPandas`: one Arrow-batched pandas
group per key, sequential logic inside, still distributed across keys.

Scale: the shuffle is one hash partition by key (same as any groupBy);
Python cost is per-key linear with vectorized pandas inside. A key's
whole history must fit one worker — true for per-user/per-entity series;
for unbounded keys switch to the streaming stateful operator
(`streaming/stateful.py`) which carries state across micro-batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

EWMA_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def ewma_by_user(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Per-user EWMA of `value` in (ts, event_id) order. Returns the
    input rows plus the running `ewma` — deterministic: group order is
    pinned by an explicit in-group sort, and the recurrence itself is
    order-defined."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        # pandas ewm(adjust=False) IS the recurrence above
        pdf["ewma"] = pdf["value"].ewm(alpha=alpha, adjust=False).mean()
        return pdf[["user_id", "event_id", "ts", "value", "ewma"]]

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fn, EWMA_SCHEMA)
    )
