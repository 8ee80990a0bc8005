"""Approximate-tier twins of the exact gate queries.

The exact `events_type_stats` gate (distinct counts + percentiles) is
oracle-hash-checked, so they stay exact. At interactive 100 TB scale the
standard swaps are sketch-based:

- `approx_count_distinct` (HyperLogLog++): fixed ~KB state per group vs
  a shuffle of every distinct key; rsd=0.01 ≈ 1% error at ~6 KB/group.
- `approx_percentile` (t-digest-style): fixed-size mergeable summary vs
  a full sort; `accuracy` trades memory for rank error.

Both are MERGEABLE aggregates — partial sketches combine map-side, the
shuffle carries sketches instead of values, so cost is O(groups), not
O(rows). Not oracle-comparable (sketch internals are engine-specific),
which is exactly why they live beside — not inside — the hash gate;
`tests/test_operators.py` bounds their error against the exact twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_users(events: DataFrame, rsd: float = 0.01) -> DataFrame:
    """HLL twin of the exact `events_type_stats` distinct counts."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=rsd).alias("n_users_approx"),
        F.count(F.lit(1)).alias("n_events"),
    )


def approx_percentiles(events: DataFrame, accuracy: int = 10_000) -> DataFrame:
    """Sketch twin of the exact `events_type_stats` percentiles."""
    pcts = F.expr(
        f"approx_percentile(value, array(0.5, 0.9, 0.99), {accuracy})"
    )
    return events.groupBy("event_type").agg(
        pcts[0].alias("p50"), pcts[1].alias("p90"), pcts[2].alias("p99")
    )
