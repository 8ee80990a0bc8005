"""Property tests for the incremental first-seen dedup (r6 streaming
gate machinery): for ANY event multiset and ANY batch count, the final
state of the `first_seen_upsert` foreachBatch replay must equal the pure
batch answer — per key, the min-order row of the earliest batch holding
that key — and re-applying a batch must be a no-op (exactly-once
layering)."""


from __future__ import annotations

import pytest

# r15 slow tier (VERDICT r14 #2): hypothesis streaming equivalence —
# excluded from the default (driver-verify) run by pytest.ini's
# `-m "not slow"`; run with `-m slow` (round-close evidence in
# OPTIMIZATION_r15.md).
pytestmark = pytest.mark.slow

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from manifold_spark.streaming.jobs import first_seen_upsert, incremental_first_seen


def _reference(rows, n_batches):
    """Pure-python first-seen: rows are (event_id, key); batch =
    event_id % n_batches, processed in batch order, min event_id within
    the earliest batch per key."""
    first = {}
    for b in range(n_batches):
        batch = [r for r in rows if r[0] % n_batches == b]
        for eid, key in sorted(batch):
            if key not in first:
                first[key] = eid
    return first


events_strategy = st.tuples(
    st.lists(
        st.tuples(st.integers(0, 99), st.integers(0, 9)),  # (event_id, key)
        max_size=40,
        unique_by=lambda t: t[0],  # event ids unique, like the events table
    ),
    st.integers(min_value=1, max_value=5),
)


@given(data=events_strategy)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_incremental_first_seen_matches_reference(spark, data):
    rows, n_batches = data
    expected = _reference(rows, n_batches)

    if rows:
        events = spark.createDataFrame(rows, "event_id long, user_id long")
    else:
        events = spark.createDataFrame([], "event_id long, user_id long")
    state = incremental_first_seen(events, ["user_id"], "event_id", n_batches)
    got = {r["user_id"]: r["event_id"] for r in state.collect()}
    assert got == expected


def test_upsert_reapply_is_noop(spark):
    """Exactly-once layering: re-running a processed batch against state
    that already contains its keys must change nothing (the redelivery
    case a foreachBatch sink must survive)."""
    batch = spark.createDataFrame(
        [(5, 1), (3, 1), (7, 2)], "event_id long, user_id long"
    )
    state = first_seen_upsert(batch, None, ["user_id"], "event_id")
    reapplied = first_seen_upsert(batch, state, ["user_id"], "event_id")
    assert {tuple(r) for r in reapplied.collect()} == {
        tuple(r) for r in state.collect()
    }
    # and the original pick is the min-order row per key
    assert {r["user_id"]: r["event_id"] for r in state.collect()} == {1: 3, 2: 7}
