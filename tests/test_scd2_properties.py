"""Property-based SCD2 testing: ANY sequence of weekly snapshots must
preserve the dimension invariants. Hypothesis drives the snapshot
evolution; Spark jobs are expensive, so examples are few but each runs a
multi-week merge chain."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from manifold_spark import scd2
from manifold_spark.quality import duplicate_active_keys
from manifold_spark.schema import SCD2_SENTINEL
from manifold_spark.stage import with_fingerprint

KEYS = ["k"]

# A snapshot: mapping of key -> payload value (None payloads allowed).
snapshot = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d", "e"]),
    st.one_of(st.none(), st.sampled_from(["p", "q", "r"])),
    min_size=1,
    max_size=5,
)


def _base(spark, snap: dict):
    rows = [(k, v) for k, v in sorted(snap.items())]
    df = spark.createDataFrame(rows, "k string, payload string")
    return with_fingerprint(df, ["k", "payload"])


@given(snaps=st.lists(snapshot, min_size=1, max_size=4))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_invariants_hold_for_any_snapshot_sequence(spark, snaps):
    dim = None
    seen_keys = set()
    start = dt.date(2024, 1, 1)
    for week, snap in enumerate(snaps):
        as_of = start + dt.timedelta(weeks=week)
        dim = scd2.scd2_merge(dim, _base(spark, snap), "sk", KEYS, as_of)
        # Materialize: the rebuild reads its own output in real use.
        rows = dim.collect()
        dim = spark.createDataFrame(rows, dim.schema)
        seen_keys |= set(snap)

        # Invariant 1: exactly one active row per key ever seen.
        assert duplicate_active_keys(dim, KEYS).count() == 0
        active = {
            r["k"]
            for r in rows
            if r["record_end_date"] == dt.date.fromisoformat(SCD2_SENTINEL)
        }
        assert active == seen_keys

        # Invariant 2: surrogate keys unique and dense from 1.
        sks = sorted(r["sk"] for r in rows)
        assert sks == list(range(1, len(rows) + 1))

        # Invariant 3: the active row for every key in THIS snapshot
        # carries this snapshot's payload.
        payloads = {
            r["k"]: r["payload"]
            for r in rows
            if r["record_end_date"] == dt.date.fromisoformat(SCD2_SENTINEL)
        }
        for k, v in snap.items():
            assert payloads[k] == v

        # Invariant 4: expired rows end strictly before their successor
        # starts, and validity windows never overlap per key.
        by_key = {}
        for r in rows:
            by_key.setdefault(r["k"], []).append(r)
        for k, versions in by_key.items():
            versions.sort(key=lambda r: r["record_start_date"])
            for prev, nxt in zip(versions, versions[1:]):
                assert prev["record_end_date"] < nxt["record_start_date"]
