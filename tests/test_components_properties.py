"""Property test: `dedup_components` must agree with a driver-side
union-find on arbitrary random graphs — min-label propagation's fixpoint
IS the connected-components partition with min-id representatives."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from manifold_spark.operators.dedup import dedup_components


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
