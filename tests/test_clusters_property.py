"""Property-based check of the connected-components core: on arbitrary
small undirected graphs, ``dedup.min_label_components`` (with enough
iterations to cover any diameter) must agree exactly with a pure-Python
union-find — node set, per-node component minimum, and component sizes.

The example-based tests pin the diameter-6 chain and the max_iters bound;
this covers the shapes nobody thought to plant (self-loops via duplicate
pairs, multiple singleton-free components, stars, cycles)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xboard_spark.operators import dedup

edges_strategy = st.lists(
    st.tuples(st.integers(1, 12), st.integers(1, 12)).filter(
        lambda p: p[0] != p[1]
    ),
    min_size=1,
    max_size=14,
)


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for node in list(parent):
        comp.setdefault(find(node), []).append(node)
    return {
        node: (root, len(members))
        for root, members in comp.items()
        for node in members
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(edges_strategy)
def test_min_label_components_matches_union_find(spark, pairs):
    expected = _union_find(pairs)
    # max_iters = node count bounds any possible diameter, so the only
    # question is whether the propagation itself is correct
    rows = dedup.min_label_components(
        spark.createDataFrame(pairs, "doc_a long, doc_b long"),
        max_iters=len(expected),
    ).collect()
    got = {r.doc_id: (r.cluster_id, r.cluster_size) for r in rows}
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(edges_strategy)
def test_components_star_matches_union_find(spark, pairs):
    expected = _union_find(pairs)
    rows = dedup.components_star(
        spark.createDataFrame(pairs, "doc_a long, doc_b long")
    ).collect()
    got = {r.doc_id: (r.cluster_id, r.cluster_size) for r in rows}
    assert got == expected


def test_components_star_collapses_chains_in_log_rounds(spark):
    """The reason components_star exists: a 64-node path needs 63
    propagation rounds but only O(log n) star cycles."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 64)], "doc_a long, doc_b long"
    )
    rows = dedup.components_star(pairs).collect()
    assert all(r.cluster_id == 1 for r in rows)
    assert len(rows) == 64  # nodes 1..64
    assert dedup.components_star.last_rounds <= 8, (
        dedup.components_star.last_rounds
    )


def test_star_and_propagation_agree_on_real_fuzzy_graph(spark):
    """Cross-implementation agreement on REAL data: the sf0.001 fuzzy
    customer-match graph must resolve to identical entities under
    min-label propagation (fixpoint) and large-star/small-star — two
    independent algorithms, one contract."""
    import sys

    sys.path.insert(0, "/root/repo")
    from xboard_spark.io import read_table
    from xboard_spark.operators.linkage import fuzzy_customer_pairs
    from pyspark.sql import functions as F

    cust = read_table(spark, "/root/testdata/sf0.001", "customer")
    pairs = fuzzy_customer_pairs(cust).select(
        F.col("custkey_a").alias("doc_a"), F.col("custkey_b").alias("doc_b")
    )
    prop = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in dedup.min_label_components(pairs).collect()
    }
    star = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in dedup.components_star(pairs).collect()
    }
    assert prop == star
    assert len(prop) > 0
