"""connected_components unit tests: topology shapes that stress the
pointer-jumping loop (long chains = worst-case diameter), plus the
determinism contract (component id == canonical min member, independent
of partitioning)."""

import pytest
from pyspark.sql import functions as F

from parallel_dataflow_spark.operators.graph import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df, **kw).collect()
    return {r.node: r.component for r in rows}


def test_two_triangle_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_long_chain_converges_in_log_rounds(spark):
    # a 64-node path: diameter 63; naive min-propagation needs ~63 rounds,
    # pointer jumping must finish well inside max_rounds=12 (~2*log2(64))
    edges = [(i, i + 1) for i in range(63)]
    got = _cc(spark, edges, max_rounds=12)
    assert set(got.values()) == {0}
    assert len(got) == 64


def test_chain_direction_and_id_order_irrelevant(spark):
    # same path expressed high->low with shuffled edge order
    edges = [(i + 1, i) for i in reversed(range(31))]
    got = _cc(spark, edges, max_rounds=12)
    assert set(got.values()) == {0}


def test_star_plus_isolated_edge(spark):
    edges = [(100, k) for k in range(5)] + [(7777, 8888)]
    got = _cc(spark, edges)
    assert {n for n, c in got.items() if c == 0} == {0, 1, 2, 3, 4, 100}
    assert got[7777] == 7777 and got[8888] == 7777


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0


def test_self_loops_and_duplicate_edges(spark):
    got = _cc(spark, [(5, 5), (1, 2), (2, 1), (1, 2)])
    assert got[5] == 5
    assert got[1] == 1 and got[2] == 1


def test_partitioning_invariance(spark):
    edges = [(i, i + 1) for i in range(20)] + [(50, 51), (51, 52)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r.node: r.component for r in connected_components(df).collect()}
    b = {
        r.node: r.component
        for r in connected_components(df.repartition(7, F.col("dst"))).collect()
    }
    assert a == b


def test_nonconvergence_guard(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(63)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=1)


# --- property-based: random topologies vs a union-find golden ---------------

try:
    from hypothesis import given, settings, strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False


def _union_find_golden(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


if HAS_HYPOTHESIS:

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=40),
                st.integers(min_value=0, max_value=40),
            ),
            min_size=1,
            max_size=60,
        )
    )
    def test_random_graphs_match_union_find(spark, edges):
        got = _cc(spark, [(int(a), int(b)) for a, b in edges])
        assert got == _union_find_golden(edges)
