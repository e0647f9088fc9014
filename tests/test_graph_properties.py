"""Property-based check: degree-oriented triangle counting equals the
brute-force enumeration on arbitrary small graphs.

hypothesis drives random edge lists (dupes, reversals, self-loops
included) through operators/graph.triangle_count and compares against an
itertools all-triples count on the canonicalized edge set — the oracle
DuckDB cross-check covers one fixed graph; this covers the space.
"""

from __future__ import annotations

from itertools import combinations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)


edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=0,
    max_size=40,
)


@given(edges=edge_lists)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_triangle_count_matches_bruteforce(spark_session_module, edges):
    from random_sampling_based_approximate_mapreduce_spark.operators.graph import (
        triangle_count,
    )

    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = {n for e in canon for n in e}
    expect_tri = sum(
        1
        for x, y, z in combinations(sorted(nodes), 3)
        if (x, y) in canon and (y, z) in canon and (x, z) in canon
    )
    if not edges:
        edges = [(0, 0)]  # createDataFrame needs >=1 row; self-loop drops out
        canon, nodes, expect_tri = set(), set(), 0
    df = spark_session_module.createDataFrame(edges, "a long, b long")
    got = {r.metric: r.value for r in triangle_count(df, "a", "b").collect()}
    assert got["n_edges"] == len(canon)
    assert got["n_nodes"] == len(nodes)
    assert got["n_triangles"] == expect_tri


@pytest.fixture(scope="module")
def spark_session_module(spark):
    return spark
