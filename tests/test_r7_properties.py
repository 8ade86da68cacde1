"""Property-based correctness for the round-7 graph and skyline
operators: the distributed plans must agree with brute-force O(n²)/
O(n³) reference implementations on arbitrary small inputs — the same
strategy test_properties.py uses for packing/transforms."""

from __future__ import annotations

from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

points = st.lists(
    st.tuples(st.integers(min_value=0, max_value=8), st.integers(min_value=0, max_value=8)),
    min_size=1,
    max_size=25,
)


def _brute_skyline(pts):
    out = []
    for i, (a1, a2) in enumerate(pts):
        dominated = any(
            (b1 >= a1 and b2 >= a2 and (b1 > a1 or b2 > a2))
            for j, (b1, b2) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((a1, a2))
    return sorted(out)


@given(pts=points)
@settings(**SETTINGS)
def test_skyline_matches_brute_force(spark, pts):
    from rustic_witcher_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame([(i, a, b) for i, (a, b) in enumerate(pts)], "id int, m1 int, m2 int")
    got = sorted((r["m1"], r["m2"]) for r in skyline_2d(df, "m1", "m2").collect())
    assert got == _brute_skyline(pts)


edge_sets = st.sets(
    st.tuples(st.integers(min_value=0, max_value=7), st.integers(min_value=0, max_value=7)),
    min_size=0,
    max_size=20,
)


@given(raw=edge_sets)
@settings(**SETTINGS)
def test_triangle_count_matches_brute_force(spark, raw):
    from rustic_witcher_spark.operators import graph

    undirected = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    if not undirected:
        return  # undirected_edges of an empty frame is schema-valid but trivial
    df = spark.createDataFrame([(a, b) for a, b in raw if a != b] or [(0, 1)], "a int, b int")
    df = df.filter("a != b")
    edges = graph.undirected_edges(df, "a", "b")
    row = graph.triangle_stats(edges).collect()[0]

    nodes = sorted({n for e in undirected for n in e})
    tri = sum(
        1
        for u, v, w in combinations(nodes, 3)
        if (u, v) in undirected and (v, w) in undirected and (u, w) in undirected
    )
    wedges = 0
    for n in nodes:
        d = sum(1 for e in undirected if n in e)
        wedges += d * (d - 1) // 2
    assert row["n_edges"] == len(undirected)
    assert row["n_triangles"] == tri
    if wedges:
        assert row["clustering_coeff"] == pytest.approx(round(3 * tri / wedges, 6))
