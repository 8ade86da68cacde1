"""Connected components (operators/cluster.py)."""

from __future__ import annotations

import pytest

from rustic_witcher_spark.operators.cluster import connected_components


def _cc(spark, node_ids, edge_pairs, **kw):
    nodes = spark.createDataFrame([(n,) for n in node_ids], ["doc_id"])
    edges = spark.createDataFrame(edge_pairs, ["id_a", "id_b"]) if edge_pairs else \
        spark.createDataFrame([], "id_a long, id_b long")
    out = connected_components(nodes, edges, "doc_id", **kw)
    return {r["node"]: r["component"] for r in out.collect()}


def test_stars_chains_singletons(spark):
    got = _cc(
        spark,
        list(range(10)),
        [(1, 2), (2, 3),            # chain 1-2-3
         (5, 6), (5, 7), (5, 8)],   # star at 5
    )
    assert got[1] == got[2] == got[3] == 1
    assert got[5] == got[6] == got[7] == got[8] == 5
    for singleton in (0, 4, 9):
        assert got[singleton] == singleton


def test_long_chain_converges(spark):
    n = 15
    got = _cc(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)], max_iter=n + 2)
    assert set(got.values()) == {0}  # one component labeled by min id


def test_nonconvergence_raises(spark):
    n = 12
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)], max_iter=3)


def test_edge_direction_irrelevant(spark):
    a = _cc(spark, [1, 2, 3], [(3, 1), (2, 3)])
    b = _cc(spark, [1, 2, 3], [(1, 3), (3, 2)])
    assert a == b == {1: 1, 2: 1, 3: 1}
