"""Duplicate-cluster assembly: connected components over near-dup
pairs (north-star extension).

Pair lists (minhash/simhash/cosine near-dups) answer "which pairs
collide"; curation needs "which GROUP does each doc belong to, and
which member survives". That is connected components on the pair
graph — computed here with iterative min-label propagation on
DataFrames:

    label(v) ← min(label(v), min_{(u,v)∈E} label(u))    until fixpoint

Scale shape: each round is ONE shuffle (edges joined to current
labels, min per node); rounds ≈ component diameter, and near-dup
components are shallow (stars around a template, chains of revisions),
so 3–5 rounds typically converge. Lineage is truncated every round
(``materialize``, default ``localCheckpoint`` — see
``operators/materialize.py`` for the cluster-scale reliable-checkpoint
strategy) — without it the plan doubles per iteration and
the driver dies of analysis time long before the executors hurt.
A DuckDB recursive-CTE oracle reproduces the fixpoint exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rustic_witcher_spark.operators.materialize import materialize


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node; component = min node id of its
    group; isolated nodes form singleton components."""
    lab = nodes.select(F.col(node_col).alias("node"), F.col(node_col).alias("label"))
    und = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    und = materialize(und, eager=True)
    for _ in range(max_iter):
        prop = (
            und.join(lab, und["src"] == lab["node"])
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_min"))
        )
        # carry the pre-round label through the propagation join so
        # convergence is a filter+count on the checkpointed result —
        # not an extra new⋈old join (one fewer shuffle per round)
        stepped = materialize(  # truncate lineage per round
            lab.join(prop, lab["node"] == prop["dst"], "left")
            .select(
                "node",
                F.col("label").alias("__old"),
                F.least(F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))).alias("label"),
            ),
            eager=True,
        )
        changed = stepped.filter(F.col("label") != F.col("__old")).count()
        lab = stepped.select("node", "label")
        if changed == 0:
            break
    else:
        # a silent cut-off would return WRONG components (labels flow one
        # hop per round; a path graph needs diameter rounds)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (component diameter exceeds it)"
        )
    return lab.select(F.col("node"), F.col("label").alias("component"))


def sql_connected_components(nodes_sql: str, edges_sql: str, node_col: str = "node") -> str:
    """DuckDB recursive-CTE twin: enumerate (node, reachable-label)
    closure over the undirected edge set, take the min per node. The
    closure is quadratic in component size — fine for an oracle at
    fixture scale, not the production path (that is the Spark side)."""
    return f"""
WITH RECURSIVE
__nodes AS ({nodes_sql}),
__e AS ({edges_sql}),
__und AS (SELECT id_a AS src, id_b AS dst FROM __e UNION SELECT id_b, id_a FROM __e),
__cc(node, label) AS (
  SELECT {node_col}, {node_col} FROM __nodes
  UNION
  SELECT u.dst, c.label FROM __cc c JOIN __und u ON u.src = c.node
)
SELECT node, min(label) AS component FROM __cc GROUP BY node
"""
