"""2-D skyline (Pareto frontier) — maximization on both metrics.

A row survives iff no other row is ≥ on both metrics and > on at least
one. The textbook definition is an O(n²) self-join; this is the
O(n log n) sweep, decomposed for distribution:

  1. collapse to per-distinct-m1 maxima (one shuffle, map-side combine)
  2. ONE ordered window over the distinct-m1 table computes, for each
     m1, the best m2 among STRICTLY greater m1 values
  3. broadcast-join the (m1 → gmax, thresh) table back; survivors are
     rows equal to their group max that beat the threshold

Tie semantics (pinned by unit + property tests): an equal-m1 row with
smaller m2 is dominated; exact duplicate points all survive (neither
dominates the other — no strict coordinate).

100 TB shape: step 2's window runs over |distinct m1| rows — already
aggregated, orders of magnitude under the input. If even that is too
wide, range-partition by m1, skyline partitions locally (each pass
removes ~everything), then sweep only the per-partition survivors:
skyline(skyline(P1) ∪ ... ∪ skyline(Pk)) = skyline(P) because
dominance is transitive and partition-local dominance implies global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, m1: str, m2: str) -> DataFrame:
    """Non-dominated rows of ``df`` under (max ``m1``, max ``m2``)."""
    g = df.groupBy(m1).agg(F.max(m2).alias("__gmax"))
    w = Window.orderBy(F.desc(m1)).rowsBetween(Window.unboundedPreceding, -1)
    t = g.withColumn("__thresh", F.max("__gmax").over(w))
    return (
        df.join(F.broadcast(t), m1)
        .filter(
            (F.col(m2) == F.col("__gmax"))
            & (F.col("__thresh").isNull() | (F.col(m2) > F.col("__thresh")))
        )
        .drop("__gmax", "__thresh")
    )
