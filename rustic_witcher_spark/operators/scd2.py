"""Slowly-changing-dimension type-2 history from an append-only change
log, plus point-in-time snapshots over the produced intervals.

The reference's CDC merge (ref: rustic-witcher/src/cdc.rs-equivalent
surface, SURVEY §2.4 J1) keeps only the LAST version per primary key.
SCD2 is the other half of the same problem a warehouse user has: keep
EVERY version, as non-overlapping validity intervals
``[valid_from, valid_to)``, so any historical state can be queried with
a point-in-time predicate instead of replaying the log.

Spark-first shape — both steps are expressible as window functions over
ONE hash partitioning on the key:

1. change-collapse: consecutive rows whose tracked attributes are
   unchanged are collapsed into the first row of the run
   (``lag(attrs) over (partition by key order by ts)`` ≠ attrs).
2. intervalize: ``valid_to = lead(valid_from)`` over the same window;
   the last version per key gets ``valid_to = NULL`` and
   ``is_current = true``.

100 TB story: the two windows and any downstream per-key join share the
SAME ``key_cols`` hash partitioning, so Catalyst plans exactly one
Exchange for the whole history build; there is no global sort and no
driver-side state. Point-in-time snapshot is a plain filter
(``valid_from <= T < coalesce(valid_to, inf)``) that pushes down to the
history scan — on a real lake the history table would additionally be
partitioned by ``date(valid_from)`` so snapshots prune files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
    weight_col: str | None = None,
    keep_tiebreak: bool = False,
) -> DataFrame:
    """Collapse an event/change log into SCD2 validity intervals.

    Returns one row per *version run*: ``key_cols + attr_cols`` plus
    ``valid_from`` (first ts of the run), ``valid_to`` (start of the
    next run, NULL for the open current version), ``is_current`` and
    ``n_changes`` (events collapsed into the run).

    ``tiebreak_cols`` must make (ts, tiebreak) a total order per key —
    pass the log's unique id so same-timestamp events order
    deterministically across engines and partitionings.

    ``weight_col``: each input row counts as this many changes instead
    of 1 — lets the incremental merger (streaming/scd2_stream.py) feed
    already-collapsed history rows back through without losing their
    accumulated ``n_changes``.

    ``keep_tiebreak``: also output each run's START tiebreak values
    (min_by (ts, tiebreak)) — required by the incremental merger:
    several versions can share one valid_from timestamp (zero-length
    intervals from same-ts changes), and only the stored tiebreak can
    re-order them correctly on a later rebuild.

    Rows with a NULL ``ts_col`` are DROPPED: a version with no
    effective timestamp has no place on the validity axis — and left
    in, it both forges run breaks (the lag-is-NULL "no previous event"
    test can't distinguish a missing row from a NULL ts) and sorts
    NULLS FIRST here but NULLS LAST in the DuckDB twins (dirty-stream
    fuzz finding, r9).
    """
    df = df.filter(F.col(ts_col).isNotNull())
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    def changed() -> Column:
        # first row of a run: any tracked attribute differs from the
        # previous event (null-safe), or there is no previous event
        conds = [~F.col(c).eqNullSafe(F.lag(c).over(w)) for c in attr_cols]
        prev_missing = F.lag(ts_col).over(w).isNull()
        out = prev_missing
        for c in conds:
            out = out | c
        return out

    weight = F.col(weight_col) if weight_col else F.lit(1)
    extra = [weight_col] if weight_col else []
    runs = df.select(*key_cols, *attr_cols, ts_col, *tiebreak_cols, *extra).withColumn(
        "__run", F.sum(F.when(changed(), 1).otherwise(0)).over(w)
    )
    run_order = F.struct(F.col(ts_col), *[F.col(c) for c in tiebreak_cols])
    tb_aggs = (
        [F.min_by(F.col(c), run_order).alias(c) for c in tiebreak_cols] if keep_tiebreak else []
    )
    per_run = runs.groupBy(*key_cols, F.col("__run")).agg(
        *[F.first(c).alias(c) for c in attr_cols],
        F.min(ts_col).alias("valid_from"),
        F.sum(weight).cast("long").alias("n_changes"),
        *tb_aggs,
    )
    # runs were numbered along (ts, tiebreak); order intervals the same
    # way — ordering by valid_from alone is ambiguous when several
    # same-ts versions share it (zero-length intervals)
    w2 = Window.partitionBy(*key_cols).orderBy(F.col("__run").asc())
    return (
        per_run.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__run")
    )


_FAR_FUTURE = "9999-01-01 00:00:00"


def temporal_join(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str],
    a_prefix: str = "a_",
    b_prefix: str = "b_",
) -> DataFrame:
    """SQL:2011-style temporal join of two SCD2 histories: per key,
    intersect the validity intervals, yielding one row per time
    segment where BOTH attribute sets are constant —
    ``[greatest(valid_from), least(valid_to))``, open ends (NULL
    valid_to) treated as +infinity and restored to NULL on output.

    Plan shape: an equi hash join on the key with the overlap
    condition (``a.vf < b.vt AND b.vf < a.vt``) as a residual — never
    a nested loop; both histories and the output share the key's hash
    partitioning. Per key the output size is |A| + |B| segments at
    most (intervals within one history are disjoint), so no quadratic
    blow-up is possible.

    Attribute columns (everything except keys / valid_from / valid_to
    / is_current / n_changes) are emitted with ``a_prefix`` /
    ``b_prefix``.
    """
    meta = {"valid_from", "valid_to", "is_current", "n_changes"}
    a_attrs = [c for c in a.columns if c not in meta and c not in key_cols]
    b_attrs = [c for c in b.columns if c not in meta and c not in key_cols]
    far = F.to_timestamp(F.lit(_FAR_FUTURE))
    aa, bb = a.alias("ta"), b.alias("tb")
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(f"ta.{k}") == F.col(f"tb.{k}"))
    a_vt = F.coalesce(F.col("ta.valid_to"), far)
    b_vt = F.coalesce(F.col("tb.valid_to"), far)
    cond = cond & (F.col("ta.valid_from") < b_vt) & (F.col("tb.valid_from") < a_vt)
    seg_to = F.least(a_vt, b_vt)
    return aa.join(bb, cond).select(
        *[F.col(f"ta.{k}").alias(k) for k in key_cols],
        *[F.col(f"ta.{c}").alias(f"{a_prefix}{c}") for c in a_attrs],
        *[F.col(f"tb.{c}").alias(f"{b_prefix}{c}") for c in b_attrs],
        F.greatest(F.col("ta.valid_from"), F.col("tb.valid_from")).alias("valid_from"),
        F.when(seg_to < far, seg_to).alias("valid_to"),
    )


def scd2_snapshot(history: DataFrame, at_ts: str) -> DataFrame:
    """Point-in-time state: the single valid version per key at ``at_ts``.

    A pure filter over the history — pushes down to the scan; no join,
    no window. ``at_ts`` is a SQL-literal timestamp string.
    """
    t = F.to_timestamp(F.lit(at_ts))
    return history.filter(
        (F.col("valid_from") <= t) & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
