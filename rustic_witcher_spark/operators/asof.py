"""As-of join — an operator Spark lacks natively (SURVEY §2.4 extension).

``asof_join(left, right)``: for every left row, attach the most recent
right row of the same key with ``right.ts <= left.ts`` (backward
direction, inclusive).

Implementation is the scalable union+window composition, NOT a
per-group ``merge_asof`` in pandas:

    union(left, right) → window last(right_value, ignorenulls)
        over (partition by key, order by ts / side / tiebreak)
    → keep left rows

Cost shape: ONE shuffle on the key (the same shuffle any join needs),
no range explosion, no per-group Python. Ties at equal ts order the
right row first (inclusive <=) and break among right rows by a caller
tiebreak column, so results are deterministic and partition-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join; appends ``<value_col><suffix>`` columns to left.

    Rows with a NULL timestamp are DROPPED on both sides: an event with
    no timestamp has no as-of position. Left in, the engines invent
    opposite answers — Spark's NULLS-FIRST sort makes a NULL-ts left
    row see nothing and a NULL-ts right row visible to EVERY left row,
    while DuckDB's native ASOF treats NULL as +infinity (a NULL-ts left
    row matches the latest right row) — the dirty-stream fuzz caught
    exactly this divergence (r9).

    The carried payload is the whole right-row STRUCT, not the bare
    value columns: the match is "most recent right ROW", and if that
    row's value is NULL the result is NULL. A bare
    ``last(value, ignorenulls)`` would skip the NULL-valued row and
    resurrect an OLDER right row — masking instead of matching (a
    second real fuzz finding, r9: DuckDB's ASOF returned the latest
    purchase's NULL while this operator time-traveled past it).

    RIGHT rows with a NULL ``on`` key are also DROPPED: the as-of
    match is an EQUI-join on the key and NULL never equi-joins — but
    the union+window implementation would happily group NULL keys
    into one window partition and match a NULL-key left row to a
    NULL-key right row (review finding, r9; verified divergent vs
    DuckDB's native ASOF, which leaves such left rows unmatched).
    Left rows keep the LEFT-join contract: a NULL-key left row
    survives with a NULL match — its partition contains no right rows.
    """
    for k in on:
        right = right.filter(F.col(k).isNotNull())
    left = left.filter(F.col(left_ts).isNotNull())
    right = right.filter(F.col(right_ts).isNotNull())
    lcols = left.columns
    pack_t = ", ".join(
        f"`{v}`: {right.schema[v].dataType.simpleString()}" for v in value_cols
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(0))
    l = l.withColumn("__pack", F.lit(None).cast(f"struct<{pack_t}>"))
    l = l.withColumn("__tb", F.lit(None).cast("long"))

    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(v).alias(v) for v in value_cols]).alias("__pack"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")).alias("__tb"),
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.select(*lcols, "__ts", "__side", "__tb", "__pack").unionByName(
        r.select(*lcols, "__ts", "__side", "__tb", "__pack")
    )

    # right rows (side=1) sort BEFORE left rows at equal ts → inclusive <=
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").desc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the struct literal from a right row is never NULL (even when every
    # field is), so ignorenulls finds the latest right ROW, not the
    # latest non-null value
    out = unioned.withColumn("__m", F.last(F.col("__pack"), ignorenulls=True).over(w))
    return out.filter(F.col("__side") == 0).select(
        *lcols, *[F.col("__m").getField(v).alias(f"{v}{suffix}") for v in value_cols]
    )
