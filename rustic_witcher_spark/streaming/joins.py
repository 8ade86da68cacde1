"""Stream-stream joins: watermarked interval joins for event
attribution (north-star §2.8 extension).

The batch funnel (`funnel_click_purchase`) answers "which click
converted within the window" over a closed dataset; its streaming twin
must answer it CONTINUOUSLY, with bounded state. Spark's stream-stream
inner join does exactly that when BOTH sides carry watermarks and the
join condition bounds the event-time distance — the engine then knows
when a buffered click can never match a future purchase and evicts it.

Scale shape: state per key is bounded by (watermark delay + join
interval) x arrival rate, independent of stream lifetime. The join
itself is a hash join on the equi-key (user_id); the time bound is a
post-condition on the co-partitioned pair, NOT a nested loop — the
same plan shape Spark uses for the batch interval join.

Design notes (public Spark semantics, Structured Streaming guide
"Stream-Stream Joins"): inner joins permit any watermark placement but
the state bound needs the time-interval condition; we therefore take
the delays explicitly and apply the interval condition in BOTH the
batch and streaming builders so batch ≡ stream is testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    key: str = "user_id",
    click_ts: str = "click_ts",
    purchase_ts: str = "purchase_ts",
    within: str = "1 hour",
    watermark_delay: str = "2 hours",
    streaming: bool | None = None,
    how: str = "inner",
) -> DataFrame:
    """Attribute each purchase to the clicks that preceded it by at
    most ``within``. Works identically on batch and streaming inputs
    (pass streaming frames and the watermarks bound the join state).

    ``how="leftOuter"`` additionally emits never-converted clicks with
    NULL purchase columns — in streaming mode such a row is emitted
    only once the watermark proves no future purchase can match (the
    click's state is evicted), so the unmatched output is LATE by up
    to ``watermark_delay`` but exactly-once. Spark requires the
    time-interval condition for outer stream-stream joins; inner joins
    merely want it for state bounding.

    Returns (key, click_ts, purchase_ts, lag_seconds).
    """
    if streaming is None:
        streaming = clicks.isStreaming
    c = clicks.select(F.col(key), F.col(click_ts))
    p = purchases.select(F.col(key).alias("__pkey"), F.col(purchase_ts))
    if streaming:
        c = c.withWatermark(click_ts, watermark_delay)
        p = p.withWatermark(purchase_ts, watermark_delay)
    cond = (
        (F.col(key) == F.col("__pkey"))
        & (F.col(purchase_ts) >= F.col(click_ts))
        & (F.col(purchase_ts) <= F.col(click_ts) + F.expr(f"INTERVAL {within}"))
    )
    return (
        c.join(p, cond, how)
        .select(
            key,
            click_ts,
            purchase_ts,
            (F.unix_timestamp(purchase_ts) - F.unix_timestamp(click_ts)).alias("lag_seconds"),
        )
    )
