"""Windowed event analytics (SURVEY §2.8 extension).

The reference's incremental model is ordered CDC micro-batches; the
engine extends it with real time-window operators over the ``events``
table. Batch and Structured Streaming share the same expressions —
``F.window`` / ``F.session_window`` work in both — so a batch-verified
query can be re-bound to ``readStream`` unchanged.

Window starts are epoch-aligned (both Spark and DuckDB's time_bucket),
which is what makes the DuckDB oracles exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fmt(col):  # timestamp → canonical string (avoids engine TZ-repr drift)
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def tumbling(df: DataFrame, ts_col: str = "ts", width: str = "1 hour", keys: list[str] | None = None) -> DataFrame:
    """Tumbling-window count/sum per window (and optional keys)."""
    keys = keys or []
    w = F.window(F.col(ts_col), width)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(_fmt(F.col("w.start")).alias("window_start"), *keys, "n_events", "sum_value")
    )


def sliding(df: DataFrame, ts_col: str = "ts", width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding-window aggregate; each event lands in width/slide windows."""
    w = F.window(F.col(ts_col), width, slide)
    return (
        df.groupBy(w.alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(_fmt(F.col("w.start")).alias("window_start"), "n_events", "sum_value")
    )


def value_histogram(df: DataFrame, value_col: str = "value", keys: list[str] | None = None) -> DataFrame:
    """Mergeable log2-bucket histogram — the streaming face of the
    batch ``latency_histogram`` entry. Fixed integer buckets (binary
    length of floor(v)+1, no float log2) are what make the counts
    ALGEBRAICALLY mergeable: per-micro-batch partial counts combine by
    addition, so the same expression runs over ``readStream`` in
    update/complete mode with bounded state (#keys × #buckets rows) —
    unlike exact percentiles, which cannot stream. Batch ≡ stream is
    pinned in test_windows.py; the batch registry entry
    (q_latency_histogram) builds on THIS function so the two faces
    cannot drift.

    Contract: ``value_col`` must be non-negative. floor(v)+1 <= 0
    makes F.conv read the long as unsigned 64-bit (bucket 63) and
    v in [-1, 0) collides with the [0, 1) bucket — clamp or abs
    signed metrics before calling. NULL values are DROPPED: a row with
    no measurement belongs to no bucket (a NULL bucket group would
    also sort NULLS FIRST in Spark but NULLS LAST in the DuckDB twin's
    cumulative window — the dirty-stream fuzz caught exactly that)."""
    keys = keys or []
    bucket = (
        F.length(F.conv((F.floor(F.col(value_col)) + F.lit(1)).cast("long"), 10, 2)) - 1
    ).alias("bucket")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, bucket)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def session(df: DataFrame, ts_col: str = "ts", gap: str = "30 minutes", key: str = "user_id") -> DataFrame:
    """Session windows per key with a fixed inactivity gap.

    Uses ``F.session_window`` (native, works in batch since Spark 3.2).
    Session end = last event + gap (Spark's semantics; the oracle
    replicates via gaps-and-islands lag/cumsum).
    """
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), key)
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col(key),
            _fmt(F.col("sw.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def streaming_tumbling_demo(spark, events_dir: str, schema, width: str = "1 hour"):
    """Structured Streaming variant: file source → watermark → windowed agg
    → memory sink, driven to completion synchronously (for tests).

    This is the shape a production stream (Kafka source, same
    transformations, checkpointed sink) would use; watermark bounds the
    window state store for late data.
    """
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window(F.col("ts"), width).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(_fmt(F.col("w.start")).alias("window_start"), "n_events")
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName("tumbling_demo").start()
    q.processAllAvailable()
    out = spark.sql("SELECT * FROM tumbling_demo")
    q.stop()
    return out
