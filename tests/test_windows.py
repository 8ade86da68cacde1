"""Windowed event analytics + the Structured Streaming variant."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from rustic_witcher_spark.streaming import windows


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 5), 100, "click", 1.0),
        (2, datetime(2024, 1, 1, 0, 50), 100, "click", 2.0),
        (3, datetime(2024, 1, 1, 1, 10), 100, "view", 4.0),
        (4, datetime(2024, 1, 1, 3, 0), 100, "click", 8.0),  # new session (gap > 30m)
        (5, datetime(2024, 1, 1, 0, 10), 200, "view", 16.0),
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value"])


def test_tumbling(spark, events):
    out = {r["window_start"]: (r["n_events"], r["sum_value"]) for r in windows.tumbling(events).collect()}
    assert out["2024-01-01 00:00:00"] == (3, 19.0)
    assert out["2024-01-01 01:00:00"] == (1, 4.0)
    assert out["2024-01-01 03:00:00"] == (1, 8.0)


def test_sliding_each_event_in_two_windows(spark, events):
    out = windows.sliding(events, width="1 hour", slide="30 minutes")
    total = sum(r["n_events"] for r in out.collect())
    assert total == 2 * events.count()


def test_session_windows(spark, events):
    out = windows.session(events, gap="30 minutes", key="user_id")
    sessions = sorted([(r["user_id"], r["session_start"], r["n_events"]) for r in out.collect()])
    # user 100: events at 0:05 / 0:50 / 1:10 chain (gaps < 30m? 0:05->0:50 is 45m -> break)
    assert (100, "2024-01-01 00:05:00", 1) in sessions
    assert (100, "2024-01-01 00:50:00", 2) in sessions  # 0:50 + 1:10 chain (20m gap)
    assert (100, "2024-01-01 03:00:00", 1) in sessions
    assert (200, "2024-01-01 00:10:00", 1) in sessions


def test_streaming_tumbling_matches_batch(spark, events, tmp_path):
    """The same windowed agg through readStream == the batch answer."""
    events.write.parquet(str(tmp_path / "ev"))
    out = windows.streaming_tumbling_demo(spark, str(tmp_path / "ev"), events.schema)
    got = {r["window_start"]: r["n_events"] for r in out.collect()}
    batch = {r["window_start"]: r["n_events"] for r in windows.tumbling(events).collect()}
    assert got == batch


def test_watermark_drops_late_events(spark, tmp_path):
    """Aggregation state closes once the watermark passes a window:
    an event arriving far behind the max seen event time must not
    resurrect its (already emitted) window. Append mode only emits
    windows the watermark has closed."""
    from pyspark.sql import functions as F

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = str(tmp_path / "late_ev")
    b1 = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 10), 1, "c", 1.0),
         (2, datetime(2024, 1, 1, 5, 0), 1, "c", 2.0)],  # pushes watermark ~5h
        schema,
    )
    b1.write.parquet(src)
    stream = spark.readStream.schema(b1.schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("late")
        .option("checkpointLocation", str(tmp_path / "late_ck"))
        .start()
    )
    q.processAllAvailable()
    # late event for the long-closed 00:00 window
    spark.createDataFrame([(3, datetime(2024, 1, 1, 0, 20), 1, "c", 4.0)], schema) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    # force final emission of whatever is still open
    spark.createDataFrame([(4, datetime(2024, 1, 1, 9, 0), 1, "c", 8.0)], schema) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    rows = {r["ws"]: r["n"] for r in spark.sql("SELECT * FROM late").collect()}
    q.stop()
    # the 00:00 window emitted with ONLY the on-time event; the late
    # arrival (event 3) was dropped by the watermark, not re-counted
    assert rows.get("2024-01-01 00:00:00") == 1


def test_streaming_histogram_merges_across_microbatches(spark, tmp_path):
    """The mergeability claim, proven: the SAME value_histogram
    expression over a two-micro-batch stream (complete mode) equals
    the batch histogram over the union — per-batch partial counts
    combined by addition, state bounded by #keys x #buckets."""
    from rustic_witcher_spark.streaming.windows import value_histogram

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = str(tmp_path / "hist_ev")
    b1 = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 0, i), 1, "c", float(i)) for i in range(10)], schema
    )
    b2 = spark.createDataFrame(
        [(100 + i, datetime(2024, 1, 1, 1, i), 1, "c", float(i * 3)) for i in range(10)], schema
    )
    b1.write.mode("append").parquet(src)

    stream = spark.readStream.schema(b1.schema).parquet(src)
    q = (
        value_histogram(stream, keys=["event_type"])
        .writeStream.outputMode("complete")
        .format("memory").queryName("hist_stream")
        .option("checkpointLocation", str(tmp_path / "hist_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        b2.write.mode("append").parquet(src)  # second micro-batch
        q.processAllAvailable()
        got = {
            (r["event_type"], r["bucket"]): r["n"]
            for r in spark.sql("SELECT * FROM hist_stream").collect()
        }
    finally:
        q.stop()
    batch = {
        (r["event_type"], r["bucket"]): r["n"]
        for r in value_histogram(b1.unionByName(b2), keys=["event_type"]).collect()
    }
    assert got == batch and len(batch) >= 4
