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
