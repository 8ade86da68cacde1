"""Custom stateful streaming operators (applyInPandasWithState)."""

from __future__ import annotations

from datetime import datetime

import pytest

from rustic_witcher_spark.streaming import stateful


@pytest.fixture(scope="module")
def event_rows():
    return [
        (1, datetime(2024, 1, 1, 0, 0), 100, "click", 1.0),
        (2, datetime(2024, 1, 1, 0, 1), 100, "view", 2.0),
        (3, datetime(2024, 1, 1, 0, 2), 200, "click", 4.0),
        (4, datetime(2024, 1, 1, 0, 3), 200, "click", 8.0),
        (5, datetime(2024, 1, 1, 0, 4), 300, "view", 16.0),
    ]


SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _run_stream(spark, rows, tmp_path, op, query_name):
    df = spark.createDataFrame(rows, SCHEMA)
    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out_mode = "append" if query_name == "seen" else "update"
    q = (
        op(stream)
        .writeStream.outputMode(out_mode)
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    rows_out = spark.sql(f"SELECT * FROM {query_name}").collect()
    q.stop()
    return rows_out


def test_streaming_seen_filter(spark, event_rows, tmp_path):
    out = _run_stream(spark, event_rows, tmp_path, stateful.streaming_seen_filter, "seen")
    got = {r["user_id"]: r["event_id"] for r in out}
    assert got == {100: 1, 200: 3, 300: 5}  # first event per user only


def test_running_user_totals(spark, event_rows, tmp_path):
    out = _run_stream(spark, event_rows, tmp_path, stateful.running_user_totals, "totals")
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in out}
    assert got == {100: (2, 3.0), 200: (2, 12.0), 300: (1, 16.0)}


def test_totals_accumulate_across_batches(spark, event_rows, tmp_path):
    """Second batch of files updates the carried state."""
    df = spark.createDataFrame(event_rows, SCHEMA)
    src = str(tmp_path / "src2")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stateful.running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    more = spark.createDataFrame([(6, datetime(2024, 1, 2), 100, "click", 10.0)], SCHEMA)
    more.write.mode("append").parquet(src)
    q.processAllAvailable()
    rows = spark.sql("SELECT * FROM totals2").collect()
    q.stop()
    # memory sink in update mode appends updated rows; take the latest per user
    latest = {}
    for r in rows:
        latest[r["user_id"]] = (r["n_events"], r["total_value"])
    assert latest[100] == (3, 13.0)


def test_seen_filter_min_across_chunks():
    """The first-event pick must span ALL pandas chunks of a group's
    micro-batch, not just the first non-empty chunk."""
    import pandas as pd

    class FakeState:
        exists = False

        def update(self, v):
            self.exists = True

    chunks = iter(
        [
            pd.DataFrame({"user_id": [7, 7], "event_id": [50, 60]}),
            pd.DataFrame({"user_id": [], "event_id": []}),
            pd.DataFrame({"user_id": [7], "event_id": [3]}),  # true first
        ]
    )
    out = list(stateful._seen_filter_fn((7,), chunks, FakeState()))
    assert len(out) == 1
    assert out[0]["event_id"].iloc[0] == 3
