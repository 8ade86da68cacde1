"""Streaming SCD2 maintenance: batch ≡ stream under in-order delivery,
late-event splicing, structural consistency under disorder, and the
real foreachBatch flow over a file-source stream."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from rustic_witcher_spark.operators.scd2 import scd2_intervals
from rustic_witcher_spark.streaming.scd2_stream import (
    scd2_merge,
    scd2_snapshot_merger,
    streaming_scd2_apply,
)

T = dt.datetime
SCHEMA = "k long, state string, ts timestamp, eid long"


def _hist_key(r):
    return (r["k"], str(r["valid_from"]), r["state"], str(r["valid_to"]), r["n_changes"])


def _assert_equal_history(a_rows, b_rows):
    assert sorted(map(_hist_key, a_rows)) == sorted(map(_hist_key, b_rows))


def _assert_consistent(rows):
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    for rs in by_key.values():
        rs.sort(key=lambda r: r["valid_from"])
        for x, y in zip(rs, rs[1:]):
            assert x["valid_to"] == y["valid_from"]
        assert rs[-1]["valid_to"] is None
        assert sum(r["is_current"] for r in rs) == 1


def test_inorder_chunked_stream_equals_batch(spark):
    events = [
        (k, state, T(2024, 1, d, h), k * 1000 + d * 10 + h)
        for k in (1, 2, 3)
        for d, h, state in [
            (1, 0, "a"), (1, 5, "a"), (2, 0, "b"), (3, 0, "b"),
            (4, 0, "a"), (5, 0, "c"), (6, 0, "c"), (7, 0, "a"),
        ]
    ]
    df = spark.createDataFrame(events, SCHEMA)
    batch_hist = scd2_intervals(df, ["k"], ["state"], "ts", ["eid"]).collect()

    # three time-ordered chunks (per-key nondecreasing ts across chunks)
    chunks = [
        df.filter(F.col("ts") < T(2024, 1, 3)),
        df.filter((F.col("ts") >= T(2024, 1, 3)) & (F.col("ts") < T(2024, 1, 6))),
        df.filter(F.col("ts") >= T(2024, 1, 6)),
    ]
    hist = scd2_intervals(chunks[0], ["k"], ["state"], "ts", ["eid"], keep_tiebreak=True)
    for chunk in chunks[1:]:
        hist = scd2_merge(hist, chunk, ["k"], ["state"], "ts", ["eid"])
    _assert_equal_history(hist.collect(), batch_hist)


def test_late_event_splices_into_middle(spark):
    base = spark.createDataFrame(
        [(1, "a", T(2024, 1, 1), 10), (1, "b", T(2024, 1, 5), 11)], SCHEMA
    )
    hist = scd2_intervals(base, ["k"], ["state"], "ts", ["eid"], keep_tiebreak=True)
    late = spark.createDataFrame([(1, "c", T(2024, 1, 3), 12)], SCHEMA)
    merged = scd2_merge(hist, late, ["k"], ["state"], "ts", ["eid"]).collect()
    rows = sorted(merged, key=lambda r: r["valid_from"])
    assert [(r["state"], str(r["valid_from"])[:10], str(r["valid_to"])[:10] if r["valid_to"] else None) for r in rows] == [
        ("a", "2024-01-01", "2024-01-03"),
        ("c", "2024-01-03", "2024-01-05"),
        ("b", "2024-01-05", None),
    ]
    _assert_consistent(merged)
    # and it matches the full-log batch rebuild exactly
    full = scd2_intervals(base.unionByName(late), ["k"], ["state"], "ts", ["eid"]).collect()
    _assert_equal_history(merged, full)


def test_untouched_keys_are_not_rewritten_logically(spark):
    base = spark.createDataFrame(
        [(1, "a", T(2024, 1, 1), 1), (2, "x", T(2024, 1, 1), 2)], SCHEMA
    )
    hist = scd2_intervals(base, ["k"], ["state"], "ts", ["eid"], keep_tiebreak=True)
    batch = spark.createDataFrame([(1, "b", T(2024, 1, 2), 3)], SCHEMA)
    merged = scd2_merge(hist, batch, ["k"], ["state"], "ts", ["eid"]).collect()
    k2 = [r for r in merged if r["k"] == 2]
    assert len(k2) == 1 and k2[0]["state"] == "x" and k2[0]["is_current"]
    assert len([r for r in merged if r["k"] == 1]) == 2


def test_adversarial_disorder_stays_consistent(spark):
    # deliver chunks in SHUFFLED time order — exact equivalence is not
    # promised (collapsed interior points), but structural consistency is
    events = [
        (1, s, T(2024, 1, d), d) for d, s in
        [(1, "a"), (2, "a"), (3, "b"), (4, "a"), (5, "a"), (6, "c")]
    ]
    df = spark.createDataFrame(events, SCHEMA)
    order = [5, 2, 6, 1, 4, 3]
    hist = scd2_intervals(df.filter(F.col("eid") == order[0]), ["k"], ["state"], "ts", ["eid"], keep_tiebreak=True)
    for eid in order[1:]:
        hist = scd2_merge(hist, df.filter(F.col("eid") == eid), ["k"], ["state"], "ts", ["eid"])
    rows = hist.collect()
    _assert_consistent(rows)
    # every change point that was delivered as its own batch survives
    assert {str(r["valid_from"])[:10] for r in rows} >= {"2024-01-01", "2024-01-03", "2024-01-06"}


def test_foreachbatch_flow_over_file_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    hist_path = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")
    b1 = spark.createDataFrame(
        [(1, "a", T(2024, 1, 1), 1), (2, "x", T(2024, 1, 1), 2)], SCHEMA
    )
    b1.write.mode("append").parquet(src)
    stream = spark.readStream.schema(b1.schema).parquet(src)
    q = streaming_scd2_apply(
        spark, stream, hist_path, ["k"], ["state"], "ts", ckpt, tiebreak_cols=["eid"]
    )
    try:
        q.processAllAvailable()
        h1 = spark.read.parquet(hist_path).collect()
        assert len(h1) == 2 and all(r["is_current"] for r in h1)

        spark.createDataFrame(
            [(1, "b", T(2024, 1, 2), 3), (3, "z", T(2024, 1, 2), 4)], SCHEMA
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        h2 = spark.read.parquet(hist_path).collect()
        _assert_consistent(h2)
        states = {r["k"]: r["state"] for r in h2 if r["is_current"]}
        assert states == {1: "b", 2: "x", 3: "z"}
        assert len([r for r in h2 if r["k"] == 1]) == 2
    finally:
        q.stop()


def test_merger_bootstrap_and_restart(spark, tmp_path):
    """The merger bootstraps an empty history and a NEW merger instance
    picks up the existing snapshot (restart survival)."""
    hist_path = str(tmp_path / "hist")
    m1 = scd2_snapshot_merger(spark, hist_path, ["k"], ["state"], "ts", ["eid"])
    m1(spark.createDataFrame([(1, "a", T(2024, 1, 1), 1)], SCHEMA), 0)
    m2 = scd2_snapshot_merger(spark, hist_path, ["k"], ["state"], "ts", ["eid"])
    m2(spark.createDataFrame([(1, "b", T(2024, 1, 2), 2)], SCHEMA), 1)
    rows = sorted(spark.read.parquet(hist_path).collect(), key=lambda r: r["valid_from"])
    assert [r["state"] for r in rows] == ["a", "b"]
    assert rows[0]["valid_to"] == rows[1]["valid_from"] and rows[1]["is_current"]


# -------------------------------------------------- property: random logs


def test_property_random_inorder_chunking_equals_batch(spark):
    """Randomized logs: ANY chunking that respects per-key (ts, eid)
    order reproduces the batch history exactly — including same-ts
    ties, single-event keys, and all-same-state runs. One Spark job
    per example batch (hypothesis-style, inlined: a fixed seed sweep
    keeps runtime bounded while varying shapes)."""
    import random

    for seed in range(6):
        rng = random.Random(seed)
        events = []
        eid = 0
        for k in range(1, rng.randint(2, 5)):
            t = 0
            for _ in range(rng.randint(1, 12)):
                t += rng.randint(0, 3)  # 0 -> same-ts ties happen
                events.append((k, rng.choice("abc"), T(2024, 1, 1, 0, t % 60, t // 60), eid))
                eid += 1
        df = spark.createDataFrame(events, SCHEMA)
        batch_hist = scd2_intervals(df, ["k"], ["state"], "ts", ["eid"]).collect()

        # chunk by global (ts, eid) order — per-key order follows
        events_sorted = sorted(events, key=lambda e: (e[2], e[3]))
        n_chunks = rng.randint(2, 4)
        cuts = sorted(rng.sample(range(1, len(events_sorted)), min(n_chunks - 1, len(events_sorted) - 1)))
        chunks = [events_sorted[a:b] for a, b in zip([0] + cuts, cuts + [len(events_sorted)])]
        hist = scd2_intervals(spark.createDataFrame(chunks[0], SCHEMA), ["k"], ["state"], "ts", ["eid"], keep_tiebreak=True)
        for chunk in chunks[1:]:
            hist = scd2_merge(hist, spark.createDataFrame(chunk, SCHEMA), ["k"], ["state"], "ts", ["eid"])
        _assert_equal_history(hist.collect(), batch_hist)
        _assert_consistent(hist.collect())
