"""Round-11 additions: the streaming CDC/SCD2 apply paths under the
driver gate (cdc_incremental / scd2_incremental) and the null-safe
key-split regression the dirty-stream fuzz surfaced when scd2's
foreachBatch merge first ran against NULL partition keys."""

from __future__ import annotations

import datetime
import tempfile

import pytest


def _write_events(spark, rows, d):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(d + "/events.parquet")


def test_cdc_incremental_delete_then_reinsert(spark):
    """Semantics pin for the three-batch replay: an updated key carries
    value+1000; a deleted key (%17, not %34) is gone; a %34 key is
    deleted in batch 1 then RE-INSERTED in batch 2 with value+5000 —
    the shape a tombstone-wins-forever apply gets wrong."""
    from rustic_witcher_spark.queries import q_cdc_incremental

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, t0, 1, "click", float(i), None) for i in (3, 10, 17, 34)]
    d = tempfile.mkdtemp()
    _write_events(spark, rows, d)
    out = {r["event_id"]: r["value"] for r in q_cdc_incremental(spark, d).collect()}
    assert out[3] == 3.0          # untouched
    assert out[10] == 1010.0      # updated
    assert 17 not in out          # deleted, never reinserted
    assert out[34] == 5034.0      # deleted then reinserted from base value


def test_cdc_incremental_routes_through_snapshot_merger(spark, monkeypatch):
    """The entry must exercise the REAL foreachBatch merge path, not a
    batch shortcut: count the merger invocations."""
    from rustic_witcher_spark.streaming import cdc_stream
    from rustic_witcher_spark.queries import q_cdc_incremental

    calls = []
    orig = cdc_stream.parquet_snapshot_merger

    def spy(spark_, path, pk):
        inner = orig(spark_, path, pk)

        def merge(batch_df, batch_id):
            calls.append(batch_id)
            return inner(batch_df, batch_id)

        return merge

    monkeypatch.setattr(cdc_stream, "parquet_snapshot_merger", spy)
    d = tempfile.mkdtemp()
    _write_events(spark, [(1, datetime.datetime(2024, 1, 1), 1, "click", 1.0, None)], d)
    q_cdc_incremental(spark, d).collect()
    assert calls == [0, 1, 2]


def test_scd2_incremental_merges_across_the_cut(spark):
    """A key whose state runs span the median-ts cut must come back as
    ONE coherent history: the open version from batch 0 closes at the
    batch-1 change, exactly as the all-at-once batch build would."""
    from rustic_witcher_spark.queries import q_scd2_incremental
    from rustic_witcher_spark.queries import q_scd2_user_history

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0 + datetime.timedelta(hours=h), 7, state, 1.0, None)
        for h, state in [(0, "a"), (1, "a"), (2, "b"), (3, "b"), (4, "a")]
    ]
    # unique event ids
    rows = [(i,) + r[1:] for i, r in enumerate(rows)]
    d = tempfile.mkdtemp()
    _write_events(spark, rows, d)
    inc = [tuple(r) for r in q_scd2_incremental(spark, d).collect()]
    bat = [tuple(r) for r in q_scd2_user_history(spark, d).collect()]
    assert inc == bat
    # and the history is structurally sane: 3 runs (a, b, a), one open
    assert len(inc) == 3
    assert [r[1] for r in inc] == ["a", "b", "a"]
    assert [r[4] for r in inc] == [False, False, True]
    assert [r[5] for r in inc] == [2, 2, 1]  # n_changes survives the feedback


def test_scd2_merge_null_key_is_one_group(spark):
    """Regression (r11 dirty-stream fuzz): NULL keys are ONE real group
    to the interval builder's window, so the incremental split must
    match them null-safely — a plain equi-join left the NULL-key
    history permanently untouched and rebuilt a second, disconnected
    one (two open versions per NULL key)."""
    from pyspark.sql import functions as F

    from rustic_witcher_spark.operators.scd2 import scd2_intervals
    from rustic_witcher_spark.streaming.scd2_stream import scd2_merge

    t0 = datetime.datetime(2024, 1, 1)
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    all_rows = [
        (1, t0, None, "a"),
        (2, t0 + datetime.timedelta(hours=1), None, "b"),
        (3, t0 + datetime.timedelta(hours=2), None, "b"),
        (4, t0 + datetime.timedelta(hours=3), None, "c"),
    ]
    batch0 = spark.createDataFrame(all_rows[:2], schema)
    batch1 = spark.createDataFrame(all_rows[2:], schema)
    hist0 = scd2_intervals(
        batch0, ["user_id"], ["event_type"], "ts",
        tiebreak_cols=["event_id"], keep_tiebreak=True,
    )
    merged = scd2_merge(hist0, batch1, ["user_id"], ["event_type"], "ts", ["event_id"])
    want = scd2_intervals(
        spark.createDataFrame(all_rows, schema),
        ["user_id"], ["event_type"], "ts",
        tiebreak_cols=["event_id"], keep_tiebreak=True,
    )
    cols = ["user_id", "event_type", "valid_from", "valid_to", "is_current", "n_changes"]
    got = sorted(map(tuple, merged.select(*cols).collect()))
    exp = sorted(map(tuple, want.select(*cols).collect()))
    assert got == exp
    # exactly one open version for the NULL key
    assert sum(1 for r in got if r[4]) == 1


def test_bpe_encode_applies_trained_merges(spark):
    """Meaning pin for train→apply: a corpus dominated by one repeated
    word must end with that word segmented as ONE token (6 merges
    cover its 4 chars), and the digest must pin token ORDER — two docs
    with the same multiset but different order hash differently."""
    import tempfile

    from rustic_witcher_spark.queries import q_bpe_encode

    rows = [
        (1, "abcd abcd abcd abcd abcd abcd abcd abcd"),
        (2, "abcd xy"),
        (3, "xy abcd"),
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(d + "/documents.parquet")
    out = {r["doc_id"]: r for r in q_bpe_encode(spark, d).collect()}
    # doc 1: 8 copies of the fully merged word -> 8 tokens, 1 type
    assert out[1]["n_tokens"] == 8 and out[1]["n_types"] == 1
    # docs 2/3: same token multiset, different order -> different digest
    assert out[2]["n_tokens"] == out[3]["n_tokens"] == 2
    assert out[2]["seq_digest"] != out[3]["seq_digest"]


def test_quota_incremental_saturates_across_batches(spark):
    """Cross-batch state pin: a user with more than QUOTA_INC_CAP
    events split across the two micro-batches admits exactly the CAP
    lowest event_ids with contiguous ranks — later batches see the
    carried n_admitted, not a fresh counter."""
    from rustic_witcher_spark.queries import QUOTA_INC_CAP, q_quota_incremental

    t0 = datetime.datetime(2024, 1, 1)
    # user 1: five events (ids 1,2,3,10,11 — the median cut puts 1-3 in
    # batch 0, 10-11 in batch 1); user 2: one event
    rows = [(i, t0, 1, "click", 1.0, None) for i in (1, 2, 3, 10, 11)]
    rows.append((4, t0, 2, "view", 1.0, None))
    d = tempfile.mkdtemp()
    _write_events(spark, rows, d)
    got = [(r["user_id"], r["event_id"], r["admit_rank"]) for r in q_quota_incremental(spark, d).collect()]
    assert QUOTA_INC_CAP == 3
    assert got == [(1, 1, 1), (1, 2, 2), (1, 3, 3), (2, 4, 1)]


def test_stateful_totals_final_state_equals_batch_aggregate(spark):
    """running ≡ final pin: the last update per key (max n_events) must
    equal the whole-log groupBy — state carried across micro-batches,
    NULL values counted as 0."""
    from rustic_witcher_spark.queries import q_stateful_totals_incremental

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 1.5, None),
        (2, t0, 1, "view", None, None),     # NULL value -> 0
        (10, t0, 1, "click", 2.25, None),   # lands in batch 1
        (3, t0, 2, "view", 4.0, None),
    ]
    d = tempfile.mkdtemp()
    _write_events(spark, rows, d)
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in q_stateful_totals_incremental(spark, d).collect()}
    assert got == {1: (3, 3.75), 2: (1, 4.0)}


def test_dedup_exact_incremental_first_seen_wins(spark):
    """Cross-batch first-seen pin: content present in both batches
    attributes to batch 0; batch-1-only content to batch 1; a
    within-batch dup collapses to one digest row."""
    import tempfile as _tf

    from rustic_witcher_spark.queries import q_dedup_exact_incremental

    rows = [
        (0, "shared content"),       # batch 0 (doc_id % 10 < 8)
        (1, "shared  CONTENT "),     # batch 0, same digest (normalization)
        (2, "standing only"),
        (8, "shared content"),       # batch 1 dup of batch 0 -> must NOT re-emit
        (18, "fresh in batch one"),
    ]
    d = _tf.mkdtemp()
    spark.createDataFrame(rows, "doc_id long, text string").write.mode("overwrite").parquet(
        d + "/documents.parquet"
    )
    got = {r["digest"]: r["first_part"] for r in q_dedup_exact_incremental(spark, d).collect()}
    assert len(got) == 3  # shared, standing-only, fresh
    from rustic_witcher_spark.operators.dedup import normalized_text
    from pyspark.sql import functions as F

    dig = {
        t: spark.range(1).select(F.md5(normalized_text(F.lit(t))).alias("d")).first()["d"]
        for t in ["shared content", "standing only", "fresh in batch one"]
    }
    assert got[dig["shared content"]] == 0
    assert got[dig["standing only"]] == 0
    assert got[dig["fresh in batch one"]] == 1


def test_ingest_health_incremental_counts_partial_rows(spark):
    """Counter-meaning pin: corrupt lines (doc_id%7==0) count corrupt;
    clean lines with NULL fields are clean + key-parsed but NOT
    fully-parsed — the partially-coerced gap the module reports."""
    import tempfile as _tf

    from rustic_witcher_spark.queries import q_ingest_health_incremental

    rows = [
        (0, "text a", "en", "s", 6),    # corrupted (0 % 7 == 0)
        (1, "text b", "en", "s", 6),    # clean + full
        (2, None, "en", "s", 0),        # clean, partial (NULL text)
        (8, "text c", None, "s", 6),    # clean, partial (NULL lang), batch 1
        (14, "x", "en", "s", 1),        # corrupted (14 % 7 == 0), batch 1
    ]
    d = _tf.mkdtemp()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(d + "/documents.parquet")
    r = q_ingest_health_incremental(spark, d).first()
    assert (r["clean_rows"], r["corrupt_rows"], r["parsed_key_rows"], r["fully_parsed_rows"]) == (3, 2, 3, 1)


def test_shard_incremental_order_invariant_and_audited(spark, monkeypatch):
    """The manifest merge is algebraic: swapping the batch order yields
    the identical manifest; and the entry must RAISE when the audit
    reports a corrupted shard (the verify hook is load-bearing, not
    decorative)."""
    import json
    import os
    import tempfile as _tf

    from rustic_witcher_spark.queries import SEED, q_shard_incremental
    from rustic_witcher_spark.streaming.shard_stream import shard_append_batch
    from rustic_witcher_spark.sinks.shards import MANIFEST_NAME

    rows = [(i, f"doc {i}") for i in range(25)]
    d = _tf.mkdtemp()
    spark.createDataFrame(rows, "doc_id long, text string").write.mode("overwrite").parquet(
        d + "/documents.parquet"
    )
    base = {(r["shard"], r["n_rows"], r["digest"]) for r in q_shard_incremental(spark, d).collect()}

    # swapped-order manual replay produces the same manifest
    df = spark.read.parquet(d + "/documents.parquet")
    from pyspark.sql import functions as F

    path = _tf.mkdtemp() + "/shards"
    shard_append_batch(df.filter((F.col("doc_id") % 10) >= 8), 0, "doc_id", 8, path, seed=SEED)
    shard_append_batch(df.filter((F.col("doc_id") % 10) < 8), 1, "doc_id", 8, path, seed=SEED)
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        m = json.load(fh)
    swapped = {(int(k), v["n_rows"], v["digest"]) for k, v in m["shards"].items()}
    assert swapped == base

    # a corrupted manifest digest must make the entry raise via verify
    from rustic_witcher_spark.streaming import shard_stream

    orig = shard_stream.shard_append_batch

    def corrupting(batch_df, batch_id, id_col, n_shards, p, seed=42):
        out = orig(batch_df, batch_id, id_col, n_shards, p, seed=seed)
        if batch_id == 1:
            with open(os.path.join(p, MANIFEST_NAME)) as fh:
                man = json.load(fh)
            k = next(iter(man["shards"]))
            man["shards"][k]["digest"] = (man["shards"][k]["digest"] + 1) % ((1 << 61) - 1)
            with open(os.path.join(p, MANIFEST_NAME), "w") as fh:
                json.dump(man, fh)
        return out

    import rustic_witcher_spark.queries as qmod

    monkeypatch.setattr(shard_stream, "shard_append_batch", corrupting)
    # queries.py imports the function inside the entry body, so the
    # module-attr patch is what it resolves
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="shard audit failed"):
        q_shard_incremental(spark, d)
