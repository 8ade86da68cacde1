"""Round-12 additions: the last ungraded streaming behavior classes
under the driver gate — the watermarked stream-stream attribution join
(state + left-outer watermark eviction) and the two complete-mode
stateful aggregations (drift term counts, the mergeable histogram) run
as REAL Structured Streaming queries.

The load-bearing claims:
  * attribution_incremental's output SET equals the batch left-outer
    interval join regardless of where the median cut lands
    (batch-cut invariance — fuzzed over dirty event logs);
  * unmatched clicks are emitted exactly once, via watermark eviction,
    NULL-padded (the late-emission class no prior entry graded);
  * the complete-mode entries' final state equals the batch aggregate
    (additive counts are batch-order-invariant), through the SAME
    finalizer code as their batch twins.
"""

from __future__ import annotations

import datetime
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

T0 = datetime.datetime(2024, 1, 1)


def _write_events(spark, rows, d):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(d + "/events.parquet")


def _batch_attribution_expected(spark, d):
    """The semantics oracle: batch left-outer interval join through the
    same attribution_join builder + the entry's formatting."""
    from pyspark.sql import functions as F

    from rustic_witcher_spark.queries import _fmt
    from rustic_witcher_spark.sources.parquet import read_events
    from rustic_witcher_spark.streaming.joins import attribution_join

    ev = read_events(spark, d).filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    c = ev.filter(F.col("event_type") == "click").select("user_id", F.col("ts").alias("click_ts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    return attribution_join(c, p, streaming=False, how="leftOuter").select(
        "user_id",
        _fmt(F.col("click_ts")).alias("click_at"),
        _fmt(F.col("purchase_ts")).alias("purchase_at"),
        "lag_seconds",
    )


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=lambda t: tuple(str(x) for x in t)
    )


def test_attribution_incremental_matches_and_evicts(spark):
    """Semantics pin on a hand-built log: a click matched by TWO
    purchases yields two rows; a click whose only purchase is outside
    1h, and a click with no purchase at all, surface exactly once as
    NULL-padded evictions; a purchase with no click yields nothing."""
    from rustic_witcher_spark.queries import q_attribution_incremental

    h = datetime.timedelta
    rows = [
        (1, T0, 1, "click", 1.0, None),
        (2, T0 + h(minutes=10), 1, "purchase", 1.0, None),
        (3, T0 + h(minutes=50), 1, "purchase", 1.0, None),
        (4, T0, 2, "click", 1.0, None),          # purchase 2h later: no match
        (5, T0 + h(hours=2), 2, "purchase", 1.0, None),
        (6, T0 + h(hours=3), 3, "click", 1.0, None),   # never converts
        (7, T0, 4, "purchase", 1.0, None),        # purchase with no click
    ]
    d = tempfile.mkdtemp()
    _write_events(spark, rows, d)
    got = [
        (r["user_id"], r["purchase_at"] is not None, r["lag_seconds"])
        for r in q_attribution_incremental(spark, d).collect()
    ]
    assert got == [
        (1, True, 600),
        (1, True, 3000),
        (2, False, None),
        (3, False, None),
    ]


@given(
    data=st.lists(
        st.tuples(
            st.sampled_from([None, 0, 1, 2, 3]),                 # user_id
            st.sampled_from(["click", "purchase", "view"]),      # event_type
            st.one_of(st.none(), st.integers(0, 360)),           # ts offset (minutes)
        ),
        min_size=0,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_attribution_incremental_batch_cut_invariance_fuzz(spark, data):
    """Dirty-stream fuzz: NULL users, NULL timestamps, duplicate
    events, clicks/purchases at identical instants — the streaming
    output SET must equal the batch left-outer interval join whatever
    the data-dependent median cut does to the micro-batching."""
    from rustic_witcher_spark.queries import q_attribution_incremental

    rows = [
        (i, (T0 + datetime.timedelta(minutes=off)) if off is not None else None, uid, typ, 1.0, None)
        for i, (uid, typ, off) in enumerate(data)
    ]
    d = tempfile.mkdtemp()
    _write_events(spark, rows, d)
    got = _rows(q_attribution_incremental(spark, d))
    want = _rows(_batch_attribution_expected(spark, d))
    assert got == want


def test_drift_incremental_equals_batch(spark, sf_dir):
    """The complete-mode state table + shared finalizer must reproduce
    the batch KL entry exactly (additive counts, same code path)."""
    from rustic_witcher_spark.queries import q_drift_incremental, q_drift_vs_reference

    assert _rows(q_drift_incremental(spark, sf_dir)) == _rows(
        q_drift_vs_reference(spark, sf_dir)
    )


def test_histogram_incremental_equals_batch(spark, sf_dir):
    """Streaming mergeable-histogram state + shared finalizer ==
    batch latency_histogram on the real table."""
    from rustic_witcher_spark.queries import q_histogram_incremental, q_latency_histogram

    assert _rows(q_histogram_incremental(spark, sf_dir)) == _rows(
        q_latency_histogram(spark, sf_dir)
    )


def test_histogram_incremental_dirty_events(spark):
    """Dirty-stream pin: NULL values (dropped), NULL event_type (one
    real group), NULL event_id (split key coalesces — no lost rows),
    value 0 and a large value land in the right buckets, and the
    stream result equals the batch build on the same log."""
    from rustic_witcher_spark.queries import q_histogram_incremental, q_latency_histogram

    rows = [
        (1, T0, 1, "click", 0.0, None),
        (2, T0, 1, "click", 1.0, None),
        (None, T0, 1, "click", 7.5, None),
        (4, T0, 2, None, 3.0, None),
        (5, T0, 2, None, None, None),       # NULL value: dropped
        (6, T0, 3, "view", 1000.0, None),
    ]
    d = tempfile.mkdtemp()
    _write_events(spark, rows, d)
    got = _rows(q_histogram_incremental(spark, d))
    want = _rows(q_latency_histogram(spark, d))
    assert got == want
    # NULL value dropped: total n across buckets is 5, not 6
    assert sum(r[3] for r in got) == 5


def test_drift_incremental_dirty_docs(spark):
    """Dirty-corpus pin: NULL text, empty text, NULL source (excluded
    by != on both faces), OOV terms — stream == batch."""
    from rustic_witcher_spark.queries import q_drift_incremental, q_drift_vs_reference

    docs = [
        (0, "alpha beta beta", "en", "src0", 15),
        (1, "alpha beta", "en", "src0", 10),
        (2, "alpha zz yy", "en", "src1", 11),
        (3, None, "en", "src1", 0),
        (4, "", "en", "src2", 0),
        (5, "beta beta beta", None, "src2", 14),
        (6, "alpha", "en", None, 5),          # NULL source: excluded everywhere
        (None, "beta gamma", "en", "src1", 10),  # NULL doc_id: split must keep it
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(d + "/documents.parquet")
    assert _rows(q_drift_incremental(spark, d)) == _rows(q_drift_vs_reference(spark, d))


def _write_customer(spark, rows, d):
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(d + "/customer.parquet")


def test_k_anonymity_lattice_levels_and_violations(spark):
    """Meaning pin: 12 records in one (nation, segment) cell split
    across two acctbal buckets (7+5) with K=10 — level 0 violates on
    both buckets, level 1 is the minimal safe generalization; l counts
    distinct exact balances."""
    from rustic_witcher_spark.queries import q_k_anonymity_lattice

    rows = [(i, "x", 1, 100.0 + (i % 2), "AUTO") for i in range(7)]           # bucket 0
    rows += [(100 + i, "x", 1, 1100.0, "AUTO") for i in range(5)]             # bucket 1
    d = tempfile.mkdtemp()
    _write_customer(spark, rows, d)
    out = {r["level"]: r for r in q_k_anonymity_lattice(spark, d).collect()}
    assert out[0]["n_groups"] == 2
    assert out[0]["violating_groups"] == 2
    assert out[0]["records_at_risk"] == 12
    assert out[0]["min_group_size"] == 5
    assert out[1]["n_groups"] == 1
    assert out[1]["violating_groups"] == 0          # 12 >= K: minimal safe level
    assert out[1]["min_l_diversity"] == 3           # 100.0, 101.0, 1100.0
    assert out[3]["n_groups"] == 1                  # grand total row


def test_k_anonymity_null_key_group_is_not_a_subtotal(spark):
    """The classic rollup-audit bug: a data-NULL nationkey group at
    level 0 must stay a level-0 group (grouping() flags identify
    levels), never collide with the level-2 subtotal over the same
    records."""
    from rustic_witcher_spark.queries import q_k_anonymity_lattice

    rows = [(i, "x", None, 50.0, "AUTO") for i in range(3)]
    rows += [(10 + i, "x", 2, 50.0, "AUTO") for i in range(4)]
    d = tempfile.mkdtemp()
    _write_customer(spark, rows, d)
    out = {r["level"]: r for r in q_k_anonymity_lattice(spark, d).collect()}
    # level 0: two real groups (NULL-nation x bucket, nation-2 x bucket)
    assert out[0]["n_groups"] == 2
    assert out[0]["min_group_size"] == 3
    # level 2 (nation only): still two groups — NULL nation is real data
    assert out[2]["n_groups"] == 2
    # level 3: ONE grand-total row over all 7
    assert out[3]["n_groups"] == 1 and out[3]["min_group_size"] == 7


def test_join_skew_probe_counts_and_ppm(spark):
    """Meaning pin: pairs = clicks x purchases per user, ppm by floor
    division over the total, NULL users dropped, click-only and
    purchase-only users emit nothing, ties break on user_id."""
    from rustic_witcher_spark.queries import q_join_skew_probe

    rows = []
    eid = 0
    def add(uid, typ, n):
        nonlocal eid, rows
        for _ in range(n):
            rows.append((eid, T0, uid, typ, 1.0, None)); eid += 1
    add(1, "click", 3); add(1, "purchase", 2)    # 6 pairs
    add(2, "click", 2); add(2, "purchase", 1)    # 2 pairs
    add(3, "click", 1); add(3, "purchase", 2)    # 2 pairs (tie with user 2)
    add(4, "click", 5)                           # click-only: no row
    add(None, "click", 2); add(None, "purchase", 2)  # NULL user: dropped
    d = tempfile.mkdtemp()
    _write_events(spark, rows, d)
    got = [tuple(r) for r in q_join_skew_probe(spark, d).collect()]
    assert got == [
        (1, 3, 2, 6, 600000),
        (2, 2, 1, 2, 200000),
        (3, 1, 2, 2, 200000),
    ]
