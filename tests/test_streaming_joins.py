"""Stream-stream watermarked interval join (streaming/joins.py):
batch ≡ stream on the same data, cross-micro-batch matching, and the
interval bound actually excluding stale clicks."""

from __future__ import annotations

from datetime import datetime

from rustic_witcher_spark.streaming.joins import attribution_join

C_SCHEMA = "user_id long, click_ts timestamp"
P_SCHEMA = "user_id long, purchase_ts timestamp"


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


CLICKS = [
    (1, _ts(10, 0)),   # converts at 10:30 (lag 1800s)
    (1, _ts(10, 20)),  # also within 1h of 10:30 (lag 600s)
    (2, _ts(9, 0)),    # purchase at 11:00 → outside 1h, no match
    (3, _ts(12, 0)),   # no purchase at all
]
PURCHASES = [
    (1, _ts(10, 30)),
    (2, _ts(11, 0)),
]
EXPECTED = {(1, 1800), (1, 600)}


def _got(rows):
    return {(r["user_id"], r["lag_seconds"]) for r in rows}


def test_batch_attribution(spark):
    c = spark.createDataFrame(CLICKS, C_SCHEMA)
    p = spark.createDataFrame(PURCHASES, P_SCHEMA)
    rows = attribution_join(c, p).collect()
    assert _got(rows) == EXPECTED


def test_batch_left_outer_keeps_unconverted_clicks(spark):
    c = spark.createDataFrame(CLICKS, C_SCHEMA)
    p = spark.createDataFrame(PURCHASES, P_SCHEMA)
    rows = attribution_join(c, p, how="leftOuter").collect()
    matched = {t for t in _got(rows) if t[1] is not None}
    unmatched = [r for r in rows if r["lag_seconds"] is None]
    assert matched == EXPECTED
    assert {(r["user_id"], r["click_ts"]) for r in unmatched} == {(2, _ts(9, 0)), (3, _ts(12, 0))}


def test_stream_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """Outer stream-stream semantics: an unmatched click surfaces with
    NULL purchase once the watermark passes click_ts + within — proven
    by advancing event time with a later batch."""
    csrc, psrc = str(tmp_path / "oc"), str(tmp_path / "op")
    spark.createDataFrame(CLICKS, C_SCHEMA).write.parquet(csrc)
    spark.createDataFrame(PURCHASES, P_SCHEMA).write.parquet(psrc)
    cs = spark.readStream.schema(C_SCHEMA).parquet(csrc)
    ps = spark.readStream.schema(P_SCHEMA).parquet(psrc)
    out = attribution_join(cs, ps, watermark_delay="10 minutes", how="leftOuter")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("oattrib")
        .option("checkpointLocation", str(tmp_path / "ock"))
        .start()
    )
    q.processAllAvailable()
    # advance BOTH watermarks far past every click's interval end
    spark.createDataFrame([(99, _ts(23, 0))], C_SCHEMA).write.mode("append").parquet(csrc)
    spark.createDataFrame([(99, _ts(23, 1))], P_SCHEMA).write.mode("append").parquet(psrc)
    q.processAllAvailable()
    q.processAllAvailable()  # one more cycle so eviction lands in the sink
    rows = spark.sql("SELECT * FROM oattrib WHERE user_id < 99").collect()
    q.stop()
    assert {t for t in _got(rows) if t[1] is not None} == EXPECTED
    assert {(r["user_id"], r["click_ts"]) for r in rows if r["lag_seconds"] is None} == {
        (2, _ts(9, 0)), (3, _ts(12, 0)),
    }


def test_stream_matches_batch_across_microbatches(spark, tmp_path):
    csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    # batch 1: the clicks only
    spark.createDataFrame(CLICKS, C_SCHEMA).write.parquet(csrc)
    spark.createDataFrame([], P_SCHEMA).write.parquet(psrc)
    cs = spark.readStream.schema(C_SCHEMA).parquet(csrc)
    ps = spark.readStream.schema(P_SCHEMA).parquet(psrc)
    out = attribution_join(cs, ps)
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    assert spark.sql("SELECT * FROM attrib").count() == 0  # no purchases yet
    # batch 2: purchases arrive later — the buffered click state matches
    spark.createDataFrame(PURCHASES, P_SCHEMA).write.mode("append").parquet(psrc)
    q.processAllAvailable()
    rows = spark.sql("SELECT * FROM attrib").collect()
    q.stop()
    assert _got(rows) == EXPECTED  # identical to the batch run
