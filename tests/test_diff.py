"""Table diff operator (operators/diff.py) + datadiff CLI."""

from __future__ import annotations

from rustic_witcher_spark.operators.diff import diff_summary, table_diff


def test_table_diff_statuses(spark):
    src = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)], "k int, v string, x double"
    )
    tgt = spark.createDataFrame(
        [(1, "a", 1.0),          # identical -> absent from diff
         (2, "b", 99.0),         # value mismatch
         (3, "c", 3.0),          # NULL -> value mismatch (sentinel distinguishes)
         (5, "e", 5.0)],         # missing_in_source
        "k int, v string, x double",
    )
    got = {r["k"]: r["status"] for r in table_diff(src, tgt, ["k"]).collect()}
    assert got == {2: "mismatch", 3: "mismatch", 4: "missing_in_target", 5: "missing_in_source"}


def test_null_encoding_not_ambiguous(spark):
    """(NULL,'x') must differ from ('x',NULL) — naive concat_ws collides."""
    src = spark.createDataFrame([(1, None, "x")], "k int, a string, b string")
    tgt = spark.createDataFrame([(1, "x", None)], "k int, a string, b string")
    assert table_diff(src, tgt, ["k"]).count() == 1


def test_diff_summary_counts(spark):
    src = spark.createDataFrame([(i, i * 1.0) for i in range(100)], "k int, v double")
    tgt = spark.createDataFrame([(i, i * 1.0 if i % 10 else -1.0) for i in range(90)], "k int, v double")
    got = {r["status"]: r["n"] for r in diff_summary(src, tgt, ["k"]).collect()}
    assert got == {"mismatch": 9, "missing_in_target": 10}  # k=0..89 %10==0 -> 9 mismatches (k=0 too) +1?


def test_digest_shuffle_is_narrow(spark):
    """The exchange must carry digests, not full rows: before the join
    each side is projected to (pk, md5)."""
    src = spark.createDataFrame([(1, "a" * 100, "b" * 100)], "k int, a string, b string")
    plan = table_diff(src, src, ["k"])._jdf.queryExecution().optimizedPlan().toString()
    # the full-row columns are pruned away below the join
    assert "'a'" not in plan
