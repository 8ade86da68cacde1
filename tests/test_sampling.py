"""Deterministic sampling (operators/sampling.py): reproducibility,
partitioning-invariance, per-class rates, scan-side pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from rustic_witcher_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    uniform01,
)


def test_sample_rate_and_determinism(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    a = deterministic_sample(df, "k", 0.3)
    b = deterministic_sample(df, "k", 0.3)
    ka, kb = {r["k"] for r in a.collect()}, {r["k"] for r in b.collect()}
    assert ka == kb  # same seed -> identical sample, not just same size
    assert 0.27 < len(ka) / 10_000 < 0.33


def test_sample_partitioning_invariant(spark):
    df = spark.range(5_000).withColumnRenamed("id", "k")
    one = {r["k"] for r in deterministic_sample(df.coalesce(1), "k", 0.5).collect()}
    many = {r["k"] for r in deterministic_sample(df.repartition(16), "k", 0.5).collect()}
    assert one == many


def test_sample_is_nested_subset(spark):
    """A row kept at 20% is also kept at 40% — thresholding gives
    monotone nested samples (incremental-curation property)."""
    df = spark.range(5_000).withColumnRenamed("id", "k")
    small = {r["k"] for r in deterministic_sample(df, "k", 0.2).collect()}
    large = {r["k"] for r in deterministic_sample(df, "k", 0.4).collect()}
    assert small <= large


def test_stratified_rates_and_allowlist(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(9_000)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    out = stratified_sample(df, "k", "lang", {"en": 0.5, "de": 1.0})
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got.get("zh") is None          # not in fractions -> dropped
    assert got["de"] == 3_000             # fraction 1.0 keeps all
    assert 1_350 < got["en"] < 1_650      # ~50% of 3000


def test_sample_predicate_reaches_scan(spark, sf_dir):
    """The keep-predicate must be a scan-side filter (no shuffle, no
    UDF) — visible as a Filter directly over the file scan."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    out = stratified_sample(d, "doc_id", "lang", {"en": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
