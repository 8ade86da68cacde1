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


def test_mixture_zero_weight_stratum_keeps_nothing(spark):
    """A stratum whose weights sum to 0 keeps NOTHING — even when it is
    outside the shares allowlist (0/0 would otherwise make a NULL frac
    that least() skips, inverting to keep-everything; review finding,
    r9). Both engines, both budget forms."""
    import duckdb

    from rustic_witcher_spark.operators import mixing

    rows = [(i, "en", 10) for i in range(20)] + [(100 + i, "zz", 0) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    kept_abs = mixing.mixture_sample(df, "doc_id", "lang", "n_chars", {"en": 1.0, "zz": 1.0}, budget=100.0)
    assert kept_abs.filter(F.col("lang") == "zz").count() == 0
    assert kept_abs.filter(F.col("lang") == "en").count() > 0
    kept_rel = mixing.mixture_sample_relative(
        df, "doc_id", "lang", "n_chars", {"en": 1.0}, budget_frac=0.5
    )
    assert kept_rel.filter(F.col("lang") == "zz").count() == 0
    # twin parity on the same frame
    import tempfile

    d = tempfile.mkdtemp(prefix="mixzero_")
    df.write.mode("overwrite").parquet(f"{d}/t")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{d}/t/*.parquet')")
    got = sorted(r[0] for r in con.execute(
        mixing.sql_mixture_sample("doc_id", "lang", "n_chars", "t", {"en": 1.0, "zz": 1.0}, 100.0, "doc_id")
    ).fetchall())
    want = sorted(r["doc_id"] for r in kept_abs.collect())
    assert got == want
