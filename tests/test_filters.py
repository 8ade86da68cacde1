"""Filter compiler F1–F8 vs DuckDB oracle on the driver's synthetic tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rustic_witcher_spark.config.model import FilterSpec
from rustic_witcher_spark.operators.filters import apply_filter, filter_to_sql
from tests.conftest import assert_same

CASES = [
    ("part", FilterSpec(type="Contains", column="p_name", value="widget")),
    ("part", FilterSpec(type="StartsWith", column="p_name", value="small")),
    ("part", FilterSpec(type="EndsWith", column="p_name", value="bolt")),
    ("part", FilterSpec(type="StartsAndEndsWith", column="p_name", starts_with="red", ends_with="gear")),
    ("customer", FilterSpec(type="Equals", column="c_mktsegment", value="BUILDING")),
    ("customer", FilterSpec(type="AnyOfInt", column="c_nationkey", values=(1, 2, 3))),
    ("orders", FilterSpec(type="AnyOfString", column="o_orderpriority", values=("1-URGENT", "2-HIGH"))),
    ("part", FilterSpec(type="NoFilter")),
]


@pytest.mark.parametrize("table,spec", CASES, ids=[f"{t}-{s.type}" for t, s in CASES])
def test_filter_matches_oracle(spark, duck, sf_dir, table, spec):
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    out = apply_filter(df, spec).select(df.columns[0])  # first col only: avoids float/ts repr noise
    pred = filter_to_sql(spec)
    where = f" WHERE {pred}" if pred else ""
    key = df.columns[0]
    assert_same(out, duck, f"SELECT {key} FROM {table}{where}")


def test_filter_is_pushed_down(spark, sf_dir):
    """The compiled predicate must reach the parquet scan (PushedFilters)."""
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = apply_filter(df, FilterSpec(type="Equals", column="c_mktsegment", value="BUILDING"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "c_mktsegment" in plan


def test_anyof_is_not_in(spark, sf_dir):
    """F6/F7 are NOT-IN despite the name (SURVEY F6 note)."""
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = apply_filter(df, FilterSpec(type="AnyOfInt", column="c_nationkey", values=(0,)))
    assert out.filter(F.col("c_nationkey") == 0).count() == 0
    assert out.count() < df.count()


def test_anyof_keeps_null_rows(spark, duck):
    """Reference semantics: is_in(..., nulls_equal=true).not() KEEPS rows
    whose cell is NULL; plain ~isin would drop them (NULL predicate)."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "k int, v string"
    )
    out = apply_filter(df, FilterSpec(type="AnyOfString", column="v", values=("a",)))
    kept = sorted(r["k"] for r in out.collect())
    assert kept == [2, 3, 4]  # NULL rows retained, 'a' dropped

    dfi = spark.createDataFrame([(1, 10), (2, None), (3, 30)], "k int, v int")
    outi = apply_filter(dfi, FilterSpec(type="AnyOfInt", column="v", values=(10,)))
    assert sorted(r["k"] for r in outi.collect()) == [2, 3]

    # the SQL twin agrees with the Spark predicate on the same data
    duck.execute("CREATE OR REPLACE TABLE _nulls AS SELECT * FROM (VALUES (1, 'a'), (2, NULL), (3, 'b'), (4, NULL)) t(k, v)")
    sql = filter_to_sql(FilterSpec(type="AnyOfString", column="v", values=("a",)))
    got = sorted(r[0] for r in duck.execute(f"SELECT k FROM _nulls WHERE {sql}").fetchall())
    assert got == [2, 3, 4]


def test_anyof_empty_values_is_identity(spark, sf_dir):
    """NOT-IN over an empty list excludes nothing; the SQL twin must
    not emit invalid 'NOT IN ()' syntax."""
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    for t in ("AnyOfInt", "AnyOfString"):
        spec = FilterSpec(type=t, column="c_nationkey", values=())
        assert apply_filter(df, spec).count() == df.count()
        assert filter_to_sql(spec) is None
