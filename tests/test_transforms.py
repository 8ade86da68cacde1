"""Per-operator unit tests mirroring the reference's test strategy
(SURVEY §5(1)): tiny DataFrames, seed 42, output ≠ input, shape/structure
preserved."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rustic_witcher_spark.config.model import ColumnTransformation, TransformationSpec
from rustic_witcher_spark.functions import fake
from rustic_witcher_spark.operators.transforms import (
    SchemaDriftError,
    apply_transformations,
    check_schema_drift,
    sanitize_null_bytes,
)

SEED = 42


def _col_values(df, col):
    return [r[col] for r in df.select(col).collect()]


@pytest.fixture(scope="module")
def strings_df(spark):
    return spark.createDataFrame([("foo-bar",), ("foo-qux",), ("hello world",)], ["a"])


# ------------------------------------------------------------- faker family


@pytest.mark.parametrize(
    "fn",
    [fake.fake_firstname, fake.fake_lastname, fake.fake_name, fake.fake_companyname, fake.fake_email, fake.fake_address, fake.fake_md5],
)
def test_faker_changes_values_preserves_shape(spark, strings_df, fn):
    out = strings_df.select(fn(F.col("a"), SEED).alias("a"))
    vals = _col_values(out, "a")
    orig = _col_values(strings_df, "a")
    assert len(vals) == len(orig)
    assert all(v is not None for v in vals)
    assert vals != orig


def test_fake_email_shape(spark, strings_df):
    for v in _col_values(strings_df.select(fake.fake_email(F.col("a"), SEED).alias("a")), "a"):
        local, _, domain = v.partition("@")
        assert local and domain, v
        assert "." in local


def test_fake_md5_is_uuid4_shaped(spark, strings_df):
    import re

    for v in _col_values(strings_df.select(fake.fake_md5(F.col("a"), SEED).alias("a")), "a"):
        assert re.fullmatch(r"[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}", v), v


def test_fake_phone_structure_preserved(spark):
    # mirrors tests/fake_phone_transformator.rs:12-38
    df = spark.createDataFrame([("+44 20 7123 4567",), ("555-0199",), ("7",), ("",)], ["a"])
    out = _col_values(df.select(fake.fake_phone(F.col("a"), SEED).alias("a")), "a")
    orig = _col_values(df, "a")
    full = out[0]
    assert len(full) == len(orig[0])
    assert full[0] == "+" and full[3] == " " and full[6] == " "  # punctuation kept
    assert full != orig[0]
    # every digit changed (rotation has no fixed point)
    for o, n in zip(orig[0], full):
        if o.isdigit():
            assert n.isdigit() and n != o
    assert out[2] == "7"  # length ≤ 1 kept
    assert out[3] == ""


def test_fake_multi_email_structure(spark):
    # mirrors tests/fake_multi_email_transformator.rs:11-29
    df = spark.createDataFrame([("{foo, bar, qux}",), ("x",)], ["a"])
    out = _col_values(df.select(fake.fake_multi_email(F.col("a"), SEED).alias("a")), "a")
    assert out[0].startswith("{") and out[0].endswith("}")
    elems = out[0][1:-1].split(",")
    assert len(elems) == 3
    assert all("@" in e for e in elems)
    assert out[1] == "x"  # length ≤ 1 kept


def test_fake_email_with_id_prefix(spark):
    df = spark.createDataFrame([(7, "x@y.z")], ["id", "email"])
    out = _col_values(df.select(fake.fake_email_with_id_prefix(F.col("email"), F.col("id"), SEED).alias("e")), "e")
    assert out[0].startswith("7-")
    assert "@" in out[0]


# ------------------------------------------------------------- determinism


def test_determinism_equal_inputs_equal_fakes(spark):
    df = spark.createDataFrame([("same",), ("same",), ("other",)], ["a"])
    vals = _col_values(df.select(fake.fake_email(F.col("a"), SEED).alias("a")), "a")
    assert vals[0] == vals[1]
    assert vals[0] != vals[2]


def test_determinism_across_runs_and_partitioning(spark):
    df = spark.createDataFrame([(f"v{i}",) for i in range(100)], ["a"])
    one = _col_values(df.coalesce(1).select(fake.fake_name(F.col("a"), SEED).alias("a")), "a")
    many = _col_values(df.repartition(8).select(fake.fake_name(F.col("a"), SEED).alias("a")), "a")
    assert sorted(one) == sorted(many)


def test_different_seed_different_output(spark, strings_df):
    a = _col_values(strings_df.select(fake.fake_email(F.col("a"), 42).alias("a")), "a")
    b = _col_values(strings_df.select(fake.fake_email(F.col("a"), 43).alias("a")), "a")
    assert a != b


# -------------------------------------------------------- nullify / replace


def test_replace_all_values(spark):
    # mirrors replace_transformator.rs:44-70
    df = spark.createDataFrame([(i,) for i in range(1, 6)], ["a"])
    ct = ColumnTransformation("a", TransformationSpec(type="Replace", replacement_value="test"))
    out = apply_transformations(df, (ct,), SEED)
    assert _col_values(out, "a") == ["test"] * 5


def test_nullify_preserves_dtype(spark):
    # mirrors nulify_transformator.rs:47-76 (string) + dtype dispatch (int/double)
    df = spark.createDataFrame([("1", 1, 1.0)], ["s", "i", "d"])
    cts = tuple(ColumnTransformation(c, TransformationSpec(type="Nullify")) for c in ["s", "i", "d"])
    out = apply_transformations(df, cts, SEED)
    assert out.schema == df.schema
    row = out.collect()[0]
    assert row["s"] is None and row["i"] is None and row["d"] is None


# ---------------------------------------------------------- retain_if_empty


def test_retain_if_empty(spark):
    # mirrors transformator.rs:90-105: "v" faked, "" and NULL kept
    df = spark.createDataFrame([Row(a="v"), Row(a=""), Row(a=None)])
    ct = ColumnTransformation("a", TransformationSpec(type="Custom", operation_type="fake_name_transformation"), retain_if_empty=True)
    out = _col_values(apply_transformations(df, (ct,), SEED), "a")
    assert out[0] not in ("v", "", None)
    assert out[1] == ""
    assert out[2] is None


def test_no_retain_fakes_nulls_deterministically(spark):
    df = spark.createDataFrame([Row(a=None), Row(a=None)], schema="a string")
    ct = ColumnTransformation("a", TransformationSpec(type="Custom", operation_type="fake_name_transformation"))
    out = _col_values(apply_transformations(df, (ct,), SEED), "a")
    assert out[0] is not None and out[0] == out[1]


# -------------------------------------------------------------- null bytes


def test_sanitize_null_bytes(spark):
    # mirrors anonymization_dataframe_operator.rs:329-366
    df = spark.createDataFrame([("ok", "has\x00nul"), ("\x00", "fine")], ["a", "b"])
    out = sanitize_null_bytes(df).collect()
    assert out[0]["a"] == "ok" and out[0]["b"] is None
    assert out[1]["a"] is None and out[1]["b"] == "fine"


def test_sanitize_skips_non_strings(spark):
    df = spark.createDataFrame([(1, "x")], ["i", "s"])
    out = sanitize_null_bytes(df)
    assert out.schema == df.schema
    assert out.collect()[0]["i"] == 1


# ------------------------------------------------------------ drift / skip


def test_schema_drift_check():
    check_schema_drift(["a", "b", "Op", "_dms_ingestion_timestamp"], ["a", "b"])  # ok
    with pytest.raises(SchemaDriftError):
        check_schema_drift(["a", "zzz"], ["a"])


def test_missing_column_transformation_skipped(spark, strings_df):
    ct = ColumnTransformation("not_there", TransformationSpec(type="Replace", replacement_value="x"))
    out = apply_transformations(strings_df, (ct,), SEED)
    assert _col_values(out, "a") == _col_values(strings_df, "a")
