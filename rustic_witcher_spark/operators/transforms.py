"""Column transformation operators T1–T11 (SURVEY §2.3).

The reference's Transformator trait replaces whole columns with newly
computed Series (ref: rustic-transformator/src/transformator.rs:65-120);
here each operator is a ``Column -> Column`` expression applied with
``withColumn``, so the whole set fuses into one projection under
whole-stage codegen — there is no per-operator pass over the data.

Registry mirrors the config dispatch table
(ref: rustic-anonymization-config/src/anonymization_config_table_impl.rs:48-113)
including its panic-on-unknown behavior (:111). Transformations whose
column is absent from the DataFrame are skipped
(ref: anonymization_dataframe_operator.rs:284-294).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rustic_witcher_spark.config.model import ColumnTransformation, TransformationSpec
from rustic_witcher_spark.functions import fake, fake_sql
from rustic_witcher_spark.functions.wordlists import DEFAULT_SEED

# ------------------------------------------------------------------ T2 / T3


def nullify(dtype: T.DataType) -> Column:
    """T2: entire column → typed NULLs. The reference dispatches on
    String/Int32/Float64 and panics otherwise
    (ref: nulify_transformator.rs:19-44); we accept any Spark type but
    keep the dtype (schema-preserving)."""
    return F.lit(None).cast(dtype)


def replace_with(value: str) -> Column:
    """T3: entire column → constant string (column becomes StringType,
    matching the reference's utf8 replacement series,
    ref: replace_transformator.rs:21-42)."""
    return F.lit(value)


# ---------------------------------------------------------------------- T10


def sanitize_null_bytes(df: DataFrame) -> DataFrame:
    """T10: for every string column, any cell containing ``\\x00`` becomes
    NULL — whole cell, never stripped (a stripped JSON cell would be
    invalid), ref: anonymization_dataframe_operator.rs:142-150,329-366."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StringType):
            c = F.col(f.name)
            cols.append(F.when(c.contains("\x00"), F.lit(None).cast("string")).otherwise(c).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


SANITIZE_NULL_BYTES_SQL = "(CASE WHEN contains({c}, chr(0)) THEN NULL ELSE {c} END)"


# ----------------------------------------------------------------------- T11


class SchemaDriftError(RuntimeError):
    pass


DMS_METADATA_COLUMNS = ("Op", "_dms_ingestion_timestamp")


def check_schema_drift(df_columns: list[str], catalog_columns: list[str]) -> None:
    """T11: Parquet columns (minus DMS metadata) must be a subset of the
    catalog's, else abort (ref: cdc_operator.rs:255-273)."""
    extra = set(df_columns) - set(catalog_columns) - set(DMS_METADATA_COLUMNS)
    if extra:
        raise SchemaDriftError(f"columns in parquet but not in catalog: {sorted(extra)}")


# ----------------------------------------------------- faker dispatch (T4–T8)

# operation_type string → (spark builder, duckdb-sql builder).
# Names follow the reference's config vocabulary
# (ref: anonymization_config_table_impl.rs:67-113).
FAKER_REGISTRY: dict[str, tuple[Callable[[Column, int], Column], Callable[[str, int], str]]] = {
    "fake_firstname_transformation": (fake.fake_firstname, fake_sql.sql_fake_firstname),
    "fake_lastname_transformation": (fake.fake_lastname, fake_sql.sql_fake_lastname),
    "fake_name_transformation": (fake.fake_name, fake_sql.sql_fake_name),
    "fake_companyname_transformation": (fake.fake_companyname, fake_sql.sql_fake_companyname),
    "fake_email_transformation": (fake.fake_email, fake_sql.sql_fake_email),
    "fake_address_transformation": (fake.fake_address, fake_sql.sql_fake_address),
    "fake_md5_transformation": (fake.fake_md5, fake_sql.sql_fake_md5),
    "fake_phone_transformation": (fake.fake_phone, fake_sql.sql_fake_phone),
    "fake_multi_email_transformation": (fake.fake_multi_email, fake_sql.sql_fake_multi_email),
}

# cross-column transform (T8) handled specially: needs the sibling `id` column
FAKE_EMAIL_WITH_ID_PREFIX = "fake_email_with_id_prefix_transformation"


def _retain_if_empty(value: Column, transformed: Column) -> Column:
    """retain_if_empty=true keeps NULL and '' untouched
    (ref: transformator.rs:93,102)."""
    return F.when(value.isNull() | (value == ""), value).otherwise(transformed)


def compile_transformation(
    ct: ColumnTransformation, dtype: T.DataType, seed: int = DEFAULT_SEED
) -> Column:
    """ColumnTransformation → replacement Column expression."""
    spec: TransformationSpec = ct.transformation_type
    col = F.col(ct.column_name)
    if spec.type == "Nullify":
        return nullify(dtype)
    if spec.type == "Replace":
        return replace_with(spec.replacement_value or "")
    if spec.type == "Custom":
        op = spec.operation_type or ""
        if op == FAKE_EMAIL_WITH_ID_PREFIX:
            out = fake.fake_email_with_id_prefix(col, F.col("id"), seed)
        elif op in FAKER_REGISTRY:
            out = FAKER_REGISTRY[op][0](col, seed)
        else:
            # mirror the reference's panic on unknown operation_type
            raise ValueError(f"unknown operation_type: {op!r}")
        return _retain_if_empty(col, out) if ct.retain_if_empty else out
    raise ValueError(f"unknown transformation type: {spec.type!r}")


def transformation_to_sql(ct: ColumnTransformation, dtype_sql: str = "VARCHAR", seed: int = DEFAULT_SEED) -> str:
    """Same transformation in DuckDB SQL over column ``ct.column_name``."""
    spec = ct.transformation_type
    c = ct.column_name
    if spec.type == "Nullify":
        return f"NULL::{dtype_sql}"
    if spec.type == "Replace":
        return "'" + (spec.replacement_value or "").replace("'", "''") + "'"
    if spec.type == "Custom":
        op = spec.operation_type or ""
        if op == FAKE_EMAIL_WITH_ID_PREFIX:
            out = fake_sql.sql_fake_email_with_id_prefix(c, "id", seed)
        elif op in FAKER_REGISTRY:
            out = FAKER_REGISTRY[op][1](c, seed)
        else:
            raise ValueError(f"unknown operation_type: {op!r}")
        if ct.retain_if_empty:
            return f"(CASE WHEN {c} IS NULL OR {c} = '' THEN {c} ELSE {out} END)"
        return out
    raise ValueError(f"unknown transformation type: {spec.type!r}")


def apply_transformations(
    df: DataFrame, transformations: tuple[ColumnTransformation, ...], seed: int = DEFAULT_SEED
) -> DataFrame:
    """Apply all configured column transformations as ONE projection.

    Transformations targeting columns absent from the DataFrame are
    skipped (ref: anonymization_dataframe_operator.rs:284-294).
    """
    by_col = {ct.column_name: ct for ct in transformations if ct.column_name in df.columns}
    if not by_col:
        return df
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    cols = [
        compile_transformation(by_col[name], dtypes[name], seed).alias(name) if name in by_col else F.col(name)
        for name in df.columns
    ]
    return df.select(*cols)
