"""The per-table anonymization pipeline — config IS the plan.

Mirrors the reference's per-file inner query (SURVEY §3.2 ①–⑦):

    read → [limit] → [sanitize_null_bytes] → [filter] → transforms → sink

Order matters and matches the reference exactly: the
``keep_num_of_records`` slice happens at READ time (ref
:116-125, i.e. BEFORE sanitize/filter), the filter runs BEFORE
transformations (transformations only see surviving rows, SURVEY §2.2).

The whole pipeline compiles to scan → Filter → ONE Project in Catalyst:
no shuffle, no Python — it runs at parquet-scan speed regardless of
table size, which is the 100 TB story for the reference surface.

``pipeline_oracle_sql`` renders the SAME pipeline as one DuckDB SELECT
(used by the driver's correctness gate and by tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rustic_witcher_spark.config.model import TableConfig
from rustic_witcher_spark.functions.wordlists import DEFAULT_SEED
from rustic_witcher_spark.operators.filters import apply_filter, filter_to_sql
from rustic_witcher_spark.operators.transforms import (
    apply_transformations,
    sanitize_null_bytes,
    transformation_to_sql,
)

_SPARK_TO_DUCK = {
    T.StringType(): "VARCHAR",
    T.IntegerType(): "INTEGER",
    T.LongType(): "BIGINT",
    T.DoubleType(): "DOUBLE",
    T.FloatType(): "FLOAT",
    T.BooleanType(): "BOOLEAN",
}


def anonymize_table(df: DataFrame, cfg: TableConfig, seed: int = DEFAULT_SEED, limit_already_applied: bool = False) -> DataFrame:
    """Apply a table's full anonymization pipeline to a DataFrame."""
    if cfg.keep_num_of_records is not None and not limit_already_applied:
        df = df.limit(cfg.keep_num_of_records)
    if cfg.sanitize_null_bytes:
        df = sanitize_null_bytes(df)
    df = apply_filter(df, cfg.filter)
    df = apply_transformations(df, cfg.column_transformations, seed)
    # whole-table transformation (T9) is a plugin point; the open-source
    # reference build is a NoOp (ref: whole_table_transformator.rs:1-21)
    if cfg.whole_table_transformation:
        df = WHOLE_TABLE_REGISTRY.get(cfg.whole_table_transformation, lambda d: d)(df)
    return df


# T9 plugin registry: name -> Callable[[DataFrame], DataFrame]
WHOLE_TABLE_REGISTRY: dict = {}


def pipeline_oracle_sql(
    cfg: TableConfig,
    columns: list[tuple[str, str]],
    table: str | None = None,
    seed: int = DEFAULT_SEED,
) -> str:
    """Render the same pipeline as one DuckDB SELECT.

    ``columns`` is the table's ordered (name, duckdb_type) schema. The
    limit wraps the base scan (read-time slice), then null-byte
    sanitization, then the filter, then the transform projection —
    identical order to ``anonymize_table``.
    """
    table = table or cfg.table_name
    base = f"SELECT * FROM {table}"
    if cfg.keep_num_of_records is not None:
        base = f"SELECT * FROM (SELECT * FROM {table} LIMIT {cfg.keep_num_of_records})"

    if cfg.sanitize_null_bytes:
        sanitized_cols = []
        for name, dt in columns:
            if dt.upper() == "VARCHAR":
                sanitized_cols.append(f"(CASE WHEN contains({name}, chr(0)) THEN NULL ELSE {name} END) AS {name}")
            else:
                sanitized_cols.append(name)
        base = f"SELECT {', '.join(sanitized_cols)} FROM ({base})"

    pred = filter_to_sql(cfg.filter)
    if pred:
        base = f"SELECT * FROM ({base}) WHERE {pred}"

    by_col = {ct.column_name: ct for ct in cfg.column_transformations if ct.column_name in {c for c, _ in columns}}
    out_cols = []
    for name, dt in columns:
        if name in by_col:
            out_cols.append(f"{transformation_to_sql(by_col[name], dt, seed)} AS {name}")
        else:
            out_cols.append(name)
    return f"SELECT {', '.join(out_cols)} FROM ({base})"


def duckdb_type(dt: T.DataType) -> str:
    """Spark type → DuckDB type name (for pipeline_oracle_sql columns)."""
    if isinstance(dt, T.TimestampType) or isinstance(dt, T.TimestampNTZType):
        return "TIMESTAMP"
    for k, v in _SPARK_TO_DUCK.items():
        if dt == k:
            return v
    return "VARCHAR"
