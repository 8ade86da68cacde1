"""Filter compiler: FilterSpec → Spark Column predicate (F1–F8).

Mirrors the reference's per-table lazy filter
(ref: rustic-anonymization-operator/src/anonymization_dataframe_operator.rs:152-242).
Exactly one filter per table, applied BEFORE anonymization. Note the
reference's ``AnyOfInt``/``AnyOfString`` are NOT-IN despite the name
(``is_in(...).not()``, ref :194-229) — preserved here.

All predicates are plain Catalyst expressions, so parquet predicate
pushdown applies (check ``PushedFilters`` in ``.explain``), which is
what makes these free at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rustic_witcher_spark.config.model import FilterSpec


def compile_filter(spec: FilterSpec) -> Column | None:
    """Return a boolean Column, or None for NoFilter (identity)."""
    t = spec.type
    if t == "NoFilter":
        return None
    col = F.col(spec.column)
    if t == "Contains":  # F1 (ref :159-164)
        return col.contains(spec.value)
    if t == "StartsWith":  # F2 (ref :165-169)
        return col.startswith(spec.value)
    if t == "EndsWith":  # F3 (ref :170-174)
        return col.endswith(spec.value)
    if t == "StartsAndEndsWith":  # F4 = F2 ∧ F3 (ref :175-189)
        return col.startswith(spec.starts_with) & col.endswith(spec.ends_with)
    if t == "Equals":  # F5 (ref :190-193)
        return col == F.lit(spec.value)
    if t in ("AnyOfInt", "AnyOfString"):  # F6/F7 — NOT-IN (ref :194-229)
        # Empty value list: NOT-IN over nothing excludes nothing —
        # identity filter (and the SQL twin would be invalid syntax).
        if not spec.values:
            return None
        vals = [int(v) for v in spec.values] if t == "AnyOfInt" else [str(v) for v in spec.values]
        # NULL cells must be KEPT: the reference uses
        # is_in(..., nulls_equal=true).not(), while plain ~isin is NULL
        # for NULL input and Spark would drop the row. IsNull-OR (rather
        # than a coalesce wrapper) keeps the predicate parquet-pushable:
        # Or(IsNull, Not(In(...))) reaches PushedFilters.
        return col.isNull() | ~col.isin(vals)
    raise ValueError(f"unknown filter type: {t}")


def apply_filter(df: DataFrame, spec: FilterSpec) -> DataFrame:
    pred = compile_filter(spec)
    return df if pred is None else df.filter(pred)


def filter_to_sql(spec: FilterSpec) -> str | None:
    """Same predicate in ANSI/DuckDB SQL (for oracle queries)."""
    t, c = spec.type, spec.column
    esc = lambda s: str(s).replace("'", "''")  # noqa: E731
    if t == "NoFilter":
        return None
    if t == "Contains":
        return f"contains({c}, '{esc(spec.value)}')"
    if t == "StartsWith":
        return f"starts_with({c}, '{esc(spec.value)}')"
    if t == "EndsWith":
        return f"suffix({c}, '{esc(spec.value)}')"
    if t == "StartsAndEndsWith":
        return f"(starts_with({c}, '{esc(spec.starts_with)}') AND suffix({c}, '{esc(spec.ends_with)}'))"
    if t == "Equals":
        return f"{c} = '{esc(spec.value)}'"
    if t in ("AnyOfInt", "AnyOfString"):  # NULL rows kept, matching compile_filter
        if not spec.values:
            return None  # empty NOT-IN = identity (NOT IN () is invalid SQL)
        lits = (
            ", ".join(str(int(v)) for v in spec.values)
            if t == "AnyOfInt"
            else ", ".join(chr(39) + esc(v) + chr(39) for v in spec.values)
        )
        return f"({c} IS NULL OR {c} NOT IN ({lits}))"
    raise ValueError(f"unknown filter type: {t}")
