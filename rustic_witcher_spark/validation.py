"""Post-run validation runner (O9, SURVEY §2.10).

The reference runs TOML-configured SQL queries after import and asserts
every result row's ``column_to_check`` Equals/Contains a value
(ref: rustic-result-validator/src/validator/result_validator.rs:65-139).
Here validations run as DataFrame assertions: the violation count must
be zero (A3's fold re-expressed as ``filter(~pred).count() == 0``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rustic_witcher_spark.config.model import ValidationCheck, ValidationConfig


@dataclass(frozen=True)
class ValidationResult:
    table: str
    passed: bool
    violations: int


def check_dataframe(df: DataFrame, check: ValidationCheck) -> ValidationResult:
    col = F.col(check.column_to_check)
    if check.check_type == "Equals":
        pred = col == F.lit(check.value)
    elif check.check_type == "Contains":
        pred = col.contains(check.value)
    else:
        raise ValueError(f"unknown value_check_type: {check.check_type!r}")
    violations = df.filter(~F.coalesce(pred, F.lit(False))).count()
    return ValidationResult(table=check.table, passed=violations == 0, violations=violations)


def run_validations(spark: SparkSession, config: ValidationConfig) -> list[ValidationResult]:
    """Run each validation's query via spark.sql over registered views.

    ``SKIP_VALIDATIONS`` env short-circuits, mirroring the reference
    (ref: result_validator.rs:143-148).
    """
    import os

    if os.environ.get("SKIP_VALIDATIONS", "").lower() in ("1", "true", "yes"):
        return []
    results = []
    for check in config.validations:
        df = spark.sql(check.query)
        results.append(check_dataframe(df, check))
    return results
