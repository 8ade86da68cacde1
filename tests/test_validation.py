"""Validation runner (O9/A3)."""

from __future__ import annotations

import pytest

from rustic_witcher_spark.config.model import ValidationCheck
from rustic_witcher_spark.validation import check_dataframe, run_validations
from rustic_witcher_spark.config.loader import load_validation_config_str


def test_equals_check(spark):
    df = spark.createDataFrame([("x",), ("x",)], ["c"])
    r = check_dataframe(df, ValidationCheck("t", "q", "c", "Equals", "x"))
    assert r.passed and r.violations == 0
    r2 = check_dataframe(spark.createDataFrame([("x",), ("y",)], ["c"]), ValidationCheck("t", "q", "c", "Equals", "x"))
    assert not r2.passed and r2.violations == 1


def test_contains_check_null_is_violation(spark):
    df = spark.createDataFrame([("has space",), (None,)], "c string")
    r = check_dataframe(df, ValidationCheck("t", "q", "c", "Contains", " "))
    assert not r.passed and r.violations == 1


def test_unknown_check_type(spark):
    with pytest.raises(ValueError, match="value_check_type"):
        check_dataframe(spark.createDataFrame([("x",)], ["c"]), ValidationCheck("t", "q", "c", "Regex", "x"))


def test_run_validations_via_sql(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView("v_customer")
    cfg = load_validation_config_str(
        """
[[validations]]
table = "customer"
query = "select c_name from v_customer limit 5"
column_to_check = "c_name"
[validations.value_check_type]
type = "Contains"
value = "Customer#"
"""
    )
    results = run_validations(spark, cfg)
    assert len(results) == 1 and results[0].passed


def test_validate_cli(spark, sf_dir, tmp_path):
    import json as _json
    import subprocess
    import sys
    from pathlib import Path as _P

    vt = tmp_path / "vals.toml"
    vt.write_text(
        """
[[validations]]
table = "customer"
query = "SELECT c_name FROM customer LIMIT 20"
column_to_check = "c_name"
[validations.value_check_type]
type = "Contains"
value = "Customer#"
"""
    )
    proc = subprocess.run(
        [sys.executable, "-m", "rustic_witcher_spark.cli", "validate",
         "--data", sf_dir, "--validations", str(vt)],
        capture_output=True, text=True, timeout=300,
        env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
             "PYTHONPATH": str(_P(__file__).resolve().parent.parent)},
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    lines = [_json.loads(x) for x in proc.stdout.splitlines() if x.startswith("{")]
    assert lines[-1] == {"validations": 1, "passed": True}
    assert lines[0]["table"] == "customer" and lines[0]["violations"] == 0
