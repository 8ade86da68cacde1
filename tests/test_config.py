"""Config loader tests — port of the reference's deserialization suite
(rustic-anonymization-config/src/tests/mod.rs:9-147) plus edge cases from
FIXTURES.md §2."""

from __future__ import annotations

import pytest

from rustic_witcher_spark.config.loader import load_config_file, load_config_str, load_validation_config_str

MULTI_TOML = """
[[tables]]
table_name = "customer"
keep_num_of_records = 100
[tables.anonymization_type]
type = "Multi"
[[tables.anonymization_type.column_transformations]]
column_name = "c_name"
retain_if_empty = true
[tables.anonymization_type.column_transformations.transformation_type]
type = "Custom"
operation_type = "fake_name_transformation"
[[tables.anonymization_type.column_transformations]]
column_name = "c_mktsegment"
[tables.anonymization_type.column_transformations.transformation_type]
type = "Replace"
replacement_value = "SEGMENT"
"""

SINGLE_TOML = """
[[tables]]
table_name = "events"
[tables.filter_type]
type = "StartsWith"
column = "event_type"
value = "click"
[tables.anonymization_type]
type = "Single"
transformation = "some_whole_table_op"
"""

FILTER_TOML = """
[[tables]]
table_name = "part"
sanitize_null_bytes = true
[tables.filter_type]
type = "Contains"
column = "p_type"
value = "BRASS"
"""


def test_multi_roundtrip():
    cfg = load_config_str(MULTI_TOML)
    t = cfg.table("customer")
    assert t is not None
    assert t.keep_num_of_records == 100
    assert len(t.column_transformations) == 2
    ct0 = t.column_transformations[0]
    assert ct0.column_name == "c_name"
    assert ct0.retain_if_empty is True
    assert ct0.transformation_type.type == "Custom"
    assert ct0.transformation_type.operation_type == "fake_name_transformation"
    ct1 = t.column_transformations[1]
    assert ct1.transformation_type.type == "Replace"
    assert ct1.transformation_type.replacement_value == "SEGMENT"
    assert ct1.retain_if_empty is False


def test_single_roundtrip():
    cfg = load_config_str(SINGLE_TOML)
    t = cfg.table("events")
    assert t.whole_table_transformation == "some_whole_table_op"
    assert t.filter.type == "StartsWith"
    assert t.filter.column == "event_type"
    assert t.filter.value == "click"


def test_filter_roundtrip():
    cfg = load_config_str(FILTER_TOML)
    t = cfg.table("part")
    assert t.filter.type == "Contains"
    assert t.sanitize_null_bytes is True
    assert t.column_transformations == ()


def test_missing_file_is_passthrough(tmp_path):
    cfg = load_config_file(tmp_path / "nope-public-sync.toml")
    assert cfg.tables == ()


def test_unknown_filter_tag_degrades_to_nofilter():
    cfg = load_config_str(
        """
[[tables]]
table_name = "t"
[tables.filter_type]
type = "SomethingNew"
column = "c"
value = "v"
"""
    )
    assert cfg.table("t").filter.type == "NoFilter"


def test_unknown_operation_type_raises_at_compile(spark):
    from pyspark.sql import types as T

    from rustic_witcher_spark.config.model import ColumnTransformation, TransformationSpec
    from rustic_witcher_spark.operators.transforms import compile_transformation

    ct = ColumnTransformation(
        column_name="c",
        transformation_type=TransformationSpec(type="Custom", operation_type="not_a_real_op"),
    )
    with pytest.raises(ValueError, match="unknown operation_type"):
        compile_transformation(ct, T.StringType())


def test_validation_config():
    vc = load_validation_config_str(
        """
[[validations]]
table = "customer"
query = "select c_name from customer limit 5"
column_to_check = "c_name"
[validations.value_check_type]
type = "Contains"
value = " "
"""
    )
    assert len(vc.validations) == 1
    v = vc.validations[0]
    assert v.check_type == "Contains"
    assert v.value == " "


def test_starts_ends_reference_toml_keys():
    """The reference TOML spells the operands start_value/end_value
    (filter_type_struct.rs:21-22)."""
    cfg = load_config_str(
        """
[[tables]]
table_name = "part"
[tables.filter_type]
type = "StartsAndEndsWith"
column = "p_name"
start_value = "red"
end_value = "gear"
"""
    )
    f = cfg.table("part").filter
    assert f.starts_with == "red"
    assert f.ends_with == "gear"


def test_starts_ends_missing_operand_raises():
    """A missing operand would compile to startswith(NULL), silently
    dropping every row — must fail loudly instead."""
    with pytest.raises(ValueError, match="StartsAndEndsWith"):
        load_config_str(
            """
[[tables]]
table_name = "part"
[tables.filter_type]
type = "StartsAndEndsWith"
column = "p_name"
start_value = "red"
"""
        )
