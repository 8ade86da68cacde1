"""Declarative config model — the engine's "query language".

Mirrors the reference's TOML config shapes (SURVEY.md §1.4):
- per-table: ``table_name``, ``keep_num_of_records``, ``filter_type``,
  ``sanitize_null_bytes``, ``anonymization_type``
  (ref: rustic-anonymization-config/src/config_structs/table_struct.rs:7-13)
- ``anonymization_type``: ``Multi`` with ``column_transformations`` or
  ``Single`` with a whole-table ``transformation``
  (ref: table_type_struct.rs:8-15)
- filter tags: Contains/StartsWith/EndsWith/StartsAndEndsWith/Equals/
  AnyOfInt/AnyOfString/NoFilter; unknown tag ⇒ NoFilter
  (ref: filter_type_struct.rs:6-39)
- validations config (ref: validation_struct.rs:7-12)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

# Filter tags (SURVEY §2.2 F1–F8). Unknown tags degrade to NoFilter,
# mirroring the reference's serde(other) default (filter_type_struct.rs:36-38).
KNOWN_FILTER_TYPES = {
    "Contains",
    "StartsWith",
    "EndsWith",
    "StartsAndEndsWith",
    "Equals",
    "AnyOfInt",
    "AnyOfString",
    "NoFilter",
}


@dataclass(frozen=True)
class FilterSpec:
    """One filter per table, applied before anonymization (SURVEY §2.2)."""

    type: str = "NoFilter"
    column: str | None = None
    value: str | None = None
    # StartsAndEndsWith uses two values (ref :175-189)
    starts_with: str | None = None
    ends_with: str | None = None
    # AnyOfInt / AnyOfString carry a value list; semantics are NOT-IN
    # despite the name (ref :194-229, SURVEY F6/F7 note)
    values: tuple[Any, ...] = ()

    @staticmethod
    def from_dict(d: dict[str, Any] | None) -> "FilterSpec":
        if not d:
            return FilterSpec()
        tag = d.get("type", "NoFilter")
        if tag not in KNOWN_FILTER_TYPES:
            tag = "NoFilter"  # unknown tag ⇒ identity filter
        # The reference TOML spells the two-ended keys start_value /
        # end_value (filter_type_struct.rs:21-22); accept those first,
        # keeping the older starts_with/ends_with spellings as aliases.
        starts = d.get("start_value", d.get("starts_with", d.get("startsWith")))
        ends = d.get("end_value", d.get("ends_with", d.get("endsWith")))
        if tag == "StartsAndEndsWith" and (starts is None or ends is None):
            # A None operand would compile to startswith(NULL) — a NULL
            # predicate that silently drops every row. Fail loudly instead.
            raise ValueError(
                "StartsAndEndsWith filter requires start_value and end_value "
                f"(got start={starts!r}, end={ends!r})"
            )
        return FilterSpec(
            type=tag,
            column=d.get("column"),
            value=d.get("value"),
            starts_with=starts,
            ends_with=ends,
            values=tuple(d.get("values", ())),
        )


@dataclass(frozen=True)
class TransformationSpec:
    """``transformation_type`` of one column transformation.

    type: "Replace" (constant), "Nullify", or "Custom" with an
    ``operation_type`` naming a registered operator (faker family etc.)
    (ref: transformation_type_struct.rs:6-10,
    anonymization_config_table_impl.rs:48-113).
    """

    type: str
    replacement_value: str | None = None
    operation_type: str | None = None

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "TransformationSpec":
        return TransformationSpec(
            type=d["type"],
            replacement_value=d.get("replacement_value"),
            operation_type=d.get("operation_type"),
        )


@dataclass(frozen=True)
class ColumnTransformation:
    """(ref: column_transformation_struct.rs:8-12)"""

    column_name: str
    transformation_type: TransformationSpec
    retain_if_empty: bool = False

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "ColumnTransformation":
        return ColumnTransformation(
            column_name=d["column_name"],
            transformation_type=TransformationSpec.from_dict(d["transformation_type"]),
            retain_if_empty=bool(d.get("retain_if_empty", False)),
        )


@dataclass(frozen=True)
class TableConfig:
    """(ref: table_struct.rs:7-13, table_type_struct.rs:8-15)"""

    table_name: str
    keep_num_of_records: int | None = None
    filter: FilterSpec = field(default_factory=FilterSpec)
    sanitize_null_bytes: bool = False
    # anonymization_type = Multi → column transformations
    column_transformations: tuple[ColumnTransformation, ...] = ()
    # anonymization_type = Single → whole-table transformation name
    # (open-source reference build is a no-op; kept as a plugin point, T9)
    whole_table_transformation: str | None = None

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "TableConfig":
        anon = d.get("anonymization_type") or {}
        cols: tuple[ColumnTransformation, ...] = ()
        whole: str | None = None
        if anon.get("type") == "Multi":
            cols = tuple(ColumnTransformation.from_dict(c) for c in anon.get("column_transformations", []))
        elif anon.get("type") == "Single":
            whole = anon.get("transformation")
        return TableConfig(
            table_name=d["table_name"],
            keep_num_of_records=d.get("keep_num_of_records"),
            filter=FilterSpec.from_dict(d.get("filter_type")),
            sanitize_null_bytes=bool(d.get("sanitize_null_bytes", False)),
            column_transformations=cols,
            whole_table_transformation=whole,
        )


@dataclass(frozen=True)
class AnonymizationConfig:
    """A whole ``<database>-<schema>`` config file.

    Missing file ⇒ empty config ⇒ pure passthrough
    (ref: anonymization_config_impl.rs:36-39).
    """

    tables: tuple[TableConfig, ...] = ()

    def table(self, name: str) -> TableConfig | None:
        for t in self.tables:
            if t.table_name == name:
                return t
        return None

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "AnonymizationConfig":
        return AnonymizationConfig(tables=tuple(TableConfig.from_dict(t) for t in d.get("tables", [])))


@dataclass(frozen=True)
class ValidationCheck:
    """Post-run validation (ref: validation_struct.rs:7-12,
    value_check_type_struct.rs:6-9): run ``query``, assert every row's
    ``column_to_check`` Equals/Contains ``value``."""

    table: str
    query: str
    column_to_check: str
    check_type: str  # "Equals" | "Contains"
    value: str

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "ValidationCheck":
        vct = d.get("value_check_type", {})
        return ValidationCheck(
            table=d["table"],
            query=d["query"],
            column_to_check=d["column_to_check"],
            check_type=vct.get("type", "Equals"),
            value=vct.get("value", ""),
        )


@dataclass(frozen=True)
class ValidationConfig:
    validations: tuple[ValidationCheck, ...] = ()

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "ValidationConfig":
        return ValidationConfig(validations=tuple(ValidationCheck.from_dict(v) for v in d.get("validations", [])))
