"""Config generator (O11 parity, non-interactive).

The reference ships an interactive TUI that appends a table/column
transformation to a ``<db>-<schema>-sync.toml``
(ref: rustic-config-generator-cli/src/main.rs:15-187). This is the same
operation as a library call + small CLI, suitable for scripting:

    python -m rustic_witcher_spark.config.generator \
        --config configuration_data/demo-public-sync.toml \
        --table customer --column c_name \
        --operation custom --custom-operation fake_name_transformation
"""

from __future__ import annotations

import argparse
from pathlib import Path

from rustic_witcher_spark.operators.transforms import FAKE_EMAIL_WITH_ID_PREFIX, FAKER_REGISTRY

AVAILABLE_CUSTOM_OPERATIONS = sorted(FAKER_REGISTRY) + [FAKE_EMAIL_WITH_ID_PREFIX]


def transformation_toml(
    table: str,
    column: str,
    operation: str,
    replacement_value: str | None = None,
    custom_operation: str | None = None,
    retain_if_empty: bool = False,
) -> str:
    """Render the TOML block for one column transformation."""
    lines = [
        "",
        "[[tables]]",
        f'table_name = "{table}"',
        "[tables.anonymization_type]",
        'type = "Multi"',
        "[[tables.anonymization_type.column_transformations]]",
        f'column_name = "{column}"',
    ]
    if retain_if_empty:
        lines.append("retain_if_empty = true")
    lines.append("[tables.anonymization_type.column_transformations.transformation_type]")
    if operation == "replace":
        lines.append('type = "Replace"')
        lines.append(f'replacement_value = "{replacement_value or ""}"')
    elif operation == "nullify":
        lines.append('type = "Nullify"')
    elif operation == "custom":
        if custom_operation not in AVAILABLE_CUSTOM_OPERATIONS:
            raise ValueError(f"unknown custom operation {custom_operation!r}; available: {AVAILABLE_CUSTOM_OPERATIONS}")
        lines.append('type = "Custom"')
        lines.append(f'operation_type = "{custom_operation}"')
    else:
        raise ValueError(f"unknown operation {operation!r} (replace|nullify|custom)")
    return "\n".join(lines) + "\n"


def append_transformation(config_path: str | Path, **kwargs) -> None:
    """Append a transformation block to an existing (or new) config file."""
    p = Path(config_path)
    block = transformation_toml(**kwargs)
    with p.open("a") as f:
        f.write(block)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="rustic-witcher-config-generator")
    ap.add_argument("--config", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--column", required=True)
    ap.add_argument("--operation", choices=["replace", "nullify", "custom"], required=True)
    ap.add_argument("--replacement-value")
    ap.add_argument("--custom-operation", choices=AVAILABLE_CUSTOM_OPERATIONS)
    ap.add_argument("--retain-if-empty", action="store_true")
    a = ap.parse_args(argv)
    append_transformation(
        a.config,
        table=a.table,
        column=a.column,
        operation=a.operation,
        replacement_value=a.replacement_value,
        custom_operation=a.custom_operation,
        retain_if_empty=a.retain_if_empty,
    )
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
