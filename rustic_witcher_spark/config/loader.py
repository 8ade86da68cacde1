"""TOML config loading.

Mirrors the reference's file discovery: one file per
``<database>-<schema>`` named ``<db>-<schema>-sync.toml``
(ref: anonymization_config_impl.rs:21-41); a missing file yields an
empty config (pure passthrough, ref :36-39). Unknown
``operation_type`` values raise at plan-build time, mirroring the
reference's panic-on-unknown (anonymization_config_table_impl.rs:111).
"""

from __future__ import annotations

import tomllib
from pathlib import Path

from rustic_witcher_spark.config.model import AnonymizationConfig, ValidationConfig


def config_file_name(database: str, schema: str) -> str:
    return f"{database}-{schema}-sync.toml"


def load_config(config_dir: str | Path, database: str, schema: str) -> AnonymizationConfig:
    """Load ``<db>-<schema>-sync.toml`` from ``config_dir``; missing ⇒ empty."""
    return load_config_file(Path(config_dir) / config_file_name(database, schema))


def load_config_file(path: str | Path) -> AnonymizationConfig:
    p = Path(path)
    if not p.exists():
        return AnonymizationConfig()
    with p.open("rb") as f:
        return AnonymizationConfig.from_dict(tomllib.load(f))


def load_config_str(toml_text: str) -> AnonymizationConfig:
    return AnonymizationConfig.from_dict(tomllib.loads(toml_text))


def load_validation_config(path: str | Path) -> ValidationConfig:
    p = Path(path)
    if not p.exists():
        return ValidationConfig()
    with p.open("rb") as f:
        return ValidationConfig.from_dict(tomllib.load(f))


def load_validation_config_str(toml_text: str) -> ValidationConfig:
    return ValidationConfig.from_dict(tomllib.loads(toml_text))
