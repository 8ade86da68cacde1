from rustic_witcher_spark.config.model import (
    AnonymizationConfig,
    ColumnTransformation,
    FilterSpec,
    TableConfig,
    TransformationSpec,
    ValidationCheck,
    ValidationConfig,
)
from rustic_witcher_spark.config.loader import load_config, load_config_file, load_validation_config

__all__ = [
    "AnonymizationConfig",
    "ColumnTransformation",
    "FilterSpec",
    "TableConfig",
    "TransformationSpec",
    "ValidationCheck",
    "ValidationConfig",
    "load_config",
    "load_config_file",
    "load_validation_config",
]
