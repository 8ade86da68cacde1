"""Small parity utilities: duration formatting, config generator, mongo-buddy."""

from __future__ import annotations

import pytest

from rustic_witcher_spark import mongo_buddy as mb
from rustic_witcher_spark.config.generator import append_transformation, transformation_toml
from rustic_witcher_spark.config.loader import load_config_file
from rustic_witcher_spark.util import beautify_duration


def test_beautify_duration():
    assert beautify_duration(0.5) == "500ms"
    assert beautify_duration(0.999) == "999ms"
    assert beautify_duration(2.7) == "2s"


def test_config_generator_roundtrip(tmp_path):
    p = tmp_path / "demo-public-sync.toml"
    append_transformation(p, table="customer", column="c_name", operation="custom", custom_operation="fake_name_transformation", retain_if_empty=True)
    append_transformation(p, table="orders", column="o_orderpriority", operation="replace", replacement_value="X")
    cfg = load_config_file(p)
    assert cfg.table("customer").column_transformations[0].transformation_type.operation_type == "fake_name_transformation"
    assert cfg.table("customer").column_transformations[0].retain_if_empty is True
    assert cfg.table("orders").column_transformations[0].transformation_type.replacement_value == "X"


def test_config_generator_rejects_unknown_custom():
    with pytest.raises(ValueError, match="unknown custom operation"):
        transformation_toml("t", "c", "custom", custom_operation="fake_nope")


def test_mongo_commands():
    assert mb.mongodump_command("mongodb://h", "db1", "/tmp/d")[0] == "mongodump"
    cmd = mb.mongorestore_command("mongodb://staging-host", "/tmp/d", ns_from="a.*", ns_to="b.*")
    assert "--nsFrom=a.*" in cmd and "--nsTo=b.*" in cmd and "--drop" in cmd
    with pytest.raises(mb.ProductionGuardError):
        mb.mongorestore_command("mongodb://prod-cluster", "/tmp/d")


def test_multipart_sizing():
    assert mb.multipart_part_size(1024) is None
    part = mb.multipart_part_size(6 * 1024**3)
    assert part is not None and 9 <= (6 * 1024**3) / part <= 10


def test_skip_validations_env(spark, monkeypatch):
    from rustic_witcher_spark.config.model import ValidationCheck, ValidationConfig
    from rustic_witcher_spark.validation import run_validations

    monkeypatch.setenv("SKIP_VALIDATIONS", "true")
    cfg = ValidationConfig(validations=(ValidationCheck("t", "select 1 as c", "c", "Equals", "1"),))
    assert run_validations(spark, cfg) == []


def test_mongo_export_sequence():
    from rustic_witcher_spark import mongo_buddy as mb

    calls = []
    mb.export_data(
        "mongodb://u:p@host/appdb", "appdb", "s3://bkt/dumps/appdb",
        run=lambda cmd: calls.append(("run", cmd[0])),
        upload=lambda b, k, f: calls.append(("upload", b, k, f)),
        cleanup=lambda p: calls.append(("rm", p)),
        work_dir="/tmp/md",
    )
    assert calls == [
        ("run", "mongodump"),
        ("run", "tar"),
        ("upload", "bkt", "dumps/appdb", "/tmp/md.tar.zst"),
        ("rm", "/tmp/md.tar.zst"),
        ("rm", "/tmp/md"),
    ]


def test_mongo_export_db_mismatch_raises():
    from rustic_witcher_spark import mongo_buddy as mb

    with pytest.raises(ValueError, match="does not match"):
        mb.export_data("mongodb://u:p@host/otherdb", "appdb", "s3://b/k", run=None, upload=None)


def test_mongo_import_sequence_and_prod_guard():
    from rustic_witcher_spark import mongo_buddy as mb

    calls = []
    mb.import_data(
        "mongodb://u:p@staging-host/appdb", "appdb", "s3://bkt/dumps/appdb.tar.zst",
        run=lambda cmd: calls.append(cmd[0]),
        download=lambda b, k, f: calls.append(("dl", b, k, f)),
        cleanup=lambda p: calls.append(("rm", p)),
        work_dir="/tmp/md",
    )
    assert calls == [
        ("dl", "bkt", "dumps/appdb.tar.zst", "/tmp/md/appdb.tar.zst"),
        "tar",
        "mongorestore",
        ("rm", "/tmp/md/appdb.tar.zst"),
    ]
    with pytest.raises(mb.ProductionGuardError):
        mb.import_data("mongodb://u:p@prod-host/appdb", "appdb", "s3://b/k", run=None, download=None)
