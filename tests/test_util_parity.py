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


class _FakeS3:
    """boto3-shaped recorder for the multipart sequence."""

    def __init__(self, fail_on_part: int | None = None):
        self.calls: list[tuple] = []
        self.fail_on_part = fail_on_part

    def create_multipart_upload(self, Bucket, Key):
        self.calls.append(("create", Bucket, Key))
        return {"UploadId": "uid-1"}

    def upload_part(self, Bucket, Key, UploadId, PartNumber, Body):
        if self.fail_on_part == PartNumber:
            raise IOError("network")
        self.calls.append(("part", UploadId, PartNumber, len(Body), bytes(Body[:2])))
        return {"ETag": f"etag-{PartNumber}"}

    def complete_multipart_upload(self, Bucket, Key, UploadId, MultipartUpload):
        self.calls.append(("complete", UploadId, MultipartUpload["Parts"]))

    def abort_multipart_upload(self, Bucket, Key, UploadId):
        self.calls.append(("abort", UploadId))

    def put_object(self, Bucket, Key, Body):
        self.calls.append(("put", Bucket, Key, len(Body.read())))


def test_multipart_upload_chunks_and_completes(tmp_path):
    p = tmp_path / "archive.tar.zst"
    p.write_bytes(b"ab" * 13)  # 26 bytes
    s3 = _FakeS3()
    mb.multipart_upload(s3, "bkt", "k/a.tar.zst", str(p), part_size=10)
    kinds = [c[0] for c in s3.calls]
    assert kinds == ["create", "part", "part", "part", "complete"]
    # chunk sizes 10/10/6, part numbers sequential, first bytes correct
    parts = [c for c in s3.calls if c[0] == "part"]
    assert [(c[2], c[3]) for c in parts] == [(1, 10), (2, 10), (3, 6)]
    assert parts[0][4] == b"ab"
    # completion carries every (PartNumber, ETag) in order
    assert s3.calls[-1][2] == [
        {"PartNumber": 1, "ETag": "etag-1"},
        {"PartNumber": 2, "ETag": "etag-2"},
        {"PartNumber": 3, "ETag": "etag-3"},
    ]


def test_multipart_upload_aborts_on_failure(tmp_path):
    p = tmp_path / "a.bin"
    p.write_bytes(b"x" * 30)
    s3 = _FakeS3(fail_on_part=2)
    with pytest.raises(IOError):
        mb.multipart_upload(s3, "b", "k", str(p), part_size=10)
    assert s3.calls[-1] == ("abort", "uid-1")  # no orphaned billable parts


def test_upload_archive_routes_by_size(tmp_path, monkeypatch):
    p = tmp_path / "small.bin"
    p.write_bytes(b"y" * 100)
    s3 = _FakeS3()
    mb.upload_archive(s3, "b", "k", str(p))
    assert s3.calls == [("put", "b", "k", 100)]  # under threshold: single PUT
    # shrink the threshold to exercise the multipart branch on a tiny file
    monkeypatch.setattr(mb, "MULTIPART_THRESHOLD_BYTES", 50)
    s3b = _FakeS3()
    mb.upload_archive(s3b, "b", "k", str(p))
    kinds = [c[0] for c in s3b.calls]
    assert kinds[0] == "create" and kinds[-1] == "complete"
    assert sum(c[3] for c in s3b.calls if c[0] == "part") == 100


def test_upload_archive_simulated_6gib(tmp_path, monkeypatch):
    """>5 GiB routing with the REAL threshold (no threshold shrinking):
    a 6 GiB archive is simulated by faking the size probe, and the
    multipart leg must receive the ~10-part ceil-divided part size the
    reference exporter computes (mongo_data_exporter.rs:105,160-164)."""
    p = tmp_path / "big.tar.zst"
    p.write_bytes(b"z" * 64)
    total = 6 * 1024**3
    monkeypatch.setattr(mb.os.path, "getsize", lambda _: total)
    seen = {}
    monkeypatch.setattr(
        mb, "multipart_upload", lambda client, bucket, key, path, part_size: seen.update(
            {"bucket": bucket, "key": key, "path": path, "part_size": part_size}
        )
    )
    s3 = _FakeS3()
    mb.upload_archive(s3, "bkt", "dumps/big.tar.zst", str(p))
    assert s3.calls == []  # no single PUT at 6 GiB
    assert seen["part_size"] == -(-total // mb.TARGET_MULTIPART_PARTS)
    # every part except possibly the last is ≥ S3's 5 MiB floor and the
    # count lands at the ~10-part target
    n_parts = -(-total // seen["part_size"])
    assert n_parts == mb.TARGET_MULTIPART_PARTS
    assert seen["part_size"] >= 5 * 1024**2


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
        run=lambda cmd, check_for_error=False: calls.append((cmd[0], check_for_error)),
        download=lambda b, k, f: calls.append(("dl", b, k, f)),
        cleanup=lambda p: calls.append(("rm", p)),
        work_dir="/tmp/md",
    )
    # mongorestore (and only it) runs under the O10 stdout error-line
    # scan — the reference's one check_for_error=Some(true) call site
    assert calls == [
        ("dl", "bkt", "dumps/appdb.tar.zst", "/tmp/md/appdb.tar.zst"),
        ("tar", False),
        ("mongorestore", True),
        ("rm", "/tmp/md/appdb.tar.zst"),
    ]
    with pytest.raises(mb.ProductionGuardError):
        mb.import_data("mongodb://u:p@prod-host/appdb", "appdb", "s3://b/k", run=None, download=None)
