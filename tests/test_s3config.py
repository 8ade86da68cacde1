"""S3 client env-contract parity (ref: rustic-s3-config/src/lib.rs:8-34):
``S3_VPC_ENDPOINT`` becomes an explicit endpoint_url, ``S3_BUCKET_REGION``
the client region (default eu-west-1), and every engine call site that
builds its own client routes through the one factory."""

from __future__ import annotations

import sys
import types

from rustic_witcher_spark.s3config import S3_AWS_REGION, create_s3_client, s3_client_kwargs


class _FakeBoto3:
    """boto3-shaped recorder: captures client() kwargs, returns a stub."""

    def __init__(self):
        self.calls = []

    def client(self, service, **kwargs):
        self.calls.append((service, kwargs))
        return types.SimpleNamespace(service=service, kwargs=kwargs)


def test_default_region_no_endpoint(monkeypatch):
    monkeypatch.delenv("S3_VPC_ENDPOINT", raising=False)
    monkeypatch.delenv("S3_BUCKET_REGION", raising=False)
    assert s3_client_kwargs() == {"region_name": S3_AWS_REGION}
    assert S3_AWS_REGION == "eu-west-1"  # the reference's pinned default


def test_env_region_and_endpoint_honored(monkeypatch):
    monkeypatch.setenv("S3_BUCKET_REGION", "us-east-2")
    monkeypatch.setenv("S3_VPC_ENDPOINT", "https://vpce.example.internal")
    fake = _FakeBoto3()
    client = create_s3_client(fake)
    assert fake.calls == [
        ("s3", {"region_name": "us-east-2", "endpoint_url": "https://vpce.example.internal"})
    ]
    assert client.kwargs["endpoint_url"] == "https://vpce.example.internal"


def test_empty_endpoint_env_means_no_endpoint(monkeypatch):
    """An empty S3_VPC_ENDPOINT is 'unset' (the reference's Err branch),
    not an endpoint_url of ''."""
    monkeypatch.setenv("S3_VPC_ENDPOINT", "")
    monkeypatch.delenv("S3_BUCKET_REGION", raising=False)
    assert "endpoint_url" not in s3_client_kwargs()


def test_copy_object_routes_through_env_contract(monkeypatch):
    """The copy-through sink's client carries the env endpoint/region."""
    from rustic_witcher_spark.sinks import s3copy

    monkeypatch.setenv("S3_VPC_ENDPOINT", "https://vpce.copy.internal")
    monkeypatch.delenv("S3_BUCKET_REGION", raising=False)
    copied = []

    class _Client:
        def __init__(self, kwargs):
            self.kwargs = kwargs

        def copy_object(self, **kw):
            copied.append(kw)

    fake = types.SimpleNamespace(client=lambda service, **kw: _Client(kw))
    monkeypatch.setattr(s3copy, "boto3", fake)
    monkeypatch.setattr(s3copy, "HAS_BOTO3", True)
    s3copy.copy_object("srcb", "k.parquet", "dstb")
    assert copied == [
        {"Bucket": "dstb", "Key": "k.parquet", "CopySource": {"Bucket": "srcb", "Key": "k.parquet"}}
    ]


def test_s3_listing_default_client_uses_factory(monkeypatch):
    """_list_s3_parquet's lazy default client is the env-contract one:
    inject a fake boto3 module and check the kwargs it was built with."""
    from rustic_witcher_spark.sources.parquet import _list_s3_parquet

    monkeypatch.setenv("S3_BUCKET_REGION", "ap-south-1")
    monkeypatch.delenv("S3_VPC_ENDPOINT", raising=False)
    fake = _FakeBoto3()

    class _Lister:
        def list_objects_v2(self, **kwargs):
            return {"Contents": [{"Key": "t/a.parquet"}], "IsTruncated": False}

    fake_mod = types.SimpleNamespace(client=lambda service, **kw: (fake.calls.append((service, kw)), _Lister())[1])
    monkeypatch.setitem(sys.modules, "boto3", fake_mod)
    out = _list_s3_parquet("s3://bkt/t")
    assert out == ["s3://bkt/t/a.parquet"]
    assert fake.calls == [("s3", {"region_name": "ap-south-1"})]


def test_mongo_default_hooks_use_factory(monkeypatch):
    """export_data/import_data default upload/download hooks build the
    env-contract client (the reference's exporter/importer path)."""
    import rustic_witcher_spark.mongo_buddy as mb

    monkeypatch.setenv("S3_VPC_ENDPOINT", "https://vpce.mongo.internal")
    monkeypatch.setenv("S3_BUCKET_REGION", "eu-central-1")
    built = []
    downloads = []

    class _Client:
        def __init__(self, kwargs):
            built.append(kwargs)

        def download_file(self, bucket, key, path):
            downloads.append((bucket, key, path))

    fake_mod = types.SimpleNamespace(client=lambda service, **kw: _Client(kw))
    monkeypatch.setitem(sys.modules, "boto3", fake_mod)
    ran = []
    mb.import_data(
        "mongodb://staging-host/db",
        "db",
        "s3://bkt/dump.tar.zst",
        run=lambda cmd, check_for_error=False: ran.append(cmd),
        work_dir="/tmp/mongo-s3config-test",
    )
    assert built == [{"region_name": "eu-central-1", "endpoint_url": "https://vpce.mongo.internal"}]
    assert downloads == [("bkt", "dump.tar.zst", "/tmp/mongo-s3config-test/dump.tar.zst")]
    assert len(ran) == 2  # untar + mongorestore
