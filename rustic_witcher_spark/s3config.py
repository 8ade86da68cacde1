"""S3 client construction with the reference's environment contract
(ref: rustic-s3-config/src/lib.rs:8-34): honor ``S3_VPC_ENDPOINT`` as
an explicit endpoint URL when set (the in-VPC gateway path), and
``S3_BUCKET_REGION`` as the client region, defaulting to the
reference's pinned ``eu-west-1``.

Every boto3 client the engine builds (copy-through sink, S3 parquet
listing, mongo archive upload/download hooks) routes through
:func:`create_s3_client`, so the env contract holds engine-wide. The
boto3 module itself is injectable: the test container has no boto3/S3,
and the call-shape tests drive a recorder instead.
"""

from __future__ import annotations

import os

S3_AWS_REGION = "eu-west-1"  # the reference's default region


def s3_bucket_region() -> str:
    """``S3_BUCKET_REGION`` or the reference's pinned default
    (ref: rustic-s3-config/src/lib.rs:31-34)."""
    return os.environ.get("S3_BUCKET_REGION") or S3_AWS_REGION


def s3_client_kwargs() -> dict:
    """The kwargs the env contract adds to ``boto3.client("s3", ...)``:
    always a region; an ``endpoint_url`` only when ``S3_VPC_ENDPOINT``
    is set (ref: rustic-s3-config/src/lib.rs:8-29)."""
    kwargs: dict = {"region_name": s3_bucket_region()}
    endpoint = os.environ.get("S3_VPC_ENDPOINT")
    if endpoint:
        kwargs["endpoint_url"] = endpoint
    return kwargs


def create_s3_client(boto3_module=None):
    """Build the engine's S3 client. ``boto3_module`` is injectable for
    tests (the container has no boto3); production call sites pass
    nothing and get the lazily-imported real module."""
    if boto3_module is None:
        try:
            import boto3 as boto3_module  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover - boto3 not in test env
            raise RuntimeError("S3 access requires boto3 or an injected client") from e
    return boto3_module.client("s3", **s3_client_kwargs())
