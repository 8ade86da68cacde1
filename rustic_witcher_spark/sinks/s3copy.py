"""S3 server-side copy-through (S7, SURVEY §2.1) — infra-gated.

Tables with no anonymization config are copied bucket-to-bucket with a
server-side CopyObject, never read into the engine
(ref: anonymization_dataframe_operator.rs:368-394). Kept outside Spark
on purpose: a byte-identical passthrough should not pay scan+encode.
"""

from __future__ import annotations

try:
    import boto3  # type: ignore

    HAS_BOTO3 = True
except ImportError:  # pragma: no cover
    boto3 = None
    HAS_BOTO3 = False


def copy_object(source_bucket: str, key: str, dest_bucket: str, dest_key: str | None = None) -> None:
    from rustic_witcher_spark.s3config import create_s3_client

    if not HAS_BOTO3:
        raise RuntimeError("boto3 not available in this environment")
    # env-contract client: S3_VPC_ENDPOINT / S3_BUCKET_REGION honored
    # (ref: rustic-s3-config/src/lib.rs:8-34)
    s3 = create_s3_client(boto3)
    s3.copy_object(
        Bucket=dest_bucket,
        Key=dest_key or key,
        CopySource={"Bucket": source_bucket, "Key": key},
    )
