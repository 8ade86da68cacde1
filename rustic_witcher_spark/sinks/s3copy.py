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
    if not HAS_BOTO3:
        raise RuntimeError("boto3 not available in this environment")
    s3 = boto3.client("s3")
    s3.copy_object(
        Bucket=dest_bucket,
        Key=dest_key or key,
        CopySource={"Bucket": source_bucket, "Key": key},
    )
