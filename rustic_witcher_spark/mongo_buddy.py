"""Mongo export/import orchestration (S10/S11 parity) — command builders.

The reference's mongo-buddy shells out to mongodump/tar/mongorestore and
moves archives through S3 (ref: rustic-mongo-buddy/src/
mongo_data_exporter.rs:33-271, mongo_data_importer.rs:39-203). That is
process orchestration, not dataflow — kept out of Spark on purpose. The
commands are built here (unit-testable); execution requires the mongo
tooling, which is not in this container.
"""

from __future__ import annotations

import os


class ProductionGuardError(RuntimeError):
    pass


def guard_not_production(uri: str) -> None:
    """The importer refuses to restore into anything that looks like a
    production cluster (ref: mongo_data_importer.rs:40-43)."""
    if "prod" in uri.lower():
        raise ProductionGuardError(f"refusing to run against production-looking URI: {uri!r}")


def mongodump_command(uri: str, db: str, out_dir: str) -> list[str]:
    return ["mongodump", "--uri", uri, "--db", db, "--gzip", f"--out={out_dir}"]


def tar_command(src_dir: str, archive: str) -> list[str]:
    # zstd-compressed tar, matching the reference's `tar -acf` extension-driven choice
    return ["tar", "-acf", archive, "-C", src_dir, "."]


def untar_command(archive: str, dest_dir: str) -> list[str]:
    return ["tar", "-xf", archive, "-C", dest_dir]


def mongorestore_command(
    uri: str,
    dump_dir: str,
    ns_from: str | None = None,
    ns_to: str | None = None,
    parallel_collections: int = 4,
    insertion_workers: int = 4,
    drop: bool = True,
) -> list[str]:
    guard_not_production(uri)
    cmd = [
        "mongorestore",
        "--uri", uri,
        "--gzip",
        f"--numParallelCollections={parallel_collections}",
        f"--numInsertionWorkersPerCollection={insertion_workers}",
    ]
    if drop:
        cmd.append("--drop")
    if ns_from and ns_to:
        cmd += [f"--nsFrom={ns_from}", f"--nsTo={ns_to}"]
    cmd.append(dump_dir)
    return cmd


# S3 multipart threshold parity (ref: mongo_data_exporter.rs:105,160-164)
MULTIPART_THRESHOLD_BYTES = 5 * 1024**3
TARGET_MULTIPART_PARTS = 10


def multipart_part_size(total_bytes: int) -> int | None:
    """None = single PUT; otherwise the part size targeting ~10 parts."""
    if total_bytes < MULTIPART_THRESHOLD_BYTES:
        return None
    return -(-total_bytes // TARGET_MULTIPART_PARTS)  # ceil division


def multipart_upload(client, bucket: str, key: str, path: str, part_size: int) -> None:
    """Real S3 multipart sequence (ref: mongo_data_exporter.rs:105-237):
    CreateMultipartUpload → UploadPart per ``part_size`` chunk (read
    streamed, never the whole archive in memory) → CompleteMultipartUpload
    with the collected (PartNumber, ETag) list; AbortMultipartUpload on
    any failure so S3 doesn't accumulate orphaned billable parts.

    ``client`` is boto3-shaped and injected (the container has no S3);
    tests drive a fake asserting the exact call/chunk sequence.
    """
    mpu = client.create_multipart_upload(Bucket=bucket, Key=key)
    upload_id = mpu["UploadId"]
    parts = []
    try:
        with open(path, "rb") as fh:
            num = 1
            while True:
                chunk = fh.read(part_size)
                if not chunk:
                    break
                resp = client.upload_part(
                    Bucket=bucket, Key=key, UploadId=upload_id, PartNumber=num, Body=chunk
                )
                parts.append({"PartNumber": num, "ETag": resp["ETag"]})
                num += 1
        client.complete_multipart_upload(
            Bucket=bucket, Key=key, UploadId=upload_id, MultipartUpload={"Parts": parts}
        )
    except Exception:
        client.abort_multipart_upload(Bucket=bucket, Key=key, UploadId=upload_id)
        raise


def upload_archive(client, bucket: str, key: str, path: str) -> None:
    """Size-routed upload: single PutObject under the 5 GiB threshold,
    else the ~10-part multipart sequence — the exporter's decision rule
    (``multipart_part_size``) wired to a real client call sequence."""
    total = os.path.getsize(path)
    part_size = multipart_part_size(total)
    if part_size is None:
        with open(path, "rb") as fh:
            client.put_object(Bucket=bucket, Key=key, Body=fh)
        return
    multipart_upload(client, bucket, key, path, part_size)


def s3_upload_hook(client):
    """Adapter binding a boto3 client to ``export_data``'s
    ``upload(bucket, key, file)`` hook with size-routed multipart."""
    return lambda bucket, key, path: upload_archive(client, bucket, key, path)


def s3_download_hook(client):
    """Adapter binding a boto3 client to ``import_data``'s
    ``download(bucket, key, file)`` hook (managed streamed download —
    the importer's archive fetch, ref: mongo_data_importer.rs:148-176)."""
    return lambda bucket, key, path: client.download_file(bucket, key, path)


def split_s3_path(s3_path: str) -> tuple[str, str]:
    """``s3://bucket/some/key`` → (bucket, key)
    (ref: mongo_data_exporter.rs:55-68)."""
    bucket, _, key = s3_path.removeprefix("s3://").partition("/")
    if not bucket:
        raise ValueError(f"not an s3 path: {s3_path!r}")
    return bucket, key


def export_data(
    mongo_uri: str,
    database_name: str,
    s3_path: str,
    run=None,
    upload=None,
    cleanup=None,
    work_dir: str = "/tmp/mongo-dump",
) -> None:
    """The exporter's full sequence (ref: mongo_data_exporter.rs:33-77):
    validate the URI's trailing db name, mongodump, zstd-tar, upload to
    S3 (multipart decided by ``multipart_part_size``), clean up.

    ``run(cmd: list[str], check_for_error=False)`` executes a
    subprocess (defaults to ``shell.execute_cmd``, the O10 executor —
    requires the mongo tooling on PATH); ``upload(bucket, key, file)``
    ships the archive; ``cleanup(path)`` removes local artifacts.
    """
    if run is None:
        from rustic_witcher_spark.shell import execute_cmd as run
    if upload is None:
        # env-contract client: S3_VPC_ENDPOINT / S3_BUCKET_REGION
        # honored (ref: rustic-s3-config/src/lib.rs:8-34)
        from rustic_witcher_spark.s3config import create_s3_client

        upload = s3_upload_hook(create_s3_client())
    # the URI's trailing path segment, minus any ?options suffix —
    # 'mongodb+srv://u:p@c/db?retryWrites=true' names database 'db'
    uri_db = mongo_uri.rsplit("/", 1)[-1].split("?", 1)[0]
    if uri_db != database_name:
        raise ValueError(
            f"Database name in URI ({uri_db!r}) does not match provided database name {database_name!r}"
        )
    archive = f"{work_dir}.tar.zst"
    run(mongodump_command(mongo_uri, database_name, work_dir))
    run(tar_command(work_dir, archive))
    bucket, key = split_s3_path(s3_path)
    upload(bucket, key, archive)
    if cleanup:
        cleanup(archive)
        cleanup(work_dir)


def import_data(
    mongo_uri: str,
    database_name: str,
    s3_path: str,
    run=None,
    download=None,
    cleanup=None,
    work_dir: str = "/tmp/mongo-dump",
) -> None:
    """The importer's full sequence (ref: mongo_data_importer.rs:39-68):
    refuse production URIs, download the archive, untar, mongorestore,
    remove the archive.

    ``run`` defaults to ``shell.execute_cmd``; the mongorestore step
    passes ``check_for_error=True`` — mongorestore reports
    per-collection failures as "error" lines on stdout while still
    exiting 0, and the reference fails the import on any such line
    (mongo_data_importer.rs:194 → shell_command_executor.rs:47-56)."""
    import os

    if run is None:
        from rustic_witcher_spark.shell import execute_cmd as run
    if download is None:
        # env-contract client: S3_VPC_ENDPOINT / S3_BUCKET_REGION
        # honored (ref: rustic-s3-config/src/lib.rs:8-34)
        from rustic_witcher_spark.s3config import create_s3_client

        download = s3_download_hook(create_s3_client())

    guard_not_production(mongo_uri)
    extract_dir = f"{work_dir}/{database_name}"
    # the reference fs::create_dir_all's both locations before use
    # (mongo_data_importer.rs:48-49) — tar -C and the download fail on
    # a fresh host otherwise
    os.makedirs(extract_dir, exist_ok=True)
    bucket, key = split_s3_path(s3_path)
    archive = f"{work_dir}/{key.rsplit('/', 1)[-1]}"
    download(bucket, key, archive)
    run(untar_command(archive, extract_dir))
    run(mongorestore_command(mongo_uri, extract_dir), check_for_error=True)
    if cleanup:
        cleanup(archive)
