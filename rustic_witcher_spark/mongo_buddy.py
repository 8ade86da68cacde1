"""Mongo export/import orchestration (S10/S11 parity) — command builders.

The reference's mongo-buddy shells out to mongodump/tar/mongorestore and
moves archives through S3 (ref: rustic-mongo-buddy/src/
mongo_data_exporter.rs:33-271, mongo_data_importer.rs:39-203). That is
process orchestration, not dataflow — kept out of Spark on purpose. The
commands are built here (unit-testable); execution requires the mongo
tooling, which is not in this container.
"""

from __future__ import annotations


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
