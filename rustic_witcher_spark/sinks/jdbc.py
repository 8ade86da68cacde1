"""Postgres sinks (S8 insert / S9 upsert, SURVEY §2.1) — infra-gated.

No Postgres (or JDBC driver jar) ships in the test environment, so these
raise ``SinkUnavailable`` unless the runtime provides one; the logic is
still unit-testable via the SQL builders.

Insert: ``df.write.jdbc(mode="append")`` (LOAD files,
ref: cdc_operator.rs:275-307).
Upsert: Spark has no native JDBC MERGE — stage the batch into a temp
table then run ``INSERT ... ON CONFLICT (pk) DO UPDATE`` server-side
(CDC files, ref: cdc_operator.rs:308-328). Rows are pre-deduped
last-writer-wins per PK (operators.cdc.latest_by_pk) so the merge is
idempotent and order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class SinkUnavailable(RuntimeError):
    pass


def upsert_sql(table: str, columns: list[str], pk: list[str], staging: str | None = None) -> str:
    """Build the Postgres ``INSERT ... ON CONFLICT`` statement used to
    merge a staged batch into the target table (composite PKs joined as
    in the reference's comma-joined PK list, ref: cdc_operator.rs:310-328).
    """
    src = staging or f"{table}__staging"
    col_list = ", ".join(columns)
    conflict = ", ".join(pk)
    updates = ", ".join(f"{c} = EXCLUDED.{c}" for c in columns if c not in pk)
    return (
        f"INSERT INTO {table} ({col_list}) SELECT {col_list} FROM {src} "
        f"ON CONFLICT ({conflict}) DO UPDATE SET {updates}"
    )


def insert(df: DataFrame, url: str, table: str, properties: dict[str, str] | None = None, chunk_size: int = 1000) -> None:
    """Append rows into a target table (ref chunk size 1000, src/main.rs:169)."""
    try:
        df.write.option("batchsize", str(chunk_size)).jdbc(url=url, table=table, mode="append", properties=properties or {})
    except Exception as e:  # pragma: no cover - needs a live Postgres + driver jar
        raise SinkUnavailable(f"JDBC insert unavailable: {e}") from e


def upsert(df: DataFrame, url: str, table: str, pk: list[str], properties: dict[str, str] | None = None) -> None:
    """Stage + MERGE upsert. Requires a live Postgres; see module docstring."""
    staging = f"{table}__staging"
    try:
        df.write.jdbc(url=url, table=staging, mode="overwrite", properties=properties or {})
    except Exception as e:  # pragma: no cover
        raise SinkUnavailable(f"JDBC upsert unavailable: {e}") from e
    # the ON CONFLICT statement must run server-side; callers execute
    # upsert_sql(...) over their own psycopg/JDBC connection.
