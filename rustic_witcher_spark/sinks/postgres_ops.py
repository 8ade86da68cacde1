"""Postgres prepare/finalize orchestration (O1–O8, SURVEY §2.10).

All statements are built as plain SQL strings (unit-testable offline)
and executed through a pluggable ``execute`` callable — psycopg/JDBC
aren't in this environment, so runtime execution is infra-gated while
the SQL surface keeps full parity with the reference:

- O2 drop schema + CREATE EXTENSION list   (target_db_preparator.rs:57-101)
- O4 data-import role, replica mode, grants (target_db_preparator.rs:143-226)
- O5 sequence ownership fix-ups             (target_db_preparator.rs:230-247)
- O6 sequence SETVAL sync from MAX(pk)      (target_db_finalizer.rs:17-57)
- O7 application-user grants                (target_db_finalizer.rs:62-109)
- O8 post-import SQL from env, ';'-split    (target_db_finalizer.rs:114-198)

O1/O3 (pg_dump/pg_restore) remain subprocess commands, also built here.
"""

from __future__ import annotations

from collections.abc import Callable

ExecuteFn = Callable[[str], None]


# --------------------------------------------------------------- O1 / O3


def pg_dump_command(source_url: str, schema: str, out_file: str) -> list[str]:
    """Schema-only dump in CUSTOM format (--format=c) — pg_restore
    rejects plain-SQL dumps, so the format flag is load-bearing for the
    O1→O3 pipeline (ref: target_db_preparator.rs:41 uses --format=c
    --no-owner --no-privileges; caught live by test_pg_live.py)."""
    return [
        "pg_dump", "--no-owner", "--no-privileges", "--schema-only",
        f"--schema={schema}", "--format=c", "--file", out_file, "--dbname", source_url,
    ]


def pg_restore_command(target_url: str, dump_file: str) -> list[str]:
    return ["pg_restore", "--clean", "--if-exists", "--no-owner", "--dbname", target_url, dump_file]


# -------------------------------------------------------------------- O2


def drop_schema_sql(schema: str) -> str:
    return f"DROP SCHEMA IF EXISTS {schema} CASCADE"


def create_extensions_sql(extensions: list[str]) -> list[str]:
    return [f"CREATE EXTENSION IF NOT EXISTS {ext}" for ext in extensions]


# -------------------------------------------------------------------- O4


def create_import_role_sql(role: str, password: str, schema: str, pg16_grant_to: str | None = None) -> list[str]:
    """Data-import role with replica session (FK/trigger bypass during
    load) and full schema rights; PG16+ additionally grants the role to
    the connecting superuser."""
    stmts = [
        f"DO $$ BEGIN CREATE ROLE {role} LOGIN PASSWORD '{password}'; "
        f"EXCEPTION WHEN duplicate_object THEN NULL; END $$",
        f"ALTER ROLE {role} SET session_replication_role = 'replica'",
        f"GRANT ALL ON SCHEMA {schema} TO {role}",
        f"GRANT ALL ON ALL TABLES IN SCHEMA {schema} TO {role}",
        f"GRANT ALL ON ALL SEQUENCES IN SCHEMA {schema} TO {role}",
    ]
    if pg16_grant_to:
        stmts.append(f"GRANT {role} TO {pg16_grant_to}")
    return stmts


# -------------------------------------------------------------------- O5


def sequence_ownership_sql(fixups: list[tuple[str, str, str]]) -> list[str]:
    """(sequence, table, column) triples → ALTER SEQUENCE OWNED BY."""
    return [f"ALTER SEQUENCE {seq} OWNED BY {table}.{col}" for seq, table, col in fixups]


# -------------------------------------------------------------------- O6

# Finds sequences owned by table columns (the reference's pg_depend join,
# target_db_finalizer.rs:18-39), to pair with MAX(pk) per table.
OWNED_SEQUENCES_QUERY = """
SELECT s.relname AS sequence_name, t.relname AS table_name, a.attname AS column_name
FROM pg_class s
JOIN pg_depend d ON d.objid = s.oid AND d.deptype = 'a'
JOIN pg_class t ON d.refobjid = t.oid
JOIN pg_attribute a ON a.attrelid = t.oid AND a.attnum = d.refobjsubid
JOIN pg_namespace n ON n.oid = s.relnamespace
WHERE s.relkind = 'S' AND n.nspname = {schema!r}
ORDER BY s.relname
"""


def setval_sql(sequence: str, table: str, pk_column: str) -> str:
    """SETVAL from current MAX(pk) — A1's aggregate feeding O6."""
    return f"SELECT setval('{sequence}', COALESCE((SELECT MAX({pk_column}) FROM {table}), 1))"


# -------------------------------------------------------------------- O7


def grant_app_users_sql(schema: str, users: list[str], owner: str | None = None) -> list[str]:
    stmts = []
    for u in users:
        stmts += [
            f"GRANT USAGE ON SCHEMA {schema} TO {u}",
            f"GRANT SELECT, INSERT, UPDATE, DELETE ON ALL TABLES IN SCHEMA {schema} TO {u}",
            f"GRANT USAGE, SELECT ON ALL SEQUENCES IN SCHEMA {schema} TO {u}",
        ]
        if owner:
            stmts.append(
                f"ALTER DEFAULT PRIVILEGES FOR ROLE {owner} IN SCHEMA {schema} "
                f"GRANT SELECT, INSERT, UPDATE, DELETE ON TABLES TO {u}"
            )
    return stmts


# -------------------------------------------------------------------- O8


def split_post_import_sql(blob: str) -> list[str]:
    """';'-split with blank-statement trimming (ref :114-198)."""
    return [s.strip() for s in blob.split(";") if s.strip()]


# ------------------------------------------------------------- execution


class PostgresUnavailable(RuntimeError):
    pass


def run_statements(statements: list[str], execute: ExecuteFn | None) -> None:
    """Run statements through the provided callable; without one
    (no psycopg/JDBC in this environment) raise ``PostgresUnavailable``."""
    if execute is None:
        raise PostgresUnavailable("no Postgres connection available; pass an execute callable")
    for stmt in statements:
        execute(stmt)
