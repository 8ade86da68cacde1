"""LIVE Postgres round-trip for the prepare → sync → finalize flow.

The recording-fake suite (test_pg_sync.py) pins the exact statement
sequence; this file proves the sequence actually WORKS on a real
server: a scratch PostgreSQL cluster is initdb'd into tmp, started on
a unix socket, and the whole pg_snapshot flow runs against it with
psql-backed hooks — real pg_dump --format=c → pg_restore schema copy,
real COPY loads, real DELETE + INSERT ... ON CONFLICT upsert, real
setval on a catalog-discovered owned sequence.

Skipped when the postgres server binaries are absent (the moral
equivalent of the reference's docker-compose gate,
/root/reference/docker-compose.yaml:1 — here the server ships in the
image, so the gate rarely fires).
"""

from __future__ import annotations

import shutil
import subprocess
import tempfile
from datetime import date
from pathlib import Path

import pytest

from rustic_witcher_spark.config.loader import load_config_str
from rustic_witcher_spark.sinks.pg_sync import PgSyncHooks, pg_snapshot

PG_PORT = "54333"
PG_MISSING = not (shutil.which("initdb") and shutil.which("pg_ctl") and shutil.which("psql"))

pytestmark = pytest.mark.skipif(PG_MISSING, reason="postgres server binaries not installed")

CFG = """
[[tables]]
table_name = "accounts"
[tables.anonymization_type]
type = "Multi"
[[tables.anonymization_type.column_transformations]]
column_name = "name"
[tables.anonymization_type.column_transformations.transformation_type]
type = "Replace"
replacement_value = "X"
"""

_SPARK_TO_PG = {
    "bigint": "bigint",
    "int": "integer",
    "double": "double precision",
    "string": "text",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
}


def _su_pg(cmd: str) -> None:
    subprocess.run(["su", "postgres", "-s", "/bin/sh", "-c", cmd], check=True, capture_output=True)


@pytest.fixture(scope="module")
def pg(spark):
    """A throwaway cluster on a unix socket (no TCP), owned by the
    'postgres' system user, with src/tgt databases, torn down with the
    module. Lives in a world-traversable /tmp dir (pytest's tmp roots
    are 0700 root, which the postgres user can't reach)."""
    base = Path(tempfile.mkdtemp(prefix="pglive-", dir="/tmp"))
    data, sock = base / "data", base / "sock"
    sock.mkdir()
    base.chmod(0o755)
    shutil.chown(base, "postgres", "postgres")
    shutil.chown(sock, "postgres", "postgres")
    try:
        _su_pg(f"initdb -A trust -U postgres -D {data} >/dev/null")
        _su_pg(
            f"pg_ctl -D {data} -l {base}/pg.log -w "
            f"-o \"-k {sock} -p {PG_PORT} -c listen_addresses=''\" start >/dev/null"
        )
    except subprocess.CalledProcessError as exc:  # pragma: no cover
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"could not start scratch postgres: {exc.stderr}")
    info = {"sock": str(sock)}
    _psql(info, "postgres", "CREATE DATABASE src")
    _psql(info, "postgres", "CREATE DATABASE tgt")
    _psql(info, "src", "CREATE TABLE public.accounts (k bigserial PRIMARY KEY, name text)")
    _psql(info, "postgres",
          "DO $$ BEGIN CREATE ROLE app LOGIN; EXCEPTION WHEN duplicate_object THEN NULL; END $$")
    yield info
    _su_pg(f"pg_ctl -D {data} -m immediate stop >/dev/null")
    shutil.rmtree(base, ignore_errors=True)


def _psql(pg, db: str, sql: str) -> list[list[str]]:
    proc = subprocess.run(
        ["psql", "-h", pg["sock"], "-p", PG_PORT, "-U", "postgres", "-d", db,
         "-v", "ON_ERROR_STOP=1", "-qAtX", "-F", "\t", "-c", sql],
        check=True, capture_output=True, text=True,
    )
    return [line.split("\t") for line in proc.stdout.splitlines()]


def _url(pg, db: str) -> str:
    # empty authority + host=<socket dir> query param: libpq URI form
    # that works with a socket-only server
    return f"postgresql://postgres@/{db}?host={pg['sock']}&port={PG_PORT}"


def _hooks(pg, db: str, pk_tables: set[str]) -> PgSyncHooks:
    """psql-backed implementations of the four infra touchpoints."""

    def execute(sql: str) -> None:
        _psql(pg, db, sql)

    def query(sql: str) -> list[tuple]:
        return [tuple(r) for r in _psql(pg, db, sql)]

    def write_dataframe(df, qualified: str, mode: str) -> None:
        cols = [(f.name, _SPARK_TO_PG[f.dataType.simpleString()]) for f in df.schema.fields]
        col_ddl = ", ".join(f'"{n}" {t}' for n, t in cols)
        bare = qualified.split(".", 1)[1]
        if mode == "overwrite":
            _psql(pg, db, f"DROP TABLE IF EXISTS {qualified}")
            _psql(pg, db, f"CREATE TABLE {qualified} ({col_ddl})")
        elif bare not in pk_tables:
            _psql(pg, db, f"CREATE TABLE IF NOT EXISTS {qualified} ({col_ddl})")
        # else: the table's DDL (incl. PK) came from the pg_restore copy
        tsv = "\n".join(
            "\t".join("\\N" if row[n] is None else str(row[n]) for n, _ in cols)
            for row in (r.asDict() for r in df.collect())
        )
        col_list = ", ".join(f'"{n}"' for n, _ in cols)
        subprocess.run(
            ["psql", "-h", pg["sock"], "-p", PG_PORT, "-U", "postgres", "-d", db,
             "-v", "ON_ERROR_STOP=1", "-qAtX",
             "-c", f"COPY {qualified} ({col_list}) FROM STDIN"],
            input=tsv + "\n", text=True, check=True, capture_output=True,
        )

    def run_command(argv: list[str]) -> None:
        subprocess.run(argv, check=True, capture_output=True)

    return PgSyncHooks(execute=execute, write_dataframe=write_dataframe,
                       query=query, run_command=run_command)


@pytest.fixture()
def dms_source(tmp_path):
    import pandas as pd

    d = tmp_path / "pgsrc" / "accounts"
    d.mkdir(parents=True)
    pd.DataFrame({"k": [1, 2, 3], "name": ["a", "b", "c"]}).to_parquet(d / "LOAD00000001.parquet")
    pd.DataFrame(
        {
            "k": [2, 2, 3, 4],
            "name": ["b1", "b2", "c", "d"],
            "Op": ["U", "U", "D", "I"],
            "_dms_ingestion_timestamp": [1, 2, 1, 1],
        }
    ).to_parquet(d / "20240115-000000001.parquet")
    return tmp_path / "pgsrc"


def _run_snapshot(spark, pg, dms_source):
    hooks = _hooks(pg, "tgt", pk_tables={"accounts"})
    return pg_snapshot(
        spark, hooks, dms_source, load_config_str(CFG),
        schema="public", primary_keys={"accounts": ["k"]},
        mode="DateAware", start_date=date(2024, 1, 1),
        import_role="rustic_import", import_role_password="pw",
        app_users=["app"],
        sequences=None,  # force catalog discovery through the query hook
        post_import_sql="ANALYZE public.accounts",
        source_url=_url(pg, "src"), target_url=_url(pg, "tgt"),
    )


def test_full_flow_against_live_server(spark, pg, dms_source):
    results = _run_snapshot(spark, pg, dms_source)
    assert len(results) == 1 and results[0].load_rows_written

    # LOAD insert + CDC merge, applied BY the server: k=3 tombstoned,
    # k=2 last-writer-wins updated, k=4 inserted; every name anonymized.
    rows = {int(k): name for k, name in _psql(pg, "tgt", "SELECT k, name FROM public.accounts ORDER BY k")}
    assert rows == {1: "X", 2: "X", 4: "X"}

    # staging table dropped by the flow
    assert _psql(pg, "tgt", "SELECT to_regclass('public.accounts__staging')") == [[""]]

    # finalize: the catalog-discovered owned sequence was SETVAL'd to MAX(pk)
    assert _psql(pg, "tgt", "SELECT last_value FROM public.accounts_k_seq") == [["4"]]

    # ON CONFLICT needed the PK constraint → proves pg_restore really
    # applied the source DDL (a plain-SQL dump would have crashed O3)
    assert _psql(
        pg, "tgt",
        "SELECT count(*) FROM pg_constraint c JOIN pg_class t ON t.oid = c.conrelid "
        "WHERE t.relname = 'accounts' AND c.contype = 'p'",
    ) == [["1"]]


def test_idempotent_rerun_converges(spark, pg, dms_source):
    """Running the snapshot twice (the reference's re-sync story) lands
    on the same target state — DROP SCHEMA CASCADE + restore + re-load."""
    _run_snapshot(spark, pg, dms_source)
    _run_snapshot(spark, pg, dms_source)
    rows = {int(k): name for k, name in _psql(pg, "tgt", "SELECT k, name FROM public.accounts ORDER BY k")}
    assert rows == {1: "X", 2: "X", 4: "X"}
