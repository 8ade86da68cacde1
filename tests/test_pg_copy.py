"""Distributed COPY bulk-load sink: Catalyst-side text-format
rendering (exact escaping contract) + a live parallel-stream round
trip against the scratch Postgres cluster."""

from __future__ import annotations

import datetime as dt
import shutil
import subprocess
import tempfile
from pathlib import Path

import pytest

from rustic_witcher_spark.sinks import pg_copy

# ------------------------------------------------------------ rendering


def test_copy_lines_escaping_contract(spark):
    df = spark.createDataFrame(
        [
            (1, "plain", 2.5),
            (2, "tab\there", None),
            (3, "nl\nhere", 0.0),
            (4, "back\\slash", 1.0),
            (5, None, 3.25),
            (6, "cr\rhere", None),
        ],
        "k long, s string, v double",
    )
    lines = {r["line"] for r in pg_copy.copy_lines(df).collect()}
    assert lines == {
        "1\tplain\t2.5",
        "2\ttab\\there\t\\N",
        "3\tnl\\nhere\t0.0",
        "4\tback\\\\slash\t1.0",
        "5\t\\N\t3.25",
        "6\tcr\\rhere\t\\N",
    }


def test_copy_lines_is_pure_catalyst(spark):
    df = spark.range(10).selectExpr("id", "concat('s', id) AS s", "cast(id AS double) AS v")
    plan = pg_copy.copy_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_copy_sql_quotes_columns():
    sql = pg_copy.copy_sql("public.t", ["k", "name"])
    assert sql == 'COPY public.t ("k", "name") FROM STDIN'


def test_copy_load_fans_out_streams(spark):
    # recording runner: count invocations via files (foreachPartition
    # runs in executor threads; local mode shares the filesystem)
    import os

    tmp = tempfile.mkdtemp(prefix="copyload-")

    def runner(lines):
        import uuid

        n = sum(1 for _ in lines)
        if n:
            # uuid, not id(lines): CPython reuses freed generator
            # addresses, so sequential partitions on one worker would
            # collide and overwrite each other's count file
            Path(tmp, f"part-{os.getpid()}-{uuid.uuid4().hex}").write_text(str(n))

    df = spark.range(100).selectExpr("id AS k", "concat('n', id) AS name")
    pg_copy.copy_load(df, runner, num_streams=3)
    counts = [int(p.read_text()) for p in Path(tmp).iterdir()]
    assert sum(counts) == 100 and 1 <= len(counts) <= 3
    shutil.rmtree(tmp, ignore_errors=True)


# ------------------------------------------------------------ live COPY

PG_PORT = "54334"
PG_MISSING = not (shutil.which("initdb") and shutil.which("pg_ctl") and shutil.which("psql"))


def _su_pg(cmd: str) -> None:
    subprocess.run(["su", "postgres", "-s", "/bin/sh", "-c", cmd], check=True, capture_output=True)


@pytest.fixture(scope="module")
def pgc():
    if PG_MISSING:
        pytest.skip("postgres server binaries not installed")
    base = Path(tempfile.mkdtemp(prefix="pgcopy-", dir="/tmp"))
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
    info = {"sock": str(sock), "data": str(data)}
    _psql(info, "CREATE DATABASE bulk")
    yield info
    _su_pg(f"pg_ctl -D {data} -m immediate stop >/dev/null")
    shutil.rmtree(base, ignore_errors=True)


def _psql(pg, sql: str, db: str = "postgres") -> list[list[str]]:
    proc = subprocess.run(
        ["psql", "-h", pg["sock"], "-p", PG_PORT, "-U", "postgres", "-d", db,
         "-v", "ON_ERROR_STOP=1", "-qAtX", "-F", "\t", "-c", sql],
        check=True, capture_output=True, text=True,
    )
    return [line.split("\t") for line in proc.stdout.splitlines()]


def test_live_parallel_copy_roundtrip(spark, pgc):
    _psql(pgc, "CREATE TABLE IF NOT EXISTS t (k bigint, s text, v double precision, ts timestamp)", "bulk")
    _psql(pgc, "TRUNCATE t", "bulk")
    rows = [
        (1, "plain", 1.5, dt.datetime(2024, 1, 2, 3, 4, 5)),
        (2, "tab\tnl\nback\\slash", None, None),
        (3, None, 2.25, dt.datetime(2024, 6, 7, 8, 9, 10, 123456)),
    ] + [(10 + i, f"bulk-{i}", float(i), None) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, s string, v double, ts timestamp")
    runner = pg_copy.psql_copy_runner(
        pgc["sock"], PG_PORT, "bulk", pg_copy.copy_sql("t", ["k", "s", "v", "ts"])
    )
    pg_copy.copy_load(df, runner, num_streams=4)  # 4 parallel COPY streams

    assert _psql(pgc, "SELECT count(*) FROM t", "bulk") == [["203"]]
    # escaped characters arrived intact (compared server-side: psql's
    # stdout would re-mangle real tabs/newlines in the value)
    assert _psql(
        pgc, r"SELECT s = E'tab\tnl\nback\\slash' FROM t WHERE k = 2", "bulk"
    ) == [["t"]]
    # NULLs are NULLs (not the string 'None' / '\\N')
    assert _psql(pgc, "SELECT count(*) FROM t WHERE s IS NULL", "bulk") == [["1"]]
    assert _psql(pgc, "SELECT count(*) FROM t WHERE v IS NULL", "bulk") == [["1"]]
    assert _psql(pgc, "SELECT count(*) FROM t WHERE ts IS NULL", "bulk") == [["201"]]
    # timestamp with microseconds survives Spark's string rendering
    assert _psql(pgc, "SELECT ts FROM t WHERE k = 3", "bulk") == [["2024-06-07 08:09:10.123456"]]


def test_copy_escaping_roundtrips_arbitrary_text(spark):
    """Property: un-escaping a rendered line recovers the exact cell
    values for adversarial strings (escape-order bugs — e.g. escaping
    backslash last — would double-unescape)."""
    from hypothesis import given, settings, HealthCheck
    from hypothesis import strategies as st

    def unescape(cell: str):
        if cell == r"\N":
            return None
        out, i = [], 0
        while i < len(cell):
            c = cell[i]
            if c == "\\" and i + 1 < len(cell):
                nxt = cell[i + 1]
                out.append({"t": "\t", "n": "\n", "r": "\r", "\\": "\\"}.get(nxt, nxt))
                i += 2
            else:
                out.append(c)
                i += 1
        return "".join(out)

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
    @given(st.lists(st.one_of(st.none(), st.text(max_size=30)), min_size=1, max_size=25))
    def prop(values):
        df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, s string")
        lines = {r["line"] for r in pg_copy.copy_lines(df).collect()}
        got = {}
        for line in lines:
            idx, cell = line.split("\t", 1)
            got[int(idx)] = unescape(cell)
        assert got == dict(enumerate(values))

    prop()
