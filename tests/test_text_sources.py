"""JSONL/CSV source legs (sources/text_formats.py): schema-normalized
parity with the parquet read of the same rows, malformed-line
quarantine, and registry compatibility (a documents JSONL dump feeds
the same dedup query as parquet)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from rustic_witcher_spark.sources import text_formats as tf

DOCS = [
    {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11},
    {"doc_id": 2, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11},
    {"doc_id": 3, "text": "bonjour", "lang": "fr", "source": "books", "n_chars": 7},
]


def _write_jsonl(path, rows, extra_lines=()):
    lines = [json.dumps(r) for r in rows] + list(extra_lines)
    path.write_text("\n".join(lines) + "\n")


def test_jsonl_matches_parquet_schema_and_rows(spark, tmp_path):
    j = tmp_path / "docs.jsonl"
    _write_jsonl(j, DOCS)
    jdf = tf.read_jsonl(spark, str(j), tf.TABLE_DDL["documents"])

    pq = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(d["doc_id"], d["text"], d["lang"], d["source"], d["n_chars"]) for d in DOCS],
        tf.TABLE_DDL["documents"],
    ).write.parquet(str(pq))
    pdf = spark.read.parquet(str(pq))

    assert jdf.schema == pdf.schema  # dtypes normalized, not inferred
    assert sorted(map(tuple, jdf.collect())) == sorted(map(tuple, pdf.collect()))


def test_jsonl_quarantines_malformed_lines(spark, tmp_path):
    j = tmp_path / "docs.jsonl"
    _write_jsonl(j, DOCS, extra_lines=['{"doc_id": "not-a-number"', "garbage line"])
    q = tf.read_jsonl(spark, str(j), tf.TABLE_DDL["documents"], quarantine=True)
    assert tf.corrupt_count(q) == 2
    # clean rows still parse alongside the quarantined ones (the select
    # keeps a real column in the scan schema — corrupt-only queries are
    # disallowed by Spark, see corrupt_count docstring)
    clean = q.filter(F.col(tf.CORRUPT_COL).isNull()).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in clean) == [1, 2, 3]
    # default read strips the quarantine column
    assert tf.CORRUPT_COL not in tf.read_jsonl(spark, str(j), tf.TABLE_DDL["documents"]).columns


def test_csv_roundtrip_with_timestamps(spark, tmp_path):
    c = tmp_path / "events.csv"
    c.write_text(
        "event_id,ts,user_id,event_type,value,props\n"
        "1,2024-01-01 10:00:00,7,click,1.5,{}\n"
        "2,2024-01-01 11:30:00,8,view,2.0,{}\n"
    )
    df = tf.read_csv(spark, str(c), tf.TABLE_DDL["events"])
    rows = df.orderBy("event_id").collect()
    assert [r["event_id"] for r in rows] == [1, 2]
    assert rows[0]["ts"].hour == 10  # session pinned UTC by pin_parquet_confs
    assert df.schema["ts"].dataType.typeName() == "timestamp"


def test_csv_malformed_row_quarantined(spark, tmp_path):
    c = tmp_path / "events.csv"
    c.write_text(
        "event_id,ts,user_id,event_type,value,props\n"
        "1,2024-01-01 10:00:00,7,click,1.5,{}\n"
        "oops,not-a-ts,x,y,z,{}\n"
    )
    q = tf.read_csv(spark, str(c), tf.TABLE_DDL["events"], quarantine=True)
    assert tf.corrupt_count(q) == 1


def test_jsonl_feeds_registry_query(spark, tmp_path):
    """A JSONL corpus dump drives the same dedup operator as parquet —
    the source-format-agnostic contract."""
    from rustic_witcher_spark.operators import dedup

    j = tmp_path / "docs.jsonl"
    _write_jsonl(j, DOCS)
    d = tf.read_jsonl(spark, str(j), tf.TABLE_DDL["documents"])
    out = dedup.exact_dedup(d, "text", "doc_id").collect()
    # docs 1 and 2 share identical text → lowest-id survivor kept
    assert sorted(r["doc_id"] for r in out) == [1, 3]


def test_cli_ingest_jsonl(spark, tmp_path, capsys):
    import json as _json

    from rustic_witcher_spark import cli

    j = tmp_path / "in.jsonl"
    _write_jsonl(j, DOCS, extra_lines=["not json"])
    out = str(tmp_path / "docs.parquet")
    rc = cli.main(["ingest", "--format", "jsonl", "--input", str(j), "--target", out, "--table", "documents"])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep == {"rows": 3, "quarantined": 1, "target": out}
    assert spark.read.parquet(out).count() == 3


def test_streaming_ingest_health_accumulates(spark, tmp_path):
    """Streaming quarantine monitor: counts accumulate across
    micro-batches (complete mode, constant state)."""
    from rustic_witcher_spark.streaming.ingest_health import ingest_health, read_jsonl_stream

    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.jsonl").write_text(
        "\n".join([json.dumps(d) for d in DOCS] + ["garbage"]) + "\n"
    )
    stream = read_jsonl_stream(spark, str(src), tf.TABLE_DDL["documents"])
    qname = f"ingest_health_{abs(hash(str(tmp_path))) % 10**8}"
    query = (
        ingest_health(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        r = spark.sql(f"SELECT * FROM {qname}").collect()[0]
        assert (r["clean_rows"], r["corrupt_rows"]) == (3, 1)
        # second file lands → counts move forward, never reset; includes a
        # later-field coercion failure, which the full-schema monitor must
        # flag corrupt (a pruned scan would call it clean — the
        # corrupt_count bug class)
        (src / "b2.jsonl").write_text(
            '{"doc_id": 9, "text": "t", "lang": "en", "source": "w", "n_chars": 1}\n'
            "broken{\nalso broken\n"
            '{"doc_id": 10, "text": "t", "lang": "en", "source": "w", "n_chars": "xx"}\n'
        )
        query.processAllAvailable()
        r = spark.sql(f"SELECT * FROM {qname}").collect()[0]
        assert (r["clean_rows"], r["corrupt_rows"]) == (4, 4)
        # the coercion-failure row parsed its key but not every field
        assert r["parsed_key_rows"] == 5
        assert r["fully_parsed_rows"] == 4
    finally:
        query.stop()


def test_cli_ingest_dead_letter_captures_raw_lines(spark, tmp_path, capsys):
    """--quarantine-target routes the RAW malformed lines to a
    dead-letter parquet for replay, instead of dropping them."""
    import json as _json

    from rustic_witcher_spark import cli

    src = tmp_path / "in"
    src.mkdir()
    (src / "d.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "w", "n_chars": 2}\n'
        "this is not json\n"
        "{broken\n"
        # valid JSON, but a LATER field fails bigint coercion — the case a
        # column-pruned counting/DLQ scan never flags while the full-schema
        # clean write drops the row (review-confirmed silent-loss bug)
        '{"doc_id": 9, "text": "typed wrong", "lang": "en", "source": "w", "n_chars": "xx"}\n'
    )
    out, dlq = str(tmp_path / "out"), str(tmp_path / "dlq")
    rc = cli.main([
        "ingest", "--format", "jsonl", "--input", str(src), "--table", "documents",
        "--target", out, "--quarantine-target", dlq,
    ])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep == {"rows": 1, "quarantined": 3, "target": out, "quarantine_target": dlq}
    dl = spark.read.parquet(dlq).collect()
    raw = sorted(r["raw_line"] for r in dl)
    assert raw == sorted([
        "this is not json",
        "{broken",
        '{"doc_id": 9, "text": "typed wrong", "lang": "en", "source": "w", "n_chars": "xx"}',
    ])
    # the partial parse rides along: the coercion-failure line kept its
    # parseable fields
    typed = next(r for r in dl if r["doc_id"] == 9)
    assert typed["text"] == "typed wrong" and typed["n_chars"] is None

    # a clean rerun CLEARS the dead letters (stale-replay regression)
    (src / "d.jsonl").write_text('{"doc_id": 1, "text": "ok", "lang": "en", "source": "w", "n_chars": 2}\n')
    rc = cli.main([
        "ingest", "--format", "jsonl", "--input", str(src), "--table", "documents",
        "--target", out, "--quarantine-target", dlq,
    ])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["quarantined"] == 0
    assert spark.read.parquet(dlq).count() == 0


def test_cli_curate_quarantine_target_captures_malformed(spark, tmp_path, capsys):
    """curate gets the same dead-letter leg as ingest — malformed lines
    are captured for replay, not silently filtered."""
    import json as _json

    from rustic_witcher_spark import cli

    src = tmp_path / "in"
    src.mkdir()
    (src / "docs.jsonl").write_text(
        '{"doc_id": 1, "text": "a perfectly reasonable training document", "lang": "en", "source": "w", "n_chars": 41}\n'
        "garbage\n"
    )
    out, dlq = str(tmp_path / "shards"), str(tmp_path / "dlq")
    rc = cli.main([
        "curate", "--input", str(src), "--format", "jsonl", "--target", out,
        "--n-shards", "1", "--min-quality", "0.3", "--quarantine-target", dlq,
    ])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["input_rows"] == 1
    assert [r["raw_line"] for r in spark.read.parquet(dlq).collect()] == ["garbage"]


def test_cli_ingest_csv_dead_letter(spark, tmp_path, capsys):
    """The CSV leg routes malformed rows (wrong arity / bad coercion)
    through the same dead-letter contract as JSONL."""
    import json as _json

    from rustic_witcher_spark import cli

    src = tmp_path / "in"
    src.mkdir()
    (src / "d.csv").write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,ok,en,w,2\n"
        "9,bad type,en,w,notanumber\n"
    )
    out, dlq = str(tmp_path / "out"), str(tmp_path / "dlq")
    rc = cli.main([
        "ingest", "--format", "csv", "--input", str(src), "--table", "documents",
        "--target", out, "--quarantine-target", dlq,
    ])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == 1 and rep["quarantined"] == 1
    dl = spark.read.parquet(dlq).collect()
    assert len(dl) == 1
    assert dl[0]["raw_line"] == "9,bad type,en,w,notanumber"
    assert dl[0]["n_chars"] is None and dl[0]["text"] == "bad type"
