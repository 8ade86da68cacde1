"""Quality heuristics + PII scrubbing (operators/quality.py) — planted
fixtures, engine-vs-engine regex equivalence, edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from rustic_witcher_spark.operators import quality

PII_DOCS = [
    (0, "contact me at john.doe+spam@example.co.uk or call +1 (555) 123-4567 now"),
    (1, "server at 192.168.0.1 and 10.0.0.255 replied"),
    (2, "no pii here, honest"),
    (3, None),
    (4, "double email a@b.io c@d.org and phone +44 20 7946 0958"),
]


def test_pii_redact_planted(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r["clean"] for r in df.select("doc_id", quality.pii_redact(F.col("text")).alias("clean")).collect()}
    assert got[0] == "contact me at [EMAIL] or call [PHONE] now"
    assert got[1] == "server at [IP] and [IP] replied"
    assert got[2] == "no pii here, honest"
    assert got[3] == ""  # NULL-safe
    assert got[4] == "double email [EMAIL] [EMAIL] and phone [PHONE]"


def test_pii_counts_planted(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    c = quality.pii_counts(F.col("text"))
    rows = {r["doc_id"]: (r["e"], r["i"], r["p"]) for r in df.select(
        "doc_id", c["email"].alias("e"), c["ip"].alias("i"), c["phone"].alias("p")).collect()}
    assert rows[0] == (1, 0, 1)
    assert rows[1] == (0, 2, 0)
    assert rows[2] == (0, 0, 0)
    assert rows[4] == (2, 0, 1)


def test_pii_sql_twin_agrees(spark, duck):
    """Java regex (Spark) and RE2 (DuckDB) must produce byte-identical
    redactions on the planted fixture — the patterns live in the
    common subset."""
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    s_rows = {r["doc_id"]: r["clean"] for r in df.select("doc_id", quality.pii_redact(F.col("text")).alias("clean")).collect()}
    duck.execute("CREATE OR REPLACE TABLE _pii(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO _pii VALUES (?, ?)", PII_DOCS)
    d_rows = dict(duck.execute(f"SELECT doc_id, {quality.sql_pii_redact('text')} FROM _pii").fetchall())
    assert s_rows == d_rows


def test_repetition_fractions(spark):
    rows = [
        (0, "spam spam spam spam"),          # one token dominates
        (1, "a b a b a b"),                  # top bigram 'a b' = 3/5
        (2, "all words totally different here"),
        (3, ""),                             # no tokens -> 0.0
        (4, "single"),                       # no bigrams -> 0.0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["tt"], r["tb"]) for r in df.select(
        "doc_id",
        quality.top_token_fraction(F.col("text")).alias("tt"),
        quality.top_bigram_fraction(F.col("text")).alias("tb"),
    ).collect()}
    assert got[0] == (1.0, 1.0)
    assert got[1][0] == 0.5 and abs(got[1][1] - 3 / 5) < 1e-9
    assert got[2][0] == 0.2
    assert got[3] == (0.0, 0.0)
    assert got[4] == (1.0, 0.0)


def test_gopher_stats(spark):
    rows = [(0, "abc de"), (1, "### ### x2"), (2, None), (3, "wait... what…")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in df.select(
        "doc_id",
        quality.mean_word_length(F.col("text")).alias("mwl"),
        quality.alpha_word_fraction(F.col("text")).alias("awf"),
        quality.symbol_token_ratio(F.col("text")).alias("str_"),
    ).collect()}
    assert got[0]["mwl"] == 2.5 and got[0]["awf"] == 1.0 and got[0]["str_"] == 0.0
    assert got[1]["awf"] == 0.0 and got[1]["str_"] == 2.0  # 6 '#' over 3 tokens
    assert got[2]["mwl"] == 0.0
    # '...' is ONE ellipsis mark, not three symbols; '…' is one too
    assert got[3]["str_"] == 1.0  # 2 marks over 2 tokens


def test_quality_and_pii_are_streaming_compatible(spark, tmp_path):
    """The stateless text operators are plain projections, so the SAME
    expressions run unchanged in Structured Streaming — scrub-and-score
    as a continuous ingest stage."""
    rows = [(0, "mail me at a@b.io"), (1, "clean text here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    src = str(tmp_path / "docs")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = stream.select(
        "doc_id",
        quality.pii_redact(F.col("text")).alias("clean"),
        quality.top_token_fraction(F.col("text")).alias("tt"),
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("scrub")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    got = {r["doc_id"]: r["clean"] for r in spark.sql("SELECT * FROM scrub").collect()}
    q.stop()
    assert got == {0: "mail me at [EMAIL]", 1: "clean text here"}
