"""JSONL / CSV sources — the non-parquet ingest legs.

The reference engine reads only DMS parquet (SURVEY §2.1); real corpus
ingest also arrives as JSON-lines dumps (one doc per line — the
standard LLM-corpus interchange format) and CSV extracts. Both readers
normalize to the SAME schema/dtypes a parquet read of that table
yields, so everything downstream (the whole queries() registry, dedup,
curation) is source-format-agnostic — pinned by the parity tests in
tests/test_text_sources.py.

Scale notes:
- Schemas are REQUIRED, never inferred: Spark's JSON/CSV inference runs
  an extra full pass over the data before the real read — at 100 TB
  that is a doubled ingest. Callers pass the DDL (or take the
  per-table defaults in ``TABLE_DDL``).
- JSONL is splittable per line and CSV per line when ``multiLine`` is
  off (kept off on purpose): executors split large files by byte
  ranges, so ingest parallelism is bytes/128MB, not file count.
- Malformed rows: PERMISSIVE + ``columnNameOfCorruptRecord`` keeps bad
  lines visible in a quarantine column instead of silently dropping
  (DROPMALFORMED) or failing the 100 TB job at hour 9 (FAILFAST).
  ``read_jsonl(..., quarantine=True)`` exposes them; the default strips
  the column after the health count so downstream schemas stay clean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rustic_witcher_spark.sources.parquet import pin_parquet_confs

CORRUPT_COL = "_corrupt_record"

# DDL for the synthetic tables most likely to arrive as text dumps.
# Timestamps are declared TIMESTAMP (session-TZ); pin_parquet_confs
# pins the session to UTC so the parse matches the parquet read.
TABLE_DDL: dict[str, str] = {
    "documents": "doc_id bigint, text string, lang string, source string, n_chars bigint",
    "events": "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    "supplier": "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double",
}


def _with_corrupt(ddl: str) -> str:
    return f"{ddl}, {CORRUPT_COL} string"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    quarantine: bool = False,
) -> DataFrame:
    """Read JSON-lines with an explicit schema (no inference pass).

    ``quarantine=True`` keeps the ``_corrupt_record`` column (NULL for
    clean rows, the raw line for malformed ones) so callers can route
    bad lines to a dead-letter sink; default drops it."""
    pin_parquet_confs(spark)
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return df if quarantine else df.drop(CORRUPT_COL)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
    quarantine: bool = False,
) -> DataFrame:
    """Read CSV with an explicit schema. ``multiLine`` stays off so
    files split by byte range across executors; embedded newlines must
    be quoted out upstream (the standard big-CSV contract)."""
    pin_parquet_confs(spark)
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )
    return df if quarantine else df.drop(CORRUPT_COL)


def corrupt_count(df_with_quarantine: DataFrame) -> int:
    """Health count for a quarantine read — how many raw lines failed
    the schema. One aggregate job.

    The aggregate references EVERY real column, for two reasons that
    are both scan-schema games the file sources play:

    1. SPARK-26965 / QUERY_ONLY_CORRUPT_RECORD_COLUMN: a query whose
       effective scan schema is only the corrupt column is rejected
       outright (the pruned parse would never populate it); caching —
       the documented alternative — is a non-starter on a 100 TB read.
    2. Column pruning changes WHICH rows are corrupt: a line that is
       valid JSON but fails type coercion on a later field (e.g. a
       string in a bigint column) is only flagged if the pruned parse
       actually touches that field. Counting against a partial schema
       undercounts — and disagrees with a full-schema consumer of the
       same read, which DOES drop the row (the silent-loss bug this
       fixed: corrupt_count said 0 while the clean write dropped a
       row). Corruptness is defined against the FULL schema, so the
       count must force a full parse."""
    reals = [c for c in df_with_quarantine.columns if c != CORRUPT_COL]
    row = df_with_quarantine.agg(
        F.sum(F.col(CORRUPT_COL).isNotNull().cast("long")).alias("bad"),
        *[F.count(F.col(c)).alias(f"__touch_{i}") for i, c in enumerate(reals)],
    ).collect()[0]
    return int(row["bad"] or 0)


def dead_letters(df_with_quarantine: DataFrame) -> DataFrame:
    """(raw_line, <every parsed field>) for the malformed rows — the
    dead-letter frame an operator replays after fixing the producer.

    All real columns are selected deliberately: it keeps the scan
    schema full so later-field coercion failures are flagged at all
    (the corrupt_count pruning trap above), and the partially-parsed
    fields show HOW FAR each bad line got."""
    reals = [c for c in df_with_quarantine.columns if c != CORRUPT_COL]
    return df_with_quarantine.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line"), *[F.col(c) for c in reals]
    )
