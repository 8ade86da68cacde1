"""Streaming ingest-health monitor — the streaming face of the
JSONL/CSV quarantine leg (sources/text_formats.py).

A corpus drop that arrives continuously (files landing in a bucket)
needs its malformed-line rate watched the same way the batch
`corrupt_count` reports it. The monitor is a complete-mode global
aggregate over the quarantine column: counts are trivially mergeable
across micro-batches, so state is TWO longs regardless of stream
length — the same constant-state argument as the registry's sketch
streams.

Spark guard note: batch queries whose effective file-source schema is
ONLY the internal corrupt column are rejected (SPARK-26965); the
aggregate here references a real data column for the same reason the
batch `corrupt_count` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rustic_witcher_spark.sources.text_formats import CORRUPT_COL, _with_corrupt


def read_jsonl_stream(
    spark: SparkSession, path: str, schema: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming JSONL source with the quarantine column attached.
    Schema required — there is no inference pass on a stream at all.
    ``max_files_per_trigger`` bounds each micro-batch (and makes a
    replayed file drop deterministic batch-by-batch)."""
    reader = (
        spark.readStream.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def ingest_health(stream_with_quarantine: DataFrame, key_col: str | None = None) -> DataFrame:
    """Running (clean_rows, corrupt_rows, parsed_key_rows,
    fully_parsed_rows) over the whole stream.

    ``key_col`` names the column whose parse success is the
    ``parsed_key_rows`` signal; default is the FIRST real column of the
    caller's DDL (documented contract, no longer a silent assumption —
    a schema ordered payload-first should pass its key explicitly).

    Complete-output-mode aggregate: four longs of state, merged per
    micro-batch. The aggregate references EVERY real column — that
    keeps the scan schema full, which matters twice: (1) a
    corrupt-column-only schema trips the SPARK-26965 guard outright,
    and (2) column pruning changes WHICH rows get flagged — a line
    that is valid JSON but fails type coercion on a later field is
    only marked corrupt if the parse touches that field, so a pruned
    monitor would report clean for rows a full-schema consumer drops
    (the batch-side corrupt_count had exactly this bug).
    ``parsed_key_rows`` (key parsed) and ``fully_parsed_rows`` (every
    field parsed) are useful health signals in themselves: a gap
    between them is the partially-coerced row count."""
    reals = [c for c in stream_with_quarantine.columns if c != CORRUPT_COL]
    key = key_col if key_col is not None else reals[0]
    if key not in reals:
        raise ValueError(f"key_col {key!r} is not a data column of the stream ({reals})")
    bad = F.col(CORRUPT_COL).isNotNull()
    all_parsed = F.lit(True)
    for c in reals:
        all_parsed = all_parsed & F.col(c).isNotNull()
    return stream_with_quarantine.agg(
        F.sum((~bad).cast("long")).alias("clean_rows"),
        F.sum(bad.cast("long")).alias("corrupt_rows"),
        F.count(F.col(key)).alias("parsed_key_rows"),
        F.sum(all_parsed.cast("long")).alias("fully_parsed_rows"),
    )
