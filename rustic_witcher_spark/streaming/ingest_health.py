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


def read_jsonl_stream(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Streaming JSONL source with the quarantine column attached.
    Schema required — there is no inference pass on a stream at all."""
    return (
        spark.readStream.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def ingest_health(stream_with_quarantine: DataFrame) -> DataFrame:
    """Running (clean_rows, corrupt_rows, parsed_key_rows) over the
    whole stream.

    Complete-output-mode aggregate: three longs of state, merged per
    micro-batch. ``parsed_key_rows`` (non-null count of the first real
    column) stays in the OUTPUT deliberately — were it projected away,
    the optimizer would prune the aggregate expression and the scan
    schema would collapse to the corrupt column alone, tripping the
    SPARK-26965 guard; it is also a useful health signal in itself
    (rows whose key parsed)."""
    real = next(c for c in stream_with_quarantine.columns if c != CORRUPT_COL)
    bad = F.col(CORRUPT_COL).isNotNull()
    return stream_with_quarantine.agg(
        F.sum((~bad).cast("long")).alias("clean_rows"),
        F.sum(bad.cast("long")).alias("corrupt_rows"),
        F.count(F.col(real)).alias("parsed_key_rows"),
    )
