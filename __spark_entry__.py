"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (TPC-H Q1 shape) at sf0.001.
queries()     — one entry per implemented operator from SURVEY.md §2
                plus the north-star extensions (dedup/semdedup,
                clustering, similarity, sampling/mixing, packing/shard
                layout, sketches, decontamination, LM scoring,
                quality/PII, text analysis, multimodal, windowed
                events, datadiff, the composed curation pipeline, and
                the round-5 incremental-curation set: quality-aware
                survivors, batch-vs-corpus dedup, LSH calibration,
                threshold sweep, ANN recall eval, frame sampling,
                inter-event gap stats).
oracle_sql()  — DuckDB-dialect twins for EVERY entry (all of them — the
                deterministic IVF seed/Lloyd/probe replay and the md5
                hex-chain multimodal kernel included); IVF additionally
                carries a recall-vs-brute-force gate in tests.
                Rounds 6–7 extended the set with warehouse ops (SCD2,
                temporal joins, profiling, layout), reshaping (pivot /
                grouping sets / unpivot), graph (triangles, PageRank),
                and the round-7 training-pipeline block (DSIR, BPE,
                mixture temperature, BM25, hard negatives, group-hash
                splits, per-source KL drift).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rustic_witcher_spark.queries import build_registry, q1_pricing_summary

_REGISTRY = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
