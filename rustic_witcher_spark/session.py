"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]``; on a real cluster the same settings apply
minus master/driver-memory (AQE, UTC, Arrow, shuffle-partition sizing are
cluster-safe defaults).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "rustic_witcher_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - AQE on (runtime shuffle re-planning, skew-join handling)
    - UTC session timezone (required for oracle comparison: Spark
      timestamps are session-TZ, DuckDB's are naive)
    - Arrow enabled for the few pandas_udf paths
    - shuffle partitions sized to cores locally (overridable)
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Spark has no TIMESTAMP(NANOS) type; read ns-precision parquet
        # columns (e.g. the events table's ts) as raw long nanos and
        # convert explicitly (sources.parquet.read_events)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Naive (non-UTC-adjusted) parquet timestamps must read as
        # session-TZ TIMESTAMP, not TIMESTAMP_NTZ: NTZ can't cast to
        # double/long (range/as-of bucketing needs epoch math) and the
        # DuckDB oracles read the same columns as naive TIMESTAMP under
        # a UTC session — TimestampType keeps both engines aligned.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Several operators compile large generated methods (hyperplane
        # signatures, 63-bit simhash folds, faker projections). The
        # default codegen class cache (100 entries) thrashes once a
        # workload runs tens of distinct plans; compiles are 1-6s each,
        # so evictions dwarf execution at test scale.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_MASTER"):  # local mode unless a cluster master is set
        builder = builder.master(f"local[{cpus}]").config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
