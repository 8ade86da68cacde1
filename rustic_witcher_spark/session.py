"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]``; on a real cluster the same settings apply
minus master/driver-memory (AQE, UTC, Arrow, shuffle-partition sizing are
cluster-safe defaults).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _install_jvm_function_cache() -> None:
    """Cache the py4j reflection lookup behind every ``F.<fn>`` call.

    Stock PySpark resolves ``org.apache.spark.sql.functions`` and then
    the named method via TWO py4j reflection round-trips on EVERY
    functions-API call (``_get_jvm_function``); the resolved handle is
    a stateless JVM method ref, so re-resolving it per call buys
    nothing. On this host a py4j round-trip is ~1.7 ms, and the
    engine's query builders issue thousands of such calls per plan —
    measured 0.51 → 0.17 ms per ``F.col`` with the cache (and the
    build phase of expression-heavy entries drops proportionally).
    The cache keys on the live JVM view and resets if a new gateway
    appears (fresh subprocess JVMs re-import this module anyway).
    Purely a driver-side plan-construction fast path: the JVM object
    returned is identical, so analyzed/optimized/physical plans are
    byte-for-byte unchanged.
    """
    try:
        import pyspark.sql.functions.builtin as _builtin

        _builtin._get_jvm_function  # noqa: B018 — probe the private hook
    except (ImportError, AttributeError):
        # A pyspark upgrade moved/renamed the internal: degrade to stock
        # resolution speed instead of failing session creation (ADVICE r12).
        return

    if getattr(_builtin._get_jvm_function, "_rw_cached", False):
        return
    state: dict = {"jvm": None, "pkg": None, "cache": {}}

    def _cached_get_jvm_function(name, sc):
        jvm = sc._jvm
        if state["jvm"] is not jvm:
            # Publish pkg/cache BEFORE jvm: hosts legitimately build
            # plans from several driver threads (guide §2.6 job
            # overlap), and a reader that observes the new jvm must
            # also observe its matching pkg — the old order let a
            # concurrent F.<fn> call read pkg=None mid-rebuild. The
            # GIL makes each dict op atomic; a racing double-rebuild
            # is idempotent.
            state["pkg"] = getattr(jvm, "org.apache.spark.sql.functions")
            state["cache"] = {}
            state["jvm"] = jvm
        pkg = state["pkg"]
        cache = state["cache"]
        f = cache.get(name)
        if f is None:
            f = cache[name] = getattr(pkg, name)
        return f

    _cached_get_jvm_function._rw_cached = True
    _builtin._get_jvm_function = _cached_get_jvm_function


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
        # Python call-site capture for error enrichment (DataFrame
        # query context) costs ~5 extra py4j round-trips PLUS a Python
        # stack walk on EVERY functions-API/Column call — measured
        # 6.0 → 0.51 ms per F.col on this host (py4j RTT ~1.7 ms).
        # Plan construction is a real driver cost at any scale (the
        # engine builds hundreds of plans per run); the trade is
        # losing the Python line number in error messages, which the
        # engine's own tests never rely on. Static conf — must be set
        # at session build.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_MASTER"):  # local mode unless a cluster master is set
        builder = builder.master(f"local[{cpus}]").config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _install_jvm_function_cache()
    return spark
