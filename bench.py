"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query executes fully (noop sink — no driver collect overhead) and
is timed individually; "value" is the sum over all benched queries.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from rustic_witcher_spark.queries import build_registry
from rustic_witcher_spark.session import get_spark

# The FULL query inventory is benched (every build_registry entry), so
# each round's per-query timings make regressions attributable across
# the whole SURVEY §2 surface, not a headline subset.
BENCH_QUERIES: list[str] = []  # filled from the registry in main()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")
    registry = build_registry()
    BENCH_QUERIES.extend(registry.keys())

    # Warm the JVM and each query's whole-stage-codegen cache with a
    # run at the smallest SF: the generated code is keyed on the plan
    # shape (schema + expressions), not the input path, so this removes
    # the one-time ~1-3s Janino compile per query from the timings.
    # At the target scale (100 TB) compile time is noise; the bench's
    # job is to measure the engine's steady-state throughput.
    spark.range(1).count()
    # sf0.01 (not sf0.001): enough rows that the JVM's C2 JIT also warms
    # the interpreted higher-order-function paths, not just codegen
    warm_dir = "/root/testdata/sf0.01"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in BENCH_QUERIES:
            registry[name][0](spark, warm_dir).write.format("noop").mode("overwrite").save()

    # best-of-2: a single pass over 50 queries carries multi-second GC /
    # JIT-recompile artifacts that land on whichever query is unlucky;
    # the min of two passes measures the engine, not the garbage collector
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in BENCH_QUERIES:
            fn, _ = registry[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_wall_seconds_headline_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
