#!/usr/bin/env python
"""Benchmark the declared query suite (BASELINE.md protocol).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], one warm
SparkSession, 3 repetitions per query, median wall-clock.

Materialization uses the ``noop`` sink: the full result is computed
and serialized by executors but never shipped to the driver, so the
number measures the engine, not driver-side row transfer.

Prints ONE JSON line:
  {"metric": "suite_seconds", "value": <total>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>, ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from v6spark.plans import REGISTRY  # noqa: E402
from v6spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("V6SPARK_BENCH_REPS", "3"))
# One untimed warm-up execution per query before the timed reps: the
# first execution of a query pays one-off JVM JIT/codegen-compile cost
# (measured 12.6 s cold vs 1.65 s warm for q_dedup_minhash) that says
# nothing about steady-state throughput.  Recorded in the JSON line.
WARMUP = int(os.environ.get("V6SPARK_BENCH_WARMUP", "1"))


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("v6spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    per_query: dict[str, float] = {}
    for name in sorted(REGISTRY):
        fn = REGISTRY[name].spark_fn
        times = []
        for _ in range(WARMUP):
            materialize(fn(spark, sf_dir))
        for _ in range(REPS):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            times.append(time.perf_counter() - t0)
        per_query[name] = round(statistics.median(times), 4)
        print(f"[bench] {name}: {per_query[name]}s", file=sys.stderr)

    total = round(sum(per_query.values()), 4)
    qs = sorted(per_query.values())
    result = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf_from_dir(sf_dir),
        "n_queries": len(per_query),
        "p50_sec": round(qs[len(qs) // 2], 4),
        "p95_sec": round(qs[max(0, int(len(qs) * 0.95) - 1)], 4),
        "reps": REPS,
        "warmup": WARMUP,
        "cpus": cpus,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
