#!/usr/bin/env python
"""Measured runtime-bloom-filter join benefit (VERDICT r3 missing #4).

The posture so far was plan-asserted: with a selective predicate on
the dimension side of a shuffle join, Spark's runtime row-level
filtering (spark.sql.optimizer.runtime.bloomFilter.*) builds a bloom
filter from the filtered dim keys and applies it to the FACT side
before the shuffle — at 100 TB this is the difference between
shuffling the whole fact table and shuffling the ~selectivity
fraction that can actually join.  This script measures it: 10x
corpus, broadcast disabled (the optimization only matters on shuffle
joins), orders filtered to one priority (~20% selectivity), joined to
lineitem, aggregated.

A/B: identical query with runtime bloom filter ON vs OFF; injection
asserted on the ON plan (BloomFilterMightContain / bloom_filter_agg),
results asserted identical.  Local thresholds lowered: the gate
creationSideThreshold defaults to 10 MB cluster-scale; the 10x local
dim side is smaller, same mechanism.

Usage: python scripts/bloom_ab.py [factor] [out_dir]
Prints one JSON line; the round artifact is AB_BLOOM.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from v6spark.session import get_spark
from v6spark.sources.tables import load_table

REPS = 3


def query(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ).cast("double"),
                6,
            ).alias("revenue"),
        )
    )


def timed(mk) -> float:
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        mk().write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v6spark_scaled"
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "bloom-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{out_dir}/lineitem.parquet"):
        from scale_stress import build_scaled

        print(f"[ab] building {factor}x corpus at {out_dir}", file=sys.stderr)
        build_scaled(spark, src_dir, out_dir, factor)

    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    )
    saved = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # local-scale trip points (cluster defaults: 10MB creation /
        # 10GB application-scan) — mechanism identical
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB",
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "1MB",
        )

        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        on_plan = query(spark, out_dir)._jdf.queryExecution().toString()
        bloom_injected = (
            "bloom_filter" in on_plan or "BloomFilter" in on_plan
        )
        # asserted, not merely recorded: without injection the A/B
        # would time two identical plans and publish a meaningless
        # ~1.0 "speedup" into the round artifact
        assert bloom_injected, (
            "runtime bloom filter was NOT injected — thresholds did not "
            "trip on this corpus; artifact would measure nothing"
        )
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        off_plan = query(spark, out_dir)._jdf.queryExecution().toString()
        assert "bloom_filter" not in off_plan and "BloomFilter" not in off_plan

        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        a = sorted(map(tuple, query(spark, out_dir).collect()))
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        b = sorted(map(tuple, query(spark, out_dir).collect()))
        assert a == b, "variants disagree"

        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        off_sec = timed(lambda: query(spark, out_dir))
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        on_sec = timed(lambda: query(spark, out_dir))
    finally:
        for k, v in saved.items():
            conf.set(k, v) if v is not None else conf.unset(k)

    result = {
        "factor": factor,
        "reps": REPS,
        "bloom_injected": bloom_injected,
        "bloom_on_sec": on_sec,
        "bloom_off_sec": off_sec,
        "speedup": round(off_sec / on_sec, 2) if on_sec else None,
    }
    print(f"[ab] {json.dumps(result)}", file=sys.stderr)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
