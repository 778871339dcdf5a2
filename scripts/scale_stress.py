#!/usr/bin/env python
"""Scale-stress: replicate the sf0.1 corpus Nx (key-shifted) and
measure how the headline queries scale.

Purpose (BASELINE.md / SURVEY.md §6): the bench corpus tops out at
sf0.1; this script manufactures an sf~1-equivalent corpus (default
10x: ~6M lineitem rows) by unioning key-shifted copies of the fact
tables, then times representative queries at both scales.  A healthy
engine shows ~linear fact-bound scaling (fixed overhead amortizing
away) and unchanged plans: broadcast joins stay broadcast, aggregates
stay two-phase.

Usage: python scripts/scale_stress.py [factor] [out_dir]
Writes one JSON line: per-query seconds at sf0.1 and at the scaled
corpus, plus the ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v6spark.plans import REGISTRY
from v6spark.session import get_spark
from v6spark.sources.tables import TABLE_NAMES, load_table

HEADLINE = [
    "q_join_multi",
    "q_category_counts",
    "q_measure_stats",
    "q_window_running",
    "q_event_session",
    "q_dedup_exact",
    "q_sort_topk",
    "q_join_asof",
]
# round 2: q_corr and q_percentile folded into q_measure_stats,
# q_pivot into q_category_counts — already in the list above.

KEY_SHIFT = 1_000_000_000  # far above any real key


def build_scaled(spark, src_dir: str, out_dir: str, factor: int) -> None:
    li = load_table(spark, src_dir, "lineitem")
    orders = load_table(spark, src_dir, "orders")
    events = load_table(spark, src_dir, "events").drop("ts_ns")

    li_scaled = None
    orders_scaled = None
    events_scaled = None
    for i in range(factor):
        shift = F.lit(i * KEY_SHIFT)
        li_i = li.withColumn("l_orderkey", F.col("l_orderkey") + shift)
        o_i = orders.withColumn("o_orderkey", F.col("o_orderkey") + shift)
        e_i = events.withColumn("event_id", F.col("event_id") + shift)
        li_scaled = li_i if li_scaled is None else li_scaled.unionByName(li_i)
        orders_scaled = o_i if orders_scaled is None else orders_scaled.unionByName(o_i)
        events_scaled = e_i if events_scaled is None else events_scaled.unionByName(e_i)

    li_scaled.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    orders_scaled.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    events_scaled.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    for name in TABLE_NAMES:
        if name in ("lineitem", "orders", "events"):
            continue
        load_table(spark, src_dir, name).drop("ts_ns").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")


def time_query(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    REGISTRY[name].spark_fn(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v6spark_scaled"
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-stress", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{out_dir}/lineitem.parquet"):
        print(f"[scale] building {factor}x corpus at {out_dir}", file=sys.stderr)
        build_scaled(spark, src_dir, out_dir, factor)

    result = {"factor": factor, "base": {}, "scaled": {}, "ratio": {}}
    for name in HEADLINE:
        base = min(time_query(spark, name, src_dir) for _ in range(2))
        scaled = min(time_query(spark, name, out_dir) for _ in range(2))
        result["base"][name] = base
        result["scaled"][name] = scaled
        result["ratio"][name] = round(scaled / base, 2) if base else None
        print(f"[scale] {name}: {base}s -> {scaled}s ({result['ratio'][name]}x)", file=sys.stderr)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
