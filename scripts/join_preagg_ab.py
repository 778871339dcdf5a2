#!/usr/bin/env python
"""A/B the q_join_multi pre-join partial aggregation at 10x scale.

The r3 rewrite reduces lineitem to one row per l_orderkey BEFORE the
orders join.  Locally (sf0.1, orders broadcasts) that adds a shuffle
and costs ~10%; the claim is that it wins where it matters — when the
fact-fact join is a SHUFFLE join, the shape it takes at 100 TB where
orders exceeds any broadcast threshold.  This script measures both
variants on the 10x corpus (~6M lineitem rows, shared with
scripts/scale_stress.py) under both postures:

- ``broadcast``: default session (AQE picks broadcast for orders);
- ``shuffle``:   spark.sql.autoBroadcastJoinThreshold=-1 on the
  lineitem⋈orders pair only (dimension chain stays hinted broadcast),
  simulating the cluster-scale join strategy.

Usage: python scripts/join_preagg_ab.py [factor] [out_dir]
Prints one JSON line; the round artifact is AB_JOIN_PREAGG.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v6spark.session import get_spark
from v6spark.sources.tables import load_table

REPS = 3


def _revenue():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def plan_joined_then_agg(spark, sf_dir):
    """The pre-r3 shape: join the raw fact, aggregate afterwards."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(_revenue().cast("decimal(18,6)")).cast("double"), 6
            ).alias("revenue"),
        )
    )


def plan_preagg(spark, sf_dir):
    """The r3 shape: reduce per l_orderkey before any join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(_revenue().cast("decimal(18,6)")).alias("_rev"),
    )
    return (
        per_order.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.sum("_n").alias("n"),
            F.round(F.sum("_rev").cast("double"), 6).alias("revenue"),
        )
    )


def timed(spark, fn, sf_dir) -> float:
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v6spark_scaled"
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "preagg-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{out_dir}/lineitem.parquet"):
        from scale_stress import build_scaled

        print(f"[ab] building {factor}x corpus at {out_dir}", file=sys.stderr)
        build_scaled(spark, src_dir, out_dir, factor)

    # sanity: both variants agree
    a = sorted(map(tuple, plan_joined_then_agg(spark, out_dir).collect()))
    b = sorted(map(tuple, plan_preagg(spark, out_dir).collect()))
    assert a == b, "variants disagree"

    result = {"factor": factor, "reps": REPS, "postures": {}}
    for posture, thresh in (("broadcast", None), ("shuffle", "-1")):
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        if thresh is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        try:
            joined = timed(spark, plan_joined_then_agg, out_dir)
            preagg = timed(spark, plan_preagg, out_dir)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        result["postures"][posture] = {
            "join_then_agg_sec": joined,
            "preagg_sec": preagg,
            "speedup": round(joined / preagg, 2) if preagg else None,
        }
        print(
            f"[ab] {posture}: join-then-agg {joined}s vs preagg {preagg}s "
            f"({result['postures'][posture]['speedup']}x)",
            file=sys.stderr,
        )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
