#!/usr/bin/env python
"""Measured skew evidence: salting vs AQE on a deliberately hot key.

VERDICT r3 item 6.  The engine ships two answers to key skew — the
explicit ``salted_agg``/``salted_broadcast_left`` operators
(operators/skew.py) and the posture of leaving AQE's runtime skew-join
splitting on — and until now both were plan-asserted, not measured.
This script manufactures a fact table where ONE key owns ~30% of all
rows (the "one customer is half the traffic" shape) at 10x bench
scale, then records wall-clock for:

aggregate path (groupBy on the hot key):
- ``plain_agg``:   direct groupBy — the hot key's partial aggregation
  still lands on one reducer AFTER map-side combine (which already
  absorbs most of it: combine makes agg skew mild by construction);
- ``salted_agg``:  two-phase (key, salt) spread.

join path (skewed fact ⋈ uniform dim, broadcast disabled so the join
is a real shuffle SMJ):
- ``smj_aqe_skew_off``: AQE skew-join splitting disabled — the hot
  key's entire sorted run is one task, the straggler;
- ``smj_aqe_skew_on``:  AQE splits the oversized partition at runtime
  (thresholds lowered to trigger at local scale, where partitions are
  MBs not the 256 MB cluster default — same mechanism, smaller trip
  point);
- ``salted_broadcast_left``: the explicit operator, for the case the
  right side is broadcast-sized.

Results are asserted identical across variants before timing.

Usage: python scripts/skew_ab.py [factor] [out_dir]
Prints one JSON line; the round artifact is AB_SKEW.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v6spark.operators.skew import salted_agg, salted_broadcast_left
from v6spark.session import get_spark
from v6spark.sources.tables import load_table

REPS = 3
HOT_KEY = 7
HOT_FRACTION = 0.3


def build_skewed(spark, src_dir: str, out_dir: str, factor: int) -> None:
    """10x lineitem with l_suppkey remapped so HOT_KEY owns ~30% of
    rows; a uniform supplier-like dim keyed the same way."""
    li = load_table(spark, src_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_quantity"
    )
    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 1_000_000_000))
        for i in range(factor)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    skewed = big.withColumn(
        "l_suppkey",
        F.when(F.rand(11) < HOT_FRACTION, F.lit(HOT_KEY)).otherwise(
            F.pmod(F.xxhash64("l_orderkey"), F.lit(1000)).cast("long")
        ),
    )
    skewed.write.mode("overwrite").parquet(f"{out_dir}/skewed_fact.parquet")
    spark.range(1000).select(
        F.col("id").alias("l_suppkey"),
        F.concat(F.lit("supp-"), F.col("id")).alias("s_name"),
        (F.col("id") % 25).alias("s_nationkey"),
    ).write.mode("overwrite").parquet(f"{out_dir}/skewed_dim.parquet")


def timed(mk) -> float:
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        mk().write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v6spark_skew"
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "skew-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{out_dir}/skewed_fact.parquet"):
        print(f"[skew] building skewed corpus at {out_dir}", file=sys.stderr)
        build_skewed(spark, src_dir, out_dir, factor)

    fact = spark.read.parquet(f"{out_dir}/skewed_fact.parquet")
    dim = spark.read.parquet(f"{out_dir}/skewed_dim.parquet")
    n_rows = fact.count()
    hot_rows = fact.filter(F.col("l_suppkey") == HOT_KEY).count()

    def plain_agg():
        return fact.groupBy("l_suppkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                    "double"
                ),
                6,
            ).alias("sum_value"),
        )

    def salted():
        return salted_agg(
            fact, ["l_suppkey"], "l_extendedprice", n_salts=32,
            salt_mode="random",
        )

    a = sorted(map(tuple, plain_agg().collect()))
    b = sorted(map(tuple, salted().collect()))
    assert a == b, "agg variants disagree"

    agg_res = {
        "plain_agg_sec": timed(plain_agg),
        "salted_agg_sec": timed(salted),
    }

    def smj_join():
        return (
            fact.join(dim, "l_suppkey")
            .groupBy("s_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                        "double"
                    ),
                    6,
                ).alias("sum_value"),
            )
        )

    def salted_join():
        return (
            salted_broadcast_left(fact, dim, "l_suppkey", n_salts=32)
            .groupBy("s_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                        "double"
                    ),
                    6,
                ).alias("sum_value"),
            )
        )

    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    )
    saved = {k: conf.get(k, None) for k in keys}
    join_res = {}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # local-scale trip points: partitions here are a few MB, so the
        # 256 MB cluster default would never split; the MECHANISM under
        # test is identical
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4MB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB")

        want = sorted(map(tuple, smj_join().collect()))
        got = sorted(map(tuple, salted_join().collect()))
        assert want == got, "join variants disagree"

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        join_res["smj_aqe_skew_off_sec"] = timed(smj_join)
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        join_res["smj_aqe_skew_on_sec"] = timed(smj_join)
        join_res["salted_broadcast_left_sec"] = timed(salted_join)
    finally:
        for k, v in saved.items():
            conf.set(k, v) if v is not None else conf.unset(k)

    result = {
        "factor": factor,
        "reps": REPS,
        "n_rows": n_rows,
        "hot_rows": hot_rows,
        "hot_share": round(hot_rows / n_rows, 3),
        "agg": agg_res,
        "join": join_res,
        "aqe_speedup": round(
            join_res["smj_aqe_skew_off_sec"] / join_res["smj_aqe_skew_on_sec"], 2
        ),
        "salting_vs_aqe": round(
            join_res["smj_aqe_skew_on_sec"]
            / join_res["salted_broadcast_left_sec"],
            2,
        ),
    }
    print(f"[skew] {json.dumps(result)}", file=sys.stderr)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
