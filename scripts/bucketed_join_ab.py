#!/usr/bin/env python
"""A/B the bucketed fact-fact join against the forced-SMJ plain path.

VERDICT r3 asked for the non-broadcast join path in measured
evidence: at 100 TB the orders⋈lineitem join is a SortMergeJoin, and
the storage-side answer is bucketing — both tables pre-shuffled by
the join key at write time so the join runs with ZERO exchanges
(sources/layout.py::write_bucketed / bucketed_join).  This script
builds the shared 10x corpus (~6M lineitem rows), disables every
broadcast threshold so the plain-parquet join is genuinely
shuffle+sort+merge, and measures:

- ``forced_smj``:   plain parquet, both sides exchange-hashpartition
  then sort — the naive cluster-scale plan;
- ``bucketed``:     same join over 16-bucket tables written by
  ``write_bucketed`` — planner elides both exchanges (asserted on the
  plan string, not assumed).

Both variants aggregate revenue per orderpriority after the join so
the timing covers a realistic join+agg, not just a count.

Usage: python scripts/bucketed_join_ab.py [factor] [out_dir]
Prints one JSON line; the round artifact is AB_BUCKETED_JOIN.json.
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
from v6spark.sources.layout import bucketed_join, write_bucketed
from v6spark.sources.tables import load_table

REPS = 3
N_BUCKETS = 16


def _agg(joined):
    return joined.groupBy("o_orderpriority").agg(
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


def plan_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return _agg(
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )


def plan_bucketed(spark):
    li = (
        spark.table("ab_lineitem_b")
        .withColumnRenamed("l_orderkey", "o_orderkey")
    )
    orders = spark.table("ab_orders_b").hint("merge")
    return _agg(li.join(orders, "o_orderkey"))


def timed(spark, mk) -> float:
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        mk().write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def plan_text(df, mode: str = "simple") -> str:
    # simple mode inlines "Exchange hashpartitioning(...)" on one
    # line, so exchange counting is a substring count; formatted mode
    # splits node list from arguments and would count zero
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v6spark_scaled"
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "bucketed-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{out_dir}/lineitem.parquet"):
        from scale_stress import build_scaled

        print(f"[ab] building {factor}x corpus at {out_dir}", file=sys.stderr)
        build_scaled(spark, src_dir, out_dir, factor)

    # bucketed copies (one-time write cost, reported but not part of
    # the per-query timing — at 100 TB this is the ingest pipeline's
    # job, amortized over every repeated join)
    t0 = time.perf_counter()
    write_bucketed(
        load_table(spark, out_dir, "lineitem"),
        "ab_lineitem_b", "l_orderkey", n_buckets=N_BUCKETS,
        sort_col="l_orderkey",
    )
    write_bucketed(
        load_table(spark, out_dir, "orders"),
        "ab_orders_b", "o_orderkey", n_buckets=N_BUCKETS,
        sort_col="o_orderkey",
    )
    bucketing_sec = round(time.perf_counter() - t0, 3)

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        plain_plan = plan_text(plan_plain(spark, out_dir))
        bucket_plan = plan_text(plan_bucketed(spark))
        assert "SortMergeJoin" in plain_plan and "SortMergeJoin" in bucket_plan
        plain_exchanges = plain_plan.count("Exchange hashpartitioning")
        bucket_exchanges = bucket_plan.count("Exchange hashpartitioning")
        # the whole point: bucketing removes the join's exchanges (the
        # post-join agg may still repartition — that one is identical
        # in both variants)
        assert bucket_exchanges < plain_exchanges, (
            bucket_exchanges, plain_exchanges,
        )
        assert "Bucketed: true" in plan_text(plan_bucketed(spark), "formatted")

        a = sorted(map(tuple, plan_plain(spark, out_dir).collect()))
        b = sorted(map(tuple, plan_bucketed(spark).collect()))
        assert a == b, "variants disagree"

        smj_sec = timed(spark, lambda: plan_plain(spark, out_dir))
        bucketed_sec = timed(spark, lambda: plan_bucketed(spark))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)

    result = {
        "factor": factor,
        "reps": REPS,
        "n_buckets": N_BUCKETS,
        "bucketing_write_sec": bucketing_sec,
        "forced_smj_sec": smj_sec,
        "bucketed_sec": bucketed_sec,
        "speedup": round(smj_sec / bucketed_sec, 2) if bucketed_sec else None,
        "plain_join_exchanges": plain_exchanges,
        "bucketed_join_exchanges": bucket_exchanges,
    }
    print(
        f"[ab] forced-SMJ {smj_sec}s vs bucketed {bucketed_sec}s "
        f"({result['speedup']}x), exchanges {plain_exchanges}->"
        f"{bucket_exchanges}",
        file=sys.stderr,
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
