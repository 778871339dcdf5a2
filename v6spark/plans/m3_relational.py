"""M3 tier — the general relational surface (SURVEY.md §2.2).

Joins (inner/multi/left/semi/anti/range/as-of), distinct and rollup
aggregation, ranking/analytic/frame windows, top-k, set ops, and the
scalar-function families (string/date/math/json).  The reference has
none of these beyond the D7 range-intersection; they are what makes
the engine a general query engine rather than a stats library.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from v6spark.functions.determinism import davg, dsum, o_davg, o_dsum
from v6spark.operators.asof import asof_join_latest
from v6spark.operators.filters import filter_in_ranges
from v6spark.plans.registry import register
from v6spark.sources.tables import load_table

TIER = "m3_relational"

def _revenue():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


O_REVENUE = "l_extendedprice * (1.0 - l_discount)"


@register(
    "q_join_inner",
    TIER,
    f"""
    SELECT c_mktsegment, count(*) AS n, {o_dsum('o_totalprice')} AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join fact->dim + aggregate.

    customer is dimension-sized: Spark's AQE picks a broadcast hash
    join (no shuffle of orders); at 100 TB the same plan holds as long
    as the dim fits the broadcast threshold, else AQE falls back to
    shuffled hash.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("sum_price"))
        .orderBy("c_mktsegment")
    )


@register(
    "q_join_multi",
    TIER,
    f"""
    SELECT r_name, count(*) AS n, {o_dsum(O_REVENUE)} AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship 5-way star join (TPC-H Q5 shape) — revenue per region.

    Join order follows the star: the big fact (lineitem) joins orders
    (shuffle or broadcast per AQE stats), then the shrinking dimension
    chain customer -> nation -> region rides broadcast joins.  nation
    and region are hinted broadcast explicitly — they are tiny at any
    scale factor and must never shuffle the fact side.
    """
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
        .agg(F.count(F.lit(1)).alias("n"), dsum(_revenue()).alias("revenue"))
        .orderBy("r_name")
    )


@register(
    "q_join_left",
    TIER,
    """
    SELECT c_nationkey,
           count(DISTINCT c_custkey) AS n_customers,
           count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join — customers without orders still counted."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q_join_semi",
    TIER,
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    ORDER BY c_custkey
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS) — left_semi never duplicates or widens rows."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q_join_anti",
    TIER,
    """
    SELECT p_partkey, p_name
    FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    ORDER BY p_partkey
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS) — parts never shipped."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@register(
    "q_region_range_join",
    TIER,
    f"""
    SELECT range_name, count(*) AS n, {o_dsum(O_REVENUE)} AS revenue
    FROM lineitem
    JOIN (VALUES ('early', DATE '1995-01-01', DATE '1997-06-01'),
                 ('mid',   DATE '1997-06-01', DATE '1999-06-01'),
                 ('late',  DATE '1999-06-01', DATE '2002-01-01'))
         AS ranges(range_name, lo, hi)
      ON CAST(l_shipdate AS DATE) >= lo AND CAST(l_shipdate AS DATE) < hi
    GROUP BY range_name
    ORDER BY range_name
    """,
)
def q_region_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genomic-region range join (D7: filter_variations_in_regions).

    Non-equi join against a 3-row literal range table: Spark plans a
    broadcast nested-loop join — the fact side streams once, no
    shuffle, which is exactly what survives a 100x scale-up.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ranges = spark.createDataFrame(
        [
            ("early", datetime.date(1995, 1, 1), datetime.date(1997, 6, 1)),
            ("mid", datetime.date(1997, 6, 1), datetime.date(1999, 6, 1)),
            ("late", datetime.date(1999, 6, 1), datetime.date(2002, 1, 1)),
        ],
        schema=T.StructType(
            [
                T.StructField("range_name", T.StringType()),
                T.StructField("lo", T.DateType()),
                T.StructField("hi", T.DateType()),
            ]
        ),
    )
    joined = filter_in_ranges(
        li.withColumn("ship_date", F.to_date("l_shipdate")), ranges, "ship_date"
    )
    return (
        joined.groupBy("range_name")
        .agg(F.count(F.lit(1)).alias("n"), dsum(_revenue()).alias("revenue"))
        .orderBy("range_name")
    )


@register(
    "q_join_asof",
    TIER,
    """
    SELECT p.event_id AS p_event_id,
           p.user_id,
           (SELECT c.event_id FROM events c
            WHERE c.event_type = 'click' AND c.user_id = p.user_id
                  AND c.ts <= p.ts
            ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS asof_click_id
    FROM events p
    WHERE p.event_type = 'purchase'
    ORDER BY p_event_id
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest prior 'click' for each 'purchase' per user.

    Uses the union+window implementation (operators/asof.py) — one
    shuffle, linear cost.  The oracle states the same semantics as a
    correlated LIMIT-1 subquery.  Timestamps compare as exact int64
    microseconds on the Spark side (ts_us) — ALIGNED with the oracle:
    DuckDB truncates the ns parquet timestamps to µs at scan time, so
    comparing at ns precision would diverge on sub-µs near-ties.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), "user_id", "ts_us"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts_us"
    )
    joined = asof_join_latest(
        purchases, clicks, key="user_id", ts="ts_us", payload="click_id"
    )
    return joined.select(
        "p_event_id", "user_id", F.col("asof_click_id")
    ).orderBy("p_event_id")


@register(
    "q_agg_distinct",
    TIER,
    """
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust
    FROM orders GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand + two-phase agg under the hood)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_cust"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_agg_rollup",
    TIER,
    """
    SELECT n_name, c_mktsegment, count(*) AS n,
           CAST(grouping(n_name) AS INT) AS g_nation,
           CAST(grouping(c_mktsegment) AS INT) AS g_segment
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(n_name, c_mktsegment)
    ORDER BY g_nation, g_segment, n_name, c_mktsegment
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping() flags disambiguating the NULL markers."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    )
    return (
        joined.rollup("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping("c_mktsegment").cast("int").alias("g_segment"),
        )
        .select("n_name", "c_mktsegment", "n", "g_nation", "g_segment")
        .orderBy("g_nation", "g_segment", "n_name", "c_mktsegment")
    )


@register(
    "q_window_rank",
    TIER,
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders)
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders per customer, total-order tie-break."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "q_window_running",
    TIER,
    """
    SELECT user_id, event_id,
           round(CAST(sum(CAST(value AS DECIMAL(18,6)))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE), 6) AS running_value
    FROM events
    ORDER BY user_id, event_id
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum over an unbounded-preceding frame.

    The accumulator is DECIMAL so the prefix sums are exact and
    independent of each engine's frame-evaluation strategy (DuckDB
    uses segment trees, Spark a running accumulator).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double"), 6
        ).alias("running_value"),
    ).orderBy("user_id", "event_id")


@register(
    "q_window_lag",
    TIER,
    """
    SELECT user_id, event_id,
           round(value - lag(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), 6) AS delta
    FROM events
    ORDER BY user_id, event_id
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag: per-user value delta, NULL on each first event."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
    ).orderBy("user_id", "event_id")


@register(
    "q_sort_topk",
    TIER,
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def q_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge), never a full sort at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .limit(20)
    )


@register(
    "q_set_ops",
    TIER,
    """
    SELECT 'except' AS op, custkey FROM (
      SELECT DISTINCT o_custkey AS custkey FROM orders
      EXCEPT
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0)
    UNION ALL
    SELECT 'intersect' AS op, custkey FROM (
      SELECT DISTINCT o_custkey AS custkey FROM orders
      INTERSECT
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0)
    ORDER BY op, custkey
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: EXCEPT and INTERSECT (distinct semantics)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    with_orders = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    negative = cust.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("custkey")
    )
    ex = with_orders.subtract(negative).withColumn("op", F.lit("except"))
    inter = with_orders.intersect(negative).withColumn("op", F.lit("intersect"))
    return ex.unionByName(inter).select("op", "custkey").orderBy("op", "custkey")


@register(
    "q_string_funcs",
    TIER,
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_uc,
           substring(p_name, 1, 8) AS name_pfx,
           CAST(length(p_name) AS INT) AS name_len,
           p_brand || '#' || p_type AS brand_type
    FROM part
    WHERE p_type LIKE 'S%'
    ORDER BY p_partkey
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions: upper/substring/length/concat/LIKE."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_type").like("S%"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_uc"),
            F.substring("p_name", 1, 8).alias("name_pfx"),
            F.length("p_name").cast("int").alias("name_len"),
            F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias(
                "brand_type"
            ),
        )
        .orderBy("p_partkey")
    )


@register(
    "q_date_funcs",
    TIER,
    f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(extract(year FROM o_orderdate) AS INT) AS order_year,
           count(*) AS n,
           {o_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY 1, 2
    ORDER BY order_month
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar functions: date_trunc / extract, emitted as DATE/INT."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("sum_price"))
        .orderBy("order_month")
    )


@register(
    "q_math_funcs",
    TIER,
    f"""
    SELECT l_returnflag,
           {o_davg('sqrt(l_extendedprice)')} AS avg_sqrt_price,
           round(avg(ln(l_extendedprice + 1.0)), 6) AS avg_ln_price,
           {o_davg('abs(l_discount - 0.05)')} AS avg_absdev_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions: sqrt/ln/abs under aggregation.

    sqrt and abs are IEEE-exact so they go through the decimal-exact
    mean; ln is only faithfully rounded (engine libms may differ in the
    last ULP) so it uses a plain double mean where per-row ULP noise
    averages out far below the 1e-6 rounding grain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            davg(F.sqrt(F.col("l_extendedprice"))).alias("avg_sqrt_price"),
            F.round(F.avg(F.log(F.col("l_extendedprice") + 1.0)), 6).alias(
                "avg_ln_price"
            ),
            davg(F.abs(F.col("l_discount") - 0.05)).alias("avg_absdev_disc"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_json_funcs",
    TIER,
    """
    SELECT event_type,
           count(*) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction: get_json_object -> typed aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(k), 6).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q_window_moving_avg",
    TIER,
    """
    SELECT user_id, event_id,
           round(CAST(sum(CAST(value AS DECIMAL(18,6)))
                        OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                      AS DOUBLE)
                 / CAST(count(*)
                        OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                        AS DOUBLE), 6) AS moving_avg
    FROM events
    ORDER BY user_id, event_id
    """,
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-user 1-hour trailing mean.

    The frame is a VALUE range over exact epoch nanoseconds (not N
    rows), so rows with sparse timestamps see only their true trailing
    hour.  Decimal accumulator + explicit sum/count keeps the mean
    bit-identical across engines regardless of frame-evaluation
    strategy.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    moving = F.round(
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double"),
        6,
    )
    return ev.select("user_id", "event_id", moving.alias("moving_avg")).orderBy(
        "user_id", "event_id"
    )


@register(
    "q_agg_cube",
    TIER,
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions with grouping() flags — all four
    grouping sets in one pass (Expand + single shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        )
        .select("o_orderstatus", "o_orderpriority", "n", "g_status", "g_priority")
        .orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    )


@register(
    "q_pivot",
    TIER,
    """
    SELECT c_mktsegment,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order-status counts as columns per market segment.

    ``groupBy().pivot(values=...)`` with explicit pivot values — the
    explicit list keeps the plan single-pass (no extra distinct-values
    job) and the output schema static, which is what a 100 TB pivot
    needs.  Oracle states the same as FILTERed counts.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    pivoted = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pivoted.select(
        "c_mktsegment",
        F.coalesce("F", F.lit(0)).alias("n_f"),
        F.coalesce("O", F.lit(0)).alias("n_o"),
        F.coalesce("P", F.lit(0)).alias("n_p"),
    ).orderBy("c_mktsegment")


@register(
    "q_percentile",
    TIER,
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group.

    ``percentile`` (exact, sort-based) rather than approx_percentile:
    the sketch-based estimate is engine-specific and would never
    hash-match an oracle.  Both engines use linear interpolation on
    the sorted set; quantities/prices are exact doubles so the
    interpolation arithmetic is identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50_qty"),
            F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_string_fuzzy",
    TIER,
    """
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey AND a.p_partkey < 60 AND b.p_partkey < 60
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY id_a, id_b
    """,
)
def q_string_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: near-identical part names by edit
    distance — the classic record-linkage primitive (both engines
    implement classic Levenshtein).  Bounded subset: edit distance is
    O(len^2) per pair; the scale path blocks candidates first
    (operators/dedup.py LSH) and verifies survivors only.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 60)
    a, b = part.alias("a"), part.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(b, F.col("a.p_partkey") < F.col("b.p_partkey"))
        .select(
            F.col("a.p_partkey").alias("id_a"),
            F.col("b.p_partkey").alias("id_b"),
            dist.cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 3)
        .orderBy("id_a", "id_b")
    )


@register(
    "q_agg_collect",
    TIER,
    """
    SELECT o_orderpriority,
           list_sort(list(DISTINCT o_orderstatus)) AS statuses,
           count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-group distinct values as a SORTED array.

    collect_set order is nondeterministic in any engine — sorting the
    array is what makes an array-typed result oracle-comparable.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.sort_array(F.collect_set("o_orderstatus")).alias("statuses"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_corr",
    TIER,
    """
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS syy,
             CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price
    FROM s
    ORDER BY l_returnflag
    """,
)
def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from decimal-exact sums.

    The built-in corr() is a streaming co-moment whose merge order
    differs between engines; here the five sums are exact decimal
    aggregations (order-independent) and the closed form runs the
    identical IEEE sequence on both sides.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d = "decimal(28,6)"
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q.cast(d)).cast("double").alias("sx"),
        F.sum(p.cast(d)).cast("double").alias("sy"),
        F.sum((q * q).cast(d)).cast("double").alias("sxx"),
        F.sum((p * p).cast(d)).cast("double").alias("syy"),
        F.sum((q * p).cast(d)).cast("double").alias("sxy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        "l_returnflag", F.round(corr, 6).alias("corr_qty_price")
    ).orderBy("l_returnflag")


@register(
    "q_unpivot",
    TIER,
    """
    SELECT p_partkey, attr, val FROM (
      SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part)
    WHERE p_partkey < 100
    ORDER BY p_partkey, attr
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide attribute columns to long (attr, val) rows.

    ``DataFrame.unpivot`` generates the rows in one pass (Expand node)
    — no N-way self-union scan; the oracle states the same relation as
    a UNION ALL.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return (
        part.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("retailprice"),
        )
        .unpivot("p_partkey", ["size", "retailprice"], "attr", "val")
        .orderBy("p_partkey", "attr")
    )


@register(
    "q_set_ops_all",
    TIER,
    """
    SELECT custkey, count(*) AS n FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice >= 100000)
    GROUP BY custkey
    ORDER BY custkey
    """,
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set op: INTERSECT ALL keeps per-key multiplicity
    min(left, right) — the multiset algebra q_set_ops' DISTINCT forms
    don't exercise."""
    orders = load_table(spark, sf_dir, "orders")
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    big = orders.filter(F.col("o_totalprice") >= 100000).select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        f_orders.intersectAll(big)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("custkey")
    )


@register(
    "q_window_distribution",
    TIER,
    """
    SELECT o_orderpriority, o_orderkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WHERE o_orderkey < 500
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderpriority, o_orderkey
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist.

    All three are exact rational arithmetic over the row's position —
    deterministic given the total order (price desc, key asc).
    """
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("o_orderpriority", "o_orderkey")


@register(
    "q_arg_extremes",
    TIER,
    """
    SELECT c_nationkey,
           (max({'bal': c_acctbal, 'ck': c_custkey})).ck AS richest_cust,
           (min({'bal': c_acctbal, 'ck': c_custkey})).ck AS poorest_cust,
           round(max(c_acctbal), 6) AS max_bal
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q_arg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max/arg-min: the key of the extreme row in one hash-agg
    pass (no self-join back), via max/min over a (value, key) struct —
    lexicographic struct comparison IS the total-order tie-break
    (acctbal ties do exist at sf0.1; a bare max_by/arg_max would pick
    arbitrarily in each engine whenever a tie lands on the extreme).
    """
    cust = load_table(spark, sf_dir, "customer")
    pair = F.struct(
        F.col("c_acctbal").alias("bal"), F.col("c_custkey").alias("ck")
    )
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.max(pair)["ck"].alias("richest_cust"),
            F.min(pair)["ck"].alias("poorest_cust"),
            F.round(F.max("c_acctbal"), 6).alias("max_bal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q_explode_lateral",
    TIER,
    """
    SELECT vec_id, i - 1 AS pos, round(CAST(embedding[i] AS DOUBLE), 6) AS val
    FROM embeddings, range(1, 65) t(i)
    WHERE vec_id < 10
    ORDER BY vec_id, pos
    """,
)
def q_explode_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral array explode WITH ordinality (posexplode).

    One Generate node fans each vector into (position, value) rows —
    the long-format pivot of an array column; the oracle states the
    same relation as a range lateral join.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
        .select(
            "vec_id",
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("v").cast("double"), 6).alias("val"),
        )
        .orderBy("vec_id", "pos")
    )


@register(
    "q_null_funcs",
    TIER,
    """
    WITH m AS (
      SELECT event_type,
             CASE WHEN value < 0.1 THEN NULL ELSE value END AS v
      FROM events)
    SELECT event_type,
           count(*) AS n,
           count(v) AS n_present,
           count(*) - count(v) AS n_null,
           round(CAST(sum(CAST(coalesce(v, 0.0) AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS sum_coalesced,
           count(nullif(event_type, 'error')) AS n_nullif
    FROM m
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar family: coalesce / nullif under aggregation
    (sentinel-to-NULL normalization is the engine's ingest rule —
    SURVEY.md §1.1; these are the functions downstream code uses)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("value") < 0.1, F.lit(None)).otherwise(F.col("value"))
    m = ev.select("event_type", v.alias("v"))
    return (
        m.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("v").alias("n_present"),
            (F.count(F.lit(1)) - F.count("v")).alias("n_null"),
            F.round(
                F.sum(F.coalesce("v", F.lit(0.0)).cast("decimal(18,6)")).cast(
                    "double"
                ),
                6,
            ).alias("sum_coalesced"),
            F.count(F.nullif("event_type", F.lit("error"))).alias("n_nullif"),
        )
        .orderBy("event_type")
    )


@register(
    "q_grouping_sets",
    TIER,
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — an arbitrary set list (neither rollup
    nor cube), via the SQL surface; one Expand + one shuffle."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
        """
    )


@register(
    "q_scalar_subquery",
    TIER,
    """
    SELECT o_orderpriority, count(*) AS n_above
    FROM orders o
    WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                                 / count(*)
                          FROM orders
                          WHERE o_orderpriority = o.o_orderpriority)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — orders above their priority's mean.

    Catalyst decorrelates this into an aggregate + join (no per-row
    re-execution).  The threshold is a decimal-exact mean so the
    strict > comparison is bit-identical across engines — a plain
    double avg would differ by summation order and could flip a row
    sitting within ~1e-5 of its group mean.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_sq")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_above
        FROM v_orders_sq o
        WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                                       / count(*)
                              FROM v_orders_sq
                              WHERE o_orderpriority = o.o_orderpriority)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "q_window_firstlast",
    TIER,
    """
    SELECT user_id, event_id,
           round(first_value(value) OVER w, 6) AS first_val,
           round(last_value(value) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING), 6) AS last_val
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def q_window_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value with explicit frames.

    last_value needs the unbounded-following frame (the default frame
    ends at CURRENT ROW, which would just echo each row) — the classic
    window-frame gotcha, stated identically in both engines.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.first("value").over(w), 6).alias("first_val"),
        F.round(F.last("value").over(w_full), 6).alias("last_val"),
    ).orderBy("user_id", "event_id")


@register(
    "q_regex_funcs",
    TIER,
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'data')) AS INT) AS n_data,
           regexp_extract(text, '([a-z]{6,})', 1) AS first_long_token,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS len_novowels
    FROM documents
    WHERE lang = 'en' AND doc_id < 200
    ORDER BY doc_id
    """,
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family: count / extract / global replace.

    DuckDB's regexp_replace is single-occurrence by default ('g' flag
    required) while Spark's is always global — the oracle states the
    flag explicitly (SURVEY-class cross-engine gotcha).
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("lang") == "en") & (F.col("doc_id") < 200)
    )
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit("data")).cast("int").alias("n_data"),
        F.regexp_extract("text", "([a-z]{6,})", 1).alias("first_long_token"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).cast("long").alias(
            "len_novowels"
        ),
    ).orderBy("doc_id")
