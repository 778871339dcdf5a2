"""M1 tier — scan / project / filter / single-shuffle aggregates.

Declared queries (SURVEY.md §2.3) covering reference ops A1/B1 (scan +
projection), D6/D9 (predicate filters + accounting), C1/C9/C10/C11
(rates, moments, histogram), B3-B6 (subset, masking, recode).
Every plan here is scan -> narrow ops -> at most one hash-agg shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from v6spark.functions.determinism import dsum, o_davg, o_dsum
from v6spark.operators import stats, transforms
from v6spark.operators.filters import accounting_df
from v6spark.plans.registry import register
from v6spark.sources.tables import load_table

TIER = "m1_core"


@register(
    "q_scan_project",
    TIER,
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection scan (A1+B1: load_zarr + field selection).

    Column pruning must reach the parquet reader: the scan's ReadSchema
    is exactly these 5 of 11 lineitem columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        F.to_date("l_shipdate").alias("ship_date"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q_filter_pred",
    TIER,
    f"""
    SELECT count(*) AS n,
           {o_dsum('l_quantity')} AS sum_qty,
           {o_dsum('l_extendedprice')} AS sum_price
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.08
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pushed-down conjunctive predicate + global aggregate (D6).

    Both comparisons reach the scan as PushedFilters; the aggregate is
    a 1-row partial+final combine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30) & F.col("l_discount").between(0.02, 0.08)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
    )


@register(
    "q_quality_filter",
    TIER,
    """
    SELECT o_orderstatus, count(*) AS n
    FROM orders o
    WHERE o_totalprice >= 100000
      AND o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                                 / count(*)
                          FROM orders
                          WHERE o_orderpriority = o.o_orderpriority)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filter with static AND data-derived thresholds (D6 +
    correlated scalar subquery).

    The per-priority mean threshold is a correlated scalar subquery
    that Catalyst decorrelates into an aggregate + join — no per-row
    re-execution.  Decimal-exact mean so the strict > comparison is
    bit-identical across engines (a plain double avg differs by
    summation order and could flip a row near its group mean).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_qf")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n
        FROM v_orders_qf o
        WHERE o_totalprice >= 100000
          AND o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                                     / count(*)
                              FROM v_orders_qf
                              WHERE o_orderpriority = o.o_orderpriority)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


@register(
    "q_missing_rate",
    TIER,
    """
    SELECT event_type,
           round(avg(CASE WHEN value < 0.1 THEN 1.0 ELSE 0.0 END), 6) AS miss_rate
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_missing_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-call-rate analog (C1: calc_missing_gt, rates=True).

    "Missing" = value below the detection threshold; the 0/1 indicator
    mean is exact integer arithmetic in doubles.
    """
    ev = load_table(spark, sf_dir, "events")
    return stats.rate_of(
        ev, ["event_type"], F.col("value") < 0.1, alias="miss_rate"
    ).orderBy("event_type")


@register(
    "q_per_entity_rate",
    TIER,
    f"""
    SELECT user_id, count(*) AS n_events, {o_davg('value')} AS avg_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_per_entity_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Other-axis reduction (C11/C9: per-sample stats across variants)."""
    ev = load_table(spark, sf_dir, "events")
    return stats.group_mean(
        ev, ["user_id"], "value", n_alias="n_events", avg_alias="avg_value"
    ).orderBy("user_id")


@register(
    "q_category_counts",
    TIER,
    """
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS n_f,
           CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS n_o,
           count(*) AS n_total
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_category_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allele-count matrix (C2: count_alleles), pivoted wide.

    The reference's count matrix is (variant x allele) — the pivoted
    form IS the faithful shape.  ``groupBy().pivot(values=[...])``
    with an explicit value list keeps the plan single-pass (no extra
    distinct-values job) and the output schema static, which is what a
    100 TB pivot needs.  Oracle states the same as FILTERed counts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .count()
    )
    n_f = F.coalesce("F", F.lit(0)).alias("n_f")
    n_o = F.coalesce("O", F.lit(0)).alias("n_o")
    return pivoted.select(
        "l_returnflag",
        n_f,
        n_o,
        (F.coalesce("F", F.lit(0)) + F.coalesce("O", F.lit(0))).alias("n_total"),
    ).orderBy("l_returnflag")


@register(
    "q_measure_stats",
    TIER,
    """
    WITH m AS (
      SELECT l_suppkey,
             round(avg(l_quantity), 6) AS avg_quantity,
             min(l_quantity) AS min_quantity,
             max(l_quantity) AS max_quantity,
             round(sqrt((sum(l_quantity * l_quantity)
                         - sum(l_quantity) * sum(l_quantity) / CAST(count(l_quantity) AS DOUBLE))
                        / (CAST(count(l_quantity) AS DOUBLE) - 1.0)), 6) AS std_quantity,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS syy,
             CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
             round(quantile_cont(l_quantity, 0.5), 6) AS p50_quantity,
             round(quantile_cont(l_quantity, 0.9), 6) AS p90_quantity
      FROM lineitem
      GROUP BY l_suppkey)
    SELECT l_suppkey, avg_quantity, min_quantity, max_quantity, std_quantity,
           p50_quantity, p90_quantity,
           round(CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
                 (n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) END, 6)
             AS corr_qty_price
    FROM m
    ORDER BY l_suppkey
    """,
)
def q_measure_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution statistics per supplier (C9: calc_depth, extended
    with exact percentiles and Pearson correlation).

    - moments: stddev from exact integral sums (closed form) so both
      engines run the identical IEEE sequence — their native streaming
      stddev_samp implementations differ in merge order.
    - correlation: five decimal-exact sums + closed form (built-in
      corr() is a streaming co-moment with engine-specific merges).
    - percentiles: RANK-BASED two-pass interpolation
      (operators/stats.py::exact_percentiles) — Spark's ``percentile``
      aggregate buffers every group value in one buffer, an executor
      OOM at 100 TB group sizes; the window+straddling-rows form sorts,
      spills gracefully, and parallelizes across keys.

    r9 plan shave (same values, PLAN_LOCK regenerated intentionally):
    the rank and count windows share ONE ordered window spec (the
    count takes an unbounded frame over the same ordering), so the
    plan carries a single Window node; and the five exact sums use
    the long-split form (functions/determinism.py::split_sum_exprs)
    — integer/fraction long sums on the codegen hash path instead of
    BigDecimal-buffered decimal aggregation (measured ~6x on the
    isolated sums) — recombined exactly per group.  The split columns
    project AFTER the window so they never ride the shuffle.
    """
    from pyspark.sql import Window

    from v6spark.functions.determinism import (
        split_cols,
        split_sum_exprs,
        split_sum_rejoin,
    )

    li = load_table(spark, sf_dir, "lineitem")
    # ONE shuffle, ONE window node: rank + group count share the
    # (l_suppkey, l_quantity) ordering, and the subsequent
    # groupBy(l_suppkey) reuses the partitioning — moments, corr
    # sums, and percentile straddles all aggregate in the same
    # post-window pass (no second scan, no join).
    w = Window.partitionBy("l_suppkey").orderBy("l_quantity")
    wn = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    ranked = li.select(
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    ).select(  # split AFTER the window: never rides the shuffle/sort
        "*",
        *split_cols(q, "x"),
        *split_cols(p, "y"),
        *split_cols(q * q, "xx"),
        *split_cols(p * p, "yy"),
        *split_cols(q * p, "xy"),
    )
    n = F.count(q).cast("double")
    s, ss = F.sum(q), F.sum(q * q)
    variance = (ss - s * s / n) / (n - F.lit(1.0))
    agged = ranked.groupBy("l_suppkey").agg(
        F.round(F.avg(q), 6).alias("avg_quantity"),
        F.min(q).alias("min_quantity"),
        F.max(q).alias("max_quantity"),
        F.round(F.sqrt(variance), 6).alias("std_quantity"),
        *stats.percentile_agg_exprs(
            [("p50_quantity", 0.5), ("p90_quantity", 0.9)],
            value="l_quantity",
        ),
        F.count(F.lit(1)).cast("double").alias("n"),
        *split_sum_exprs("x"),
        *split_sum_exprs("y"),
        *split_sum_exprs("xx"),
        *split_sum_exprs("yy"),
        *split_sum_exprs("xy"),
    ).withColumns({
        "sx": split_sum_rejoin("x"),
        "sy": split_sum_rejoin("y"),
        "sxx": split_sum_rejoin("xx"),
        "syy": split_sum_rejoin("yy"),
        "sxy": split_sum_rejoin("xy"),
    })
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (var_x > 0) & (var_y > 0),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.sqrt(var_x) * F.sqrt(var_y)),
    )
    return agged.select(
        "l_suppkey",
        "avg_quantity",
        "min_quantity",
        "max_quantity",
        "std_quantity",
        "p50_quantity",
        "p90_quantity",
        F.round(corr, 6).alias("corr_qty_price"),
    ).orderBy("l_suppkey")


@register(
    "q_histogram",
    TIER,
    """
    SELECT CAST(floor((l_extendedprice - 0.0) / 10000.0) AS BIGINT) AS bucket,
           count(*) AS n
    FROM lineitem
    WHERE l_extendedprice >= 0.0 AND l_extendedprice < 100000.0
    GROUP BY 1
    ORDER BY bucket
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-range 10-bin histogram (C10: stats::histogram)."""
    li = load_table(spark, sf_dir, "lineitem")
    return stats.histogram(li, "l_extendedprice", 0.0, 100000.0, 10).orderBy(
        "bucket"
    )


@register(
    "q_mask_low_meas",
    TIER,
    f"""
    SELECT event_type,
           count(*) AS n,
           count(v) AS n_present,
           count(*) - count(v) AS n_null,
           {o_dsum('v')} AS sum_value,
           round(CAST(sum(CAST(coalesce(v, 0.0) AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS sum_coalesced,
           count(nullif(event_type, 'error')) AS n_nullif
    FROM (SELECT event_type,
                 CASE WHEN value < 0.1 THEN NULL ELSE value END AS v
          FROM events)
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_mask_low_meas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low-evidence masking + the NULL-handling scalar family (B4/B5:
    min_depth/qual_gt_to_missing; coalesce / nullif / null counting).

    Values below threshold become NULL (the reference's -1 sentinel
    normalized away); aggregates then skip them natively.  The
    coalesce/nullif columns are the functions downstream code uses on
    sentinel-normalized data (SURVEY.md §1.1).
    """
    ev = load_table(spark, sf_dir, "events")
    masked = transforms.mask_low(ev, "value", 0.1, out="v")
    return (
        masked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("v").alias("n_present"),
            (F.count(F.lit(1)) - F.count("v")).alias("n_null"),
            dsum("v").alias("sum_value"),
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
    "q_recode_012",
    TIER,
    """
    SELECT CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 WHEN 'R' THEN 2 END AS code,
           count(*) AS n,
           round(avg(l_quantity), 6) AS avg_qty
    FROM lineitem
    GROUP BY 1
    ORDER BY code
    """,
)
def q_recode_012(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical recode to dosage codes (B6: gts_as_mat012)."""
    li = load_table(spark, sf_dir, "lineitem")
    coded = transforms.recode(li, "l_returnflag", {"A": 0, "N": 1, "R": 2}, "code")
    return (
        coded.groupBy("code")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        )
        .orderBy("code")
    )


@register(
    "q_sample_subset",
    TIER,
    """
    SELECT user_id, count(*) AS n
    FROM events
    WHERE user_id IN (3, 7, 11, 19, 23, 42, 57, 88, 101, 133)
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_sample_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample subsetting (B3: filter_samples) as an IN-list pushdown."""
    ev = load_table(spark, sf_dir, "events")
    kept = transforms.subset_entities(
        ev, "user_id", [3, 7, 11, 19, 23, 42, 57, 88, 101, 133]
    )
    return stats.category_counts(kept, ["user_id"]).orderBy("user_id")


@register(
    "q_filter_accounting",
    TIER,
    """
    SELECT CAST(count_if(l_quantity >= 25) AS BIGINT) AS n_kept,
           CAST(count(*) - count_if(l_quantity >= 25) AS BIGINT) AS n_filtered_out
    FROM lineitem
    """,
)
def q_filter_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept/filtered-out accounting (D9 + E1: the FilterResult contract)."""
    li = load_table(spark, sf_dir, "lineitem")
    return accounting_df(li, F.col("l_quantity") >= 25)
