"""M1 tier — scan / project / filter / single-shuffle aggregates.

Declared queries (SURVEY.md §2.3) covering reference ops A1/B1 (scan +
projection), D6/D9 (predicate filters + accounting), C1/C9/C10/C11
(rates, moments, histogram), B3-B6 (subset, masking, recode).
Every plan here is scan -> narrow ops -> at most one hash-agg shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from v6spark.functions.determinism import davg, dsum, o_davg, o_dsum
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
    FROM orders
    WHERE o_totalprice >= 100000
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-threshold filter (D6: filter_by_snp_qual analog)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        stats.category_counts(
            orders.filter(F.col("o_totalprice") >= 100000), ["o_orderstatus"]
        )
        .orderBy("o_orderstatus")
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
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_category_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allele-count-matrix analog (C2: count_alleles) in long form."""
    li = load_table(spark, sf_dir, "lineitem")
    return stats.category_counts(li, ["l_returnflag", "l_linestatus"]).orderBy(
        "l_returnflag", "l_linestatus"
    )


@register(
    "q_measure_stats",
    TIER,
    """
    SELECT l_suppkey,
           round(avg(l_quantity), 6) AS avg_quantity,
           min(l_quantity) AS min_quantity,
           max(l_quantity) AS max_quantity,
           round(sqrt((sum(l_quantity * l_quantity)
                       - sum(l_quantity) * sum(l_quantity) / CAST(count(l_quantity) AS DOUBLE))
                      / (CAST(count(l_quantity) AS DOUBLE) - 1.0)), 6) AS std_quantity
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """,
)
def q_measure_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-distribution moments (C9: calc_depth).

    stddev uses the closed form over exact integral sums so Spark and
    DuckDB execute the identical IEEE sequence (their native streaming
    stddev_samp implementations differ in merge order).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return stats.measure_stats(li, ["l_suppkey"], "l_quantity").orderBy(
        "l_suppkey"
    )


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
           count(v) AS n_present,
           {o_dsum('v')} AS sum_value
    FROM (SELECT event_type,
                 CASE WHEN value < 0.1 THEN NULL ELSE value END AS v
          FROM events)
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_mask_low_meas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low-evidence masking (B4/B5: min_depth/qual_gt_to_missing).

    Values below threshold become NULL (the reference's -1 sentinel
    normalized away); aggregates then skip them natively.
    """
    ev = load_table(spark, sf_dir, "events")
    masked = transforms.mask_low(ev, "value", 0.1, out="v")
    return (
        masked.groupBy("event_type")
        .agg(F.count("v").alias("n_present"), dsum("v").alias("sum_value"))
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
