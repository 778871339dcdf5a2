"""M1 tier — scan / project / filter / single-shuffle aggregates.

Declared queries (SURVEY.md §2.3) covering reference ops A1/B1 (scan +
projection), D6/D9 (predicate filters + accounting), C1/C9/C10/C11
(rates, moments, histogram), B3-B6 (subset, masking, recode).
Every plan here is scan -> narrow ops -> at most one hash-agg shuffle.

r12 (optimization round): trailing presentation ``ORDER BY``s removed
from every Spark-side plan in this package (guide §2.4 — "an orderBy
used only to make output deterministic" is an accidental shuffle).
The driver's comparison is order-INSENSITIVE (rows+schema+multiset
hash; tests/oracle_harness.py mirrors it), so the computed result is
unchanged; the oracle SQL keeps its ORDER BY (DuckDB side, untimed).
Sorts that feed a LIMIT (top-k) are semantic and stay.

r12 (optimization round, session 2): the remaining Column-API builds
restated as ONE ``spark.sql`` string each over ``ensure_view`` views
(guide §1.2/§7.3 — every Column node is a py4j round trip and every
chained Dataset op re-analyzes its whole subtree; one SQL statement
is one parse + one analysis).  Each restatement is the textual twin
of the old Column pipeline — same expressions, same aggregate
structure, s_dsum/s_davg twins for the deterministic sums — and the
operator functions (stats.rate_of, transforms.mask_low, ...) remain
the library API for general frames.  All 50 queries re-verified
green against the DuckDB oracle at sf0.001 and sf0.01 after the
conversion; PLAN_LOCK unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from v6spark.functions.determinism import o_davg, o_dsum, o_split_sum
from v6spark.plans.registry import register
from v6spark.sources.tables import ensure_view, load_table

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
    )


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
    from v6spark.functions.determinism import s_dsum

    vl = ensure_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT COUNT(1) AS n,
               {s_dsum('l_quantity')} AS sum_qty,
               {s_dsum('l_extendedprice')} AS sum_price
        FROM {vl}
        WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.08
        """)


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
    vo = ensure_view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, count(*) AS n
        FROM {vo} o
        WHERE o_totalprice >= 100000
          AND o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                                     / count(*)
                              FROM {vo}
                              WHERE o_orderpriority = o.o_orderpriority)
        GROUP BY o_orderstatus
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
    ve = ensure_view(spark, sf_dir, "events")
    return spark.sql(f"""
        SELECT event_type,
               round(avg(CASE WHEN value < 0.1 THEN 1.0D ELSE 0.0D END), 6)
                 AS miss_rate
        FROM {ve} GROUP BY event_type
        """)


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
    from v6spark.functions.determinism import s_davg

    ve = ensure_view(spark, sf_dir, "events")
    return spark.sql(f"""
        SELECT user_id, COUNT(1) AS n_events,
               {s_davg('value')} AS avg_value
        FROM {ve} GROUP BY user_id
        """)


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
    vl = ensure_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT l_returnflag,
               coalesce(F, 0) AS n_f,
               coalesce(O, 0) AS n_o,
               coalesce(F, 0) + coalesce(O, 0) AS n_total
        FROM (SELECT l_returnflag, l_linestatus FROM {vl})
        PIVOT (count(1) FOR l_linestatus IN ('F' AS F, 'O' AS O))
        """)


@register(
    "q_measure_stats",
    TIER,
    f"""
    WITH m AS (
      SELECT l_suppkey,
             min(l_quantity) AS min_quantity,
             max(l_quantity) AS max_quantity,
             CAST(count(*) AS DOUBLE) AS n,
             {o_split_sum('l_quantity')} AS sx,
             {o_split_sum('l_extendedprice')} AS sy,
             {o_split_sum('l_quantity * l_quantity')} AS sxx,
             {o_split_sum('l_extendedprice * l_extendedprice')} AS syy,
             {o_split_sum('l_quantity * l_extendedprice')} AS sxy,
             round(quantile_cont(l_quantity, 0.5), 6) AS p50_quantity,
             round(quantile_cont(l_quantity, 0.9), 6) AS p90_quantity
      FROM lineitem
      GROUP BY l_suppkey)
    SELECT l_suppkey, round(sx / n, 6) AS avg_quantity,
           min_quantity, max_quantity,
           round(sqrt((sxx - sx * sx / n) / (n - 1.0)), 6) AS std_quantity,
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
    - percentiles: VALUE-HISTOGRAM interpolation
      (operators/stats.py::percentile_hist_agg_exprs) — Spark's
      ``percentile`` aggregate buffers every group value in one
      buffer, an executor OOM at 100 TB group sizes.  The r9 plan
      ranked every row through one window sort; r10 exploits the
      value domain instead: a map-side-combined
      ``groupBy(l_suppkey, l_quantity)`` collapses the fact table to
      a per-key value histogram (600k rows → ≤50k histogram rows at
      sf0.1; at 100 TB, the difference between shuffling the fact
      table and shuffling a digest), the running-count window sorts
      only the histogram, and the percentile ranks interpolate from
      the first histogram row whose cumulative count reaches them —
      value-identical to quantile_cont.

    The five exact correlation sums use the long-split form
    (functions/determinism.py::split_cols semantics, inlined in SQL):
    a pure-IEEE floor/frac quantization per row (no BigDecimal
    allocation — the old decimal-cast protocol cost ~2 s/iteration on
    this query's single-row-group scan), long sums per (suppkey,
    quantity), long re-sums per suppkey — associative, so the staged
    value is identical to the oracle's single-stage o_split_sum twin,
    which executes the same IEEE sequence in DuckDB.  avg/std
    re-derive from those sums on BOTH sides (same formula, same
    inputs, same single division/sqrt — deterministic).

    The pipeline is ONE spark.sql statement rather than Column
    composition: the DataFrame-API form made ~2600 py4j round trips
    per build (~550 ms of wall per bench iteration); a single SQL
    parse is one round trip for the identical logical plan.
    """
    # NaN/Inf -> NULL mirrors o_split_sum's guard (DuckDB would
    # refuse CAST(floor(NaN) AS BIGINT); Spark would produce a
    # garbage long) — for finite doubles the CASE is the identity
    safe = (
        "(CASE WHEN isnan({v}) OR abs({v}) = CAST('Infinity' AS DOUBLE)"
        " THEN NULL ELSE {v} END)"
    )
    split = (
        "FLOOR({v}) AS h{t}, "
        "FLOOR(({v} - CAST(FLOOR({v}) AS DOUBLE)) * 1000000.0 + 0.5)"
        " AS f{t}"
    )
    rejoin = (
        "CAST(SUM(h{t}) AS DOUBLE)"
        " + CAST(SUM(f{t}) AS DOUBLE) / 1000000.0 AS s{t}"
    )
    pctl = (
        "MIN(CASE WHEN c_run >= FLOOR(1.0 + CAST(c_all - 1 AS DOUBLE)"
        " * {q}) THEN l_quantity END) AS p{t}_lo, "
        "MIN(CASE WHEN c_run >= CEIL(1.0 + CAST(c_all - 1 AS DOUBLE)"
        " * {q}) THEN l_quantity END) AS p{t}_hi, "
        "MAX(1.0 + CAST(c_all - 1 AS DOUBLE) * {q}"
        " - FLOOR(1.0 + CAST(c_all - 1 AS DOUBLE) * {q})) AS p{t}_fr"
    )
    splits = ", ".join(
        split.format(v=safe.format(v=f"({v})"), t=t)
        for v, t in (
            ("l_quantity", "x"),
            ("l_extendedprice", "y"),
            ("l_quantity * l_quantity", "xx"),
            ("l_extendedprice * l_extendedprice", "yy"),
            ("l_quantity * l_extendedprice", "xy"),
        )
    )
    sums = ", ".join(f"SUM({c}) AS {c}" for c in (
        "hx", "fx", "hy", "fy", "hxx", "fxx", "hyy", "fyy", "hxy", "fxy"
    ))
    rejoins = ", ".join(
        rejoin.format(t=t) for t in ("x", "y", "xx", "yy", "xy")
    )
    vl = ensure_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
    WITH pre AS (
      SELECT l_suppkey, l_quantity, {splits}
      FROM {vl}
    ), hist AS (
      -- map-side-combined partial aggregation to a per-key value
      -- histogram: only (suppkey, quantity, partial sums) shuffle
      SELECT l_suppkey, l_quantity, COUNT(1) AS cnt, {sums}
      FROM pre GROUP BY l_suppkey, l_quantity
    ), cum AS (
      -- ONE window node over the HISTOGRAM (running count + group
      -- total share the ordering); the final GROUP BY reuses the
      -- window's hash partitioning — no third shuffle
      SELECT *, SUM(cnt) OVER w_run AS c_run, SUM(cnt) OVER w_all AS c_all
      FROM hist
      WINDOW
        w_run AS (PARTITION BY l_suppkey ORDER BY l_quantity
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_all AS (PARTITION BY l_suppkey ORDER BY l_quantity
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ), agged AS (
      SELECT l_suppkey,
        MIN(l_quantity) AS min_quantity, MAX(l_quantity) AS max_quantity,
        {pctl.format(q="0.5", t="50")}, {pctl.format(q="0.9", t="90")},
        CAST(SUM(cnt) AS DOUBLE) AS n, {rejoins}
      FROM cum GROUP BY l_suppkey
    )
    SELECT l_suppkey,
      ROUND(sx / n, 6) AS avg_quantity, min_quantity, max_quantity,
      ROUND(SQRT((sxx - sx * sx / n) / (n - 1.0)), 6) AS std_quantity,
      ROUND(p50_lo + p50_fr * (p50_hi - p50_lo), 6) AS p50_quantity,
      ROUND(p90_lo + p90_fr * (p90_hi - p90_lo), 6) AS p90_quantity,
      ROUND(CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN (n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))
            END, 6) AS corr_qty_price
    FROM agged
    """)


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
    vl = ensure_view(spark, sf_dir, "lineitem")
    # bucket arithmetic is stats.histogram's textual twin (width =
    # (100000-0)/10 computed exactly in Python there; 10000.0D here)
    return spark.sql(f"""
        SELECT CAST(floor((l_extendedprice - 0.0D) / 10000.0D) AS BIGINT)
                 AS bucket,
               COUNT(1) AS n
        FROM {vl}
        WHERE l_extendedprice >= 0.0D AND l_extendedprice < 100000.0D
        GROUP BY 1
        """)


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
    from v6spark.functions.determinism import s_dsum

    ve = ensure_view(spark, sf_dir, "events")
    return spark.sql(f"""
        SELECT event_type,
               COUNT(1) AS n,
               COUNT(v) AS n_present,
               COUNT(1) - COUNT(v) AS n_null,
               {s_dsum('v')} AS sum_value,
               round(CAST(sum(CAST(coalesce(v, 0.0D) AS DECIMAL(18,6)))
                          AS DOUBLE), 6) AS sum_coalesced,
               COUNT(nullif(event_type, 'error')) AS n_nullif
        FROM (SELECT event_type,
                     CASE WHEN value < 0.1 THEN NULL ELSE value END AS v
              FROM {ve})
        GROUP BY event_type
        """)


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
    vl = ensure_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT code, COUNT(1) AS n, round(avg(l_quantity), 6) AS avg_qty
        FROM (SELECT CAST(CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1
                          WHEN 'R' THEN 2 END AS INT) AS code,
                     l_quantity
              FROM {vl})
        GROUP BY code
        """)


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
    ve = ensure_view(spark, sf_dir, "events")
    return spark.sql(f"""
        SELECT user_id, COUNT(1) AS n
        FROM {ve}
        WHERE user_id IN (3, 7, 11, 19, 23, 42, 57, 88, 101, 133)
        GROUP BY user_id
        """)


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
    vl = ensure_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT count_if(l_quantity >= 25) AS n_kept,
               COUNT(1) - count_if(l_quantity >= 25) AS n_filtered_out
        FROM {vl}
        """)
