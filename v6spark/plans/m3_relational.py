"""M3 tier — the general relational surface (SURVEY.md §2.2).

Joins (inner/multi/left/semi/anti/range/as-of), distinct and rollup
aggregation, ranking/analytic/frame windows, top-k, set ops, and the
scalar-function families (string/date/math/json).  The reference has
none of these beyond the D7 range-intersection; they are what makes
the engine a general query engine rather than a stats library.

r12: trailing presentation ORDER BYs removed — see m1_core docstring.
Top-k sorts (q_sort_topk's and any feeding a LIMIT) are semantic and
stay.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from v6spark.functions.determinism import (
    davg,
    dsum,
    o_davg,
    o_dsum,
    o_fsplit_parts,
    s_dsum,
)
from v6spark.operators.filters import label_disjoint_ranges
from v6spark.plans.registry import register
from v6spark.sources.tables import ensure_view, load_table

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

    r12: built as ONE spark.sql string (s_dsum = the dsum Column
    form's Spark-SQL twin, identical IEEE sequence) — the Column
    build's ~0.17 s of per-iteration py4j chatter drops to one parse
    call; logical plan unchanged.
    """
    vo = ensure_view(spark, sf_dir, "orders")
    vc = ensure_view(spark, sf_dir, "customer")
    return spark.sql(f"""
        SELECT c_mktsegment, COUNT(1) AS n,
               {s_dsum('o_totalprice')} AS sum_price
        FROM {vo} JOIN {vc} ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """)


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

    The fact side is PRE-AGGREGATED before it ever meets a join:
    revenue and line counts reduce to one row per l_orderkey first
    (map-side combine collapses the ~4 lines/order inside each
    partition), so the lineitem⋈orders join moves a 4x smaller,
    3-column relation — at 100 TB, where orders no longer broadcasts
    and that join becomes a shuffle, this is the difference between
    shuffling 6B fact rows and 1.5B pre-reduced rows.  The decimal
    partial sums re-sum exactly (decimal addition is associative), so
    the result is bit-identical to aggregating after the join.  The
    shrinking dimension chain customer -> nation -> region rides
    broadcast joins; nation and region are hinted explicitly — tiny at
    any scale factor, they must never shuffle the fact side.

    r12: built as ONE spark.sql string — the Column build (split_cols
    + two split_sum_exprs stages + 4 joins) was the suite's most
    expensive plan CONSTRUCTION at ~0.46 s of py4j chatter per bench
    iteration; the SQL states the identical floor-split arithmetic
    (revenue rides the joins as the long pair: partial long sums per
    order, long re-sums per region, one exact rejoin — associative,
    bit-identical to o_dsum's single-stage twin) and the identical
    join/hint structure, so the logical plan is unchanged.
    """
    from v6spark.functions.determinism import _s_safe

    vl = ensure_view(spark, sf_dir, "lineitem")
    vo = ensure_view(spark, sf_dir, "orders")
    vc = ensure_view(spark, sf_dir, "customer")
    vn = ensure_view(spark, sf_dir, "nation")
    vr = ensure_view(spark, sf_dir, "region")
    safe_rev = _s_safe(O_REVENUE)
    return spark.sql(f"""
        WITH pre AS (
          SELECT l_orderkey,
                 FLOOR(s) AS _hr,
                 FLOOR((s - CAST(FLOOR(s) AS DOUBLE)) * 1000000.0 + 0.5) AS _fr
          FROM (SELECT l_orderkey, ({safe_rev}) AS s FROM {vl})
        ), per_order AS (
          SELECT l_orderkey, COUNT(1) AS _n, SUM(_hr) AS _hr, SUM(_fr) AS _fr
          FROM pre GROUP BY l_orderkey
        )
        SELECT /*+ BROADCAST(na), BROADCAST(re) */ r_name,
               SUM(_n) AS n,
               ROUND(CAST(SUM(_hr) AS DOUBLE)
                     + CAST(SUM(_fr) AS DOUBLE) / 1000000.0, 6) AS revenue
        FROM per_order
        JOIN {vo} ON l_orderkey = o_orderkey
        JOIN {vc} ON o_custkey = c_custkey
        JOIN {vn} na ON c_nationkey = na.n_nationkey
        JOIN {vr} re ON na.n_regionkey = re.r_regionkey
        GROUP BY r_name
        """)


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
    """Left outer join — customers without orders still counted.

    r12: orders is pre-aggregated to per-customer counts BEFORE the
    join (guide §2.3 "aggregate before you shuffle" / §3 pre-reduce).
    The naive form broadcast the 1.5M-row fact side and ran the
    count(DISTINCT) Expand over every joined row; here the fact table
    collapses map-side to one (custkey, n) row per customer, the
    broadcast shrinks ~10x, and the distinct count becomes a plain
    count because c_custkey is the customer table's primary key (one
    row per key, so each key appears exactly once post-join).  At
    100 TB the naive plan must shuffle the whole fact table; this one
    shuffles only map-combined per-customer partial counts.  sum of
    per-customer counts == count of joined non-null o_orderkey
    (LEFT-join customers without orders contribute coalesce(NULL,0)).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("_n_ord")
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .groupBy("c_nationkey")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.sum(F.coalesce("_n_ord", F.lit(0))).alias("n_orders"),
        )
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
    """Anti join (NOT EXISTS) — parts never shipped.

    r12 (guide §2.3): the anti join only consumes the KEY SET of
    lineitem, so the fact side is reduced to distinct l_partkey before
    the join — the map-side partial distinct collapses the ~30
    lineitems per part inside each scan task, shrinking the broadcast
    (and, at 100 TB where this side exceeds any broadcast threshold,
    the shuffle) by the per-key multiplicity.  Anti-join semantics are
    invariant to right-side duplicates.  Interleaved A/B at sf0.1:
    0.258 -> 0.159 s median of 7.
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
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
    """Genomic-region range tagging (D7: filter_variations_in_regions).

    The ranges are DISJOINT plan-time literals, so no join operator is
    needed at all: ``label_disjoint_ranges`` compiles them to a CASE
    chain that evaluates per row inside whole-stage codegen — the fact
    side streams once with zero broadcast and zero per-row predicate
    re-evaluation (the BroadcastNestedLoopJoin form evaluated all 3
    range predicates per fact row and was 1.8x slower at sf0.1).
    ``filter_in_ranges`` (operators/filters.py) remains the general
    operator for overlapping or data-driven range tables.
    """
    li = load_table(spark, sf_dir, "lineitem")
    tagged = label_disjoint_ranges(
        li.withColumn("ship_date", F.to_date("l_shipdate")),
        [
            ("early", datetime.date(1995, 1, 1), datetime.date(1997, 6, 1)),
            ("mid", datetime.date(1997, 6, 1), datetime.date(1999, 6, 1)),
            ("late", datetime.date(1999, 6, 1), datetime.date(2002, 1, 1)),
        ],
        "ship_date",
    )
    return (
        tagged.groupBy("range_name")
        .agg(F.count(F.lit(1)).alias("n"), dsum(_revenue()).alias("revenue"))
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

    Uses the union+window trick (the operators/asof.py design) — one
    shuffle, linear cost.  The oracle states the same semantics as a
    correlated LIMIT-1 subquery.  Timestamps compare as exact int64
    microseconds on the Spark side (ts_us) — ALIGNED with the oracle:
    DuckDB truncates the ns parquet timestamps to µs at scan time, so
    comparing at ns precision would diverge on sub-µs near-ties.

    r12: the judged instance is stated as ONE spark.sql string — the
    identical tag/union/last-ignorenulls-window/filter pipeline
    ``asof_join_latest`` builds (which stays the library operator for
    general frames), minus ~0.36 s of per-iteration Column/py4j build
    cost.  The struct marker rides so last(_m, true) finds the latest
    QUOTE ROW even when the payload value itself is NULL, and the
    (ts, side, po) ordering keeps quotes before probes at equal
    timestamps with the largest payload-order winning ties — exactly
    asof_join_latest's contract.
    """
    ve = ensure_view(spark, sf_dir, "events")
    return spark.sql(f"""
        WITH u AS (
          SELECT event_id AS p_event_id, user_id, ts_us, 1 AS _side,
                 CAST(NULL AS STRUCT<p: BIGINT, po: BIGINT>) AS _m
          FROM {ve} WHERE event_type = 'purchase'
          UNION ALL
          SELECT CAST(NULL AS BIGINT) AS p_event_id, user_id, ts_us, 0 AS _side,
                 named_struct('p', event_id, 'po', event_id) AS _m
          FROM {ve} WHERE event_type = 'click'
        ), m AS (
          SELECT p_event_id, user_id, _side,
                 (last(_m, true) OVER (
                   PARTITION BY user_id
                   ORDER BY ts_us ASC, _side ASC, _m.po ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 )).p AS asof_click_id
          FROM u
        )
        SELECT p_event_id, user_id, asof_click_id FROM m WHERE _side = 1
        """)


@register(
    "q_agg_distinct",
    TIER,
    """
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_cust,
           count(DISTINCT o_orderstatus) AS n_statuses,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           (max({'p': o_totalprice, 'ck': o_custkey})).ck AS top_cust,
           round(max(o_totalprice), 6) AS max_price
    FROM orders GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Advanced aggregates: distinct counting, sorted collect_set, and
    arg-max in one hash-agg pass.

    - collect_set order is nondeterministic in any engine: the set is
      SORTED then emitted as a joined STRING (array-typed outputs break
      the driver's pandas canonicalization).
    - arg-max via max over a (value, key) struct — lexicographic
      struct comparison IS the total-order tie-break; a bare max_by
      would pick arbitrarily whenever a price tie lands on the extreme.
    """
    orders = load_table(spark, sf_dir, "orders")
    pair = F.struct(
        F.col("o_totalprice").alias("p"), F.col("o_custkey").alias("ck")
    )
    # Two-level distinct for the HIGH-CARDINALITY key: counting
    # distinct customers as groupBy(priority, custkey) -> count keeps
    # the shuffle rows (priority, custkey) pairs, whereas putting two
    # countDistincts in one agg makes Catalyst Expand every input row
    # once per distinct aggregate and object-hash the multiplied set —
    # measured 2.8x slower at sf0.1.  The low-cardinality distinct
    # (order status, 3 values) stays in the plain agg; the final join
    # is post-aggregation (one row per priority).
    n_cust = (
        orders.groupBy("o_orderpriority", "o_custkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    rest = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.array_join(
            F.sort_array(F.collect_set("o_orderstatus")), ","
        ).alias("statuses"),
        F.max(pair)["ck"].alias("top_cust"),
        F.round(F.max("o_totalprice"), 6).alias("max_price"),
    )
    return (
        n_cust.join(rest, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_cust",
            "n_statuses",
            "statuses",
            "top_cust",
            "max_price",
        )
    )


@register(
    "q_agg_rollup",
    TIER,
    """
    SELECT n_name, c_mktsegment, count(*) AS n,
           CAST(grouping(n_name) AS INT) AS g_nation,
           CAST(grouping(c_mktsegment) AS INT) AS g_segment
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment), ())
    ORDER BY g_nation, g_segment, n_name, c_mktsegment
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation via explicit GROUPING SETS, with
    grouping() flags disambiguating the NULL markers.

    The set list is the full lattice over (nation, segment): it
    contains ROLLUP(n_name, c_mktsegment)'s chain AND the
    (c_mktsegment) set — i.e. CUBE — stated through the general
    GROUPING SETS surface.  All sets evaluate in ONE pass: a single
    Expand node + one shuffle, not one scan per set.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).createOrReplaceTempView("v_cust_nation_gs")
    return spark.sql(
        """
        SELECT n_name, c_mktsegment, count(*) AS n,
               CAST(grouping(n_name) AS INT) AS g_nation,
               CAST(grouping(c_mktsegment) AS INT) AS g_segment
        FROM v_cust_nation_gs
        GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment), ())
        """
    )


@register(
    "q_window_rank",
    TIER,
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn, quartile, pct_rank, cume FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER w AS INT) AS rn,
             CAST(ntile(4) OVER w AS INT) AS quartile,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey))
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + distribution windows in one pass: top-3 orders per
    customer with quartile / percent_rank / cume_dist.

    All four functions share ONE window spec (one shuffle + sort);
    the distribution values are exact rational arithmetic over the
    row's position, deterministic given the total order (price desc,
    key asc tie-break).
    """
    vo = ensure_view(spark, sf_dir, "orders")
    # r12: ONE spark.sql build (the Column form cost ~0.055 s of py4j
    # chatter per bench iteration); same window spec, same functions,
    # identical logical plan.
    return spark.sql(f"""
        SELECT o_custkey, o_orderkey, o_totalprice,
               rn, quartile, pct_rank, cume
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER w AS rn,
                 CAST(ntile(4) OVER w AS INT) AS quartile,
                 round(percent_rank() OVER w, 6) AS pct_rank,
                 round(cume_dist() OVER w, 6) AS cume
          FROM {vo}
          WINDOW w AS (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC))
        WHERE rn <= 3
        """)


_WR_H, _WR_F = o_fsplit_parts("value")


@register(
    "q_window_running",
    TIER,
    """
    SELECT user_id, event_id,
           round(CAST(sum({h}) OVER w_run AS DOUBLE)
                 + CAST(sum({f}) OVER w_run AS DOUBLE) / 1000000.0,
                 6) AS running_value,
           round((CAST(sum({h}) OVER w_rng AS DOUBLE)
                  + CAST(sum({f}) OVER w_rng AS DOUBLE) / 1000000.0)
                 / CAST(count(*) OVER w_rng AS DOUBLE), 6) AS moving_avg
    FROM events
    WINDOW
      w_run AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_rng AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """.format(h=_WR_H, f=_WR_F),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame windows: running sum (ROWS unbounded-preceding) and a
    1-hour trailing mean (RANGE value frame) in one query.

    Floor-split long accumulators (functions/determinism.py) keep the
    sums exact and independent of each engine's frame-evaluation
    strategy (DuckDB uses segment trees, Spark a running accumulator;
    long addition/removal is exact either way) — with zero per-row
    BigDecimal, unlike the r9 decimal accumulators.  The moving
    average's frame is a VALUE range over exact epoch microseconds —
    rows with sparse timestamps see only their true trailing hour —
    with explicit sum/count so the mean is bit-identical across
    engines.  Both windows share the user_id partitioning: one
    shuffle, two sorts.
    """
    from v6spark.functions.determinism import _s_safe

    ve = ensure_view(spark, sf_dir, "events")
    # r12: ONE spark.sql build; the floor-split quantization is the
    # _s_safe/fsplit twin stated inline (same IEEE sequence), windows
    # share the user_id partitioning exactly as the Column form did.
    s = f"({_s_safe('value')})"
    return spark.sql(f"""
        WITH p AS (
          SELECT user_id, event_id, ts_us,
                 FLOOR({s}) AS _h,
                 FLOOR(({s} - CAST(FLOOR({s}) AS DOUBLE)) * 1000000.0
                       + 0.5) AS _f
          FROM {ve})
        SELECT user_id, event_id,
               round(CAST(sum(_h) OVER w_run AS DOUBLE)
                     + CAST(sum(_f) OVER w_run AS DOUBLE) / 1000000.0,
                     6) AS running_value,
               round((CAST(sum(_h) OVER w_rng AS DOUBLE)
                      + CAST(sum(_f) OVER w_rng AS DOUBLE) / 1000000.0)
                     / CAST(count(1) OVER w_rng AS DOUBLE), 6) AS moving_avg
        FROM p
        WINDOW
          w_run AS (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_rng AS (PARTITION BY user_id ORDER BY ts_us
                    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        """)


@register(
    "q_window_lag",
    TIER,
    """
    SELECT user_id, event_id,
           round(value - lag(value) OVER w, 6) AS delta,
           round(lead(value) OVER w - value, 6) AS next_delta,
           round(first_value(value) OVER w, 6) AS first_val,
           round(last_value(value) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING), 6) AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window family: lag / lead / first_value / last_value.

    Per-user deltas are NULL on each partition edge.  last_value needs
    the unbounded-following frame (the default frame ends at CURRENT
    ROW, which would just echo each row) — the classic window-frame
    gotcha, stated identically in both engines.  One shared partition
    ordering: one shuffle + sort.
    """
    ve = ensure_view(spark, sf_dir, "events")
    # r12: ONE spark.sql build; same shared window ordering (one
    # shuffle + sort), same default frame for first/last semantics.
    return spark.sql(f"""
        SELECT user_id, event_id,
               round(value - (lag(value) OVER w), 6) AS delta,
               round((lead(value) OVER w) - value, 6) AS next_delta,
               round(first(value) OVER w, 6) AS first_val,
               round(last(value) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND UNBOUNDED FOLLOWING),
                     6) AS last_val
        FROM {ve}
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        """)


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
    SELECT 'except' AS op, custkey, CAST(1 AS BIGINT) AS n FROM (
      SELECT DISTINCT o_custkey AS custkey FROM orders
      EXCEPT
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0)
    UNION ALL
    SELECT 'intersect' AS op, custkey, CAST(1 AS BIGINT) AS n FROM (
      SELECT DISTINCT o_custkey AS custkey FROM orders
      INTERSECT
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0)
    UNION ALL
    SELECT 'intersect_all' AS op, custkey, count(*) AS n FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice >= 100000)
    GROUP BY custkey
    ORDER BY op, custkey
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: EXCEPT / INTERSECT (distinct semantics) plus
    INTERSECT ALL (bag semantics — per-key multiplicity
    min(left, right), which the DISTINCT forms don't exercise).
    ``n`` carries the multiplicity; 1 by construction for the
    distinct branches.

    r12 (guide §2.3/§2.4): the literal set-operator form scanned
    orders FOUR times (once per distinct branch, twice for INTERSECT
    ALL) and customer twice.  All three branches are functions of ONE
    per-custkey aggregate of orders — f = multiplicity under
    o_orderstatus='F', b = multiplicity under o_totalprice>=100000 —
    left-joined to the (primary-key-unique) negative-balance customer
    keys: EXCEPT = unmatched keys, INTERSECT = matched keys, and
    INTERSECT ALL's count(*) per key is exactly least(f, b) on keys
    where both are positive.  The shared aggregate subtree is planned
    once (ReusedExchange across the union branches); orders and
    customer are each scanned once.  Key equality is the plain
    equi-join: o_custkey/c_custkey are non-null key columns, so the
    set operators' null-safe equality never diverges on this schema.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
        ).alias("_f"),
        F.sum(
            F.when(F.col("o_totalprice") >= 100000, 1).otherwise(0)
        ).alias("_b"),
    )
    negative = cust.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("custkey"), F.lit(1).alias("_m")
    )
    # no broadcast hint: at bench scale the planner broadcasts the
    # filtered customer side on its own; at 100 TB that side is ~half
    # the customer table and must be allowed to fall back to a
    # shuffle join rather than die on a forced broadcast
    marked = per.join(negative, "custkey", "left")
    # Both output row families come out of ONE Generate over the
    # joined row (a union of two projections of `marked` would plan
    # the whole orders-aggregate subtree TWICE — column pruning makes
    # the branch subtrees non-identical, so exchange reuse cannot
    # deduplicate them; measured 2x the scans).
    distinct_row = F.struct(
        F.when(F.col("_m").isNull(), F.lit("except"))
        .otherwise(F.lit("intersect"))
        .alias("op"),
        F.col("custkey"),
        F.lit(1).cast("long").alias("n"),
    )
    inter_all_row = F.when(
        (F.col("_f") > 0) & (F.col("_b") > 0),
        F.struct(
            F.lit("intersect_all").alias("op"),
            F.col("custkey"),
            F.least("_f", "_b").alias("n"),
        ),
    )
    return (
        marked.select(
            F.explode(F.array(distinct_row, inter_all_row)).alias("_r")
        )
        .filter(F.col("_r").isNotNull())
        .select("_r.op", "_r.custkey", "_r.n")
    )


@register(
    "q_string_funcs",
    TIER,
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_uc,
           substring(p_name, 1, 8) AS name_pfx,
           CAST(length(p_name) AS INT) AS name_len,
           p_brand || '#' || p_type AS brand_type,
           CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS INT) AS n_vowel_runs,
           regexp_extract(p_name, '([a-z]{5,})', 1) AS first_long_token,
           CAST(length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS INT) AS len_novowels
    FROM part
    WHERE p_type LIKE 'S%'
    ORDER BY p_partkey
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar family: upper/substring/length/concat/LIKE plus
    the regex trio (count / extract / global replace).

    DuckDB's regexp_replace is single-occurrence by default ('g' flag
    required) while Spark's is always global — the oracle states the
    flag explicitly (cross-engine gotcha).
    """
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
            F.regexp_count("p_name", F.lit("[aeiou]+")).cast("int").alias(
                "n_vowel_runs"
            ),
            F.regexp_extract("p_name", "([a-z]{5,})", 1).alias(
                "first_long_token"
            ),
            F.length(F.regexp_replace("p_name", "[aeiou]", "")).cast("int").alias(
                "len_novowels"
            ),
        )
    )


@register(
    "q_date_funcs",
    TIER,
    f"""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
             CAST(extract(year FROM o_orderdate) AS INT) AS order_year,
             CAST(count(*) AS DOUBLE) AS n,
             {o_dsum('o_totalprice')} AS sum_price
      FROM orders
      GROUP BY 1, 2)
    SELECT order_month, order_year, 'n' AS metric, n AS val FROM m
    UNION ALL
    SELECT order_month, order_year, 'sum_price' AS metric, sum_price AS val FROM m
    ORDER BY order_month, metric
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar functions (date_trunc / extract, emitted as
    DATE/INT) with the aggregated metrics UNPIVOTed to long format.

    ``DataFrame.unpivot`` generates the (metric, val) rows in one pass
    (a single Expand node over the post-agg relation) — no N-way
    self-union re-scan; the oracle states the same relation as a
    UNION ALL over the aggregated CTE.
    """
    orders = load_table(spark, sf_dir, "orders")
    agged = (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )
    return agged.unpivot(
        ["order_month", "order_year"], ["n", "sum_price"], "metric", "val"
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

    sqrt and abs are IEEE-exact so they go through the order-exact
    mean; ln is only faithfully rounded (engine libms may differ in the
    last ULP) so it uses a plain double mean where per-row ULP noise
    averages out far below the 1e-6 rounding grain.

    No spread/repartition: the r9 version pre-shuffled the scan to
    parallelize per-row BigDecimal casts; the r10 floor-split davg is
    plain IEEE doubles, cheaper than the shuffle it needed (measured
    1.40 s -> 0.47 s warm at sf0.1 with the spread dropped).
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
    )
