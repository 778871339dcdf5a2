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

from pyspark.sql import DataFrame, SparkSession

from v6spark.functions.determinism import (
    o_davg,
    o_dsum,
    o_fsplit_parts,
    s_dsum,
)
from v6spark.plans.registry import register
from v6spark.sources.tables import ensure_view

TIER = "m3_relational"

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
    vc = ensure_view(spark, sf_dir, "customer")
    vo = ensure_view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT c_nationkey,
               COUNT(c_custkey) AS n_customers,
               sum(coalesce(_n_ord, 0)) AS n_orders
        FROM {vc}
        LEFT JOIN (SELECT o_custkey, COUNT(o_orderkey) AS _n_ord
                   FROM {vo} GROUP BY o_custkey)
          ON c_custkey = o_custkey
        GROUP BY c_nationkey
        """)


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
    vc = ensure_view(spark, sf_dir, "customer")
    vo = ensure_view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT c_custkey, c_name
        FROM {vc}
        LEFT SEMI JOIN (SELECT o_custkey FROM {vo}
                        WHERE o_orderstatus = 'F')
          ON c_custkey = o_custkey
        """)


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
    vp = ensure_view(spark, sf_dir, "part")
    vl = ensure_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT p_partkey, p_name
        FROM {vp}
        LEFT ANTI JOIN (SELECT DISTINCT l_partkey FROM {vl})
          ON p_partkey = l_partkey
        """)


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
    operator for overlapping or data-driven range tables (the judged
    instance is its ``label_disjoint_ranges`` CASE chain stated as one
    SQL string — same chain order, same [lo, hi) bounds, same
    NULL-tag drop).
    """
    vl = ensure_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT range_name, COUNT(1) AS n,
               {s_dsum("l_extendedprice * (1.0D - l_discount)")} AS revenue
        FROM (SELECT CASE
                WHEN ship_date >= DATE '1995-01-01'
                     AND ship_date < DATE '1997-06-01' THEN 'early'
                WHEN ship_date >= DATE '1997-06-01'
                     AND ship_date < DATE '1999-06-01' THEN 'mid'
                WHEN ship_date >= DATE '1999-06-01'
                     AND ship_date < DATE '2002-01-01' THEN 'late'
                END AS range_name,
                l_extendedprice, l_discount
              FROM (SELECT to_date(l_shipdate) AS ship_date,
                           l_extendedprice, l_discount FROM {vl}))
        WHERE range_name IS NOT NULL
        GROUP BY range_name
        """)


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
    # Two-level distinct for the HIGH-CARDINALITY key: counting
    # distinct customers as groupBy(priority, custkey) -> count keeps
    # the shuffle rows (priority, custkey) pairs, whereas putting two
    # countDistincts in one agg makes Catalyst Expand every input row
    # once per distinct aggregate and object-hash the multiplied set —
    # measured 2.8x slower at sf0.1.  The low-cardinality distinct
    # (order status, 3 values) stays in the plain agg; the final join
    # is post-aggregation (one row per priority).
    vo = ensure_view(spark, sf_dir, "orders")
    return spark.sql(f"""
        WITH _nc AS (
          SELECT o_orderpriority, COUNT(1) AS n_cust
          FROM (SELECT o_orderpriority, o_custkey, COUNT(1) AS _n
                FROM {vo} GROUP BY o_orderpriority, o_custkey)
          GROUP BY o_orderpriority),
        _rest AS (
          SELECT o_orderpriority,
                 count(DISTINCT o_orderstatus) AS n_statuses,
                 array_join(sort_array(collect_set(o_orderstatus)), ',')
                   AS statuses,
                 (max(struct(o_totalprice AS p, o_custkey AS ck))).ck
                   AS top_cust,
                 round(max(o_totalprice), 6) AS max_price
          FROM {vo} GROUP BY o_orderpriority)
        SELECT o_orderpriority, n_cust, n_statuses, statuses,
               top_cust, max_price
        FROM _nc JOIN _rest USING (o_orderpriority)
        """)


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
    vc = ensure_view(spark, sf_dir, "customer")
    vn = ensure_view(spark, sf_dir, "nation")
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(na) */
               n_name, c_mktsegment, count(*) AS n,
               CAST(grouping(n_name) AS INT) AS g_nation,
               CAST(grouping(c_mktsegment) AS INT) AS g_segment
        FROM {vc} JOIN {vn} na ON c_nationkey = na.n_nationkey
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
    vl = ensure_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM {vl}
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 20
        """)


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
    # no broadcast hint: at bench scale the planner broadcasts the
    # filtered customer side on its own; at 100 TB that side is ~half
    # the customer table and must be allowed to fall back to a
    # shuffle join rather than die on a forced broadcast.
    # Both output row families come out of ONE Generate over the
    # joined row (a union of two projections of `marked` would plan
    # the whole orders-aggregate subtree TWICE — column pruning makes
    # the branch subtrees non-identical, so exchange reuse cannot
    # deduplicate them; measured 2x the scans).
    vo = ensure_view(spark, sf_dir, "orders")
    vc = ensure_view(spark, sf_dir, "customer")
    return spark.sql(f"""
        SELECT _r.op, _r.custkey, _r.n FROM (
          SELECT explode(array(
            struct(CASE WHEN _m IS NULL THEN 'except'
                        ELSE 'intersect' END AS op,
                   custkey,
                   CAST(1 AS BIGINT) AS n),
            CASE WHEN _f > 0 AND _b > 0 THEN
              struct('intersect_all' AS op, custkey,
                     least(_f, _b) AS n)
            END)) AS _r
          FROM (SELECT o_custkey AS custkey,
                       sum(CASE WHEN o_orderstatus = 'F' THEN 1
                                ELSE 0 END) AS _f,
                       sum(CASE WHEN o_totalprice >= 100000 THEN 1
                                ELSE 0 END) AS _b
                FROM {vo} GROUP BY o_custkey)
          LEFT JOIN (SELECT c_custkey AS custkey, 1 AS _m
                     FROM {vc} WHERE c_acctbal < 0)
            USING (custkey))
        WHERE _r IS NOT NULL
        """)


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
    vp = ensure_view(spark, sf_dir, "part")
    return spark.sql(f"""
        SELECT p_partkey,
               upper(p_brand) AS brand_uc,
               substring(p_name, 1, 8) AS name_pfx,
               CAST(length(p_name) AS INT) AS name_len,
               concat(p_brand, '#', p_type) AS brand_type,
               CAST(regexp_count(p_name, '[aeiou]+') AS INT)
                 AS n_vowel_runs,
               regexp_extract(p_name, '([a-z]{{5,}})', 1)
                 AS first_long_token,
               CAST(length(regexp_replace(p_name, '[aeiou]', '')) AS INT)
                 AS len_novowels
        FROM {vp}
        WHERE p_type LIKE 'S%'
        """)


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

    SQL ``UNPIVOT INCLUDE NULLS`` generates the (metric, val) rows in
    one pass (a single Expand node over the post-agg relation, exactly
    as ``DataFrame.unpivot`` planned) — no N-way self-union re-scan;
    the oracle states the same relation as a UNION ALL over the
    aggregated CTE.  INCLUDE NULLS mirrors unpivot/melt semantics
    (SQL UNPIVOT drops NULL cells by default).
    """
    vo = ensure_view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT order_month, order_year, metric, val
        FROM (SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                       AS order_month,
                     CAST(year(o_orderdate) AS INT) AS order_year,
                     CAST(COUNT(1) AS DOUBLE) AS n,
                     {s_dsum('o_totalprice')} AS sum_price
              FROM {vo} GROUP BY 1, 2)
        UNPIVOT INCLUDE NULLS (val FOR metric IN (n, sum_price))
        """)


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
    from v6spark.functions.determinism import s_davg

    vl = ensure_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT l_returnflag,
               {s_davg('sqrt(l_extendedprice)')} AS avg_sqrt_price,
               round(avg(ln(l_extendedprice + 1.0D)), 6) AS avg_ln_price,
               {s_davg('abs(l_discount - 0.05D)')} AS avg_absdev_disc
        FROM {vl} GROUP BY l_returnflag
        """)


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
    ve = ensure_view(spark, sf_dir, "events")
    return spark.sql(f"""
        SELECT event_type,
               COUNT(1) AS n,
               round(avg(CAST(get_json_object(props, '$.k') AS INT)), 6)
                 AS avg_k
        FROM {ve} GROUP BY event_type
        """)
