"""M2 tier — the reference's genomic statistics core (SURVEY.md §2.1 C/D).

Allele-frequency-family reductions (shares, major/minor frequency,
observed/expected heterozygosity), stat-threshold filters, and the
array-column reductions that stand in for per-sample depth vectors.

r12: trailing presentation ORDER BYs removed — see m1_core docstring.
r12 session 2: Column-API builds restated as single spark.sql strings
(textual twins, operator functions stay the library API) — see
m1_core docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from v6spark.plans.registry import register
from v6spark.sources.tables import ensure_view

TIER = "m2_stats"


@register(
    "q_category_shares",
    TIER,
    """
    WITH c AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS n
      FROM customer GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment,
           round(n / sum(n) OVER (PARTITION BY c_nationkey), 6) AS share
    FROM c
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def q_category_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allele frequencies (C3: calc_allele_freq) — counts / row total."""
    vc = ensure_view(spark, sf_dir, "customer")
    return spark.sql(f"""
        WITH c AS (
          SELECT c_nationkey, c_mktsegment, COUNT(1) AS n
          FROM {vc} GROUP BY c_nationkey, c_mktsegment)
        SELECT c_nationkey, c_mktsegment,
               round(n / sum(n) OVER (PARTITION BY c_nationkey), 6) AS share
        FROM c
        """)


@register(
    "q_maf_gt",
    TIER,
    """
    WITH c AS (
      SELECT o_orderpriority, o_orderstatus, count(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, round(max(n) / sum(n), 6) AS maf
    FROM c GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_maf_gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Major-frequency from category counts (C4: calc_maf_by_gt)."""
    vo = ensure_view(spark, sf_dir, "orders")
    return spark.sql(f"""
        WITH c AS (
          SELECT o_orderpriority, o_orderstatus, COUNT(1) AS n
          FROM {vo} GROUP BY o_orderpriority, o_orderstatus)
        SELECT o_orderpriority, round(max(n) / sum(n), 6) AS maf
        FROM c GROUP BY o_orderpriority
        """)


@register(
    "q_maf_depth",
    TIER,
    """
    WITH s AS (
      SELECT label,
             list_sum(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
             CAST(embedding[1] AS DOUBLE) AS e0
      FROM embeddings WHERE vec_id < 100
    )
    SELECT label, round(max(s) / sum(s), 6) AS maf,
           round(avg(nrm), 6) AS avg_l2_norm,
           round(avg(e0 / nrm), 6) AS avg_u0
    FROM s GROUP BY label
    ORDER BY label
    """,
)
def q_maf_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-evidence major frequency (C5: calc_maf_by_allele_count)
    + embedding-hygiene aggregates (r5 fold: the
    operators/embeddings.py l2-normalization arithmetic, judged —
    per-label mean l2 norm and mean first normalized component).

    The per-row vector reductions (abs-sum standing in for the AD
    depth vector; square-sum for the norm) run as Catalyst
    ``aggregate`` HOFs — JVM-side, sequential left fold in DOUBLE
    (cast BEFORE squaring, exactly as the oracle), bitwise-
    reproducible per row.  The norm fold here is the textual twin of
    the old Column form (transform then fold — NOT arr_norm_sq_sql's
    fused fold) so the IEEE sequence is unchanged.
    """
    vemb = ensure_view(spark, sf_dir, "embeddings")
    nrm_sql = ("sqrt(aggregate(transform(embedding, "
               "x -> cast(x as double) * cast(x as double)), 0.0D, "
               "(acc, x) -> acc + x))")
    abs_sum = ("aggregate(embedding, 0.0D, "
               "(acc, x) -> acc + abs(cast(x as double)))")
    return spark.sql(f"""
        WITH p AS (
          SELECT label,
                 {abs_sum} AS s,
                 {nrm_sql} AS nrm,
                 cast(element_at(embedding, 1) as double) / {nrm_sql} AS u0
          FROM {vemb} WHERE vec_id < 100)
        SELECT label,
               round(max(s) / sum(s), 6) AS maf,
               round(avg(nrm), 6) AS avg_l2_norm,
               round(avg(u0), 6) AS avg_u0
        FROM p GROUP BY label
        """)


@register(
    "q_mac",
    TIER,
    """
    WITH c AS (
      SELECT p_brand, p_type, count(*) AS n FROM part GROUP BY 1, 2
    )
    SELECT p_brand, CAST(sum(n) - max(n) AS BIGINT) AS mac
    FROM c GROUP BY p_brand
    HAVING CAST(sum(n) - max(n) AS BIGINT) >= 1
    ORDER BY p_brand
    """,
)
def q_mac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minor-category count (C6: calc_mac, D4: filter_by_mac)."""
    vp = ensure_view(spark, sf_dir, "part")
    return spark.sql(f"""
        SELECT p_brand, mac FROM (
          SELECT p_brand, sum(n) - max(n) AS mac FROM (
            SELECT p_brand, p_type, COUNT(1) AS n
            FROM {vp} GROUP BY p_brand, p_type)
          GROUP BY p_brand)
        WHERE mac >= 1
        """)


@register(
    "q_obs_het",
    TIER,
    """
    SELECT user_id,
           round(avg(CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END), 6) AS het_rate
    FROM events GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_obs_het(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed heterozygosity analog (C7: calc_obs_het)."""
    ve = ensure_view(spark, sf_dir, "events")
    return spark.sql(f"""
        SELECT user_id,
               round(avg(CASE WHEN event_type = 'click' THEN 1.0D
                              ELSE 0.0D END), 6) AS het_rate
        FROM {ve} GROUP BY user_id
        """)


@register(
    "q_obs_het_filter",
    TIER,
    """
    SELECT user_id,
           round(avg(CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END), 6) AS het_rate
    FROM events GROUP BY user_id
    HAVING round(avg(CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END), 6)
             BETWEEN 0.15 AND 0.25
    ORDER BY user_id
    """,
)
def q_obs_het_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Het-rate band filter (D5: filter_by_obs_het)."""
    ve = ensure_view(spark, sf_dir, "events")
    return spark.sql(f"""
        SELECT user_id, het_rate FROM (
          SELECT user_id,
                 round(avg(CASE WHEN event_type = 'click' THEN 1.0D
                                ELSE 0.0D END), 6) AS het_rate
          FROM {ve} GROUP BY user_id)
        WHERE het_rate >= 0.15 AND het_rate <= 0.25
        """)


@register(
    "q_exp_het",
    TIER,
    """
    WITH c AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS n
      FROM customer GROUP BY 1, 2
    ), e AS (
      SELECT c_nationkey,
             CAST(sum(n) AS BIGINT) AS n_total,
             CAST(sum(n * n) AS BIGINT) AS sum_sq
      FROM c GROUP BY c_nationkey
    )
    SELECT c_nationkey,
           round(CASE WHEN n_total > 1 THEN
                 (1.0 - CAST(sum_sq AS DOUBLE)
                        / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)))
                 * (CAST(n_total AS DOUBLE) / CAST(n_total - 1 AS DOUBLE))
                 END, 6) AS exp_het
    FROM e
    ORDER BY c_nationkey
    """,
)
def q_exp_het(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nei's unbiased expected heterozygosity (C8: calc_unbiased_exp_het).

    Computed from exact integer counts (sum n, sum n^2) so the double
    arithmetic sequence is identical across engines.
    """
    vc = ensure_view(spark, sf_dir, "customer")
    return spark.sql(f"""
        WITH c AS (
          SELECT c_nationkey, c_mktsegment, COUNT(1) AS n
          FROM {vc} GROUP BY c_nationkey, c_mktsegment),
        e AS (
          SELECT c_nationkey, sum(n) AS n_total, sum(n * n) AS sum_sq
          FROM c GROUP BY c_nationkey)
        SELECT c_nationkey,
               round(CASE WHEN n_total > 1 THEN
                     (1.0D - cast(sum_sq as double)
                             / (cast(n_total as double)
                                * cast(n_total as double)))
                     * (cast(n_total as double)
                        / cast(n_total - 1 as double))
                     END, 6) AS exp_het
        FROM e
        """)


@register(
    "q_callrate_filter",
    TIER,
    """
    SELECT l_partkey,
           round(avg(CASE WHEN l_discount >= 0.05 THEN 1.0 ELSE 0.0 END), 6) AS call_rate
    FROM lineitem GROUP BY l_partkey
    HAVING round(avg(CASE WHEN l_discount >= 0.05 THEN 1.0 ELSE 0.0 END), 6) >= 0.5
    ORDER BY l_partkey
    """,
)
def q_callrate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Call-rate threshold filter (D1: remove_low_call_rate_vars).

    Aggregate-then-HAVING over the grouping key; one shuffle, and the
    HAVING predicate runs post-aggregation on the (small) grouped set.
    """
    vl = ensure_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT l_partkey, call_rate FROM (
          SELECT l_partkey,
                 round(avg(CASE WHEN l_discount >= 0.05 THEN 1.0D
                                ELSE 0.0D END), 6) AS call_rate
          FROM {vl} GROUP BY l_partkey)
        WHERE call_rate >= 0.5
        """)


@register(
    "q_variable_only",
    TIER,
    """
    SELECT 'variable' AS rule, p_brand AS group_key,
           count(DISTINCT p_type) AS n_categories
    FROM part GROUP BY p_brand
    HAVING count(DISTINCT p_type) >= 2
    UNION ALL
    SELECT 'biallelic' AS rule, CAST(l_partkey AS VARCHAR) AS group_key,
           count(DISTINCT l_returnflag) AS n_categories
    FROM lineitem WHERE l_quantity >= 44
    GROUP BY l_partkey
    HAVING count(DISTINCT l_returnflag) = 2
    ORDER BY rule, group_key
    """,
)
def q_variable_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-sites + biallelic-sites filters (D8:
    keep_variable_variations / keep_biallelic), tagged branches.

    'variable': groups with >= 2 distinct categories; 'biallelic':
    groups with exactly 2 observed categories among high-quantity
    rows.  Both are aggregate-then-HAVING on independent inputs — the
    union is of two already-reduced relations, not a fact-table scan
    twice over the same data.
    """
    vp = ensure_view(spark, sf_dir, "part")
    vl = ensure_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT 'variable' AS rule, p_brand AS group_key, n_categories
        FROM (SELECT p_brand, count(DISTINCT p_type) AS n_categories
              FROM {vp} GROUP BY p_brand)
        WHERE n_categories >= 2
        UNION ALL
        SELECT 'biallelic' AS rule, CAST(l_partkey AS STRING) AS group_key,
               n_categories
        FROM (SELECT l_partkey,
                     count(DISTINCT l_returnflag) AS n_categories
              FROM {vl} WHERE l_quantity >= 44
              GROUP BY l_partkey)
        WHERE n_categories = 2
        """)


@register(
    "q_array_funcs",
    TIER,
    """
    SELECT vec_id,
           i - 1 AS pos,
           round(CAST(embedding[i] AS DOUBLE), 6) AS val,
           CAST(len(embedding) AS INT) AS n_dims,
           round(list_sum(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 6) AS abs_sum
    FROM embeddings, range(1, 65) t(i)
    WHERE vec_id < 25
    ORDER BY vec_id, pos
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column surface: size / aggregate HOF / lateral posexplode.

    The reference's per-variant AD vector ops (C5) expressed with
    Catalyst higher-order functions — all JVM-side, no UDF — plus the
    long-format pivot of the array via ONE Generate (posexplode) node;
    the oracle states the same relation as a range lateral join.
    """
    from v6spark.sources.tables import ensure_view

    ve = ensure_view(spark, sf_dir, "embeddings")
    # r12: ONE spark.sql build (the Column form's abs-sum lambda +
    # posexplode cost ~0.12 s of py4j chatter per bench iteration);
    # aggregate lambda is the textual twin of arrays.arr_abs_sum.
    return spark.sql(f"""
        SELECT vec_id,
               CAST(pos AS BIGINT) AS pos,
               round(CAST(v AS DOUBLE), 6) AS val,
               n_dims,
               abs_sum
        FROM (
          SELECT vec_id,
                 size(embedding) AS n_dims,
                 round(aggregate(embedding, 0.0D,
                                 (acc, x) -> acc + abs(cast(x as double))),
                       6) AS abs_sum,
                 posexplode(embedding) AS (pos, v)
          FROM {ve}
          WHERE vec_id < 25)
        """)
