"""Per-group statistics — the heart of the reference library.

Each function generalizes one variation6 axis-reduction (SURVEY.md
§2.1 C1-C11) from "per variant over samples" to "per key over rows of
a long-format DataFrame".  All of them compile to a single Spark
hash-aggregate (partial map-side combine + final), i.e. exactly one
shuffle on the grouping key — the shape that scales linearly with
executors.  No Python UDFs anywhere.

Reference citations are ``file::function`` per SURVEY.md §0 (the line
numbers in the reference are unverified; the function-level semantics
are the contract).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from v6spark.functions.determinism import davg, dsum


def _cols(keys: Sequence[str | Column]) -> list[Column]:
    return [F.col(k) if isinstance(k, str) else k for k in keys]


def rate_of(
    df: DataFrame,
    keys: Sequence[str],
    indicator: Column,
    alias: str = "rate",
    scale: int = 6,
) -> DataFrame:
    """Per-key rate of rows satisfying ``indicator``.

    Generalizes ``variation6/stats::calc_missing_gt`` (C1: per-variant
    missing-call rate) and ``calc_obs_het`` (C7: per-variant
    heterozygosity rate).  The 0/1 indicator sums exactly in doubles,
    so plain avg is already deterministic.
    """
    ind = F.when(indicator, F.lit(1.0)).otherwise(F.lit(0.0))
    return df.groupBy(*_cols(keys)).agg(
        F.round(F.avg(ind), scale).alias(alias)
    )


def category_counts(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Count of rows per category combination.

    Generalizes ``variation6/stats::count_alleles`` (C2): the
    (variant x allele) count matrix in long form.
    """
    return df.groupBy(*_cols(keys)).agg(F.count(F.lit(1)).alias("n"))


def category_shares(
    df: DataFrame,
    entity_key: str,
    category_key: str,
    alias: str = "share",
    scale: int = 6,
) -> DataFrame:
    """Within each entity, the share of each category.

    Generalizes ``variation6/stats::calc_allele_freq`` (C3): per-variant
    allele frequencies = counts normalized by the row total.  The
    normalization is a window sum over the already-aggregated counts —
    cheap because it runs on the post-agg (small) relation.
    """
    counts = category_counts(df, [entity_key, category_key])
    total = F.sum("n").over(Window.partitionBy(entity_key))
    return counts.select(
        entity_key,
        category_key,
        F.round(F.col("n") / total, scale).alias(alias),
    )


def major_category_freq(
    df: DataFrame,
    entity_key: str,
    category_key: str,
    alias: str = "maf",
    scale: int = 6,
) -> DataFrame:
    """Per-entity frequency of its most common category.

    Generalizes ``variation6/stats::calc_maf_by_gt`` (C4): the
    major-allele frequency max(count)/sum(count).  Two-level aggregate;
    both levels are hash-aggs on shrinking data.
    """
    counts = category_counts(df, [entity_key, category_key])
    return counts.groupBy(entity_key).agg(
        F.round(F.max("n") / F.sum("n"), scale).alias(alias)
    )


def minor_category_count(
    df: DataFrame,
    entity_key: str,
    category_key: str,
    alias: str = "mac",
) -> DataFrame:
    """Per-entity count of rows NOT in its modal category.

    Generalizes ``variation6/stats::calc_mac`` (C6): minor-allele count
    = total calls - major-allele count.  Exact integer arithmetic.
    """
    counts = category_counts(df, [entity_key, category_key])
    return counts.groupBy(entity_key).agg(
        (F.sum("n") - F.max("n")).alias(alias)
    )


def expected_het_unbiased(
    df: DataFrame,
    entity_key: str,
    category_key: str,
    alias: str = "exp_het",
    scale: int = 6,
) -> DataFrame:
    """Nei's unbiased expected heterozygosity per entity.

    ``(1 - sum(p_i^2)) * n / (n - 1)`` over category shares p_i —
    ``variation6/stats::calc_unbiased_exp_het`` (C8).  Computed from
    exact integer counts so the double arithmetic is reproducible.
    """
    counts = category_counts(df, [entity_key, category_key])
    per_entity = counts.groupBy(entity_key).agg(
        F.sum("n").alias("n_total"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
    )
    # sum(p_i^2) = sum(n_i^2) / n^2 with exact int64 numerators.
    p2 = F.col("sum_sq").cast("double") / (
        F.col("n_total").cast("double") * F.col("n_total").cast("double")
    )
    h = (F.lit(1.0) - p2) * (
        F.col("n_total").cast("double")
        / (F.col("n_total") - F.lit(1)).cast("double")
    )
    # n=1 has no unbiased estimate: emit NULL (Spark would produce NaN
    # from 0*inf, while SQL engines yield NULL on /0 — cross-engine
    # divergence otherwise)
    h = F.when(F.col("n_total") > 1, h)
    return per_entity.select(entity_key, F.round(h, scale).alias(alias))


def measure_stats(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    scale: int = 6,
) -> DataFrame:
    """Per-key avg/min/max/stddev of a measure.

    Generalizes ``variation6/stats::calc_depth`` (C9: depth
    distribution moments).  stddev is computed from exact sum /
    sum-of-squares (the corpus measures are integral doubles, so both
    sums are exact int-valued doubles and the closed-form
    ``sqrt((ss - s^2/n) / (n-1))`` is bitwise-identical across engines
    — a streaming-variance implementation would not be).
    """
    v = F.col(value)
    n = F.count(v).cast("double")
    s = F.sum(v)
    ss = F.sum(v * v)
    variance = (ss - s * s / n) / (n - F.lit(1.0))
    return df.groupBy(*_cols(keys)).agg(
        F.round(F.avg(v), scale).alias(f"avg_{value.split('_')[-1]}"),
        F.min(v).alias(f"min_{value.split('_')[-1]}"),
        F.max(v).alias(f"max_{value.split('_')[-1]}"),
        F.round(F.sqrt(variance), scale).alias(f"std_{value.split('_')[-1]}"),
    )


def histogram(
    df: DataFrame,
    value: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Fixed-range histogram of a numeric column.

    ``variation6/stats::histogram`` (C10) wraps dask.array.histogram;
    the Spark form is a bucket expression + hash-agg — one shuffle of
    (bucket, partial count) pairs, never of raw rows.
    """
    width = (hi - lo) / n_bins
    v = F.col(value)
    bucket = F.floor((v - F.lit(lo)) / F.lit(width)).cast("long")
    return (
        df.filter((v >= lo) & (v < hi))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def exact_percentiles(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    quantiles: Sequence[tuple[str, float]],
    scale: int = 6,
) -> DataFrame:
    """Exact interpolated per-key percentiles, rank-based (scale-safe).

    Spark's ``percentile`` aggregate buffers every value of a group in
    one aggregation buffer — an executor OOM at 100 TB group sizes.
    This is the two-pass formulation instead: a per-key ``row_number``
    window (sort-based, spills gracefully, parallel across keys) plus
    a per-key count, then only the two straddling rows of each target
    rank are aggregated and linearly interpolated.  Values are
    identical to ``percentile``/DuckDB ``quantile_cont``:
    ``pos = 1 + (n-1) q``; ``v = v_lo + frac (v_hi - v_lo)``.
    """
    v = F.col(value)
    base = df.filter(v.isNotNull())
    w = Window.partitionBy(*_cols(keys)).orderBy(v)
    wp = Window.partitionBy(*_cols(keys))
    ranked = base.select(
        *_cols(keys),
        v.alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wp).alias("_n"),
    )
    return ranked.groupBy(*_cols(keys)).agg(
        *percentile_agg_exprs(quantiles, value="_v", scale=scale)
    )


def percentile_agg_exprs(
    quantiles: Sequence[tuple[str, float]],
    value: str = "_v",
    rn: str = "_rn",
    n: str = "_n",
    scale: int = 6,
) -> list[Column]:
    """Aggregate expressions interpolating percentiles from a ranked
    frame (columns ``rn`` = per-key row_number ordered by value, ``n``
    = per-key count).  Lets callers fuse the percentile aggregation
    with other aggregates over the SAME window pass — one shuffle,
    no join (see q_measure_stats)."""
    aggs = []
    for name, q in quantiles:
        pos = F.lit(1.0) + (F.col(n) - F.lit(1)).cast("double") * F.lit(q)
        lo = F.floor(pos).cast("long")
        hi = F.ceil(pos).cast("long")
        frac = pos - F.floor(pos)
        v_lo = F.max(F.when(F.col(rn) == lo, F.col(value)))
        v_hi = F.max(F.when(F.col(rn) == hi, F.col(value)))
        f = F.max(F.when(F.col(rn) == lo, frac))
        aggs.append(F.round(v_lo + f * (v_hi - v_lo), scale).alias(name))
    return aggs


def percentile_hist_agg_exprs(
    quantiles: Sequence[tuple[str, float]],
    value: str,
    cum: str = "_cum",
    n: str = "_n",
    scale: int = 6,
) -> list[Column]:
    """Aggregate expressions interpolating percentiles from a per-key
    VALUE HISTOGRAM (one row per distinct value, columns ``cum`` =
    running count ordered by value, ``n`` = per-key total count).

    Same interpolation as :func:`percentile_agg_exprs`
    (``pos = 1 + (n-1) q``; ``v = v_lo + frac (v_hi - v_lo)``), but
    over distinct values instead of ranked rows: the rank-``lo``
    element is the first histogram row whose running count reaches
    ``lo``.  For low-cardinality value domains this shrinks the
    windowed frame from every row to every distinct (key, value) pair
    — the map-side partial aggregate does the heavy lifting and the
    sort touches only the histogram (see q_measure_stats: 600k rows →
    50k histogram rows at sf0.1; at 100 TB the reduction is the
    difference between shuffling the fact table and shuffling a
    per-key digest)."""
    aggs = []
    v, c = F.col(value), F.col(cum)
    for name, q in quantiles:
        pos = F.lit(1.0) + (F.col(n) - F.lit(1)).cast("double") * F.lit(q)
        lo = F.floor(pos).cast("long")
        hi = F.ceil(pos).cast("long")
        frac = pos - F.floor(pos)
        v_lo = F.min(F.when(c >= lo, v))
        v_hi = F.min(F.when(c >= hi, v))
        f = F.max(frac)  # constant within the key group
        aggs.append(F.round(v_lo + f * (v_hi - v_lo), scale).alias(name))
    return aggs


def group_mean(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    n_alias: str = "n",
    avg_alias: str = "avg_value",
    scale: int = 6,
) -> DataFrame:
    """Per-key count + decimal-exact mean of a double measure.

    Generalizes ``variation6/stats::calc_called_gt_per_sample`` /
    per-sample depth means (C11): the "other axis" reduction — in long
    format just a different grouping key.
    """
    return df.groupBy(*_cols(keys)).agg(
        F.count(F.lit(1)).alias(n_alias),
        davg(value, scale).alias(avg_alias),
    )


def group_sum(
    df: DataFrame,
    keys: Sequence[str],
    value: Column | str,
    n_alias: str = "n",
    sum_alias: str = "sum_value",
    scale: int = 6,
) -> DataFrame:
    """Per-key count + order-independent decimal sum of a measure."""
    return df.groupBy(*_cols(keys)).agg(
        F.count(F.lit(1)).alias(n_alias),
        dsum(value, scale).alias(sum_alias),
    )
