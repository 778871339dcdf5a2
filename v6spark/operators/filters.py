"""Filter operators with kept/filtered accounting (SURVEY.md §2.1 D).

The reference's signature idiom: every filter returns
``{FLT_VARS, N_KEPT, N_FILTERED_OUT[, FLT_STATS]}``
(``variation6/filters.py`` throughout, constants in
``variation6/__init__.py``).  Here that contract is a ``FilterResult``
dataclass.  Counts are computed with a single aggregate pass over the
predicate (``count_if`` + total), not by counting two DataFrames —
one job, exact, and the filtered DataFrame stays lazy.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class FilterResult:
    """Mirror of the reference's FLT_VARS / N_KEPT / N_FILTERED_OUT dict."""

    df: DataFrame
    n_kept: int
    n_filtered_out: int
    stats: DataFrame | None = None

    @property
    def n_total(self) -> int:
        return self.n_kept + self.n_filtered_out


def accounting_df(df: DataFrame, predicate: Column) -> DataFrame:
    """One-row (n_kept, n_filtered_out) frame for a predicate.

    ``variation6/filters.py`` D9: every filter reports how many rows
    survived.  Single aggregate, no second scan.
    """
    return df.agg(
        F.count_if(predicate).alias("n_kept"),
        (F.count(F.lit(1)) - F.count_if(predicate)).alias("n_filtered_out"),
    )


def filter_rows(df: DataFrame, predicate: Column, with_counts: bool = True) -> FilterResult:
    """Row-level predicate filter (D6: ``filter_by_snp_qual`` pattern).

    The predicate is pushed into the parquet scan by Catalyst when it
    references scan columns directly.
    """
    kept = df.filter(predicate)
    if not with_counts:
        return FilterResult(kept, -1, -1)
    row = accounting_df(df, predicate).collect()[0]
    return FilterResult(kept, row["n_kept"], row["n_filtered_out"])


def rate_histogram(
    grouped: DataFrame,
    rate_col: str,
    n_bins: int = 20,
    limits: tuple = (0.0, 1.0),
) -> DataFrame:
    """Histogram of an already-aggregated rate column, numpy-edged.

    Unlike :func:`v6spark.operators.stats.histogram` (half-open bins
    throughout), the LAST bin is closed — ``rate == limits[1]`` counts
    — matching ``np.histogram``, which is what the reference's
    FLT_STATS contract returns (``variation6/filters.py`` D1).
    """
    lo, hi = float(limits[0]), float(limits[1])
    width = (hi - lo) / n_bins
    v = F.col(rate_col)
    bucket = F.least(
        F.floor((v - F.lit(lo)) / F.lit(width)).cast("long"),
        F.lit(n_bins - 1).cast("long"),
    )
    return (
        grouped.filter((v >= lo) & (v <= hi))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def filter_by_group_rate(
    df: DataFrame,
    key: str,
    indicator: Column,
    min_rate: float | None = None,
    max_rate: float | None = None,
    rate_alias: str = "rate",
    scale: int = 6,
    calc_histogram: bool = False,
    n_bins: int = 20,
) -> DataFrame | FilterResult:
    """Keep groups whose indicator-rate is inside [min_rate, max_rate].

    The shared shape of the reference's stat-threshold filters:
    ``remove_low_call_rate_vars`` (D1), ``filter_by_maf`` (D2),
    ``filter_by_obs_het`` (D5) — aggregate per group, then HAVING.
    Returns (key, rate) for surviving groups.

    With ``calc_histogram=True`` (the reference's
    ``remove_low_call_rate_vars(..., calc_histogram=True)`` signature)
    the return is a :class:`FilterResult` whose ``stats`` is the
    histogram of the PRE-FILTER rate distribution (numpy-style closed
    last bin) and whose counts come from ONE extra aggregate over the
    already-reduced per-group relation — never a second pass over the
    input rows.
    """
    ind = F.when(indicator, F.lit(1.0)).otherwise(F.lit(0.0))
    grouped = df.groupBy(key).agg(F.round(F.avg(ind), scale).alias(rate_alias))
    cond = F.lit(True)
    if min_rate is not None:
        cond = cond & (F.col(rate_alias) >= min_rate)
    if max_rate is not None:
        cond = cond & (F.col(rate_alias) <= max_rate)
    kept = grouped.filter(cond)
    if not calc_histogram:
        return kept
    stats = rate_histogram(grouped, rate_alias, n_bins)
    row = accounting_df(grouped, cond).collect()[0]
    return FilterResult(
        kept, row["n_kept"], row["n_filtered_out"], stats=stats
    )


def label_disjoint_ranges(
    df: DataFrame,
    ranges: Sequence[tuple],
    value: Column | str,
    name_alias: str = "range_name",
) -> DataFrame:
    """Tag rows with the name of the [lo, hi) literal range holding ``value``.

    The narrow-map alternative to :func:`filter_in_ranges` for the
    common case where the range list is a plan-time literal and the
    ranges are DISJOINT (each row matches at most one): a CASE chain
    evaluates per row inside whole-stage codegen — no join operator at
    all, nothing to broadcast, nothing for AQE to re-plan at 1000
    executors.  Rows outside every range are dropped (inner-join
    parity with ``filter_in_ranges``).

    Use :func:`filter_in_ranges` when ranges genuinely overlap (a row
    may match several) or when they arrive as data rather than plan
    literals.

    ``ranges``: iterable of ``(name, lo, hi)`` Python literals.
    """
    v = F.col(value) if isinstance(value, str) else value
    expr: Column | None = None
    for name, lo, hi in ranges:
        cond = (v >= F.lit(lo)) & (v < F.lit(hi))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    if expr is None:
        raise ValueError("label_disjoint_ranges: empty range list")
    return df.withColumn(name_alias, expr).filter(F.col(name_alias).isNotNull())


def filter_in_ranges(
    df: DataFrame,
    ranges: DataFrame,
    value: Column | str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Keep rows whose ``value`` falls in any [lo, hi) range.

    ``variation6/filters.py::filter_variations_in_regions`` (D7): keep
    variants inside genomic regions.  Implemented as a non-equi join;
    with a small range table Spark plans a broadcast nested-loop join —
    the right physical choice (ranges are tiny dimension data), and at
    100 TB the fact side still streams with no shuffle.
    """
    v = F.col(value) if isinstance(value, str) else value
    return df.join(
        F.broadcast(ranges),
        (v >= F.col(lo_col)) & (v < F.col(hi_col)),
        "inner",
    )


def variable_groups(
    df: DataFrame, key: str, category: str, min_distinct: int = 2
) -> DataFrame:
    """Groups with at least ``min_distinct`` distinct categories.

    ``variation6/filters.py::keep_variable_variations`` (D8): drop
    invariant sites (a single observed allele).
    """
    return (
        df.groupBy(key)
        .agg(F.countDistinct(category).alias("n_categories"))
        .filter(F.col("n_categories") >= min_distinct)
    )


def exactly_k_groups(
    df: DataFrame, key: str, category: str, k: int = 2
) -> DataFrame:
    """Groups with exactly ``k`` distinct categories.

    ``variation6/filters.py::keep_biallelic`` (D8): keep biallelic
    sites (exactly two observed alleles).
    """
    return (
        df.groupBy(key)
        .agg(F.countDistinct(category).alias("n_categories"))
        .filter(F.col("n_categories") == k)
    )
