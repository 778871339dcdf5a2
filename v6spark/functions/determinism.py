"""Cross-engine deterministic aggregation helpers.

Problem (SURVEY.md §7 pitfall 1): a plain ``SUM(double)`` is
order-dependent — Spark's partial/final aggregation and DuckDB's
parallel hash aggregate add values in different orders, and at
price-sum magnitudes (~1e9 over 60k rows) the drift reaches ~1e-1 ULP
accumulation, easily flipping a 4-6 decimal rounding.  A driver that
hash-compares rounded values would then fail nondeterministically.

Fix: cast each addend to ``DECIMAL(18,6)`` *before* summing.  Decimal
addition is exact and associative, so any summation order produces the
same result in both engines; the final cast back to DOUBLE is a single
correctly-rounded conversion.  Each helper here has an ``o_``-prefixed
twin that emits the equivalent DuckDB SQL so the two sides cannot
drift apart.

(The reference never faced this because Dask reductions run in one
process with one deterministic chunk order; see
``variation6/compute.py::compute`` — SURVEY.md §3.3.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dround(col: Column | str, scale: int = 6) -> Column:
    """Round a double column for emission (pairs with o_dround)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale)


def _safe_double(col: Column) -> Column:
    """NaN/±Inf → NULL, as the old DECIMAL(18,6) cast did implicitly
    (so they're skipped by the sums on BOTH engines — DuckDB would
    otherwise refuse CAST(floor(NaN) AS BIGINT))."""
    c = col.cast("double")
    return F.when(~(F.isnan(c) | (F.abs(c) == float("inf"))), c)


def fsplit_parts(col: Column) -> tuple[Column, Column]:
    """Per-row (hi, frac) floor-split of a double (see the long-split
    block below) — plain IEEE ops, NaN/Inf → NULL.  Sum both as longs
    (plain agg or window frame) and recombine with
    :func:`fsplit_rejoin`."""
    c = _safe_double(col)
    hi = F.floor(c)
    frac = F.floor(
        (c - hi.cast("double")) * F.lit(float(_SPLIT_SCALE)) + F.lit(0.5)
    )
    return hi, frac


def fsplit_rejoin(hi_sum: Column, frac_sum: Column) -> Column:
    """Recombine summed floor-split parts as DOUBLE via the
    engine-agnostic double recipe (same as :func:`split_sum_rejoin`)."""
    return (
        hi_sum.cast("double")
        + frac_sum.cast("double") / F.lit(float(_SPLIT_SCALE))
    )


def _fsplit_sum(col: Column) -> Column:
    """The floor-split exact sum as one aggregate expression: hi/frac
    long sums recombined with the engine-agnostic double recipe.
    Usable inline inside ``.agg()`` — no pre-projection needed, the
    per-row ops are plain IEEE doubles."""
    hi, frac = fsplit_parts(col)
    return fsplit_rejoin(F.sum(hi), F.sum(frac))


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent sum of a double column, emitted as DOUBLE.

    r10: the floor-split protocol (pure IEEE per-row ops summed as
    longs) replaced the per-row DECIMAL(18,6) cast — same
    associativity/order-independence, no BigDecimal allocation per
    row (the decimal cast was measured at ~2x the whole wall of
    scan-bound aggregate queries).  o_dsum emits the identical IEEE
    sequence for DuckDB, so agreement holds by construction."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(_fsplit_sum(c), scale)


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent mean: floor-split exact sum / int64 count.

    The division is one IEEE double op — identical in both engines.
    The count matches the oracle's ``count(expr)`` (non-null rows,
    NaN included), while NaN/Inf drop out of the SUM exactly as the
    old decimal cast dropped them."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(_fsplit_sum(c) / F.count(c).cast("double"), scale)


# --- long-split exact sums: the FAST order-independent sum -------- #
#
# A decimal sum whose buffer exceeds 18 digits is not UnsafeRow-
# mutable, so Spark's hash aggregate leaves the fast fixed-width path
# and every row pays a BigDecimal add — measured ~6x slower than a
# long sum on the bench suite's heaviest query.  The split form sums
# an integer part and a 1e-6-scaled fraction part as LONGS (codegen
# hash path) and recombines the two exact integer sums in one
# decimal(38,6) expression per GROUP — associative, so any
# partial/final staging (map-side combine, multi-level shuffles)
# produces the identical value.
#
# Quantization protocol (r10): the per-row split is computed with
# PURE IEEE-double arithmetic — ``hi = floor(x)``,
# ``f = floor((x - floor(x)) * 1e6 + 0.5)`` — because both engines
# execute the identical double op sequence (multiply, add, floor are
# deterministic IEEE-754 ops with identical semantics in Spark's JVM
# and DuckDB's C++), the two sides agree BY CONSTRUCTION, with zero
# per-row BigDecimal allocation (the previous DECIMAL(18,6)-cast
# protocol paid ~6 BigDecimal ops per addend — measured ~2s of the
# bench suite's heaviest query on a single-task scan).  The o_fsplit
# twins emit the same sequence in DuckDB SQL.  ``x - floor(x)`` is
# exact in IEEE double; the fraction rounding is half-up-toward-+inf
# at 1e-6 (values beyond 2^53 quantize at ulp granularity instead —
# still deterministic on both sides).
#
# Overflow bounds (raise, don't drift): per group,
# sum(|floor(x)|) <= 2^63-1 (~9.2e18) and rows <= 9.2e12 — far above
# any per-group magnitude the suite's data model reaches; a column
# whose group sums approach 1e19 needs the plain dsum.

_SPLIT_SCALE = 1_000_000


def split_cols(col: Column, tag: str) -> list[Column]:
    """Projection ``[_h<tag>, _f<tag>]`` splitting ``col`` exactly —
    PROJECT these once per row, then aggregate with
    :func:`split_sum_exprs` (any number of partial/final stages);
    evaluating the split inside the aggregate expressions instead
    would recompute it once per aggregate function per row."""
    c = _safe_double(col)
    hi = F.floor(c)  # LongType for double input
    f = c - hi.cast("double")  # exact IEEE subtraction
    frac = F.floor(f * F.lit(float(_SPLIT_SCALE)) + F.lit(0.5))
    return [hi.alias(f"_h{tag}"), frac.alias(f"_f{tag}")]


def o_split_sum(expr: str) -> str:
    """DuckDB twin of ``split_cols`` + ``split_sum_exprs`` +
    ``split_sum_rejoin`` as one inline SQL expression: the identical
    IEEE sequence per row, exact integer sums, and the same
    double-recipe recombine (int→double conversion, one division,
    one addition — all deterministic IEEE ops in both engines; a
    decimal recombine would NOT be engine-agnostic because DuckDB's
    decimal division returns DOUBLE)."""
    return _o_fsplit_sum(expr)


def split_sum_exprs(tag: str) -> list[Column]:
    """Aggregate expressions ``[sum(_h<tag>), sum(_f<tag>)]`` over a
    :func:`split_cols` projection — pair with
    :func:`split_sum_rejoin`."""
    return [
        F.sum(F.col(f"_h{tag}")).alias(f"_h{tag}"),
        F.sum(F.col(f"_f{tag}")).alias(f"_f{tag}"),
    ]


def split_sum_rejoin(tag: str) -> Column:
    """Recombine a :func:`split_sum_exprs` pair into the sum as
    DOUBLE via the double recipe of :func:`o_split_sum` — the same
    IEEE conversion/division/addition sequence DuckDB executes, so
    the two engines agree bit-for-bit."""
    return (
        F.col(f"_h{tag}").cast("double")
        + F.col(f"_f{tag}").cast("double") / F.lit(float(_SPLIT_SCALE))
    )


# --- Spark-SQL-side twins (string macros for SQL-string builds) --- #
#
# r12: the third member of each helper family.  A judged plan built
# through the Column API pays one py4j round trip per expression node
# (profiled 0.15-0.46 s of pure driver time per build for the widest
# plans); the same plan stated as ONE spark.sql() string is a single
# round trip.  These emit the IDENTICAL IEEE sequence as the Column
# forms above (floor-split quantization, long sums, double-recipe
# rejoin), so swapping a build between the two forms cannot change a
# value — pinned by tests/test_filters_transforms.py's s_dsum parity
# test.


def _s_safe(expr: str) -> str:
    """Spark-SQL twin of :func:`_safe_double` (NaN/±Inf → NULL)."""
    x = f"CAST(({expr}) AS DOUBLE)"
    return (
        f"CASE WHEN isnan({x}) OR abs({x}) = CAST('Infinity' AS DOUBLE)"
        f" THEN NULL ELSE {x} END"
    )


def _s_fsplit_sum(expr: str) -> str:
    """Spark-SQL twin of :func:`_fsplit_sum`."""
    s = f"({_s_safe(expr)})"
    hi = f"FLOOR({s})"
    fr = (
        f"FLOOR(({s} - CAST(FLOOR({s}) AS DOUBLE)) * 1000000.0 + 0.5)"
    )
    return (
        f"(CAST(SUM({hi}) AS DOUBLE)"
        f" + CAST(SUM({fr}) AS DOUBLE) / 1000000.0)"
    )


def s_dsum(expr: str, scale: int = 6) -> str:
    """Spark-SQL twin of :func:`dsum`."""
    return f"round({_s_fsplit_sum(expr)}, {scale})"


def s_davg(expr: str, scale: int = 6) -> str:
    """Spark-SQL twin of :func:`davg`."""
    return (
        f"round({_s_fsplit_sum(expr)}"
        f" / CAST(count({expr}) AS DOUBLE), {scale})"
    )


# --- DuckDB-side twins (string macros used by plans/*.py oracles) ---


def o_dround(expr: str, scale: int = 6) -> str:
    return f"round({expr}, {scale})"


def _o_safe(expr: str) -> str:
    x = f"CAST(({expr}) AS DOUBLE)"
    return (
        f"CASE WHEN isnan({x}) OR isinf({x}) THEN NULL ELSE {x} END"
    )


def o_fsplit_parts(expr: str) -> tuple[str, str]:
    """DuckDB twin of :func:`fsplit_parts`: per-row (hi, frac) SQL."""
    x = f"({_o_safe(expr)})"
    h = f"CAST(floor({x}) AS BIGINT)"
    f_ = (
        f"CAST(floor(({x} - floor({x})) * 1000000.0 + 0.5)"
        " AS BIGINT)"
    )
    return h, f_


def _o_fsplit_sum(expr: str) -> str:
    """DuckDB twin of :func:`_fsplit_sum` — the identical IEEE
    sequence per row, exact integer sums, double-recipe recombine."""
    h, f_ = o_fsplit_parts(expr)
    return (
        f"(CAST(sum({h}) AS DOUBLE)"
        f" + CAST(sum({f_}) AS DOUBLE) / 1000000.0)"
    )


def o_dsum(expr: str, scale: int = 6) -> str:
    return f"round({_o_fsplit_sum(expr)}, {scale})"


def o_davg(expr: str, scale: int = 6) -> str:
    return (
        f"round({_o_fsplit_sum(expr)}"
        f" / CAST(count({expr}) AS DOUBLE), {scale})"
    )
