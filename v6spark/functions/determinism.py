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


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent sum of a double column, emitted as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double"), scale)


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent mean: exact decimal sum / exact int64 count.

    The division is one IEEE double op — identical in both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(DEC)).cast("double") / F.count(c).cast("double"), scale
    )


# --- DuckDB-side twins (string macros used by plans/*.py oracles) ---


def o_dround(expr: str, scale: int = 6) -> str:
    return f"round({expr}, {scale})"


def o_dsum(expr: str, scale: int = 6) -> str:
    return f"round(CAST(sum(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE), {scale})"


def o_davg(expr: str, scale: int = 6) -> str:
    return (
        f"round(CAST(sum(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / CAST(count({expr}) AS DOUBLE), {scale})"
    )
