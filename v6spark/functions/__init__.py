"""Deterministic-aggregation and array/text helper functions.

These keep the Spark plans and the DuckDB oracle SQL numerically
identical (SURVEY.md §7 pitfalls 1-4): decimal-exact sums, 6-decimal
rounding, epoch-nanosecond time arithmetic.
"""

from v6spark.functions.determinism import (
    davg,
    dround,
    dsum,
    o_davg,
    o_dround,
    o_dsum,
)
from v6spark.functions.arrays import arr_abs_sum, arr_dot, arr_norm

__all__ = [
    "dsum",
    "davg",
    "dround",
    "o_dsum",
    "o_davg",
    "o_dround",
    "arr_abs_sum",
    "arr_dot",
    "arr_norm",
]
