"""Array-column reductions via Spark higher-order functions.

The reference reduces dense per-variant vectors (allele depths AD,
read counts RO/AO) along the allele axis with NumPy/Dask elementwise
ops (``variation6/stats::calc_maf_by_allele_count`` — SURVEY.md §2.1
C5).  Here the vectors are ``array<float>`` columns and the reductions
are Catalyst higher-order functions (``aggregate`` / ``zip_with``) —
JVM-side, codegen'd, no Python in the loop.

All folds accumulate in DOUBLE and run sequentially left-to-right,
which makes them bitwise-reproducible for a given array.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def arr_abs_sum(col: Column | str) -> Column:
    """Sum of absolute values of an array<numeric> column, as DOUBLE."""
    return F.aggregate(
        _c(col),
        F.lit(0.0),
        lambda acc, x: acc + F.abs(x.cast("double")),
    )


def arr_sum(col: Column | str) -> Column:
    """Sequential-fold sum of an array<numeric> column, as DOUBLE."""
    return F.aggregate(
        _c(col), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )


def arr_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length numeric arrays, as DOUBLE."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def arr_norm_sq(col: Column | str) -> Column:
    """Squared L2 norm of a numeric array, as DOUBLE."""
    return F.aggregate(
        _c(col),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )


def arr_dot_sql(a: str, b: str) -> str:
    """Spark-SQL string twin of :func:`arr_dot` — for SQL-string
    expression building (each Column node costs a py4j round trip;
    a lambda-bearing HOF costs ~25 — the r12 build profile measured
    ~0.27 s of pure driver chatter per ``ann_lsh_pairs`` plan build).
    Kept textually in lockstep with arr_dot: same fold direction, same
    DOUBLE casts, same 0.0 DOUBLE init, so the IEEE operation sequence
    is identical (asserted in tests/test_dedup_similarity.py)."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        "(x, y) -> cast(x as double) * cast(y as double)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def arr_norm_sq_sql(col: str) -> str:
    """Spark-SQL string twin of :func:`arr_norm_sq` (see
    :func:`arr_dot_sql` for why the twins exist)."""
    return (
        f"aggregate({col}, 0.0D, "
        "(acc, x) -> acc + cast(x as double) * cast(x as double))"
    )


def arr_norm(col: Column | str) -> Column:
    """L2 norm of a numeric array, as DOUBLE."""
    return F.sqrt(arr_norm_sq(col))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity dot/(||a||*||b||), all-DOUBLE arithmetic.

    Written as dot / (sqrt(na) * sqrt(nb)) — the oracle SQL uses the
    textually identical formula so both engines execute the same IEEE
    operation sequence.
    """
    return arr_dot(a, b) / (F.sqrt(arr_norm_sq(a)) * F.sqrt(arr_norm_sq(b)))
