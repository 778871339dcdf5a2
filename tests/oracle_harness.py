"""Local replica of the driver's Spark-vs-DuckDB comparison.

Row count + column-name schema + order-insensitive multiset of
normalized row values.  Stricter than a hash: on mismatch it reports
the first differing rows for debugging.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def normalize_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(normalize_value(x) for x in v) + "]"
    return str(v)


def normalize_rows(columns: list[str], rows) -> list[tuple]:
    """Sort columns by name (driver behavior), normalize values,
    return a sorted multiset of row tuples."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(normalize_value(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def run_spark(spark, fn, sf_dir):
    df = fn(spark, sf_dir)
    return df.columns, [tuple(r) for r in df.collect()]


def run_duck(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _pandas_canonical(df) -> list[tuple]:
    """Mirror the driver's canonicalization: sort columns by name, sort
    rows via pandas ``sort_values`` (raises on list/array cells exactly
    like the driver), then normalize cell values dtype-sensitively —
    a float64 column of integral values renders "31019.0" while int64
    renders "31019", so DuckDB HUGEINT->float64 artifacts are caught.
    """
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(normalize_value(_to_py(v)) for v in row))
    return out


def _to_py(v):
    """numpy scalar -> python scalar, preserving int-vs-float dtype.

    Tz-naive midnight timestamps collapse to dates: DuckDB's pandas
    fetch renders DATE columns as datetime64, and the real driver
    passed q_date_funcs in r1, so its hash treats the two as equal.
    """
    if isinstance(v, datetime.datetime) and v.tzinfo is None:
        try:
            if v.time() == datetime.time(0, 0):
                return v.date()
        except ValueError:  # pd.NaT
            return None
    if hasattr(v, "item") and not isinstance(v, (bytes, str)):
        try:
            return v.item()
        except (AttributeError, ValueError):
            return v
    return v


def compare_pandas(spark, con, fn, sql, sf_dir) -> list[str]:
    """Driver-faithful comparison through the pandas fetch path."""
    problems: list[str] = []
    sdf = fn(spark, sf_dir).toPandas()
    ddf = con.execute(sql).df()
    if sorted(sdf.columns) != sorted(ddf.columns):
        return [f"schema: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"]
    try:
        s_norm = _pandas_canonical(sdf)
    except TypeError as e:  # unhashable/unsortable cell type == driver ERR
        return [f"spark result not pandas-canonicalizable (driver ERR): {e}"]
    try:
        d_norm = _pandas_canonical(ddf)
    except TypeError as e:
        return [f"oracle result not pandas-canonicalizable (driver ERR): {e}"]
    if len(s_norm) != len(d_norm):
        problems.append(f"rowcount: spark={len(s_norm)} duck={len(d_norm)}")
    if s_norm != d_norm:
        d_set = set(d_norm)
        s_set = set(s_norm)
        diff_s = [r for r in s_norm if r not in d_set][:3]
        diff_d = [r for r in d_norm if r not in s_set][:3]
        problems.append(
            f"pandas-path values differ (dtype-sensitive): "
            f"spark-only={diff_s} duck-only={diff_d}"
        )
    return problems


def compare(spark, con, fn, sql, sf_dir) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    s_cols, s_rows = run_spark(spark, fn, sf_dir)
    d_cols, d_rows = run_duck(con, sql)
    problems: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
    s_norm = normalize_rows(list(s_cols), s_rows)
    d_norm = normalize_rows(list(d_cols), d_rows)
    if s_norm != d_norm:
        diff_s = [r for r in s_norm if r not in set(d_norm)][:3]
        diff_d = [r for r in d_norm if r not in set(s_norm)][:3]
        problems.append(
            f"values: {sum(a != b for a, b in zip(s_norm, d_norm))} differing "
            f"positions; spark-only={diff_s} duck-only={diff_d} "
            f"(cols sorted: {sorted(s_cols)})"
        )
    return problems
