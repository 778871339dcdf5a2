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
