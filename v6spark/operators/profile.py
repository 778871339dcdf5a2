"""Dataset profiling — per-column statistics in one pass.

The pipeline-hygiene operator every large-scale ingest runs before
anything else: null rates, distinct-count estimates, min/max, per
column, computed in a SINGLE aggregation job (one scan) and returned
in long format (column_name -> stats) so it composes with the rest of
the engine.

Distinct counts use HyperLogLog (``approx_count_distinct``) —
deliberately, and unlike everything in plans/: a profile is advisory,
and exact distinct per column would cost one shuffle per column.
rsd=0.01 keeps the estimate within ~1%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, approx_rsd: float = 0.01) -> DataFrame:
    """One-pass per-column profile, long format.

    Returns (column, dtype, n_rows, n_nulls, null_rate,
    approx_distinct, min_repr, max_repr); min/max as strings so mixed
    column types fit one result schema.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, dtype in df.dtypes:
        c = F.col(name)
        aggs.append(F.count_if(c.isNull()).alias(f"__nulls_{name}"))
        aggs.append(
            F.approx_count_distinct(name, rsd=approx_rsd).alias(f"__dist_{name}")
        )
        if dtype.startswith(("array", "map", "struct", "binary")):
            aggs.append(F.lit(None).cast("string").alias(f"__min_{name}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{name}"))
        else:
            aggs.append(F.min(c).cast("string").alias(f"__min_{name}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{name}"))
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    spark = df.sparkSession
    out = [
        (
            name,
            dtype,
            n,
            row[f"__nulls_{name}"],
            round(row[f"__nulls_{name}"] / n, 6) if n else None,
            row[f"__dist_{name}"],
            row[f"__min_{name}"],
            row[f"__max_{name}"],
        )
        for name, dtype in df.dtypes
    ]
    return spark.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nulls long, "
        "null_rate double, approx_distinct long, min_repr string, "
        "max_repr string",
    )
