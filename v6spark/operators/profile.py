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
    # Positional rename first: name-based references would misparse
    # dotted names ("user.id") as nested fields, and duplicate column
    # names (post-join frames) are ambiguous — toDF renames by
    # position without parsing, so every column gets its own stats
    names_types = df.dtypes
    df = df.toDF(*[f"__c{i}" for i in range(len(names_types))])
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (name, dtype) in enumerate(names_types):
        c = df[f"__c{i}"]
        aggs.append(F.count_if(c.isNull()).alias(f"__nulls_{i}"))
        aggs.append(F.approx_count_distinct(c, rsd=approx_rsd).alias(f"__dist_{i}"))
        if dtype.startswith(("array", "map", "struct", "binary")):
            aggs.append(F.lit(None).cast("string").alias(f"__min_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{i}"))
        else:
            aggs.append(F.min(c).cast("string").alias(f"__min_{i}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{i}"))
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    spark = df.sparkSession
    out = [
        (
            name,
            dtype,
            n,
            row[f"__nulls_{i}"],
            round(row[f"__nulls_{i}"] / n, 6) if n else None,
            row[f"__dist_{i}"],
            row[f"__min_{i}"],
            row[f"__max_{i}"],
        )
        for i, (name, dtype) in enumerate(names_types)
    ]
    return spark.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nulls long, "
        "null_rate double, approx_distinct long, min_repr string, "
        "max_repr string",
    )
