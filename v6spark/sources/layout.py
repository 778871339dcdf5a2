"""Physical-layout helpers: bucketing and partitioned writes.

The two storage-side levers that remove shuffles/scans BEFORE a query
runs (SURVEY.md §2.2 scale posture):

- **Bucketing** pre-shuffles a table by its join/agg key at write
  time.  Two tables bucketed the same way join with NO exchange on
  either side — at 100 TB this turns every repeated fact-fact join
  (lineitem ⋈ orders every day) from the dominant shuffle into a
  local merge.  Spark requires the metastore path (saveAsTable) for
  bucket metadata.
- **Partitioned writes** (`partitionBy`) turn predicate pushdown into
  file pruning: a chrom- or date-partitioned store serves region
  queries by reading only matching directories (PartitionFilters in
  the scan, verified by tests).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    mode='overwrite' drops any existing table AND its warehouse
    directory (the default in-memory catalog forgets tables between
    sessions but leaves their locations behind).  Other modes refuse
    an orphaned location loudly — appending into a directory whose
    bucket metadata is no longer in the catalog would corrupt the
    bucketing contract silently.
    """
    spark = df.sparkSession
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        if os.path.exists(loc):
            shutil.rmtree(loc)
    elif not spark.catalog.tableExists(table) and os.path.exists(loc):
        raise ValueError(
            f"orphaned warehouse location {loc} for table {table!r} "
            "(written by a previous session); its bucket metadata is "
            "lost — use mode='overwrite' or remove the directory"
        )
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables — planner elides both exchanges.

    Hinted merge: at toy scale AQE would broadcast the smaller side
    (also fine, but it bypasses the co-located path this helper
    exists to provide); at fact-fact scale SMJ is what the planner
    picks anyway, and bucketing removes both shuffles from it.
    """
    return spark.table(left_table).join(
        spark.table(right_table).hint("merge"), on
    )


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet (the chrom-partitioned Zarr-store
    analog: ``variation6/in_out/zarr.py::save_zarr`` + region pruning).
    """
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def zorder_key(cols: list, bits: int = 16, bounds: dict | None = None):
    """Morton (Z-order) key expression over bucketed columns.

    Each column is first normalized to ``bits`` levels, then the bit
    planes interleave: key = sum over bit j, column i of
    ``bucket_i[j] << (j * n_cols + i)``.  Pure Catalyst — the key is
    computed in the scan stage.  ``bits`` is clamped so the
    interleaved key fits one signed 64-bit long (``n_cols * bits <=
    62``); more columns mean fewer levels each, never wrapped shifts.

    Normalization: with ``bounds`` = {col: (lo, hi)} the bucket is a
    linear map over the given range (the SCALABLE mode — bounds come
    from one min/max agg or a sampled quantile pass, no global
    window); without, ``percent_rank`` over a global window (exact
    skew resistance, but the window sorts the key columns through a
    single partition — fine up to medium scale, not at 100 TB).
    """
    from pyspark.sql import Window

    n = len(cols)
    # the interleaved key lives in ONE signed 64-bit long: shifts past
    # bit 62 would wrap (JVM shift is mod 64) and silently collide bit
    # planes — clamp levels so n_cols * bits never exceeds the budget
    bits = max(1, min(bits, 62 // n))
    exprs = []
    for i, c in enumerate(cols):
        if bounds is not None:
            lo, hi = bounds[c]
            span = (hi - lo) or 1.0
            frac = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(float(span))
            rank = F.greatest(F.least(frac, F.lit(1.0)), F.lit(0.0))
        else:
            rank = F.percent_rank().over(Window.orderBy(F.col(c)))
        bucket = F.least(
            (rank * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
        )
        for j in range(bits):
            exprs.append(
                F.shiftleft(
                    F.shiftright(bucket, j).bitwiseAND(F.lit(1)),
                    j * n + i,
                )
            )
    key = exprs[0]
    for e in exprs[1:]:
        key = key + e
    return key


#: distinct-value cap for dictionary-rank normalization of string
#: cluster columns — 2^16 ranks, far above any categorical layout key
#: (lang, source, host bucket); higher-cardinality strings should be
#: clustered via a derived numeric column instead
ZORDER_DICT_MAX = 65536

_ZORDER_NUMERIC = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
}


def cluster_surrogates(
    df: DataFrame, cols: list, types: dict, max_dict: int = ZORDER_DICT_MAX
):
    """Numeric surrogate columns for Z-order clustering over MIXED
    column types — the normalization layer that lets
    ``compact_published(cluster_by=["lang", "day"])`` interleave a
    string with a date with a long.

    Per column type:

    - numeric: used as-is (bounds from the caller's min/max agg);
    - date / timestamp: a derived double column (days / epoch
      seconds) — order-preserving, so range predicates prune;
    - string: DICTIONARY RANK — the distinct values (capped at
      ``max_dict``; beyond it raises, honestly, rather than silently
      degrading) are sorted and broadcast-joined back as a dense rank
      with known bounds (0, n-1).  Lexicographic rank preserves
      order, so both ``lang = 'fr'`` and ``host >= 'm'`` prune the
      clustered files.  Scale shape: the distinct is a shuffle whose
      OUTPUT is the dictionary (KBs for categorical keys); the join
      is broadcast — nothing driver-sized beyond the dictionary.

    Returns ``(df, surrogate_cols, bounds, drop_cols)``: ``bounds``
    maps each surrogate to (lo, hi) where knowable without an agg
    (dictionary ranks); the caller aggregates min/max for the rest.
    NULLs rank below everything (coalesced to -1 / the numeric path's
    caller-side null handling), matching col_stats semantics where
    NULL satisfies no comparison.
    """
    surrogates: list[str] = []
    bounds: dict[str, tuple] = {}
    drop: list[str] = []
    for i, c in enumerate(cols):
        t = (types.get(c) or "").lower()
        if t in _ZORDER_NUMERIC:
            surrogates.append(c)
            continue
        sc = f"__zc_{i}"
        if t == "date":
            df = df.withColumn(
                sc, F.datediff(F.col(c), F.lit("1970-01-01"))
                .cast("double")
            )
        elif t.startswith("timestamp"):
            df = df.withColumn(sc, F.col(c).cast("double"))
        elif t == "string":
            spark = df.sparkSession
            vals = [
                r[0] for r in df.select(c).distinct()
                .limit(max_dict + 1).collect()
                if r[0] is not None
            ]
            if len(vals) > max_dict:
                raise ValueError(
                    f"cluster_by column {c!r} has more than {max_dict} "
                    "distinct values — dictionary Z-order targets "
                    "categorical keys (lang, source, host bucket); "
                    "cluster on a derived numeric column instead"
                )
            vals.sort()
            rank_df = spark.createDataFrame(
                [(v, float(r)) for r, v in enumerate(vals)],
                f"`{c}` string, `{sc}` double",
            )
            df = df.join(F.broadcast(rank_df), on=c, how="left")
            df = df.withColumn(sc, F.coalesce(F.col(sc), F.lit(-1.0)))
            bounds[sc] = (0.0, float(max(len(vals) - 1, 1)))
        else:
            raise ValueError(
                f"cluster_by column {c!r} has type {t!r}; Z-order "
                "clustering supports numeric, string, date, and "
                "timestamp columns"
            )
        surrogates.append(sc)
        drop.append(sc)
    return df, surrogates, bounds, drop


def write_zordered(
    df, path: str, cols: list, n_files: int = 16, bits: int = 16,
    mode: str = "error", bounds: str | dict | None = None,
) -> None:
    """Write parquet clustered along the Z-order curve of ``cols``.

    ``repartitionByRange`` on the Morton key gives each output file a
    compact curve segment, so every file's per-column min/max footer
    ranges are TIGHT RECTANGLES: a multi-column range predicate
    prunes most files at planning time (parquet row-group stats),
    where a linear sort on one column only prunes that column.
    The measured file-skip evidence lives in AB_ZORDER.json
    (scripts/zorder_ab.py).

    ``bounds``: None uses exact percent_rank (single-partition sort
    of the key columns — fine to medium scale); ``"minmax"`` runs ONE
    min/max aggregation and linearly buckets (the 100 TB mode — no
    global window; right for roughly uniform keys, skew collapses
    levels); a {col: (lo, hi)} dict uses caller-supplied (e.g.
    sampled-quantile) bounds.  The curve math is identical in all
    three.
    """
    b = None
    if bounds == "minmax":
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
        row = df.agg(*aggs).collect()[0]
        b = {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}
    elif isinstance(bounds, dict):
        b = bounds
    keyed = df.withColumn("__z", zorder_key(cols, bits, bounds=b))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
