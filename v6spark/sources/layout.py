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
