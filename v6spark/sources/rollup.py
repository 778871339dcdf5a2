"""Materialized rollup views with incremental, partition-wise refresh.

The hypertable "continuous aggregate" analog, Spark-first: a rollup
view is a directory-partitioned parquet table of pre-aggregated
results plus a freshness manifest recording, per partition, a
fingerprint of the source files it was built from.  ``refresh``
recomputes ONLY the partitions whose source fingerprint changed —
on a date- or chrom-partitioned 100 TB store that is the difference
between re-aggregating one day and re-aggregating the table.

Correct-by-construction: aggregates are recomputed from source per
stale partition (never merged incrementally), so any aggregate
expression is allowed — including non-decomposable ones — and a
partition's rollup is always exactly "group the source partition".
The partition column must therefore be (a prefix of) the grouping
keys.

No wall-clock anywhere: freshness is content fingerprints (file
name + size + mtime), so rebuilds are deterministic and testable.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_rollup_manifest.json"


def _partition_fingerprints(source_dir: str, partition_col: str) -> dict[str, str]:
    """value -> fingerprint of the source files under each partition
    directory (``col=value`` layout, the write_partitioned contract)."""
    out: dict[str, str] = {}
    prefix = f"{partition_col}="
    for entry in sorted(os.listdir(source_dir)):
        full = os.path.join(source_dir, entry)
        if not (entry.startswith(prefix) and os.path.isdir(full)):
            continue
        parts = []
        for root, _, files in sorted(os.walk(full)):
            for f in sorted(files):
                if f.startswith(("_", ".")):
                    continue
                st = os.stat(os.path.join(root, f))
                parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
        out[entry[len(prefix):]] = "|".join(parts)
    return out


def _manifest_path(view_dir: str) -> str:
    return os.path.join(view_dir, MANIFEST)


def read_manifest(view_dir: str) -> dict:
    p = _manifest_path(view_dir)
    if not os.path.exists(p):
        return {"partitions": {}}
    with open(p) as fh:
        return json.load(fh)


def refresh_rollup(
    spark: SparkSession,
    source_dir: str,
    view_dir: str,
    partition_col: str,
    agg_fn,
    full: bool = False,
) -> list[str]:
    """Bring the rollup view up to date; returns refreshed partitions.

    ``agg_fn(df) -> DataFrame`` states the rollup over a source
    DataFrame and must keep ``partition_col`` in its output (it is
    the view's partition column too).  Only partitions whose source
    fingerprint differs from the manifest are recomputed; their view
    directories are replaced atomically-enough via Spark's dynamic
    partition overwrite (untouched partitions keep their files).
    """
    current = _partition_fingerprints(source_dir, partition_col)
    manifest = {} if full else read_manifest(view_dir)["partitions"]
    stale = [v for v, fp in current.items() if manifest.get(v) != fp]
    dropped = [v for v in manifest if v not in current]
    if stale:
        src = spark.read.option("basePath", source_dir).parquet(
            *[os.path.join(source_dir, f"{partition_col}={v}") for v in stale]
        )
        out = agg_fn(src)
        if partition_col not in out.columns:
            raise ValueError(
                f"agg_fn must retain the partition column {partition_col!r}"
            )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(view_dir)
        )
    for v in dropped:
        import shutil

        shutil.rmtree(
            os.path.join(view_dir, f"{partition_col}={v}"), ignore_errors=True
        )
    new_manifest = {"partitions": current}
    os.makedirs(view_dir, exist_ok=True)
    with open(_manifest_path(view_dir), "w") as fh:
        json.dump(new_manifest, fh, indent=1, sort_keys=True)
    return sorted(stale)


def read_rollup(spark: SparkSession, view_dir: str) -> DataFrame:
    """Read the materialized view (lazy scan; partition pruning on the
    view's partition column works exactly as on any parquet table)."""
    return spark.read.parquet(view_dir)


def is_fresh(source_dir: str, view_dir: str, partition_col: str) -> bool:
    """True iff every source partition's fingerprint matches the
    manifest (i.e. a refresh would be a no-op)."""
    return _partition_fingerprints(source_dir, partition_col) == read_manifest(
        view_dir
    )["partitions"]


def refresh_distinct_rollup(
    spark: SparkSession,
    source_dir: str,
    view_dir: str,
    partition_col: str,
    col: str,
    group_cols: tuple[str, ...] | list[str] = (),
    p: int = 12,
    full: bool = False,
) -> list[str]:
    """Continuous aggregate for DISTINCT COUNTS — the case exact
    rollups cannot serve: ``count(distinct)`` over several partitions
    is not the sum of per-partition counts, but it IS the merge of
    per-partition HLL registers (operators/sketches.py).  The view
    materializes register rows per (partition, group); refresh
    re-sketches ONLY partitions whose source fingerprint changed,
    exactly like any other rollup.
    """
    from v6spark.operators.sketches import hll_sketch

    return refresh_rollup(
        spark,
        source_dir,
        view_dir,
        partition_col,
        lambda df: hll_sketch(df, col, [partition_col, *group_cols], p=p),
        full=full,
    )


def read_distinct_rollup(
    spark: SparkSession,
    view_dir: str,
    group_cols: tuple[str, ...] | list[str] = (),
    p: int = 12,
    partitions: list | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """Distinct-count estimates from a materialized register view,
    merged over any partition subset (``partitions`` prunes at the
    parquet scan; pass ``partition_col`` with it).  Registers from a
    refresh are bit-identical to sketching the source directly, so
    estimates carry the sketch's published error and nothing else."""
    from pyspark.sql import functions as F

    from v6spark.operators.sketches import hll_estimate

    regs = read_rollup(spark, view_dir)
    if partitions is not None:
        if partition_col is None:
            raise ValueError("partitions subset requires partition_col")
        regs = regs.filter(F.col(partition_col).isin(list(partitions)))
    return hll_estimate(regs, list(group_cols), p=p)
