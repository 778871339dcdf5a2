"""Row-wise transforms (SURVEY.md §2.1 B3-B6).

All pure Catalyst expressions (CASE WHEN / map literals) — narrow ops
that fuse into whole-stage codegen with the scan; zero shuffles.
"""

from __future__ import annotations

import weakref
from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import when


def mask_low(df: DataFrame, value: str, threshold: float, out: str | None = None) -> DataFrame:
    """Set ``value`` to NULL where it is below ``threshold``.

    ``variation6/filters.py::min_depth_gt_to_missing`` (B4) /
    ``min_qual_gt_to_missing`` (B5): genotypes backed by low
    depth/quality become missing.  Sentinel (-1) encoding from the
    reference is normalized to native NULL (SURVEY.md §1.1).
    """
    out = out or value
    v = F.col(value)
    return df.withColumn(out, when(v < threshold, F.lit(None)).otherwise(v))


def recode(
    df: DataFrame, col: str, mapping: Mapping[str, int], out: str
) -> DataFrame:
    """Map a categorical column through a small code table.

    ``variation6::gts_as_mat012`` (B6): genotypes to {0,1,2} dosage.
    Emitted as a CASE expression so Catalyst constant-folds it; a join
    against a broadcast code table would also work but is overkill for
    literal maps.
    """
    expr: Column = F.lit(None)
    for k, v in mapping.items():
        expr = when(F.col(col) == k, F.lit(v)).otherwise(expr)
    return df.withColumn(out, expr.cast("int"))


def subset_entities(
    df: DataFrame, key: str, keep: Iterable[int | str], reverse: bool = False
) -> DataFrame:
    """Keep (or drop) rows whose ``key`` is in the literal set.

    ``variation6/filters.py::filter_samples`` (B3): sample subsetting.
    For literal lists an IN predicate pushes to the parquet scan; for a
    large keep-set use a broadcast semi-join instead (see
    ``subset_entities_df``).
    """
    cond = F.col(key).isin(list(keep))
    return df.filter(~cond if reverse else cond)


def subset_entities_df(
    df: DataFrame, key: str, keep: DataFrame, reverse: bool = False
) -> DataFrame:
    """Semi/anti-join form of sample subsetting for non-literal sets."""
    how = "left_anti" if reverse else "left_semi"
    return df.join(F.broadcast(keep), on=key, how=how)


#: frames already spread (or probed as wide enough) this session,
#: mapped to their known partition-count floor — library entry points
#: defensively spread their input, so a plan fn that already spread
#: passes the SAME object back in; re-probing it would re-run full
#: plan analysis (``df.rdd`` converts the lineage, ~0.2 s cold PER
#: CALL) for a guaranteed no-op.  Weak keys: entries die with the
#: DataFrame, nothing pins query plans in memory.
_SPREAD_DONE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def spread_small_input(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a small-split scan before expensive
    per-row compute; no-op when the scan already has enough splits.

    The classic small-files fix: a single-row-group parquet file (or
    one small .gz shard) arrives as ONE input split, so a narrow but
    CPU-heavy stage (signature folds, per-token hashing) runs on one
    core no matter how many executors exist.  Redistributing a small
    input is a trivially cheap shuffle; at real scale the scan already
    has >= cores splits and this is a no-op, so the plan is identical
    where it matters.  Measured 4x on the sf0.1 documents table
    (one row group) for the SimHash fold on local[32].

    Idempotent at zero cost: a frame this function already returned
    (or probed) skips the ``df.rdd`` partition-count probe — that
    probe is a full plan analysis, and double-spreading is the normal
    shape when both a query fn and the operator it calls defensively
    spread the same input.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if _SPREAD_DONE.get(df, 0) >= target:
        return df
    n = df.rdd.getNumPartitions()
    if n < target:
        out = df.repartition(target)
        _SPREAD_DONE[out] = target
        return out
    _SPREAD_DONE[df] = n
    return df
