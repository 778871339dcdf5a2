"""Deterministic sampling and dataset-split operators (SURVEY.md §2.2).

A training-data pipeline needs reproducible subsets: train/valid/test
splits that never move a document between splits across reruns,
samples that are stable under repartitioning and cluster resizing,
and per-stratum quotas that are exact rather than expected-value.
Spark's built-in ``df.sample``/``sampleBy`` are none of these — they
seed a per-partition RNG, so the selected rows change whenever the
partitioning does.

Everything here keys the decision on ``xxhash64(seed, key)`` instead:

- ``hash_split`` / ``split_frames`` — narrow map-only split
  assignment (zero shuffles; at 100 TB it costs exactly one scan).
- ``hash_sample`` — Bernoulli-style fraction sample by hash
  threshold; samples are NESTED (frac 0.1 ⊆ frac 0.5 for the same
  seed), which makes growing a pilot corpus monotone.
- ``stratified_sample_exact`` — exactly ``n`` rows per stratum,
  picked in deterministic hash order via a ranking window (one
  shuffle on the strata; per-stratum sort spills gracefully at
  scale because row_number needs no full-group buffer).

Reference parity note: variation6 exposes random_subset-style helpers
only implicitly (NumPy slicing in user code); these operators are the
engine-level replacements a distributed pipeline requires.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Hash buckets for split/threshold arithmetic.  2^20 buckets keeps
# every threshold an exact integer (no float boundary ambiguity) while
# giving ~1e-6 granularity on requested fractions.
_BUCKETS = 1 << 20


def _bucket(key: Column | str, seed: int) -> Column:
    """Uniform bucket in [0, _BUCKETS) from a 64-bit keyed hash."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(F.lit(seed), c), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame,
    key: Column | str,
    weights: dict[str, float],
    seed: int = 0,
    out: str = "split",
) -> DataFrame:
    """Assign each row a split label by deterministic hash of ``key``.

    ``weights`` maps label -> relative weight (normalized internally).
    The assignment depends only on (seed, key value): reruns, shuffles,
    repartitioning, and cluster size cannot move a row between splits,
    and all rows sharing a key (e.g. all chunks of one document) land
    in the same split — the leakage guarantee train/test splits need.

    Narrow transformation: no shuffle, no RNG, whole-stage codegen.
    """
    if not weights:
        raise ValueError("weights must be a non-empty {label: weight} dict")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    labels = list(weights)
    # Integer cumulative thresholds; the final one is pinned to
    # _BUCKETS so the ranges cover [0, _BUCKETS) exactly.
    thresholds: list[int] = []
    acc = 0.0
    for lbl in labels:
        acc += weights[lbl] / total
        thresholds.append(min(_BUCKETS, int(acc * _BUCKETS)))
    thresholds[-1] = _BUCKETS

    b = _bucket(key, seed)
    expr = F.lit(labels[-1])
    for lbl, hi in zip(reversed(labels[:-1]), reversed(thresholds[:-1])):
        expr = F.when(b < hi, F.lit(lbl)).otherwise(expr)
    return df.withColumn(out, expr)


def split_frames(
    df: DataFrame,
    key: Column | str,
    weights: dict[str, float],
    seed: int = 0,
) -> dict[str, DataFrame]:
    """``hash_split`` materialized as one filtered DataFrame per label.

    Each frame re-derives the label from the hash, so the split column
    never needs to be persisted; Catalyst pushes the filter into the
    scan of each branch.
    """
    tagged = hash_split(df, key, weights, seed=seed, out="__split")
    return {
        lbl: tagged.filter(F.col("__split") == lbl).drop("__split")
        for lbl in weights
    }


def split_leakage_report(
    assignments: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs whose endpoints landed in DIFFERENT splits.

    The post-pipeline leakage audit: dedup-before-split
    (pipeline.prepare_training_corpus) exists precisely so no
    duplicate pair straddles train/eval; this report states the
    verified fact.  ``pairs`` is any pair relation over surviving ids
    (LSH candidates, ``simhash_pairs``, ANN pairs); output columns
    are (id_a, id_b, split_a, split_b) and an EMPTY result is the
    pass condition.  Two joins of the narrow (id, split) relation
    onto the pair list — pair-count sized, never corpus sized.
    """
    a = assignments.select(
        F.col(id_col).alias(id_a), F.col(split_col).alias("split_a")
    )
    b = assignments.select(
        F.col(id_col).alias(id_b), F.col(split_col).alias("split_b")
    )
    return (
        pairs.join(a, id_a)
        .join(b, id_b)
        .filter(F.col("split_a") != F.col("split_b"))
        .select(id_a, id_b, "split_a", "split_b")
    )


def hash_sample(
    df: DataFrame,
    key: Column | str,
    fraction: float,
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose keyed hash
    falls below ``fraction`` of the bucket space.

    Nested-sample property: for a fixed seed, the ``fraction=p``
    sample is a subset of the ``fraction=q`` sample whenever p <= q —
    so a 1% pilot can be grown to 10% without re-selecting anything.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_bucket(key, seed) < int(fraction * _BUCKETS))


def rebalance_mix(
    df: DataFrame,
    stratum_col: str,
    target_weights: dict[str, float],
    key: Column | str,
    seed: int = 0,
) -> DataFrame:
    """Downsample strata so their proportions match ``target_weights``
    while keeping as many rows as possible.

    The pretraining "domain mix" operation: given e.g. ``{"web": .8,
    "books": .1, "code": .1}`` over a ``source`` column, find the
    largest total T with ``p_s * T <= |s|`` for every stratum
    (T = min |s|/p_s — the scarcest stratum binds), then keep a
    deterministic hash-sample of each stratum at rate ``p_s * T /
    |s|``.  Strata absent from ``target_weights`` are dropped.

    Scale shape: one partial+final count per stratum (the only
    pre-pass, stratum-count-sized result on the driver), then ONE
    narrow map-only filter — per-row cost is a hash compare against
    the row's stratum threshold via a broadcast-sized CASE.  The
    nested-sample property of :func:`hash_sample` carries over: for a
    fixed seed, tightening a stratum's share only shrinks (never
    re-selects) its sample.

    Expected-value caveat: hash sampling hits each rate in
    expectation, not exactly; use :func:`stratified_sample_exact`
    when per-stratum counts must be exact.
    """
    total_w = float(sum(target_weights.values()))
    if total_w <= 0:
        raise ValueError("target_weights must sum to a positive value")
    props = {s: w / total_w for s, w in target_weights.items()}
    counts = {
        r[stratum_col]: r["n"]
        for r in df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[stratum_col] in props
    }
    missing = [s for s in props if s not in counts]
    if missing:
        raise ValueError(f"strata absent from the data: {sorted(missing)}")
    t_max = min(counts[s] / p for s, p in props.items() if p > 0)
    rates = {
        s: min(1.0, (props[s] * t_max) / counts[s]) if counts[s] else 0.0
        for s in props
    }

    threshold = None
    for s, rate in rates.items():
        cond, cut = F.col(stratum_col) == s, F.lit(int(rate * _BUCKETS))
        threshold = (
            F.when(cond, cut) if threshold is None else threshold.when(cond, cut)
        )
    threshold = threshold.otherwise(F.lit(-1))  # unknown stratum: drop
    return df.filter(_bucket(key, seed) < threshold)


def stratified_sample_exact(
    df: DataFrame,
    strata: Sequence[str],
    n_per_stratum: int,
    key: Column | str,
    seed: int = 0,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministic.

    Rows within a stratum are ranked by (keyed hash, key) — the key
    tie-break makes the order total even under hash collisions — and
    the first ``n_per_stratum`` kept.  One shuffle (hash-partition on
    the strata); ``row_number`` streams each sorted group, so no
    full-group buffer is held (scale-safe for huge strata, unlike a
    collect-and-slice design).
    """
    if n_per_stratum <= 0:
        raise ValueError("n_per_stratum must be positive")
    c = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(*strata).orderBy(_bucket(key, seed).asc(), c.asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )
