"""Sequence packing: fill fixed token-budget training bins (§2.2).

LLM pretraining consumes fixed-length sequences; feeding one short
document per sequence wastes most of the context window, so pipelines
PACK documents into bins of at most ``max_tokens`` tokens.  Optimal
bin packing is NP-hard and inherently sequential — the distributed
compromise here is the standard one:

1. Deterministically scatter documents into ``n_groups`` independent
   packing groups (``pmod(xxhash64(doc), n_groups)`` — reproducible,
   no RNG, balanced by the hash).
2. Pack each group independently with first-fit-decreasing (FFD)
   inside one ``applyInPandas`` call — the only Python stage, Arrow-
   batched, O(group) memory.  FFD's fill rate is provably >= 8/9 of
   optimal asymptotically; group independence costs at most one
   under-filled bin per group, negligible when groups hold thousands
   of documents.
3. Bin ids are globally unique without coordination:
   ``group * 2^40 + local_index``.

At 100 TB the shuffle moves only (doc_id, n_tokens) — packing never
touches document bodies; join the assignment back to the corpus on
doc_id afterwards.

Documents larger than the budget get a bin of their own and
``oversize = true`` so the caller can route them to a splitter.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GROUP_SHIFT = 1 << 40  # bins per group headroom; ids stay < 2^63


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    doc_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_groups: int = 32,
) -> DataFrame:
    """Assign every document to a training bin of <= ``max_tokens``.

    Returns (doc_col, tokens_col, bin_id long, oversize boolean); the
    assignment is deterministic in (doc ids, token counts, n_groups).
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if n_groups <= 0:
        raise ValueError("n_groups must be positive")

    narrow = df.select(
        F.col(doc_col).alias("doc"),
        F.col(tokens_col).cast("long").alias("toks"),
        F.pmod(F.xxhash64(doc_col), F.lit(n_groups)).cast("int").alias("grp"),
    )

    out_schema = (
        f"doc {dict(narrow.dtypes)['doc']}, toks long, grp int, "
        "bin_local long, oversize boolean"
    )

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # First-fit-decreasing; deterministic total order via the
        # doc id tie-break.  remaining[] is O(bins) and bins <= docs.
        pdf = pdf.sort_values(["toks", "doc"], ascending=[False, True])
        remaining: list[int] = []
        assigned: list[int] = []
        oversize: list[bool] = []
        for t in pdf["toks"]:
            t = int(t)
            if t > max_tokens:
                assigned.append(len(remaining))
                remaining.append(0)  # full: nothing else joins this bin
                oversize.append(True)
                continue
            for i, r in enumerate(remaining):
                if r >= t:
                    remaining[i] = r - t
                    assigned.append(i)
                    break
            else:
                assigned.append(len(remaining))
                remaining.append(max_tokens - t)
            oversize.append(False)
        pdf = pdf.assign(bin_local=assigned, oversize=oversize)
        return pdf

    packed = narrow.groupBy("grp").applyInPandas(pack_group, schema=out_schema)
    return packed.select(
        F.col("doc").alias(doc_col),
        F.col("toks").alias(tokens_col),
        (F.col("grp").cast("long") * F.lit(_GROUP_SHIFT) + F.col("bin_local")).alias(
            "bin_id"
        ),
        "oversize",
    )


def assign_shards(
    df: DataFrame,
    key: str,
    n_shards: int,
    seed: int = 0,
    out: str = "shard",
) -> DataFrame:
    """Deterministic shard + within-shard training order for a corpus.

    The last step before a corpus ships to trainers: rows are dealt
    into ``n_shards`` by keyed hash (same guarantees as the sampling
    operators — reruns, repartitioning, and cluster size cannot move
    a row), and ``_order`` gives a reproducible pseudo-random reading
    order WITHIN each shard (a second, independent keyed hash, key
    tie-break so the order is total).  A global ORDER BY over 100 TB
    is one giant range shuffle; per-shard ordering scales out instead
    — each shard sorts independently and trainers read shards in any
    order.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    c = F.col(key)
    return df.withColumns(
        {
            out: F.pmod(F.xxhash64(F.lit(seed), c), F.lit(n_shards)).cast("int"),
            "_order": F.xxhash64(F.lit(seed + 1), c),
        }
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str = "doc_id",
    n_shards: int = 32,
    seed: int = 0,
    mode: str = "error",
) -> None:
    """Write the corpus as ``shard=K/`` parquet directories, one file
    per shard, rows in the deterministic per-shard training order.

    ``repartition(n_shards, shard)`` hash-co-locates each shard label
    (a shard never splits across files; label collisions merely share
    a file's directory fan-out), and ``sortWithinPartitions`` streams
    the order without a global sort.  Rerunning the write yields
    byte-identical shard contents — resumable corpus publishing.
    """
    sharded = assign_shards(df, key, n_shards, seed=seed)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "_order", key)
        .drop("_order")
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )


def packing_stats(
    packed: DataFrame, max_tokens: int, tokens_col: str = "n_tokens"
) -> DataFrame:
    """One-row summary: bins, docs, mean/min fill rate of regular bins.

    Oversize single-doc bins are excluded from fill statistics — they
    are a routing signal, not a packing outcome.
    """
    bins = (
        packed.filter(~F.col("oversize"))
        .groupBy("bin_id")
        .agg(F.sum(tokens_col).alias("bin_tokens"))
    )
    fill = F.col("bin_tokens") / F.lit(float(max_tokens))
    return bins.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.round(F.avg(fill), 6).alias("mean_fill"),
        F.round(F.min(fill), 6).alias("min_fill"),
        F.round(F.max(fill), 6).alias("max_fill"),
    )
