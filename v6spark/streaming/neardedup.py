"""Incremental streaming NEAR-dedup against a persistent signature index.

``deduped_stream`` (streaming/events.py) removes EXACT key duplicates
within a watermark horizon; this module removes NEAR duplicates across
the whole ingest history — the production pattern for continuously
ingesting a training corpus: each micro-batch is checked against the
signature index of everything kept so far, survivors append their
signatures, losers never reach the sink.

Why foreachBatch rather than applyInPandasWithState: Hamming-ball
matching needs each document checked in radius+1 band buckets AND a
per-document verdict aggregated across those buckets — two stateful
exchanges per batch, which Structured Streaming's single-stateful-
operator chaining rules don't express.  foreachBatch runs the batch
Hamming-ball operators (``simhash_pairs`` within the batch,
``simhash_pairs_between`` against the index) with exactly-once
checkpointing, which is precisely what they are built for.

Semantics (deterministic, order-greedy): a document is dropped iff it
has a neighbour within ``radius`` among (a) previously KEPT documents
(any batch order: the index only contains survivors) or (b) a
SMALLER-id document in its own batch.  Within a batch this is the
"any smaller near-neighbour loses" rule — on a chain a<b<c with pairs
(a,b),(b,c) both b and c drop, which is the conservative choice for
training-data dedup (never keeps two near-dups).

Index growth is the deployment's retention policy: at 100 TB the
index partition-compacts by time (drop signatures older than the
contamination horizon) exactly like a watermark; signatures are 16
bytes/doc so a 10B-doc index is ~160 GB — a small parquet table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from v6spark.operators.dedup import (
    simhash_pairs,
    simhash_pairs_between,
    simhash_signature_portable,
)

INDEX_SCHEMA = "doc_id long, simhash long"


def batch_near_dedup_step(
    batch_df: DataFrame,
    index_dir: str,
    kept_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 60,
    radius: int = 3,
    max_bucket_size: int | None = 256,
) -> None:
    """One incremental step: drop near-dups, append survivors.

    Exposed separately from the stream runner so batch backfills and
    tests drive the identical code path the stream executes.
    """
    spark = batch_df.sparkSession
    sigs = simhash_signature_portable(
        batch_df, id_col=id_col, text_col=text_col, n_bits=n_bits
    ).persist()
    # (b) smaller-id near-neighbour within the batch
    in_batch = simhash_pairs(
        sigs, id_col=id_col, sig_col="simhash", n_bits=n_bits, radius=radius,
        max_bucket_size=max_bucket_size,
    ).select(F.col("id_b").alias(id_col))
    losers = in_batch
    # (a) near-neighbour among previously kept documents
    if os.path.exists(index_dir):
        index = spark.read.schema(INDEX_SCHEMA).parquet(index_dir)
        vs_index = simhash_pairs_between(
            sigs, index, id_col=id_col, sig_col="simhash",
            n_bits=n_bits, radius=radius, max_bucket_size=max_bucket_size,
        ).select(F.col("left_id").alias(id_col))
        losers = losers.unionByName(vs_index)
    # localCheckpoint, NOT persist: appending to index_dir below makes
    # Spark invalidate-and-recache every cached plan that READS that
    # path (refreshByPath on insert) — a persisted survivors frame
    # would lazily recompute against the post-append index and every
    # survivor would then match ITSELF and be dropped.  The eager
    # checkpoint pins the pre-append result as materialized blocks
    # with no lineage back to the index scan.
    survivors = sigs.join(
        losers.distinct(), id_col, "left_anti"
    ).localCheckpoint(eager=True)
    batch_df.join(survivors.select(id_col), id_col, "left_semi").write.mode(
        "append"
    ).parquet(kept_dir)
    survivors.select(id_col, "simhash").write.mode("append").parquet(index_dir)
    sigs.unpersist()


def run_incremental_near_dedup(
    stream_df: DataFrame,
    index_dir: str,
    kept_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 60,
    radius: int = 3,
    max_bucket_size: int | None = 256,
) -> None:
    """Drain a (finite) document stream through incremental near-dedup.

    availableNow trigger + checkpoint: the standard exactly-once
    foreachBatch shape (streaming/events.py::run_foreach_batch_upsert);
    on replay, re-delivered batches re-derive the same survivors
    against the same index prefix.
    """

    def step(batch_df: DataFrame, batch_id: int) -> None:
        batch_near_dedup_step(
            batch_df,
            index_dir,
            kept_dir,
            id_col=id_col,
            text_col=text_col,
            n_bits=n_bits,
            radius=radius,
            max_bucket_size=max_bucket_size,
        )

    q = (
        stream_df.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
