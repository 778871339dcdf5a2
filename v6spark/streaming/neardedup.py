"""Incremental streaming NEAR-dedup against a persistent signature index.

``deduped_stream`` (streaming/events.py) removes EXACT key duplicates
within a watermark horizon; this module removes exact AND near
duplicates across the whole ingest history — the production pattern
for continuously ingesting a training corpus: each micro-batch is
checked against the signature index of everything kept so far,
survivors append their signatures, losers never reach the sink.

Why foreachBatch rather than applyInPandasWithState: Hamming-ball
matching needs each document checked in radius+1 band buckets AND a
per-document verdict aggregated across those buckets — two stateful
exchanges per batch, which Structured Streaming's single-stateful-
operator chaining rules don't express.  foreachBatch runs the batch
Hamming-ball operators (``simhash_pairs`` within the batch,
``simhash_pairs_between`` against the index) with checkpointed
replay, which is precisely what they are built for.

Each batch step mirrors ``dedup.near_dup_keepers``' guard-safe
composition: byte-identical documents collapse through an EXACT
digest group first (so a boilerplate cluster larger than
``max_bucket_size`` still dedups — the guard then only ever sees
distinct texts), and the Hamming-ball joins run on representatives.

Semantics (deterministic, order-greedy): a document is dropped iff
(a) a byte-identical smaller-id document exists in its batch, or a
near-neighbour within ``radius`` exists among (b) previously KEPT
documents (the index only contains survivors) or (c) smaller-id
representatives in its own batch.  Within a batch this is the "any
smaller near-neighbour loses" rule — on a chain a<b<c with pairs
(a,b),(b,c) both b and c drop, the conservative choice for
training-data dedup (never keeps two near-dups).

Delivery guarantees, stated honestly: the two parquet appends
(kept_dir, index_dir) are not one atomic commit, so a crash BETWEEN
them followed by checkpoint replay can append the same survivors to
``kept_dir`` twice (the re-derivation is deterministic, so the
duplicates are byte-identical rows — dedupable by doc_id).  Exactly-
once needs an ACID table (Delta/Iceberg) for both sinks; plain
parquet keeps this container dependency-free while exercising the
identical streaming plumbing, same trade-off as
``run_foreach_batch_upsert``.

Index growth is the deployment's retention policy: at 100 TB the
index partition-compacts by time (drop signatures older than the
contamination horizon) exactly like a watermark; signatures are 16
bytes/doc so a 10B-doc index is ~160 GB — a small parquet table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from v6spark.operators.dedup import (
    simhash_pairs,
    simhash_pairs_between,
    simhash_signature_portable,
)


def _read_index(spark, index_dir: str) -> DataFrame | None:
    """The (doc_id, simhash) index, or None before the first append.

    A read attempt + AnalysisException, NOT ``os.path.exists`` — the
    index lives on whatever filesystem Spark writes (HDFS/S3/local),
    and a driver-local path check would silently report 'absent'
    forever on remote stores.
    """
    try:
        return spark.read.parquet(index_dir)
    except AnalysisException:
        return None


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
    """One incremental step: drop exact/near dups, append survivors.

    Exposed separately from the stream runner so batch backfills and
    tests drive the identical code path the stream executes.  The
    index is written with CANONICAL columns (doc_id, simhash)
    whatever ``id_col`` the corpus uses.
    """
    spark = batch_df.sparkSession
    # exact pre-collapse: byte-identical batch members resolve at
    # digest-groupBy cost; only representatives reach the guarded
    # Hamming-ball joins (guard-safe for boilerplate clusters)
    digests = batch_df.select(
        F.col(id_col).alias("_doc"),
        F.col(text_col).alias("_text"),
        F.sha2(F.col(text_col), 256).alias("_digest"),
    )
    exact = digests.groupBy("_digest").agg(F.min("_doc").alias("_rep"))
    reps = (
        digests.join(exact, "_digest")
        .filter(F.col("_doc") == F.col("_rep"))
        .select(F.col("_doc").alias("doc_id"), F.col("_text").alias("text"))
    )
    sigs = simhash_signature_portable(reps, n_bits=n_bits).persist()
    in_batch = simhash_pairs(
        sigs, n_bits=n_bits, radius=radius, max_bucket_size=max_bucket_size
    ).select(F.col("id_b").alias("doc_id"))
    losers = in_batch
    index = _read_index(spark, index_dir)
    if index is not None:
        vs_index = simhash_pairs_between(
            sigs, index, n_bits=n_bits, radius=radius,
            max_bucket_size=max_bucket_size,
        ).select(F.col("left_id").alias("doc_id"))
        losers = losers.unionByName(vs_index)
    # localCheckpoint, NOT persist: appending to index_dir below makes
    # Spark invalidate-and-recache every cached plan that READS that
    # path (refreshByPath on insert) — a persisted survivors frame
    # would lazily recompute against the post-append index and every
    # survivor would then match ITSELF and be dropped.  The eager
    # checkpoint pins the pre-append result as materialized blocks
    # with no lineage back to the index scan.
    survivors = sigs.join(
        losers.distinct(), "doc_id", "left_anti"
    ).localCheckpoint(eager=True)
    sigs.unpersist()
    batch_df.join(
        survivors.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
    ).write.mode("append").parquet(kept_dir)
    survivors.select("doc_id", "simhash").write.mode("append").parquet(
        index_dir
    )


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

    availableNow trigger + checkpoint; see the module docstring for
    the honest delivery-guarantee statement (at-least-once on
    kept_dir across a crash between the two appends; deterministic
    re-derivation makes replays byte-identical and dedupable).
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
