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

Delivery guarantee: EXACTLY-ONCE on committed reads, via a VERSIONED
MANIFEST log spanning both sinks (the Delta-log idea at minimum
viable size).  Each batch writes to its own directory —
``kept_dir/batch_id=<n>/`` and ``index_dir/batch_id=<n>/``
(idempotent ``mode("overwrite")``) — then publishes ONE new manifest
file ``index_dir/_commits/manifest-<v+1>`` whose JSON carries

- ``live``: the batch directories committed readers consult, and
- ``committed``: every epoch id ever published (so a replayed epoch
  skips even after compaction has folded its directory away).

A manifest is only ever published under a NEW version name (never
overwritten), so the highest complete manifest IS the atomic commit
point; one manifest covers BOTH sinks, so there is no state where
the index has a batch the kept sink lacks or vice versa.  Crash
anywhere before the publish leaves uncommitted directories that (1)
committed readers (:func:`read_kept`, the internal index reader)
never see and (2) the checkpoint replay overwrites with
byte-identical content before committing.  Crash after the publish →
replay sees its id in ``committed`` and skips.

The commit primitive lives in :mod:`v6spark.txlog` and supports two
filesystem families via ``commit_mode``: ``"rename"`` (tmp +
rename-to-new-name — atomic on HDFS/POSIX) and ``"put"`` (S3
semantics: conditional-put / write-if-absent under the final name,
with a SHA-256 completeness footer that readers verify, so a torn
object is simply skipped and the highest VERIFIABLE manifest is the
commit point).  Every entry point below threads ``commit_mode``
through; readers are mode-agnostic.

:func:`compact` folds the accumulated per-epoch directories (the
classic streaming small-files problem — one directory per
micro-batch, thousands per day at production trigger rates) into one
generation directory per sink and publishes a manifest whose
``live`` list is just that generation; superseded directories stay
on disk, invisible, until :func:`vacuum` removes everything no live
manifest references.  A crash mid-compaction leaves only orphan
generation directories that the next compaction overwrites.

The per-batch index directory doubles as the survivors
materialization: the kept-sink semi-join re-reads the just-written
parquet instead of a ``localCheckpoint``, so nothing accumulates in
executor storage memory across a long-running stream (each batch's
working set is released when the step returns).

Index growth is the deployment's retention policy: at 100 TB the
index partition-compacts by time (drop signatures older than the
contamination horizon) exactly like a watermark; signatures are 16
bytes/doc so a 10B-doc index is ~160 GB — a small parquet table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from v6spark import txlog
from v6spark.operators.dedup import (
    simhash_pairs,
    simhash_pairs_between,
    simhash_signature_portable,
)
from v6spark.txlog import _jfs

_COMMITS = "_commits"  # leading underscore: invisible to Spark file scans


def _read_manifest(
    spark: SparkSession, index_dir: str
) -> tuple[int, list[str], set[int]]:
    """(version, live dir names, committed epoch ids) from the highest
    COMPLETE manifest; (0, [], set()) before the first commit.  Torn
    higher-versioned manifests (non-atomic rename emulation, crashed
    conditional put) are skipped by :func:`v6spark.txlog.read_latest`."""
    version, doc = txlog.read_latest(spark, f"{index_dir}/{_COMMITS}")
    if doc is None:
        return 0, [], set()
    return version, list(doc["live"]), set(doc["committed"])


def _publish_manifest(
    spark: SparkSession,
    index_dir: str,
    version: int,
    live: list[str],
    committed: set[int],
    commit_mode: str = "rename",
) -> None:
    """Publish manifest ``version`` via :func:`v6spark.txlog.publish`;
    the call returning IS the commit point (rename or verified
    conditional put, per ``commit_mode``)."""
    txlog.publish(
        spark,
        f"{index_dir}/{_COMMITS}",
        version,
        {"live": sorted(live), "committed": sorted(committed)},
        commit_mode=commit_mode,
    )


def committed_batch_ids(spark: SparkSession, index_dir: str) -> set[int]:
    """Epoch ids the manifest records as durably published (includes
    epochs whose directories were folded away by :func:`compact`)."""
    return _read_manifest(spark, index_dir)[2]


def _committed_paths(
    spark: SparkSession, data_dir: str, index_dir: str
) -> list[str]:
    return [
        f"{data_dir}/{name}"
        for name in _read_manifest(spark, index_dir)[1]
    ]


def _read_index(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The (doc_id, simhash) index over COMMITTED batches only, or
    None before the first commit — an uncommitted (crashed) batch
    directory is never consulted, so a replay re-derives its verdicts
    from exactly the pre-crash state."""
    paths = _committed_paths(spark, index_dir, index_dir)
    if not paths:
        return None
    return spark.read.parquet(*paths).select("doc_id", "simhash")


def read_kept(
    spark: SparkSession, kept_dir: str, index_dir: str
) -> DataFrame | None:
    """Committed-only view of the kept sink (exactly-once read).

    ``spark.read.parquet(kept_dir)`` also works between crashes (the
    replay overwrites any uncommitted directory with byte-identical
    rows before committing), but this helper is the strict contract:
    it lists the manifest and reads only published batches.
    """
    paths = _committed_paths(spark, kept_dir, index_dir)
    if not paths:
        return None
    return spark.read.parquet(*paths)


def batch_near_dedup_step(
    batch_df: DataFrame,
    index_dir: str,
    kept_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 60,
    radius: int = 3,
    max_bucket_size: int | None = 256,
    batch_id: int | None = None,
    signer=None,
    commit_mode: str = "rename",
    _fail_after: str | None = None,
) -> None:
    """One incremental step: drop exact/near dups, publish survivors.

    Exposed separately from the stream runner so batch backfills and
    tests drive the identical code path the stream executes.  The
    index is written with CANONICAL columns (doc_id, simhash)
    whatever ``id_col`` the corpus uses.

    ``signer`` generalizes the fingerprint: a callable
    ``(reps_df) -> DataFrame(doc_id, simhash)`` over the exact-dedup
    representatives ``(doc_id, <text_col>)``.  Default is the
    portable text SimHash; the media stream passes a pHash signer
    over binary payloads (``text_col="payload"`` — the exact
    pre-collapse ``sha2`` accepts binary as well as string), reusing
    this whole transaction/manifest machinery unchanged.

    ``batch_id`` is the transaction id (the stream passes its
    checkpointed epoch id; manual backfills may omit it to get
    max(committed)+1 — deterministic only if backfills are serial).
    A batch the manifest already records as committed is skipped
    outright — that is the replay-after-commit half of exactly-once,
    and it survives :func:`compact` folding the batch's directory
    away (the ``committed`` list carries forward).

    ``_fail_after`` is a crash-injection hook for tests: ``"index"``
    raises after the index write, ``"kept"`` after the kept write
    (i.e. just before the commit marker).
    """
    spark = batch_df.sparkSession
    version, live, committed = _read_manifest(spark, index_dir)
    if batch_id is None:
        batch_id = max(committed, default=-1) + 1
    elif batch_id in committed:
        return  # replayed after commit: already fully published
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
        .select(F.col("_doc").alias("doc_id"), F.col("_text").alias(text_col))
    )
    if signer is None:
        # engine="fold": a micro-batch is SMALL by construction, and
        # the per-row fold avoids the agg engine's explode+groupBy
        # exchange in the latency path (measured: the agg default
        # cost ~1.2 s/batch at 5k-doc batches — STRESS_STREAM
        # 976 -> 819 docs/s — while the fold's interpreted-HOF
        # penalty only matters once data dominates, which a
        # micro-batch never does)
        sigs = simhash_signature_portable(
            reps, text_col=text_col, n_bits=n_bits, engine="fold"
        )
    else:
        sigs = signer(reps)
    sigs = sigs.persist()
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
    # Index batch dir first: this single write IS the survivors
    # materialization.  Its plan reads only COMMITTED index dirs (the
    # explicit paths above), never its own output path, so there is no
    # refreshByPath self-invalidation — and no localCheckpoint blocks
    # to accumulate over a long stream.
    index_batch_dir = f"{index_dir}/batch_id={batch_id}"
    sigs.join(losers.distinct(), "doc_id", "left_anti").select(
        "doc_id", "simhash"
    ).write.mode("overwrite").parquet(index_batch_dir)
    sigs.unpersist()
    if _fail_after == "index":
        raise RuntimeError("injected crash after index write")
    # kept sink: semi-join against the just-written (still uncommitted)
    # survivors parquet — a fresh scan, no lineage into the joins above
    survivor_ids = spark.read.parquet(index_batch_dir).select(
        F.col("doc_id").alias(id_col)
    )
    batch_df.join(survivor_ids, id_col, "left_semi").write.mode(
        "overwrite"
    ).parquet(f"{kept_dir}/batch_id={batch_id}")
    if _fail_after == "kept":
        raise RuntimeError("injected crash after kept write")
    _publish_manifest(
        spark,
        index_dir,
        version + 1,
        [*live, f"batch_id={batch_id}"],
        committed | {batch_id},
        commit_mode=commit_mode,
    )


_GEN_OFFSET = 1_000_000_000  # compaction generations; epochs never reach it


def compact(
    spark: SparkSession,
    index_dir: str,
    kept_dir: str,
    commit_mode: str = "rename",
    _fail_after: str | None = None,
) -> int | None:
    """Fold all live batch directories into one generation per sink.

    Reads the live set of both sinks, writes each union into
    ``batch_id=<1e9 + v>`` (a generation id above any checkpoint
    epoch), and publishes a manifest whose ``live`` is just that
    generation — ``committed`` is carried forward unchanged, so
    replayed epochs still skip after their directories are folded
    away.  Returns the new manifest version, or None when there was
    nothing to compact.  Crash before the publish leaves only orphan
    generation directories (invisible to readers, overwritten by the
    next compaction); the old directories become unreferenced only
    once the new manifest is the highest — :func:`vacuum` deletes
    them afterwards.
    """
    version, live, committed = _read_manifest(spark, index_dir)
    if len(live) <= 1:
        return None
    gen = f"batch_id={_GEN_OFFSET + version + 1}"
    spark.read.parquet(
        *[f"{index_dir}/{name}" for name in live]
    ).write.mode("overwrite").parquet(f"{index_dir}/{gen}")
    if _fail_after == "index":
        raise RuntimeError("injected crash after index compaction write")
    spark.read.parquet(
        *[f"{kept_dir}/{name}" for name in live]
    ).write.mode("overwrite").parquet(f"{kept_dir}/{gen}")
    if _fail_after == "kept":
        raise RuntimeError("injected crash after kept compaction write")
    _publish_manifest(
        spark, index_dir, version + 1, [gen], committed,
        commit_mode=commit_mode,
    )
    return version + 1


def vacuum(spark: SparkSession, index_dir: str, kept_dir: str) -> int:
    """Delete batch directories the CURRENT manifest does not
    reference (superseded by compaction or orphaned by crashes) plus
    all but the latest manifest file.  Returns directories removed.
    Safe at any time: the live set is read once and everything it
    names is kept; a concurrent reader of an OLDER manifest is the
    one retention trade-off (same as every log-structured table's
    vacuum) — run it with a grace period at production scale.
    """
    version, live, _ = _read_manifest(spark, index_dir)
    keep = set(live)
    removed = 0
    for root in (index_dir, kept_dir):
        fs, jroot, _jvm = _jfs(spark, root)
        if not fs.exists(jroot):
            continue
        for st in fs.listStatus(jroot):
            name = st.getPath().getName()
            if (
                st.isDirectory()
                and name.startswith("batch_id=")
                and name not in keep
            ):
                fs.delete(st.getPath(), True)
                removed += 1
    # manifest retention: keep only the highest COMPLETE manifest;
    # torn higher-versioned files (crashed conditional puts) go too
    txlog.vacuum_manifests(spark, f"{index_dir}/{_COMMITS}")
    return removed


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
    signer=None,
    commit_mode: str = "rename",
) -> None:
    """Drain a (finite) document stream through incremental near-dedup.

    availableNow trigger + checkpoint; the foreachBatch epoch id is
    the manifest transaction id, so a replayed epoch either skips
    (the manifest records it committed) or deterministically
    overwrites its own directories before committing — exactly-once
    on committed reads (see the module docstring for the filesystem
    caveat).
    """

    def step(batch_df: DataFrame, batch_epoch_id: int) -> None:
        batch_near_dedup_step(
            batch_df,
            index_dir,
            kept_dir,
            id_col=id_col,
            text_col=text_col,
            n_bits=n_bits,
            radius=radius,
            max_bucket_size=max_bucket_size,
            batch_id=int(batch_epoch_id),
            signer=signer,
            commit_mode=commit_mode,
        )

    q = (
        stream_df.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
