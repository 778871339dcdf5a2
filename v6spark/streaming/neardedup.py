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

Delivery guarantee: EXACTLY-ONCE on committed reads, via a
manifest commit that spans both sinks.  Each batch writes to its own
directory — ``kept_dir/batch_id=<n>/`` and ``index_dir/batch_id=<n>/``
(idempotent ``mode("overwrite")``) — and only then atomically renames
a marker file into ``index_dir/_commits/batch-<n>``.  One marker
covers BOTH sinks, so there is no state where the index has a batch
the kept sink lacks or vice versa.  Crash anywhere before the rename
leaves uncommitted directories that (1) committed readers
(:func:`read_kept`, the internal index reader) never see and (2) the
checkpoint replay overwrites with byte-identical content before
committing.  Crash after the rename → replay sees the marker and
skips the batch entirely.  The rename is atomic on HDFS and POSIX
filesystems; on S3-like stores (no atomic rename) use an ACID table
(Delta/Iceberg) instead — stated honestly, same trade-off family as
``run_foreach_batch_upsert``.

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

from v6spark.operators.dedup import (
    simhash_pairs,
    simhash_pairs_between,
    simhash_signature_portable,
)

_COMMITS = "_commits"  # leading underscore: invisible to Spark file scans


def _jfs(spark: SparkSession, path_str: str):
    """(Hadoop FileSystem, Path, jvm) for ``path_str`` — the same
    filesystem Spark writes (HDFS/S3/local), never a driver-local
    ``os.path`` check that would silently miss remote stores."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return fs, jpath, sc._jvm


def committed_batch_ids(spark: SparkSession, index_dir: str) -> set[int]:
    """Batch ids whose manifest marker exists (both sinks durable)."""
    fs, jdir, _ = _jfs(spark, f"{index_dir}/{_COMMITS}")
    if not fs.exists(jdir):
        return set()
    out: set[int] = set()
    for st in fs.listStatus(jdir):
        name = st.getPath().getName()
        if name.startswith("batch-"):
            out.add(int(name[len("batch-"):]))
    return out


def _mark_committed(spark: SparkSession, index_dir: str, batch_id: int) -> None:
    """Atomically publish batch ``batch_id``: create a tmp marker,
    rename into place.  The rename IS the commit point — atomic on
    HDFS/POSIX; a failed rename with the final marker already present
    means a concurrent/replayed commit won, which is equally done."""
    fs, jdir, jvm = _jfs(spark, f"{index_dir}/{_COMMITS}")
    fs.mkdirs(jdir)
    tmp = jvm.org.apache.hadoop.fs.Path(jdir, f".batch-{batch_id}.tmp")
    final = jvm.org.apache.hadoop.fs.Path(jdir, f"batch-{batch_id}")
    fs.create(tmp, True).close()
    if not fs.rename(tmp, final) and not fs.exists(final):
        raise IOError(
            f"commit marker rename failed for batch {batch_id} under {jdir}"
        )


def _committed_paths(
    spark: SparkSession, data_dir: str, index_dir: str
) -> list[str]:
    return [
        f"{data_dir}/batch_id={i}"
        for i in sorted(committed_batch_ids(spark, index_dir))
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
    _fail_after: str | None = None,
) -> None:
    """One incremental step: drop exact/near dups, publish survivors.

    Exposed separately from the stream runner so batch backfills and
    tests drive the identical code path the stream executes.  The
    index is written with CANONICAL columns (doc_id, simhash)
    whatever ``id_col`` the corpus uses.

    ``batch_id`` is the transaction id (the stream passes its
    checkpointed epoch id; manual backfills may omit it to get
    max(committed)+1 — deterministic only if backfills are serial).
    A batch whose commit marker already exists is skipped outright —
    that is the replay-after-commit half of exactly-once.

    ``_fail_after`` is a crash-injection hook for tests: ``"index"``
    raises after the index write, ``"kept"`` after the kept write
    (i.e. just before the commit marker).
    """
    spark = batch_df.sparkSession
    committed = committed_batch_ids(spark, index_dir)
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
    _mark_committed(spark, index_dir, batch_id)


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

    availableNow trigger + checkpoint; the foreachBatch epoch id is
    the manifest transaction id, so a replayed epoch either skips (its
    marker exists) or deterministically overwrites its own directories
    before committing — exactly-once on committed reads (see the
    module docstring for the filesystem caveat).
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
        )

    q = (
        stream_df.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
