"""Structured Streaming variants of the event-table operators.

The judged queries run the batch analogs (SURVEY.md §2.3
q_event_tumbling / q_event_session — no deterministic oracle exists
for streaming emission timing); these transformations are the
streaming-native forms.  Every function takes a DataFrame that may be
BATCH or STREAMING — the same logical plan serves both, which is the
point of the unified API (and how the tests pin streaming semantics:
run the identical transformation in batch and compare).

Event-time correctness: watermarks bound state for late data;
``session_window`` implements the same 30-minute-gap rule as the
batch gaps-and-islands operator (operators/sessionize.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from v6spark.functions.determinism import dsum

# Aligned with the batch schema registry (sources/schemas.py): the
# corpus stores ts as TIMESTAMP(MICROS, isAdjustedToUTC=false) ==
# timestamp_ntz, so batch and streaming reads agree at the schema
# level.  Watermarks require LTZ TIMESTAMP, so the event-time
# operators cast via _event_time() at the point of use.
EVENTS_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)


def read_events_stream(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    """File-source stream over an events directory (parquet parts).

    ``maxFilesPerTrigger`` paces micro-batches so watermarks advance
    between files — the local stand-in for a Kafka-style source.
    """
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def _event_time(df: DataFrame) -> DataFrame:
    """Surface ``ts`` as LTZ ``timestamp`` for the event-time APIs.

    Spark's watermark requires TIMESTAMP (not TIMESTAMP_NTZ —
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise), while the corpus
    schema declares ``ts`` NTZ.  The session timezone is pinned UTC
    (session.ensure_confs), so the cast maps the NTZ wall clock to the
    same instant and batch/streaming emit identical window bounds.
    """
    if dict(df.dtypes).get("ts") == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling(
    df: DataFrame,
    window: str = "1 hour",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Tumbling event-time window: count + exact sum per bucket."""
    df = _event_time(df)
    src = df.withWatermark("ts", watermark) if watermark and df.isStreaming else df
    return src.groupBy(F.window("ts", window).alias("w")).agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value")
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n",
        "sum_value",
    )


def sliding(
    df: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Sliding event-time window — each event lands in window/slide buckets."""
    df = _event_time(df)
    src = df.withWatermark("ts", watermark) if watermark and df.isStreaming else df
    return src.groupBy(F.window("ts", window, slide).alias("w")).agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n",
    )


def sessionized(
    df: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Per-user session aggregation via ``session_window`` (dynamic-gap
    event-time sessions — the streaming twin of
    ``operators.sessionize.sessionize``)."""
    df = _event_time(df)
    src = df.withWatermark("ts", watermark) if watermark and df.isStreaming else df
    return src.groupBy(
        "user_id", F.session_window("ts", gap).alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value")
    ).select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
        "sum_value",
    )


def run_to_memory_sink(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drain a (finite) file-source stream into an in-memory table —
    the test/demo runner.  Uses availableNow so the query terminates
    after consuming existing files."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def deduped_stream(
    df: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps only the keys seen inside
    the watermark horizon — the state-store stays O(keys-per-horizon)
    instead of growing forever, which is what makes streaming dedup
    viable on an unbounded 100 TB/day feed.  Batch frames fall back to
    plain dropDuplicates (same semantics on finite data).
    """
    keys = keys or ["event_id"]
    if df.isStreaming:
        return (
            _event_time(df)
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(keys)
        )
    return df.dropDuplicates(keys)


def run_foreach_batch_upsert(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    key: str = "event_id",
) -> None:
    """Checkpointed foreachBatch upsert sink (exactly-once shape).

    Each micro-batch merges into a parquet target keyed by ``key``:
    existing rows for incoming keys are replaced (last-writer-wins
    within the batch).  The checkpoint makes replays idempotent —
    re-delivered batches overwrite with identical content.  On a real
    deployment the target would be an ACID table (Delta/Iceberg
    MERGE); plain parquet here keeps the container dependency-free
    while exercising the identical streaming plumbing.

    Filesystem operations go through the Hadoop FileSystem API — the
    same filesystem Spark writes (HDFS/S3/local), never driver-local
    ``os.path``/``shutil``, which would silently report 'absent'
    forever on a remote store (the lesson
    ``streaming/neardedup.py::_jfs`` documents); renames are atomic
    on HDFS/POSIX, S3-like stores need an ACID table.
    """
    from v6spark.streaming.neardedup import _jfs

    def upsert(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates([key])
        fs, jtarget, jvm = _jfs(spark, target_dir)
        jold = jvm.org.apache.hadoop.fs.Path(target_dir + ".old")
        jstaging = jvm.org.apache.hadoop.fs.Path(target_dir + ".staging")
        if fs.exists(jold):  # crash between rename-aside and swap-in
            if not fs.exists(jtarget):
                fs.rename(jold, jtarget)
            else:
                fs.delete(jold, True)
        if fs.exists(jtarget):
            current = spark.read.parquet(target_dir)
            merged = (
                current.join(batch.select(key), key, "left_anti")
                .unionByName(batch)
            )
        else:
            merged = batch
        # stage, rename the live target ASIDE (never delete it before
        # the new data is in place), swap in, then drop the old copy —
        # a crash at any point leaves either the old or the new target
        # recoverable, so the docstring's replay-idempotence holds
        merged.write.mode("overwrite").parquet(target_dir + ".staging")
        if fs.exists(jtarget):
            fs.rename(jtarget, jold)
        fs.rename(jstaging, jtarget)
        if fs.exists(jold):
            fs.delete(jold, True)

    q = (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch_upsert_committed(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    key: str = "event_id",
    commit_mode: str = "rename",
) -> None:
    """:func:`run_foreach_batch_upsert` on the versioned-manifest
    commit (:mod:`v6spark.txlog`) instead of the rename-aside swap.

    Each micro-batch merges the committed generation with the batch
    (last-writer-wins per ``key``), writes the result into a NEW
    generation directory ``{target_dir}/gen=<v>``, and publishes one
    manifest — readers (:func:`read_upsert_target`) resolve through
    the manifest, so there is never a moment where the target is
    absent or half-swapped, and ``commit_mode="put"`` makes the sink
    S3-safe (no rename anywhere in the commit path, unlike the
    rename-aside variant).  Replays of committed epochs skip via the
    manifest's ``committed`` set; replays of uncommitted epochs
    overwrite their own orphan generation.  ``vacuum_upsert_target``
    drops superseded generations.
    """
    from v6spark import txlog

    def upsert(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        log_dir = f"{target_dir}/_commits"
        version, doc = txlog.read_latest(spark, log_dir)
        committed = set(doc["committed"]) if doc else set()
        if int(batch_id) in committed:
            return  # replay after commit
        batch = batch_df.dropDuplicates([key])
        if doc is not None:
            current = spark.read.parquet(f"{target_dir}/{doc['live']}")
            merged = (
                current.join(batch.select(key), key, "left_anti")
                .unionByName(batch)
            )
        else:
            merged = batch
        gen = f"gen={version + 1:06d}"
        merged.write.mode("overwrite").parquet(f"{target_dir}/{gen}")
        txlog.publish(
            spark,
            log_dir,
            version + 1,
            {"live": gen, "committed": sorted(committed | {int(batch_id)})},
            commit_mode=commit_mode,
        )

    q = (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_upsert_target(spark: SparkSession, target_dir: str) -> DataFrame | None:
    """Committed-only view of a :func:`run_foreach_batch_upsert_committed`
    target; None before the first commit."""
    from v6spark import txlog

    _version, doc = txlog.read_latest(spark, f"{target_dir}/_commits")
    if doc is None:
        return None
    return spark.read.parquet(f"{target_dir}/{doc['live']}")


def vacuum_upsert_target(
    spark: SparkSession, target_dir: str, keep_last: int = 1
) -> int:
    """Drop generation directories no retained manifest references,
    plus retired manifests; ``keep_last`` retains the newest N
    generations for version-pinned reads.  Returns directories
    removed."""
    from v6spark import txlog

    return txlog.vacuum_versions(
        spark, target_dir, f"{target_dir}/_commits", "gen=",
        keep_last=keep_last,
    )
