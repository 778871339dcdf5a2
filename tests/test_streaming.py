"""Structured Streaming tests.

Determinism strategy: the same transformation functions serve batch
and streaming DataFrames, so (1) streaming results from a finite
file-source drain must equal the batch run of the identical function,
and (2) ``session_window`` (batch mode) must agree with the
gaps-and-islands operator — two independent implementations of the
same session semantics checking each other.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from v6spark.operators.sessionize import session_counts
from v6spark.sources.tables import load_table
from v6spark.streaming import events as se


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    # project to the streaming schema (plain µs timestamp column)
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@pytest.fixture(scope="module")
def events_dir(events_batch, tmp_path_factory):
    # re-write as multiple parquet files so maxFilesPerTrigger paces batches
    out = str(tmp_path_factory.mktemp("events_stream"))
    events_batch.repartition(4).write.mode("overwrite").parquet(out)
    return out


def _norm(rows):
    return sorted(tuple(r) for r in rows)


def test_streaming_tumbling_equals_batch(spark, events_batch, events_dir):
    stream = se.read_events_stream(spark, events_dir)
    assert stream.isStreaming
    se.run_to_memory_sink(se.tumbling(stream, watermark=None), "t_tumbling")
    got = spark.sql("SELECT * FROM t_tumbling").collect()
    want = se.tumbling(events_batch).collect()
    assert _norm(got) == _norm(want)
    assert len(got) > 0


def test_streaming_sliding_equals_batch(spark, events_batch, events_dir):
    stream = se.read_events_stream(spark, events_dir, max_files=2)
    se.run_to_memory_sink(se.sliding(stream, watermark=None), "t_sliding")
    got = spark.sql("SELECT * FROM t_sliding").collect()
    want = se.sliding(events_batch).collect()
    assert _norm(got) == _norm(want)
    # sliding windows overlap: strictly more buckets than tumbling
    assert len(got) > events_batch.select(F.date_trunc("hour", "ts")).distinct().count()


def test_session_window_agrees_with_gaps_and_islands(spark, events_batch, sf_dir):
    # batch session_window per-user session counts == sessionize operator
    sw = (
        se.sessionized(events_batch)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    gi = session_counts(load_table(spark, sf_dir, "events"), gap_minutes=30)
    left = {r["user_id"]: r["n_sessions"] for r in sw.collect()}
    right = {r["user_id"]: r["n_sessions"] for r in gi.collect()}
    assert left == right


def test_streaming_session_window_runs(spark, events_dir):
    # streaming session_window needs a watermark; assert the query
    # plans, runs and terminates (emission timing is not asserted —
    # no deterministic oracle, SURVEY.md §2.2)
    stream = se.read_events_stream(spark, events_dir, max_files=1)
    se.run_to_memory_sink(
        se.sessionized(stream, watermark="1 minute"), "t_sessions", "append"
    )
    n = spark.sql("SELECT count(*) AS n FROM t_sessions").collect()[0]["n"]
    assert n >= 0


def test_deduped_stream_equals_batch_dedup(spark, events_batch, events_dir):
    # duplicate the source rows: dedup must restore the original count
    dup_dir = events_dir + "_dup"
    events_batch.unionByName(events_batch).repartition(3).write.mode(
        "overwrite"
    ).parquet(dup_dir)
    stream = se.read_events_stream(spark, dup_dir, max_files=3)
    se.run_to_memory_sink(
        se.tumbling(se.deduped_stream(stream), watermark=None), "t_dedup"
    )
    got = spark.sql("SELECT sum(n) AS total FROM t_dedup").collect()[0]["total"]
    assert got == events_batch.count()


def test_foreach_batch_upsert(spark, events_batch, events_dir, tmp_path_factory):
    target = str(tmp_path_factory.mktemp("upsert") / "target")
    ckpt = str(tmp_path_factory.mktemp("upsert_ckpt"))
    stream = se.read_events_stream(spark, events_dir, max_files=2)
    se.run_foreach_batch_upsert(stream, target, ckpt)
    back = spark.read.parquet(target)
    assert back.count() == events_batch.count()  # every event exactly once
    assert back.select("event_id").distinct().count() == events_batch.count()
    # replay with same checkpoint: no new batches -> target unchanged
    stream2 = se.read_events_stream(spark, events_dir, max_files=2)
    se.run_foreach_batch_upsert(stream2, target, ckpt)
    assert spark.read.parquet(target).count() == events_batch.count()


def test_rate_source_events_shape(spark):
    """Kafka-shaped factory: the rate fallback yields event-schema rows
    and drives the same windowed aggregation as the file source."""
    from v6spark.streaming.sources import read_stream_source

    stream = read_stream_source(spark, "rate", rows_per_second=500)
    assert stream.isStreaming
    assert [f[0] for f in stream.dtypes] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    q = (
        se.tumbling(stream, window="1 second", watermark=None)
        .writeStream.format("memory")
        .queryName("t_rate")
        .outputMode("complete")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        rows = []
        while time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM t_rate WHERE n > 0").collect()
            if rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert rows, "rate source produced no windowed rows within 30s"


def test_stream_source_factory_rejects_unknown(spark):
    from v6spark.streaming.sources import read_stream_source

    with pytest.raises(ValueError, match="unknown stream source"):
        read_stream_source(spark, "kafkaesque")
