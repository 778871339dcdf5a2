"""Incremental metric totals maintained from the change stream.

At every point the maintained totals must equal a full recompute over
the current corpus; epoch replay must not double-count.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from v6spark.pipeline import (
    publish_corpus_committed,
    read_published_corpus,
    retract_from_published,
    upsert_into_published,
)
from v6spark.sources.publog import stream_published_log
from v6spark.streaming.cdcagg import (
    corpus_metrics_frame,
    metrics_foreach_batch,
    read_corpus_metrics,
)

METRICS = {"docs": "1", "chars": "length(text)"}


def _publish(spark, tmp_path, n=30):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text"
    )
    prepared = spark.range(n).selectExpr(
        "id as doc_id",
        "case when id % 5 = 0 then 'valid' else 'train' end as split",
    )
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=2)
    return root


def _recompute(spark, root):
    df = read_published_corpus(spark, root)
    return {
        r["split"]: {"docs": float(r["docs"]), "chars": float(r["chars"])}
        for r in df.groupBy("split").agg(
            F.count(F.lit(1)).cast("double").alias("docs"),
            F.sum(F.length("text")).cast("double").alias("chars"),
        ).collect()
    }


def _run(spark, root, agg, ckpt):
    q = (
        stream_published_log(spark, root)
        .writeStream
        .foreachBatch(metrics_foreach_batch(root, agg, METRICS))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_totals_track_recompute_through_dml(spark, tmp_path):
    root = _publish(spark, tmp_path)
    agg = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ckpt")

    _run(spark, root, agg, ckpt)
    assert read_corpus_metrics(spark, agg) == _recompute(spark, root)

    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(3, "a much longer revised body three", None),
             (1003, "fresh", "train")],
            "doc_id long, text string, split string",
        ),
    )
    retract_from_published(spark, root, "doc_id = 10")  # a valid-split doc
    _run(spark, root, agg, ckpt)
    assert read_corpus_metrics(spark, agg) == _recompute(spark, root)

    frame = corpus_metrics_frame(spark, agg)
    assert set(frame.columns) == {"split", "metric", "value"}
    assert frame.filter("metric = 'docs'").count() == 2


def test_epoch_replay_does_not_double_count(spark, tmp_path):
    """Re-invoking the foreachBatch fn with the same batch content
    (the crash-replay shape) must abort on the recorded txn id."""
    root = _publish(spark, tmp_path, n=10)
    agg = str(tmp_path / "agg")
    fn = metrics_foreach_batch(root, agg, METRICS)

    class Batch:
        """Duck-typed log micro-batch (version rows only)."""
        def __init__(self, df):
            self._df = df
        def select(self, *cols):
            return self._df.select(*cols)
        @property
        def sparkSession(self):
            return self._df.sparkSession

    log_rows = spark.createDataFrame([(1,)], "version long")
    fn(Batch(log_rows), 0)
    once = read_corpus_metrics(spark, agg)
    assert once == _recompute(spark, root)
    fn(Batch(log_rows), 0)  # replayed epoch
    assert read_corpus_metrics(spark, agg) == once


def test_metadata_only_window_is_noop(spark, tmp_path):
    from v6spark.pipeline import evolve_published_schema

    root = _publish(spark, tmp_path, n=10)
    agg = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, root, agg, ckpt)
    before = read_corpus_metrics(spark, agg)
    evolve_published_schema(spark, root, [("license", "string")])
    _run(spark, root, agg, ckpt)
    assert read_corpus_metrics(spark, agg) == before


def test_totals_track_recompute_through_dv_retract(spark, tmp_path):
    root = _publish(spark, tmp_path)
    agg = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, root, agg, ckpt)

    # a deletion-vector retract rewrites no files; the metric fold
    # must still see its deletes through the change feed
    retract_from_published(spark, root, "doc_id in (10, 11)", strategy="dv")
    _run(spark, root, agg, ckpt)
    assert read_corpus_metrics(spark, agg) == _recompute(spark, root)

    # materializing the vectors via compaction emits zero changes:
    # totals stay equal and stay put
    from v6spark.pipeline import compact_published

    compact_published(spark, root)
    _run(spark, root, agg, ckpt)
    assert read_corpus_metrics(spark, agg) == _recompute(spark, root)
