"""The pubcorpus STREAMING sink (writeStream.format("pubcorpus")).

Every microbatch must be one committed manifest version carrying the
per-epoch transaction id ``<txnPrefix>:<batchId>`` — so epoch replays
(writer-level re-commit, or a query restart from the same checkpoint)
append exactly once; aborts delete their staged files; empty windows
commit nothing; and a posture drift committed mid-stream fails the
query instead of writing mis-shaped files.
"""
from __future__ import annotations

import glob
import os

import pytest

from v6spark.pipeline import read_published_corpus
from v6spark.txlog import list_versions
from v6spark.sources.pubcorpus import register_pubcorpus_source


def _doc_schema():
    return "doc_id long, text string, day long, split string"


def _feed(spark, src_dir, lo, n, part):
    spark.range(lo, lo + n).selectExpr(
        "id as doc_id", "concat('body ', id) as text",
        "cast(id % 7 as long) as day",
        "case when id % 10 = 0 then 'valid' else 'train' end as split",
    ).coalesce(1).write.mode("append").parquet(
        os.path.join(src_dir, f"p={part}")
    )


def _run_stream(spark, src_glob, root, ckpt, **opts):
    register_pubcorpus_source(spark)
    src = spark.readStream.schema(_doc_schema()).parquet(src_glob)
    w = (
        src.writeStream.format("pubcorpus")
        .option("checkpointLocation", ckpt)
    )
    for k, v in opts.items():
        w = w.option(k, v)
    q = w.trigger(availableNow=True).start(root)
    q.awaitTermination()
    return q


def test_stream_sink_end_to_end_and_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    root = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _feed(spark, src, 0, 30, 1)

    _run_stream(spark, f"{src}/p=*", root, ckpt,
                txnPrefix="sinktest", nShards="2")
    got = read_published_corpus(spark, root)
    assert got.count() == 30
    assert sorted(got.columns) == sorted(
        ["doc_id", "text", "day", "split", "shard"]
    )

    # restart with MORE data from the same checkpoint: only the new
    # rows append (offsets) and the table advances one version
    v_before = max(list_versions(spark, f"{root}/_commits"))
    _feed(spark, src, 1000, 10, 2)
    _run_stream(spark, f"{src}/p=*", root, ckpt, txnPrefix="sinktest")
    assert read_published_corpus(spark, root).count() == 40
    assert max(list_versions(spark, f"{root}/_commits")) == v_before + 1

    # restart with NO new data: no commit, no version churn
    _run_stream(spark, f"{src}/p=*", root, ckpt, txnPrefix="sinktest")
    assert max(list_versions(spark, f"{root}/_commits")) == v_before + 1


def test_epoch_replay_is_exactly_once(spark, tmp_path):
    """Writer-level replay: the same (messages, batchId) committed
    twice — the crash-between-manifest-and-checkpoint window — must
    append once."""
    from v6spark.sources.pubcorpus_writer import (
        PublishedCorpusStreamWriter,
    )

    root = str(tmp_path / "corpus")
    sdf = spark.range(0, 25).selectExpr(
        "id as doc_id", "concat('b', id) as text",
        "cast(id % 3 as long) as day",
        "case when id % 5 = 0 then 'valid' else 'train' end as split",
    )
    w = PublishedCorpusStreamWriter(
        root, sdf.schema, {"txnprefix": "replay", "nshards": "2"},
        overwrite=False,
    )
    rows = sdf.collect()
    msg = w.write(iter(rows))
    w.commit([msg], batchId=0)
    assert read_published_corpus(spark, root).count() == 25
    # replay epoch 0 with re-staged files (Spark re-runs the tasks)
    msg2 = w.write(iter(rows))
    w.commit([msg2], batchId=0)
    assert read_published_corpus(spark, root).count() == 25
    # the next epoch is NOT deduped
    more = spark.range(100, 110).selectExpr(
        "id as doc_id", "concat('b', id) as text",
        "cast(id % 3 as long) as day", "'train' as split",
    ).collect()
    w.commit([w.write(iter(more))], batchId=1)
    assert read_published_corpus(spark, root).count() == 35


def test_abort_deletes_staged_files_only(spark, tmp_path):
    from v6spark.sources.pubcorpus_writer import (
        PublishedCorpusStreamWriter,
    )

    root = str(tmp_path / "corpus")
    sdf = spark.range(0, 10).selectExpr(
        "id as doc_id", "concat('b', id) as text",
        "cast(id as long) as day", "'train' as split",
    )
    w = PublishedCorpusStreamWriter(
        root, sdf.schema, {"txnprefix": "ab"}, overwrite=False
    )
    msg_keep = w.write(iter(sdf.collect()))
    w.commit([msg_keep], batchId=0)
    committed = set(glob.glob(f"{root}/v=stream-*/**/*.parquet",
                              recursive=True))
    msg_bad = w.write(iter(sdf.selectExpr(
        "doc_id + 50 as doc_id", "text", "day", "split").collect()))
    w.abort([msg_bad, None], batchId=1)
    remaining = set(glob.glob(f"{root}/v=stream-*/**/*.parquet",
                              recursive=True))
    assert remaining == committed  # epoch-1 staging gone, epoch-0 intact
    assert read_published_corpus(spark, root).count() == 10


def test_sink_refusals(spark, tmp_path):
    from v6spark.sources.pubcorpus_writer import (
        PublishedCorpusStreamWriter,
    )

    sdf = spark.range(3).selectExpr(
        "id as doc_id", "'x' as text", "id as day", "'train' as split"
    )
    root = str(tmp_path / "c")
    with pytest.raises(ValueError, match="txnPrefix"):
        PublishedCorpusStreamWriter(root, sdf.schema, {}, False)
    with pytest.raises(ValueError, match="append-only"):
        PublishedCorpusStreamWriter(
            root, sdf.schema, {"txnprefix": "x"}, True
        )
    with pytest.raises(ValueError, match="branch"):
        PublishedCorpusStreamWriter(
            root, sdf.schema, {"txnprefix": "x", "branch": "b"}, False
        )


def test_mid_stream_posture_drift_fails_commit(spark, tmp_path):
    """A reshard committed between epochs makes the staged files
    mis-sharded: the NEXT commit must fail loudly, not write wrong
    shards (restart adopts the new posture)."""
    from v6spark.pipeline import reshard_published
    from v6spark.sources.pubcorpus_writer import (
        PublishedCorpusStreamWriter,
    )

    root = str(tmp_path / "corpus")
    sdf = spark.range(0, 20).selectExpr(
        "id as doc_id", "concat('b', id) as text",
        "cast(id % 3 as long) as day", "'train' as split",
    )
    w = PublishedCorpusStreamWriter(
        root, sdf.schema, {"txnprefix": "drift", "nshards": "2"},
        overwrite=False,
    )
    w.commit([w.write(iter(sdf.collect()))], batchId=0)
    reshard_published(spark, root, n_shards=4)
    msg = w.write(iter(sdf.selectExpr(
        "doc_id + 100 as doc_id", "text", "day", "split").collect()))
    with pytest.raises(Exception, match="shard posture"):
        w.commit([msg], batchId=1)
    # table unharmed at the resharded 20 rows
    assert read_published_corpus(spark, root).count() == 20


def test_offloaded_epochs_keep_prior_sidecars(spark, tmp_path, monkeypatch):
    """Every epoch offloads its manifest sidecar under its OWN
    directory: with a shared run-dir sidecar path, epoch N+1 would
    overwrite the sidecar epoch N's committed manifest still
    references — breaking time travel and emptying the CDC diff."""
    from v6spark import pipeline
    from v6spark.sources.pubcdc import read_published_changes_sql
    from v6spark.sources.pubcorpus_writer import (
        PublishedCorpusStreamWriter,
    )

    monkeypatch.setattr(pipeline, "_MANIFEST_INLINE_MAX", 0)
    root = str(tmp_path / "corpus")
    sdf = spark.range(0, 20).selectExpr(
        "id as doc_id", "concat('b', id) as text",
        "cast(id % 3 as long) as day", "'train' as split",
    )
    w = PublishedCorpusStreamWriter(
        root, sdf.schema, {"txnprefix": "off", "nshards": "2"},
        overwrite=False,
    )
    w.commit([w.write(iter(sdf.collect()))], batchId=0)
    more = spark.range(100, 110).selectExpr(
        "id as doc_id", "concat('b', id) as text",
        "cast(id % 3 as long) as day", "'train' as split",
    )
    w.commit([w.write(iter(more.collect()))], batchId=1)

    # v1 time travel still serves epoch-0's 20 rows, not the union
    v1 = spark.read.format("pubcorpus").option("version", "1").load(root)
    assert v1.count() == 20
    assert read_published_corpus(spark, root).count() == 30
    # the CDC window (1, 2] sees exactly epoch 1's inserts
    changes = read_published_changes_sql(spark, root, 1, 2).collect()
    assert sorted(r["doc_id"] for r in changes) == list(range(100, 110))
    assert {r["_change_type"] for r in changes} == {"insert"}


def test_sink_enforces_check_constraints(spark, tmp_path):
    """The sink rides the batch writer's Arrow path, so CHECK
    constraints gate every streamed batch: a violating microbatch
    fails the query and commits nothing."""
    from v6spark.pipeline import (
        publish_corpus_committed,
        set_published_constraint,
    )

    df = spark.range(20).selectExpr(
        "id as doc_id", "concat('body ', id) as text",
        "cast(id % 7 as long) as day",
        "case when id % 10 = 0 then 'valid' else 'train' end as split",
    )
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        df.selectExpr("doc_id", "split"), df.drop("split"), root,
        n_shards=4,
    )
    set_published_constraint(spark, root, "day_lt7", "day < 7")

    src = str(tmp_path / "src")
    spark.range(100, 110).selectExpr(
        "id as doc_id", "'bad' as text", "cast(42 as long) as day",
        "'train' as split",
    ).coalesce(1).write.parquet(os.path.join(src, "p=0"))
    with pytest.raises(Exception, match="day_lt7"):
        _run_stream(
            spark, src + "/p=*", root,
            str(tmp_path / "ckpt"), txnPrefix="cstr",
        )
    assert read_published_corpus(spark, root).count() == 20

    # compliant batches stream through, constraint carried
    src2 = str(tmp_path / "src2")
    spark.range(100, 110).selectExpr(
        "id as doc_id", "'ok' as text", "cast(1 as long) as day",
        "'train' as split",
    ).coalesce(1).write.parquet(os.path.join(src2, "p=0"))
    _run_stream(
        spark, src2 + "/p=*", root,
        str(tmp_path / "ckpt2"), txnPrefix="cstr2",
    )
    assert read_published_corpus(spark, root).count() == 30
    from v6spark.pipeline import list_published_constraints

    assert list_published_constraints(spark, root) == {
        "day_lt7": "day < 7"
    }
