"""Corpus replication via the change feed.

The mirror must converge to the source's exact content through
publish, upsert, retract, and schema-agnostic windows; epoch replay
must not double-apply; the destination keeps its own shard layout.
"""
from __future__ import annotations

from v6spark.pipeline import (
    publish_corpus_committed,
    read_published_corpus,
    retract_from_published,
    upsert_into_published,
)
from v6spark.sources.publog import stream_published_log
from v6spark.streaming.replication import mirror_foreach_batch


def _publish(spark, tmp_path, n=40):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text"
    )
    prepared = spark.range(n).selectExpr(
        "id as doc_id",
        "case when id % 10 = 0 then 'valid' else 'train' end as split",
    )
    root = str(tmp_path / "src")
    publish_corpus_committed(prepared, docs, root, n_shards=4)
    return root


def _content(spark, root):
    df = read_published_corpus(spark, root)
    return sorted(
        (r["doc_id"], r["text"], r["split"])
        for r in df.select("doc_id", "text", "split").collect()
    )


def _run(spark, src, dst, ckpt):
    q = (
        stream_published_log(spark, src)
        .writeStream
        .foreachBatch(mirror_foreach_batch(src, dst, n_shards=2))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_mirror_converges_through_lifecycle(spark, tmp_path):
    src = _publish(spark, tmp_path)
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")

    _run(spark, src, dst, ckpt)  # bootstrap snapshot
    assert _content(spark, dst) == _content(spark, src)

    upsert_into_published(
        spark, src,
        spark.createDataFrame(
            [(3, "revised three", None), (1003, "fresh", "train")],
            "doc_id long, text string, split string",
        ),
    )
    retract_from_published(spark, src, "doc_id in (10, 11)")
    _run(spark, src, dst, ckpt)
    assert _content(spark, dst) == _content(spark, src)

    # destination kept its own shard layout and is itself a table
    from v6spark import txlog
    from v6spark.pipeline import _COMMITS

    _v, doc = txlog.read_latest(spark, f"{dst}/{_COMMITS}")
    assert doc["n_shards"] == 2

    # delete-only window
    retract_from_published(spark, src, "doc_id = 7")
    _run(spark, src, dst, ckpt)
    assert _content(spark, dst) == _content(spark, src)


def test_mirror_replay_is_exactly_once(spark, tmp_path):
    """Re-invoking the batch function with the same window (the
    crash-replay shape) must skip both DML transactions."""
    src = _publish(spark, tmp_path, n=20)
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, dst, ckpt)
    upsert_into_published(
        spark, src,
        spark.createDataFrame(
            [(2, "rev two", None)], "doc_id long, text string, split string"
        ),
    )
    retract_from_published(spark, src, "doc_id = 5")
    fn = mirror_foreach_batch(src, dst, n_shards=2)
    log_rows = (
        spark.read.format("publog").load(src).filter("version > 1")
    )
    fn(log_rows, 1)
    state = _content(spark, dst)
    assert state == _content(spark, src)
    from v6spark import txlog
    from v6spark.pipeline import _COMMITS

    v1, _ = txlog.read_latest(spark, f"{dst}/{_COMMITS}")
    fn(log_rows, 1)  # replayed epoch
    v2, _ = txlog.read_latest(spark, f"{dst}/{_COMMITS}")
    assert v1 == v2
    assert _content(spark, dst) == state


def test_mirror_handles_string_keys(spark, tmp_path):
    """IN-list delete application must quote string keys."""
    docs = spark.createDataFrame(
        [(f"doc-{i}", f"body {i}") for i in range(10)],
        "doc_id string, text string",
    )
    prepared = spark.createDataFrame(
        [(f"doc-{i}", "train") for i in range(10)],
        "doc_id string, split string",
    )
    src = str(tmp_path / "src")
    publish_corpus_committed(prepared, docs, src, n_shards=2)
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, dst, ckpt)
    retract_from_published(spark, src, "doc_id = 'doc-4'")
    _run(spark, src, dst, ckpt)
    assert _content(spark, dst) == _content(spark, src)
    assert read_published_corpus(spark, dst).filter(
        "doc_id = 'doc-4'"
    ).count() == 0


def test_mirror_applies_split_moves(spark, tmp_path):
    """A key that nets to update_pre/postimage with a CHANGED split
    must land in its new split on the mirror (in-place upsert would
    pin it to the old one)."""
    src = _publish(spark, tmp_path, n=20)
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, dst, ckpt)  # bootstrap

    # source moves doc 3 train -> valid (retract + re-insert); both
    # land in one mirror window, netting to an update with split change
    retract_from_published(spark, src, "doc_id = 3")
    upsert_into_published(
        spark, src,
        spark.createDataFrame(
            [(3, "moved three", "valid")],
            "doc_id long, text string, split string",
        ),
    )
    _run(spark, src, dst, ckpt)
    assert _content(spark, dst) == _content(spark, src)
    moved = read_published_corpus(spark, dst).filter("doc_id = 3")
    row = moved.collect()[0]
    assert row["split"] == "valid" and row["text"] == "moved three"


def test_mirror_escapes_quoted_string_keys(spark, tmp_path):
    """Keys containing single quotes must survive the IN-list delete
    (repr() would emit double-quoted SQL-invalid literals)."""
    keys = [f"it's-{i}" for i in range(6)]
    docs = spark.createDataFrame(
        [(k, f"body {k}") for k in keys], "doc_id string, text string"
    )
    prepared = spark.createDataFrame(
        [(k, "train") for k in keys], "doc_id string, split string"
    )
    src = str(tmp_path / "src")
    publish_corpus_committed(prepared, docs, src, n_shards=2)
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, dst, ckpt)
    retract_from_published(spark, src, "doc_id = \"it's-2\"")
    _run(spark, src, dst, ckpt)
    assert _content(spark, dst) == _content(spark, src)
    assert read_published_corpus(spark, dst).count() == 5


def test_sql_key_literal_escaping_modes():
    import pytest

    from v6spark.streaming.replication import _sql_key_literal

    assert _sql_key_literal(7) == "7"
    assert _sql_key_literal("a'b") == "'a''b'"
    # backslashes escape per the session's parser mode — no key is a
    # poison pill that wedges the mirror stream
    assert _sql_key_literal("a\\b") == "'a\\\\b'"
    assert _sql_key_literal("a\\b", escaped_literals=True) == "'a\\b'"
    with pytest.raises(TypeError):
        _sql_key_literal(1.5)
    with pytest.raises(TypeError):
        _sql_key_literal(True)


def test_mirror_handles_backslash_keys(spark, tmp_path):
    keys = ["p\\q-1", "p\\q-2", "plain-3"]
    docs = spark.createDataFrame(
        [(k, f"body {k}") for k in keys], "doc_id string, text string"
    )
    prepared = spark.createDataFrame(
        [(k, "train") for k in keys], "doc_id string, split string"
    )
    src = str(tmp_path / "src")
    publish_corpus_committed(prepared, docs, src, n_shards=2)
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, dst, ckpt)
    retract_from_published(
        spark, src, "doc_id = 'p\\\\q-1'"
        if spark.conf.get(
            "spark.sql.parser.escapedStringLiterals", "false"
        ) == "false" else "doc_id = 'p\\q-1'"
    )
    _run(spark, src, dst, ckpt)
    assert _content(spark, dst) == _content(spark, src)
    assert read_published_corpus(spark, dst).count() == 2


def test_bootstrap_replay_does_not_burn_a_version(spark, tmp_path):
    """Replaying the bootstrap epoch (crash between publish and
    checkpoint commit) must skip via the derived txn id."""
    from v6spark import txlog
    from v6spark.pipeline import _COMMITS
    from v6spark.sources.publog import register_publog_source

    register_publog_source(spark)
    src = _publish(spark, tmp_path, n=10)
    dst = str(tmp_path / "dst")
    fn = mirror_foreach_batch(src, dst, n_shards=2)
    log_rows = spark.read.format("publog").load(src)
    fn(log_rows, 0)
    v1, _ = txlog.read_latest(spark, f"{dst}/{_COMMITS}")
    fn(log_rows, 0)  # replayed bootstrap epoch
    v2, _ = txlog.read_latest(spark, f"{dst}/{_COMMITS}")
    assert v1 == v2 == 1
    assert _content(spark, dst) == _content(spark, src)


def test_mirror_converges_through_dv_retract(spark, tmp_path):
    src = _publish(spark, tmp_path)
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, dst, ckpt)  # bootstrap
    assert _content(spark, dst) == _content(spark, src)

    retract_from_published(spark, src, "doc_id in (7, 20)", strategy="dv")
    _run(spark, src, dst, ckpt)
    assert _content(spark, dst) == _content(spark, src)
    assert len(_content(spark, dst)) == 38
