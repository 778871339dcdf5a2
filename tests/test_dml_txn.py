"""Exactly-once corpus DML via txn ids (the streaming-sink contract).

`retract_from_published` / `upsert_into_published` with a `txn_id`
already recorded in the manifest skip as idempotent replays; no-op
txns still record (a later replay must not re-apply against new data);
ids survive compact/evolve/republish; `upsert_foreach_batch` is the
Structured Streaming sink built on this.
"""
from __future__ import annotations

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    compact_published,
    evolve_published_schema,
    publish_corpus_committed,
    read_published_corpus,
    retract_from_published,
    upsert_into_published,
    upsert_foreach_batch,
)


def _publish(spark, tmp_path, n=40):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text"
    )
    prepared = spark.range(n).selectExpr("id as doc_id", "'train' as split")
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=2)
    return root


def test_upsert_replay_skips(spark, tmp_path):
    root = _publish(spark, tmp_path)
    upd = spark.createDataFrame(
        [(5, "rev 5", None)], "doc_id long, text string, split string"
    )
    r1 = upsert_into_published(spark, root, upd, txn_id="job-1")
    assert r1["rows_updated"] == 1 and "replayed" not in r1
    r2 = upsert_into_published(spark, root, upd, txn_id="job-1")
    assert r2["replayed"] is True and r2["rows_updated"] == 0
    assert r2["_version"] == r1["_version"]  # no burned version
    out = read_published_corpus(spark, root)
    assert out.filter("doc_id = 5").collect()[0]["text"] == "rev 5"


def test_retract_replay_skips_even_after_new_matching_rows(
    spark, tmp_path
):
    """The dangerous replay: txn A retracts pred P; new rows matching
    P are upserted later; a crash-replay of A must NOT delete them."""
    root = _publish(spark, tmp_path)
    r1 = retract_from_published(
        spark, root, "text = 'body 7'", txn_id="takedown-1"
    )
    assert r1["rows_removed"] == 1
    # the same content comes back under a new key
    ins = spark.createDataFrame(
        [(1007, "body 7", "train")], "doc_id long, text string, split string"
    )
    upsert_into_published(spark, root, ins)
    # replay of the takedown: skipped, the new row survives
    r2 = retract_from_published(
        spark, root, "text = 'body 7'", txn_id="takedown-1"
    )
    assert r2["replayed"] is True and r2["rows_removed"] == 0
    assert read_published_corpus(spark, root).filter(
        "doc_id = 1007"
    ).count() == 1


def test_noop_txn_still_records(spark, tmp_path):
    """txn whose predicate matches nothing must still commit its id:
    matching rows arriving later + a replay would otherwise re-apply."""
    root = _publish(spark, tmp_path)
    r1 = retract_from_published(
        spark, root, "text = 'body 9999'", txn_id="t-noop"
    )
    assert r1["rows_removed"] == 0 and "replayed" not in r1
    v, doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    assert v == r1["_version"] == 2  # metadata-only commit landed
    assert "t-noop" in doc["txn_ids"]
    # rows matching arrive...
    ins = spark.createDataFrame(
        [(900, "body 9999", "train")], "doc_id long, text string, split string"
    )
    upsert_into_published(spark, root, ins)
    # ...and the replay skips instead of deleting them
    r2 = retract_from_published(
        spark, root, "text = 'body 9999'", txn_id="t-noop"
    )
    assert r2["replayed"] is True
    assert read_published_corpus(spark, root).filter(
        "doc_id = 900"
    ).count() == 1


def test_txn_ids_survive_compact_evolve_republish(spark, tmp_path):
    root = _publish(spark, tmp_path, n=20)
    upd = spark.createDataFrame(
        [(3, "rev 3", None)], "doc_id long, text string, split string"
    )
    upsert_into_published(spark, root, upd, txn_id="u-1")
    assert compact_published(spark, root) == 3
    evolve_published_schema(spark, root, [("license", "string")])
    _v, doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    assert "u-1" in doc["txn_ids"]
    # republish (same table identity) keeps the ledger
    docs2 = spark.range(20).selectExpr(
        "id as doc_id", "concat('v2 ', id) as text", "'mit' as license"
    )
    prepared = spark.range(20).selectExpr("id as doc_id", "'train' as split")
    publish_corpus_committed(prepared, docs2, root, n_shards=2)
    _v, doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    assert "u-1" in doc["txn_ids"]
    # replay still skips post-republish
    r = upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(3, "rev 3", "x", None)],
            "doc_id long, text string, license string, split string",
        ),
        txn_id="u-1",
    )
    assert r["replayed"] is True


def test_upsert_foreach_batch_is_exactly_once(spark, tmp_path):
    """The streaming sink under epoch replay: the same batch id
    applied twice lands once."""
    root = _publish(spark, tmp_path)
    fn = upsert_foreach_batch(root)
    batch = spark.createDataFrame(
        [(4, "stream rev 4", None), (2004, "stream new", "train")],
        "doc_id long, text string, split string",
    )
    fn(batch, 7)
    v1, _ = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    fn(batch, 7)  # crash-replayed epoch
    v2, doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    assert v1 == v2 and "stream-7" in doc["txn_ids"]
    out = read_published_corpus(spark, root)
    assert out.count() == 41
    assert out.filter("text = 'stream rev 4'").count() == 1


def test_publish_replay_skips_with_txn_id(spark, tmp_path):
    """A txn-id'd publish replayed (the streaming-bootstrap crash
    shape) must not burn a version or rewrite data."""
    docs = spark.range(10).selectExpr(
        "id as doc_id", "concat('b ', id) as text"
    )
    prepared = spark.range(10).selectExpr("id as doc_id", "'train' as split")
    root = str(tmp_path / "corpus")
    r1 = publish_corpus_committed(
        prepared, docs, root, n_shards=2, txn_id="boot-1"
    )
    r2 = publish_corpus_committed(
        prepared, docs, root, n_shards=2, txn_id="boot-1"
    )
    assert r2["replayed"] is True and r2["_version"] == r1["_version"] == 1
    assert r2["train"] == 10  # the recorded split counts come back
    v, doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    assert v == 1 and "boot-1" in doc["txn_ids"]
    # a different txn id is a REAL republish (new version)
    r3 = publish_corpus_committed(
        prepared, docs, root, n_shards=2, txn_id="boot-2"
    )
    assert r3["_version"] == 2
