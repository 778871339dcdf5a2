"""Shard-count evolution on committed publishes.

Resharding rewrites every row under a new shard hash but changes no
content: the change feed across it is empty, point lookups and DML
prune with the new params immediately, and pinned readers keep the
old layout.
"""
from __future__ import annotations

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    publish_corpus_committed,
    published_corpus_changes,
    published_file_census,
    read_published_corpus,
    read_published_keys,
    reshard_published,
    upsert_into_published,
)


def _publish(spark, tmp_path, n=200, n_shards=4):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text"
    )
    prepared = spark.range(n).selectExpr("id as doc_id", "'train' as split")
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=n_shards)
    return root


def _content(spark, root, version=None):
    df = read_published_corpus(spark, root, version=version)
    return sorted(
        (r["doc_id"], r["text"]) for r in df.select("doc_id", "text").collect()
    )


def test_reshard_preserves_content_and_updates_layout(spark, tmp_path):
    root = _publish(spark, tmp_path)
    before = _content(spark, root)
    v = reshard_published(spark, root, 16)
    assert v == 2
    assert _content(spark, root) == before
    _v, doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    assert doc["n_shards"] == 16 and doc["resharded_from"] == 1
    census = published_file_census(spark, root)
    assert census.select("shard").distinct().count() == 16
    # pinned reader keeps the old layout
    assert _content(spark, root, version=1) == before


def test_change_feed_across_reshard_is_empty(spark, tmp_path):
    root = _publish(spark, tmp_path, n=100)
    reshard_published(spark, root, 8)
    ch = published_corpus_changes(spark, root, 1, 2)
    assert ch is None or ch.count() == 0


def test_lookup_and_dml_prune_with_new_params(spark, tmp_path):
    root = _publish(spark, tmp_path, n=300, n_shards=2)
    reshard_published(spark, root, 12)
    scanned = []
    hit = read_published_keys(
        spark, root, [17, 250],
        _scan_observer=lambda s, fl: scanned.append(len(fl)),
    )
    assert {r["doc_id"] for r in hit.collect()} == {17, 250}
    assert 0 < sum(scanned) <= 4  # pruned against the 12-shard layout
    res = upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(17, "rev 17", None)], "doc_id long, text string, split string"
        ),
    )
    assert res["rows_updated"] == 1
    assert res["files_rewritten"] <= 2
    out = read_published_corpus(spark, root)
    assert out.filter("doc_id = 17").collect()[0]["text"] == "rev 17"
    assert out.count() == 300


def test_reshard_validates(spark, tmp_path):
    root = _publish(spark, tmp_path, n=20, n_shards=2)
    with pytest.raises(ValueError, match="n_shards"):
        reshard_published(spark, root, 0)
    with pytest.raises(ValueError, match="no committed publish"):
        reshard_published(spark, str(tmp_path / "nowhere"), 4)
