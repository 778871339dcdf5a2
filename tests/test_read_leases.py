"""Reader-tracked vacuum safety: read leases.

The r5 gap: `vacuum_published_files(keep_last=1)` could delete the
files under a long-running version-pinned read.  A lease registered in
the commit log makes the leased version retained — manifest, version
directories, AND file-granular sweep all honor it — until release or
TTL expiry.
"""
from __future__ import annotations

import time

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    acquire_read_lease,
    publish_corpus_committed,
    read_published_corpus,
    release_read_lease,
    retract_from_published,
    vacuum_published_files,
)


def _publish(spark, tmp_path, n=40):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text"
    )
    prepared = spark.range(n).selectExpr("id as doc_id", "'train' as split")
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=2)
    return root


def test_leased_version_survives_vacuum_and_reads_back(spark, tmp_path):
    root = _publish(spark, tmp_path)
    lease, v = acquire_read_lease(spark, root, ttl_seconds=3600)
    assert v == 1
    # supersede v1 twice
    retract_from_published(spark, root, "doc_id = 1")
    retract_from_published(spark, root, "doc_id = 2")
    # keep_last=1 would normally retire v1 entirely
    vacuum_published_files(spark, root, keep_last=1)
    pinned = read_published_corpus(spark, root, version=v)
    assert pinned is not None and pinned.count() == 40  # intact
    # latest still correct
    assert read_published_corpus(spark, root).count() == 38

    # release -> the next vacuum retires v1 (manifest AND bytes)
    assert release_read_lease(spark, root, lease)
    vacuum_published_files(spark, root, keep_last=1)
    assert txlog.read_version(spark, f"{root}/{_COMMITS}", 1) is None
    assert read_published_corpus(spark, root, version=1) is None
    assert read_published_corpus(spark, root).count() == 38


def test_expired_lease_no_longer_protects(spark, tmp_path):
    root = _publish(spark, tmp_path, n=20)
    acquire_read_lease(spark, root, ttl_seconds=0.2)
    retract_from_published(spark, root, "doc_id = 1")
    time.sleep(0.4)
    vacuum_published_files(spark, root, keep_last=1)
    assert txlog.read_version(spark, f"{root}/{_COMMITS}", 1) is None
    # expired lease file was swept opportunistically
    assert txlog.leased_versions(spark, f"{root}/{_COMMITS}") == set()


def test_lease_validation(spark, tmp_path):
    root = _publish(spark, tmp_path, n=10)
    with pytest.raises(ValueError, match="no complete manifest"):
        acquire_read_lease(spark, root, version=99)
    with pytest.raises(ValueError, match="positive"):
        acquire_read_lease(spark, root, ttl_seconds=0)
    # releasing a nonexistent lease is a clean False
    assert release_read_lease(spark, root, "deadbeef") is False


def test_lease_protects_file_granular_sweep_of_rewritten_files(
    spark, tmp_path
):
    """The file-level sweep (which deletes superseded ORIGINALS inside
    still-referenced version dirs) must also spare a leased version's
    files — the subtle case: v2 references most of v1's files, vacuum
    keep_last=1 would delete v1's rewritten-away originals, but a v1
    lease keeps them."""
    root = _publish(spark, tmp_path)
    lease, _v = acquire_read_lease(spark, root, version=1)
    retract_from_published(spark, root, "doc_id = 0")
    vacuum_published_files(spark, root, keep_last=1)
    # the pinned read still sees doc 0 (its original file survived)
    pinned = read_published_corpus(spark, root, version=1)
    assert pinned.filter("doc_id = 0").count() == 1
    release_read_lease(spark, root, lease)
    vacuum_published_files(spark, root, keep_last=1)
    assert read_published_corpus(spark, root, version=1) is None
