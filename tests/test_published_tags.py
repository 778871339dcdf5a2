"""Named version references (txlog tags + pipeline.tag_published):
vacuum-proof pins — a tagged snapshot stays readable for as long as
the tag exists, regardless of keep_last retention; deleting the tag
returns the version to normal retention.  The Iceberg tag / named
snapshot idea on the commit log."""

from __future__ import annotations

import pytest

from v6spark.pipeline import (
    delete_published_tag,
    list_published_tags,
    publish_corpus_committed,
    read_published_corpus,
    read_published_keys,
    read_published_where,
    tag_published,
    upsert_into_published,
    vacuum_published_files,
)


def _publish(spark, root, n=24):
    prepared = spark.createDataFrame(
        [(i, "train") for i in range(n)], "doc_id long, split string"
    )
    content = spark.createDataFrame(
        [(i, f"v1 body {i:03d}") for i in range(n)],
        "doc_id long, text string",
    )
    return publish_corpus_committed(prepared, content, root, n_shards=4)


def _upsert(spark, root, label, keys):
    upd = spark.createDataFrame(
        [(k, f"{label} body {k:03d}", None) for k in keys],
        "doc_id long, text string, split string",
    )
    return upsert_into_published(spark, root, upd, key_col="doc_id")


def test_tagged_version_survives_retention(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _publish(spark, root)
    v = tag_published(spark, root, "eval-baseline")
    assert v == 1
    _upsert(spark, root, "v2", [0, 1])
    _upsert(spark, root, "v3", [2, 3])
    vacuum_published_files(spark, root, keep_last=1)

    # the tagged snapshot reads back in full, by tag and by version
    base = read_published_corpus(spark, root, tag="eval-baseline")
    assert base.count() == 24
    assert base.filter("doc_id = 0").collect()[0]["text"] == "v1 body 000"
    assert read_published_corpus(spark, root, version=v).count() == 24
    # latest is unaffected
    cur = read_published_corpus(spark, root)
    assert cur.filter("doc_id = 0").collect()[0]["text"] == "v2 body 000"
    assert list_published_tags(spark, root) == {"eval-baseline": 1}

    # tag-pinned selective + point reads
    got = read_published_where(
        spark, root, "doc_id < 2", tag="eval-baseline"
    ).orderBy("doc_id").collect()
    assert [r["text"] for r in got] == ["v1 body 000", "v1 body 001"]
    got = read_published_keys(spark, root, [3], tag="eval-baseline")
    assert got.collect()[0]["text"] == "v1 body 003"

    # drop the tag: the version re-enters retention and goes
    assert delete_published_tag(spark, root, "eval-baseline")
    vacuum_published_files(spark, root, keep_last=1)
    assert read_published_corpus(spark, root, version=1) is None
    assert read_published_corpus(spark, root).count() == 24  # latest fine


def test_tag_creation_rules(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _publish(spark, root)
    _upsert(spark, root, "v2", [5])
    tag_published(spark, root, "prod", version=1)
    with pytest.raises(ValueError, match="already exists"):
        tag_published(spark, root, "prod", version=2)
    assert tag_published(spark, root, "prod", version=2, replace=True) == 2
    assert list_published_tags(spark, root)["prod"] == 2
    with pytest.raises(ValueError, match="invalid tag name"):
        tag_published(spark, root, "../escape")
    with pytest.raises(ValueError, match="no complete manifest"):
        tag_published(spark, root, "ghost", version=99)
    with pytest.raises(ValueError, match="not both"):
        read_published_corpus(spark, root, version=1, tag="prod")
    with pytest.raises(ValueError, match="no tag"):
        read_published_corpus(spark, root, tag="nope")
    assert not delete_published_tag(spark, root, "nope")


def test_keep_since_time_based_retention(spark, tmp_path):
    """vacuum(keep_since=ts) retains every version committed at or
    after the timestamp (Delta retention-hours shape, commit times
    from monotonically adjusted manifest mtimes) on top of
    keep_last/leases/tags — and versions older than the window retire
    as usual."""
    import time as _time

    from v6spark.pipeline import (
        publish_corpus_committed,
        read_published_corpus,
        retract_from_published,
        vacuum_published_files,
    )

    root = str(tmp_path / "corpus")
    docs = spark.range(30).selectExpr(
        "id as doc_id", "concat('b', id) as text",
        "cast(id % 3 as long) as day",
    )
    prepared = spark.range(30).selectExpr(
        "id as doc_id", "'train' as split"
    )
    publish_corpus_committed(prepared, docs, root, n_shards=2)  # v1
    _time.sleep(0.6)
    cutoff = _time.time()
    _time.sleep(0.2)
    retract_from_published(spark, root, "doc_id < 5")           # v2
    retract_from_published(spark, root, "doc_id = 7")           # v3

    # keep_last=1 alone would retire v2; keep_since spares it (v2, v3
    # committed after the cutoff), while v1 (before cutoff) retires
    vacuum_published_files(spark, root, keep_last=1,
                           keep_since=cutoff)
    assert read_published_corpus(spark, root, version=2).count() == 25
    assert read_published_corpus(spark, root, version=3).count() == 24
    assert read_published_corpus(spark, root, version=1) is None

    # a cutoff in the future keeps only keep_last (nothing is newer)
    vacuum_published_files(spark, root, keep_last=1,
                           keep_since=_time.time() + 3600)
    assert read_published_corpus(spark, root, version=3).count() == 24
    assert read_published_corpus(spark, root, version=2) is None
