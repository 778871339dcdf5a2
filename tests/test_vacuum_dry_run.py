"""VACUUM ... DRY RUN: both vacuums report exactly what they would
delete, delete nothing, and the real run then matches the audit.
"""
from __future__ import annotations

import os

from v6spark.pipeline import (
    _COMMITS,
    publish_corpus_committed,
    read_published_corpus,
    retract_from_published,
    vacuum_published,
    vacuum_published_files,
)


def _publish(spark, tmp_path, n=40):
    df = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text",
        "cast(id % 7 as long) as day",
        "case when id % 10 = 0 then 'valid' else 'train' end as split",
    )
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        df.selectExpr("doc_id", "split"), df.drop("split"), root,
        n_shards=4,
    )
    return root, df


def _disk_files(root):
    out = []
    for base, _d, files in os.walk(root):
        for f in files:
            if not f.startswith(("_", ".")):
                out.append(os.path.join(base, f))
    return sorted(out)


def test_directory_vacuum_dry_run_then_real(spark, tmp_path):
    root, df = _publish(spark, tmp_path)                 # v1
    publish_corpus_committed(                            # v2: full
        df.selectExpr("doc_id", "split"), df.drop("split"), root,
        n_shards=4,
    )
    before = _disk_files(root)
    report = vacuum_published(spark, root, keep_last=1, dry_run=True)
    assert len(report["directories"]) == 1
    assert report["directories"][0].startswith("v=000001")
    assert len(report["manifests"]) == 1
    # nothing was touched: v1 still time-travels
    assert _disk_files(root) == before
    assert read_published_corpus(spark, root, version=1).count() == 40
    # the real run removes exactly the audited set
    removed = vacuum_published(spark, root, keep_last=1)
    assert removed == len(report["directories"])
    assert read_published_corpus(spark, root).count() == 40


def test_file_vacuum_dry_run_then_real(spark, tmp_path):
    root, _df = _publish(spark, tmp_path)                # v1
    retract_from_published(spark, root, "doc_id < 20")   # v2 rewrite
    before = _disk_files(root)
    report = vacuum_published_files(
        spark, root, keep_last=1, dry_run=True
    )
    assert report["files"], "superseded originals must be listed"
    assert all(f.startswith("v=000001") for f in report["files"])
    assert report["manifests"], "v1's manifest would retire"
    assert _disk_files(root) == before                   # untouched
    removed = vacuum_published_files(spark, root, keep_last=1)
    assert removed == len(report["files"]) + len(
        report["directories"]
    )
    assert read_published_corpus(spark, root).count() == 20


def test_dry_run_respects_retention(spark, tmp_path):
    """keep_last covering every version -> empty audit."""
    root, _df = _publish(spark, tmp_path)
    retract_from_published(spark, root, "doc_id < 5")
    report = vacuum_published_files(
        spark, root, keep_last=5, dry_run=True
    )
    assert report["files"] == []
    assert report["directories"] == []
    assert report["manifests"] == []
