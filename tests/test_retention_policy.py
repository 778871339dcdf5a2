"""Table-attached retention policy (set_published_retention): the
policy travels in the manifest, every DML carries it, and the
vacuums/maintenance consume it when the caller passes nothing —
explicit arguments always win.
"""
from __future__ import annotations

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    published_history,
    publish_corpus_committed,
    read_published_corpus,
    retract_from_published,
    set_published_retention,
    vacuum_published,
    vacuum_published_files,
)
from v6spark.sources.pubcorpus import register_pubcorpus_source


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
    return root


def _doc(spark, root):
    return txlog.read_latest(spark, f"{root}/{_COMMITS}")[1]


def test_policy_set_carry_and_history(spark, tmp_path):
    root = _publish(spark, tmp_path)                     # v1
    res = set_published_retention(spark, root, keep_last=3)  # v2
    assert res["retention"] == {"keep_last": 3}
    assert _doc(spark, root)["retention"] == {"keep_last": 3}
    # DML carries the policy (Python verb and SQL writer alike)
    retract_from_published(spark, root, "doc_id = 1")    # v3
    assert _doc(spark, root)["retention"] == {"keep_last": 3}
    register_pubcorpus_source(spark)
    spark.range(100, 104).selectExpr(
        "id as doc_id", "'a' as text", "cast(1 as long) as day",
        "'train' as split",
    ).write.format("pubcorpus").mode("append").save(root)  # v4
    assert _doc(spark, root)["retention"] == {"keep_last": 3}
    ops = {r.version: r.operation
           for r in published_history(spark, root).collect()}
    assert ops[2] == "SET RETENTION"


def test_vacuum_honors_policy_and_explicit_override(spark, tmp_path):
    root = _publish(spark, tmp_path)                     # v1
    set_published_retention(spark, root, keep_last=3)    # v2
    retract_from_published(spark, root, "doc_id = 1")    # v3
    retract_from_published(spark, root, "doc_id = 2")    # v4
    retract_from_published(spark, root, "doc_id = 3")    # v5
    vacuum_published(spark, root)                        # policy: 3
    log = f"{root}/{_COMMITS}"
    assert txlog.read_version(spark, log, 3) is not None
    assert txlog.read_version(spark, log, 2) is None
    # explicit argument wins over the policy
    vacuum_published_files(spark, root, keep_last=1)
    assert txlog.read_version(spark, log, 4) is None
    assert read_published_corpus(spark, root).count() == 37


def test_keep_hours_policy_retains_recent_versions(spark, tmp_path):
    root = _publish(spark, tmp_path)
    set_published_retention(spark, root, keep_hours=1000.0)
    retract_from_published(spark, root, "doc_id = 1")
    retract_from_published(spark, root, "doc_id = 2")
    vacuum_published(spark, root)   # everything is < 1000h old
    log = f"{root}/{_COMMITS}"
    assert txlog.read_version(spark, log, 1) is not None
    # clearing the policy restores the keep_last=1 default
    set_published_retention(spark, root)
    vacuum_published(spark, root)
    assert txlog.read_version(spark, log, 1) is None
    assert "retention" not in _doc(spark, root)


def test_policy_validation(spark, tmp_path):
    root = _publish(spark, tmp_path)
    with pytest.raises(ValueError, match="keep_last"):
        set_published_retention(spark, root, keep_last=0)
    with pytest.raises(ValueError, match="keep_hours"):
        set_published_retention(spark, root, keep_hours=-1)
