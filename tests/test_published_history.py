"""DESCRIBE HISTORY for the published corpus (published_history):
every verb's commit classified from manifests alone, newest first,
timestamps resolving back through asOf time travel.
"""
from __future__ import annotations

import json

import pytest

from v6spark.pipeline import (
    compact_published,
    create_published_branch,
    drop_published_constraint,
    evolve_published_schema,
    merge_into_published,
    publish_corpus_committed,
    published_history,
    read_published_corpus,
    restore_published,
    retract_from_published,
    set_published_constraint,
    upsert_into_published,
    vacuum_published,
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


def _ops(spark, root, **kw):
    return [
        (r.version, r.operation)
        for r in published_history(spark, root, **kw).collect()
    ]


def test_history_sequence_and_details(spark, tmp_path):
    root = _publish(spark, tmp_path)                              # 1
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(3, "edit", 1, "train")],
            "doc_id long, text string, day long, split string",
        ),
        txn_id="job-1",
    )                                                             # 2
    retract_from_published(spark, root, "doc_id = 5")             # 3
    evolve_published_schema(spark, root, [("score", "double")])   # 4
    set_published_constraint(spark, root, "d", "day < 100")       # 5
    restore_published(spark, root, version=3)                     # 6
    compact_published(spark, root)                                # 7

    h = published_history(spark, root).collect()
    assert [(r.version, r.operation) for r in h] == [
        (7, "OPTIMIZE"),
        (6, "RESTORE"),
        (5, "ALTER CONSTRAINT"),
        (4, "ADD COLUMNS"),
        (3, "DELETE"),
        (2, "UPSERT"),
        (1, "PUBLISH"),
    ]
    by_v = {r.version: r for r in h}
    assert json.loads(by_v[3].details)["predicate"] == "doc_id = 5"
    assert json.loads(by_v[6].details)["version"] == 3
    assert json.loads(by_v[5].details) == {
        "set": "d", "expr": "day < 100"
    }
    assert by_v[2].txn_id == "job-1"
    assert by_v[3].txn_id is None
    assert by_v[4].schema_changed is True
    assert by_v[1].schema_changed is False
    # timestamps are monotone non-decreasing in version order and
    # round-trip through asOf time travel
    ts = [r.timestamp for r in sorted(h, key=lambda r: r.version)]
    assert ts == sorted(ts)
    pinned = read_published_corpus(spark, root, as_of=by_v[3].timestamp)
    assert pinned.count() == 39  # post-delete, pre-restore state


def test_history_append_and_merge_markers(spark, tmp_path):
    root = _publish(spark, tmp_path)                              # 1
    register_pubcorpus_source(spark)
    spark.range(100, 110).selectExpr(
        "id as doc_id", "'appended' as text", "cast(1 as long) as day",
        "'train' as split",
    ).write.format("pubcorpus").mode("append").save(root)         # 2
    merge_into_published(
        spark, root,
        spark.createDataFrame(
            [(3, "merged", 2, "train")],
            "doc_id long, text string, day long, split string",
        ),
        when_matched_update="*",
    )                                                             # 3
    ops = dict(_ops(spark, root))
    assert ops[2] == "APPEND"
    assert ops[3] == "MERGE"
    d3 = json.loads(
        {r.version: r.details
         for r in published_history(spark, root).collect()}[3]
    )
    assert d3 == {"applied_on": 2, "deletes": 0, "updates": 1,
                  "inserts": 0}


def test_history_limit_branch_and_vacuum(spark, tmp_path):
    root = _publish(spark, tmp_path)                              # 1
    retract_from_published(spark, root, "doc_id = 1")             # 2
    retract_from_published(spark, root, "doc_id = 2")             # 3
    assert _ops(spark, root, limit=2) == [
        (3, "DELETE"), (2, "DELETE")
    ]
    create_published_branch(spark, root, "exp")
    retract_from_published(spark, root, "doc_id = 3", branch="exp")
    bops = _ops(spark, root, branch="exp")
    assert bops[0][1] == "DELETE"
    assert bops[-1][1] == "BRANCH CUT"
    # vacuumed versions leave history exactly as time travel does
    vacuum_published(spark, root, keep_last=1)
    remaining = [v for v, _op in _ops(spark, root)]
    assert 1 not in remaining
