"""Conditional MERGE INTO the published corpus
(merge_into_published) — Delta MERGE semantics as ONE main commit.

The apply rides the proven branch-merge protocol (temp mergetmp-*
branch + OCC adoption), so these tests focus on clause semantics,
atomicity (exactly one new main version; refusals leave main
untouched and no branch debris), and composition with CHECK
constraints and txn replay.
"""
from __future__ import annotations

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    list_published_branches,
    merge_into_published,
    publish_corpus_committed,
    read_published_corpus,
    set_published_constraint,
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
    return root


def _src(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, day long, split string"
    )


def _rows(spark, root):
    return {
        r.doc_id: (r.text, r.day)
        for r in read_published_corpus(spark, root).collect()
    }


def _version(spark, root):
    return txlog.read_latest(spark, f"{root}/{_COMMITS}")[0]


def test_merge_update_insert_delete_one_commit(spark, tmp_path):
    root = _publish(spark, tmp_path)
    src = _src(spark, [
        (3, "edited", 50, "train"),     # matched -> update
        (5, "whatever", 0, "train"),    # matched, day=5 -> delete
        (900, "fresh", 1, "valid"),     # unmatched -> insert
    ])
    res = merge_into_published(
        spark, root, src,
        when_matched_update="*",
        when_matched_delete="t.day = 5",
        when_not_matched_insert="*",
    )
    # exactly ONE new main version despite branch retract + upsert
    assert res["_version"] == 2
    assert _version(spark, root) == 2
    assert (res["rows_updated"], res["rows_inserted"],
            res["rows_deleted"]) == (1, 1, 1)
    rows = _rows(spark, root)
    assert rows[3] == ("edited", 50)
    assert 5 not in rows
    assert rows[900] == ("fresh", 1)
    assert rows[7] == ("body 7", 0)  # untouched
    # insert landed in the split the source named
    got = read_published_corpus(spark, root).filter(
        "doc_id = 900"
    ).collect()
    assert got[0]["split"] == "valid"
    # no branch debris
    assert list_published_branches(spark, root) == {}


def test_partial_update_keeps_unlisted_columns(spark, tmp_path):
    root = _publish(spark, tmp_path)
    src = _src(spark, [(4, "ignored", 99, "train")])
    merge_into_published(
        spark, root, src,
        when_matched_update={"day": "s.day + t.day"},
    )
    rows = _rows(spark, root)
    assert rows[4] == ("body 4", 103)  # text kept, day = 99 + 4


def test_conditions_reference_both_sides(spark, tmp_path):
    root = _publish(spark, tmp_path)
    src = _src(spark, [
        (3, "newer", 100, "train"),   # s.day > t.day -> updates
        (4, "older", 0, "train"),     # s.day < t.day -> skipped
        (901, "low", 0, "train"),     # unmatched, day < 5 -> insert
        (902, "high", 9, "train"),    # unmatched, day >= 5 -> skipped
    ])
    res = merge_into_published(
        spark, root, src,
        when_matched_update="*",
        matched_condition="s.day > t.day",
        when_not_matched_insert="*",
        not_matched_condition="s.day < 5",
    )
    assert (res["rows_updated"], res["rows_inserted"],
            res["rows_deleted"]) == (1, 1, 0)
    rows = _rows(spark, root)
    assert rows[3] == ("newer", 100)
    assert rows[4] == ("body 4", 4)
    assert 901 in rows and 902 not in rows


def test_insert_mapping_builds_the_row(spark, tmp_path):
    root = _publish(spark, tmp_path)
    src = _src(spark, [(903, "src text", 2, "ignored")])
    merge_into_published(
        spark, root, src,
        when_not_matched_insert={
            "doc_id": "s.doc_id",
            "text": "upper(s.text)",
            "day": "s.day * 10",
            "split": "'train'",
        },
    )
    assert _rows(spark, root)[903] == ("SRC TEXT", 20)


def test_clause_validation(spark, tmp_path):
    root = _publish(spark, tmp_path)
    src = _src(spark, [(1, "x", 1, "train")])
    with pytest.raises(ValueError, match="at least one clause"):
        merge_into_published(spark, root, src)
    with pytest.raises(ValueError, match="unreachable"):
        merge_into_published(
            spark, root, src,
            when_matched_update="*", when_matched_delete=True,
        )
    with pytest.raises(ValueError, match="matched_condition"):
        merge_into_published(
            spark, root, src,
            when_matched_delete=True, matched_condition="s.day > 0",
        )
    with pytest.raises(ValueError, match="duplicate"):
        merge_into_published(
            spark, root,
            _src(spark, [(1, "a", 1, "train"), (1, "b", 2, "train")]),
            when_matched_update="*",
        )
    with pytest.raises(ValueError, match="split"):
        merge_into_published(
            spark, root, src,
            when_not_matched_insert={"doc_id": "s.doc_id",
                                     "text": "s.text",
                                     "day": "s.day"},
        )
    with pytest.raises(ValueError, match="missing"):
        merge_into_published(
            spark, root, src,
            when_not_matched_insert={"doc_id": "s.doc_id",
                                     "split": "'train'"},
        )
    assert _version(spark, root) == 1  # nothing committed


def test_noop_merge_commits_nothing(spark, tmp_path):
    root = _publish(spark, tmp_path)
    src = _src(spark, [(904, "unmatched", 1, "train")])
    res = merge_into_published(
        spark, root, src, when_matched_update="*",
    )
    assert res.get("noop") is True
    assert _version(spark, root) == 1
    assert list_published_branches(spark, root) == {}


def test_txn_replay_is_exactly_once(spark, tmp_path):
    root = _publish(spark, tmp_path)
    src = _src(spark, [(3, "edit", 1, "train")])
    r1 = merge_into_published(
        spark, root, src, when_matched_update="*", txn_id="merge-1",
    )
    r2 = merge_into_published(
        spark, root, src, when_matched_update="*", txn_id="merge-1",
    )
    assert r1["_version"] == 2
    assert r2.get("replayed") is True
    assert _version(spark, root) == 2


def test_constraint_refusal_is_atomic(spark, tmp_path):
    root = _publish(spark, tmp_path)
    set_published_constraint(spark, root, "day_lt7", "day < 7")
    before = _rows(spark, root)
    src = _src(spark, [(3, "bad", 99, "train")])
    with pytest.raises(ValueError, match="day_lt7.*violated"):
        merge_into_published(
            spark, root, src, when_matched_update="*",
        )
    assert _rows(spark, root) == before
    assert _version(spark, root) == 2  # just the constraint commit
    # the failed apply left no branch debris
    assert list_published_branches(spark, root) == {}


def test_null_delete_condition_does_not_swallow_update(
    spark, tmp_path
):
    """A NULL-evaluating delete condition must neither delete NOR
    knock the row out of the update clause (matched & ~NULL is NULL
    without the coalesce)."""
    root = _publish(spark, tmp_path)
    src = spark.createDataFrame(
        [(3, "updated anyway", None, "train")],
        "doc_id long, text string, day long, split string",
    )
    res = merge_into_published(
        spark, root, src,
        when_matched_update={"text": "s.text"},
        when_matched_delete="s.day < 0",   # NULL day -> NULL cond
    )
    assert res["rows_deleted"] == 0
    assert res["rows_updated"] == 1
    assert _rows(spark, root)[3] == ("updated anyway", 3)


def test_delete_only_merge(spark, tmp_path):
    root = _publish(spark, tmp_path)
    src = _src(spark, [(0, "x", 0, "train"), (1, "x", 0, "train"),
                       (905, "x", 0, "train")])
    res = merge_into_published(
        spark, root, src, when_matched_delete=True,
    )
    assert res["rows_deleted"] == 2  # 905 unmatched: nothing to delete
    rows = _rows(spark, root)
    assert 0 not in rows and 1 not in rows and len(rows) == 38
