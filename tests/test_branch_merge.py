"""True branch merge into an advanced main (merge_published_branch).

fast_forward covers the main-never-moved case; merge covers the rest:
branch DML replays onto CURRENT main with ONE commit point (pinned
main readers see pre-merge or complete merge, never a half-apply),
conflicts are detected key-exactly with fail/branch/main policies,
and a crash in any apply window leaves main untouched.
"""
from __future__ import annotations

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    create_published_branch,
    drop_published_branch,
    list_published_branches,
    merge_published_branch,
    publish_corpus_committed,
    read_published_corpus,
    retract_from_published,
    upsert_into_published,
)


def _publish(spark, tmp_path, n=40):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text",
        "cast(id % 7 as long) as day",
    )
    prepared = spark.range(n).selectExpr(
        "id as doc_id",
        "case when id % 10 = 0 then 'valid' else 'train' end as split",
    )
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=4)
    return root


def _up(spark, root, rows, branch=None):
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            rows, "doc_id long, text string, day long, split string"
        ),
        branch=branch,
    )


def _doc(spark, root, doc_id):
    rows = read_published_corpus(spark, root).filter(
        f"doc_id = {doc_id}"
    ).collect()
    return rows[0] if rows else None


def test_merge_replays_branch_dml_onto_advanced_main(spark, tmp_path):
    root = _publish(spark, tmp_path)                        # v1
    create_published_branch(spark, root, "exp")
    # branch: delete 11, revise 3, insert 1000, MOVE 20 to valid
    retract_from_published(spark, root, "doc_id = 11", branch="exp")
    _up(spark, root, [(3, "branch rev", 99, "train")], branch="exp")
    retract_from_published(spark, root, "doc_id = 13", branch="exp")
    _up(spark, root, [(13, "body 13", 6, "valid"),
                      (1000, "branch new", 1, "train")], branch="exp")
    # main advances independently (disjoint keys)
    _up(spark, root, [(2000, "main new", 2, "train")])      # v2

    out = merge_published_branch(spark, root, "exp")
    assert out["conflicts"] == 0
    assert out["merged_deletes"] == 2  # 11 + the split-moved 13
    got = read_published_corpus(spark, root)
    assert got.filter("doc_id = 11").count() == 0
    assert _doc(spark, root, 3)["text"] == "branch rev"
    assert _doc(spark, root, 1000)["text"] == "branch new"
    assert _doc(spark, root, 2000)["text"] == "main new"  # kept
    assert _doc(spark, root, 13)["split"] == "valid"      # split move
    assert got.count() == 41  # 40 - 1 delete + 2 inserts
    # the source branch is gone; the manifest records the merge
    assert "exp" not in list_published_branches(spark, root)
    v, doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    assert doc["merged_from"]["branch"] == "exp"
    # time travel: pre-merge main is intact at its pinned version
    pre = read_published_corpus(spark, root, version=v - 1)
    assert pre.filter("doc_id = 11").count() == 1
    assert pre.filter("doc_id = 1000").count() == 0


def test_merge_conflict_policies(spark, tmp_path):
    root = _publish(spark, tmp_path)                        # v1
    create_published_branch(spark, root, "exp")
    _up(spark, root, [(5, "branch rev 5", 1, "train"),
                      (6, "branch rev 6", 1, "train")], branch="exp")
    _up(spark, root, [(5, "main rev 5", 2, "train")])       # conflict on 5

    with pytest.raises(ValueError, match="merge conflict: 1 key"):
        merge_published_branch(spark, root, "exp")
    # main untouched by the failed merge
    assert _doc(spark, root, 5)["text"] == "main rev 5"

    out = merge_published_branch(
        spark, root, "exp", on_conflict="main", drop_branch=False
    )
    assert out["conflicts"] == 1
    assert _doc(spark, root, 5)["text"] == "main rev 5"   # main kept
    assert _doc(spark, root, 6)["text"] == "branch rev 6"

    out2 = merge_published_branch(
        spark, root, "exp", on_conflict="branch"
    )
    # the first merge applied key 6 to main, so the RE-merge of the
    # same branch sees both keys as changed-on-both-sides; branch
    # wins re-applies them (6 idempotently)
    assert out2["conflicts"] == 2
    assert _doc(spark, root, 5)["text"] == "branch rev 5"  # branch wins
    assert _doc(spark, root, 6)["text"] == "branch rev 6"


@pytest.mark.parametrize("window", ["mid_apply", "before_adopt"])
def test_merge_crash_windows_leave_main_untouched(
    spark, tmp_path, window
):
    root = _publish(spark, tmp_path)
    create_published_branch(spark, root, "exp")
    retract_from_published(spark, root, "doc_id = 7", branch="exp")
    _up(spark, root, [(3000, "branch new", 1, "train")], branch="exp")
    _up(spark, root, [(2000, "main new", 2, "train")])
    before = sorted(
        r["doc_id"]
        for r in read_published_corpus(spark, root).collect()
    )
    v_before, _d = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    kw = {
        "_fail_mid_apply": window == "mid_apply",
        "_fail_before_adopt": window == "before_adopt",
    }
    with pytest.raises(RuntimeError, match="injected crash"):
        merge_published_branch(spark, root, "exp", **kw)
    # main: same version, same rows — the half-applied temp branch
    # was never adopted
    v_after, _d2 = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    assert v_after == v_before
    assert sorted(
        r["doc_id"]
        for r in read_published_corpus(spark, root).collect()
    ) == before
    # the leftover temp branch is visible debris, droppable, and a
    # fresh merge succeeds regardless
    leftovers = [
        b for b in list_published_branches(spark, root)
        if b.startswith("mergetmp-")
    ]
    assert len(leftovers) == 1
    assert drop_published_branch(spark, root, leftovers[0])
    out = merge_published_branch(spark, root, "exp")
    assert out["merged_deletes"] == 1
    got = read_published_corpus(spark, root)
    assert got.filter("doc_id = 7").count() == 0
    assert got.filter("doc_id = 3000").count() == 1


def test_merge_of_unchanged_branch_is_noop(spark, tmp_path):
    root = _publish(spark, tmp_path, n=20)
    create_published_branch(spark, root, "idle")
    _up(spark, root, [(999, "main new", 1, "train")])
    out = merge_published_branch(spark, root, "idle")
    assert out["merged_deletes"] == 0 and out["merged_upserts"] == 0
    assert "idle" not in list_published_branches(spark, root)


def test_merge_falls_back_to_fast_forward(spark, tmp_path):
    root = _publish(spark, tmp_path, n=20)
    create_published_branch(spark, root, "ff")
    retract_from_published(spark, root, "doc_id = 3", branch="ff")
    out = merge_published_branch(spark, root, "ff")
    assert out["conflicts"] == 0
    v, doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    assert "fast_forwarded_from" in doc  # the cheap path was taken
    assert read_published_corpus(spark, root).filter(
        "doc_id = 3"
    ).count() == 0


def test_cleanup_merge_debris(spark, tmp_path):
    """Stale mergetmp-* chains (crashed merges) drop after the grace
    window; in-flight ones and user branches survive."""
    from v6spark.pipeline import cleanup_merge_debris

    root = _publish(spark, tmp_path, n=20)
    create_published_branch(spark, root, "exp")
    retract_from_published(spark, root, "doc_id = 7", branch="exp")
    _up(spark, root, [(2000, "main new", 2, "train")])
    with pytest.raises(RuntimeError, match="injected crash"):
        merge_published_branch(
            spark, root, "exp", _fail_before_adopt=True
        )
    leftovers = [
        b for b in list_published_branches(spark, root)
        if b.startswith("mergetmp-")
    ]
    assert len(leftovers) == 1
    # inside the grace window: spared (an in-flight merge looks
    # exactly like this)
    assert cleanup_merge_debris(spark, root, grace_seconds=3600) == []
    # past the window: swept; the user branch survives
    dropped = cleanup_merge_debris(spark, root, grace_seconds=0.0)
    assert dropped == leftovers
    live = list_published_branches(spark, root)
    assert "exp" in live
    assert not [b for b in live if b.startswith("mergetmp-")]
