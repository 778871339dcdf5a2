"""RESTORE — roll the published corpus back to an earlier version as
a NEW commit (restore_published).

Delta RESTORE semantics: the rollback is a forward step in the log
(the mistake stays time-travelable), metadata-only (the new manifest
re-references the target's files, zero bytes move), and refused
loudly when retention already swept the target's manifest or any of
its data files.
"""
from __future__ import annotations

import time as _time

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    create_published_branch,
    publish_corpus_committed,
    published_corpus_changes,
    read_published_corpus,
    restore_published,
    retract_from_published,
    tag_published,
    upsert_into_published,
    vacuum_published,
    vacuum_published_files,
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
    return upsert_into_published(
        spark, root,
        spark.createDataFrame(
            rows, "doc_id long, text string, day long, split string"
        ),
        branch=branch,
    )


def _rows(spark, root, **kw):
    df = read_published_corpus(spark, root, **kw)
    return sorted(
        (r.doc_id, r.text, r.day) for r in df.collect()
    )


def _mutate(spark, root):
    """v2: update doc 3 + insert doc 900; v3: delete doc 5."""
    _up(spark, root, [(3, "edited", 99, "train"),
                      (900, "new doc", 1, "train")])      # v2
    retract_from_published(spark, root, "doc_id = 5")     # v3


def test_restore_round_trips_contents(spark, tmp_path):
    root = _publish(spark, tmp_path)                      # v1
    before = _rows(spark, root)
    _mutate(spark, root)                                  # v2, v3
    assert _rows(spark, root) != before

    res = restore_published(spark, root, version=1)       # v4
    assert res["_version"] == 4
    assert res["restored_from"] == 1
    assert res["previous_version"] == 3
    assert _rows(spark, root) == before
    # the rolled-back state stays inspectable (forward-only log)
    assert _rows(spark, root, version=3) != before
    assert (3, "edited", 99) in _rows(spark, root, version=2)


def test_restore_is_metadata_only(spark, tmp_path):
    """The restore commit writes a manifest, not data: the new head
    references the TARGET's live dirs and no v=000004* data
    directory exists under the root."""
    root = _publish(spark, tmp_path)
    _mutate(spark, root)
    restore_published(spark, root, version=1)
    log = f"{root}/{_COMMITS}"
    v1 = txlog.read_version(spark, log, 1)
    v4 = txlog.read_version(spark, log, 4)
    live4 = v4["live"]
    live4 = [live4] if isinstance(live4, str) else list(live4)
    assert set(live4) == {v1["live"]}
    assert v4["restore_of"] == {"version": 1, "from_version": 3}
    import os
    data_dirs = [
        d for d in os.listdir(root)
        if d.startswith("v=000004")
    ]
    assert data_dirs == []


def test_restore_current_head_is_noop(spark, tmp_path):
    root = _publish(spark, tmp_path)
    _mutate(spark, root)
    res = restore_published(spark, root, version=3)
    assert res.get("noop") is True
    assert res["_version"] == 3
    assert txlog.read_latest(spark, f"{root}/{_COMMITS}")[0] == 3


def test_restore_cdc_window_nets_the_rollback(spark, tmp_path):
    """The restore window's change feed is an ordinary manifest diff:
    the deleted doc comes back as an insert, the inserted doc leaves
    as a delete, the edited doc reverts as an update pair."""
    root = _publish(spark, tmp_path)
    _mutate(spark, root)
    restore_published(spark, root, version=1)             # v4
    ch = published_corpus_changes(spark, root, 3, 4).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r["_change_type"], set()).add(r["doc_id"])
    assert 5 in by_type.get("insert", set())
    assert 900 in by_type.get("delete", set())
    assert 3 in by_type.get("update_postimage", set())
    post3 = [r for r in ch
             if r["_change_type"] == "update_postimage"
             and r["doc_id"] == 3]
    assert post3[0]["text"] == "body 3"


def test_restore_by_tag_and_as_of(spark, tmp_path):
    root = _publish(spark, tmp_path)
    tag_published(spark, root, "golden")
    before = _rows(spark, root)
    _time.sleep(0.6)
    t_v1 = _time.time()
    _time.sleep(0.6)
    _mutate(spark, root)

    restore_published(spark, root, tag="golden")          # v4
    assert _rows(spark, root) == before

    _mutate(spark, root)                                  # v5, v6
    res = restore_published(spark, root, as_of=t_v1)      # -> v1 state
    assert res["restored_from"] == 1
    assert _rows(spark, root) == before

    with pytest.raises(ValueError, match="not both"):
        restore_published(spark, root, version=1, tag="golden")
    with pytest.raises(ValueError, match="target"):
        restore_published(spark, root)


def test_restore_forward_refused(spark, tmp_path):
    root = _publish(spark, tmp_path)
    with pytest.raises(ValueError, match="forward"):
        restore_published(spark, root, version=7)


def test_restore_unretained_manifest_refused(spark, tmp_path):
    root = _publish(spark, tmp_path)
    _mutate(spark, root)
    vacuum_published(spark, root, keep_last=1)
    with pytest.raises(ValueError, match="not retained"):
        restore_published(spark, root, version=1)


def test_restore_file_vacuum_retires_manifest_with_files(spark, tmp_path):
    """The natural retention path never leaves a retained manifest
    with vacuumed bytes: vacuum_published_files retires the manifests
    whose files it sweeps, so restore hits the clear 'not retained'
    refusal, not a hole."""
    root = _publish(spark, tmp_path)
    retract_from_published(spark, root, "doc_id < 20")    # v2 rewrite
    removed = vacuum_published_files(spark, root, keep_last=1)
    assert removed > 0
    with pytest.raises(ValueError, match="not retained"):
        restore_published(spark, root, version=1)


def test_restore_missing_files_refused(spark, tmp_path):
    """Out-of-band loss (failed storage, fat-fingered rm): the v1
    manifest is intact but one of its data files is gone.  Restore
    must name the hole instead of committing a manifest whose READERS
    would fail — the recorded per-file stats are the durable census
    that catches this even for directory-level publish manifests,
    whose file lists are live listings that would self-heal."""
    import os

    root = _publish(spark, tmp_path)
    retract_from_published(spark, root, "doc_id < 20")    # v2 rewrite
    log = f"{root}/{_COMMITS}"
    v1, v2 = (txlog.read_version(spark, log, v) for v in (1, 2))
    v2_files = {
        rel for fl in (v2.get("files") or {}).values() for rel in fl
    }
    superseded = sorted(
        rel
        for per_split in (v1.get("file_stats") or {}).values()
        for rel in per_split
        if rel not in v2_files
    )
    assert superseded, "retract must have rewritten at least one file"
    os.remove(os.path.join(root, superseded[0]))
    with pytest.raises(ValueError, match="vacuumed|missing"):
        restore_published(spark, root, version=1)
    # the head (v2) never referenced that file: still fully readable
    assert len(_rows(spark, root)) == 20


def test_restore_txn_replay_is_exactly_once(spark, tmp_path):
    root = _publish(spark, tmp_path)
    before = _rows(spark, root)
    _mutate(spark, root)
    r1 = restore_published(spark, root, version=1, txn_id="job-7")
    r2 = restore_published(spark, root, version=1, txn_id="job-7")
    assert r1["_version"] == 4
    assert r2.get("replayed") is True
    assert r2["_version"] == 4
    assert _rows(spark, root) == before


def test_restore_on_branch_leaves_main_alone(spark, tmp_path):
    root = _publish(spark, tmp_path)                      # main v1
    create_published_branch(spark, root, "exp")
    _up(spark, root, [(7, "branch edit", 1, "train")], branch="exp")
    main_before = _rows(spark, root)
    res = restore_published(spark, root, version=1, branch="exp")
    assert res["restored_from"] == 1
    assert _rows(spark, root, branch="exp") == main_before
    assert _rows(spark, root) == main_before


def test_restored_head_serves_dml_and_reads(spark, tmp_path):
    """The restored manifest is a full citizen: stats/key pruning
    survive the copy, and the next DML builds on it normally."""
    root = _publish(spark, tmp_path)
    _mutate(spark, root)
    restore_published(spark, root, version=1)             # v4
    _up(spark, root, [(11, "after restore", 2, "train")])  # v5
    rows = _rows(spark, root)
    assert (11, "after restore", 2) in rows
    assert (5, "body 5", 5) in rows                       # un-deleted
    assert (900, "new doc", 1) not in rows
