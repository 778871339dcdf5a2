"""Vacuum vs concurrent writers/readers — no referenced byte dies.

Three races, each previously only mitigated by luck or grace windows:

* a DML transaction committing WHILE vacuum_published_files is mid-
  sweep (its brand-new files are unknown to the vacuum's pre-scan) —
  closed by the OCC re-check that re-lists the commit log immediately
  before deletion, in both commit modes;
* a read lease acquired while the directory vacuum's pre-scan runs —
  closed by txlog.vacuum_versions re-reading the lease/tag set right
  before its delete loop;
* a lease acquired on a version a concurrent vacuum just retired —
  closed by acquire_lease re-verifying the manifest AFTER the lease
  file is durably visible (fails cleanly, removes the dead lease).
"""
from __future__ import annotations

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    acquire_read_lease,
    publish_corpus_committed,
    read_published_corpus,
    retract_from_published,
    upsert_into_published,
    vacuum_published_files,
)


def _publish(spark, tmp_path, n=40, commit_mode="rename"):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text"
    )
    prepared = spark.range(n).selectExpr("id as doc_id", "'train' as split")
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        prepared, docs, root, n_shards=2, commit_mode=commit_mode
    )
    return root


@pytest.mark.parametrize("commit_mode", ["rename", "put"])
def test_vacuum_vs_concurrent_dml_keeps_every_referenced_byte(
    spark, tmp_path, commit_mode
):
    """An upsert committing between the vacuum's pre-scan and its
    delete loop writes files the pre-scan never saw; the OCC re-check
    must spare them (pre-fix: the sweep deleted the new version's
    files and the just-committed table lost data)."""
    root = _publish(spark, tmp_path, commit_mode=commit_mode)  # v1
    retract_from_published(
        spark, root, "doc_id = 1", commit_mode=commit_mode
    )  # v2: gives the vacuum superseded originals to sweep

    def racing_dml():
        upsert_into_published(
            spark, root,
            spark.createDataFrame(
                [(2, "revised two", None), (2002, "fresh", "train")],
                "doc_id long, text string, split string",
            ),
            commit_mode=commit_mode,
        )  # v3 commits mid-vacuum

    vacuum_published_files(
        spark, root, keep_last=1, _pause_before_sweep=racing_dml
    )
    df = read_published_corpus(spark, root)
    rows = {r["doc_id"]: r["text"] for r in df.collect()}
    assert len(rows) == 40  # 40 - 1 retracted + 1 inserted
    assert rows[2] == "revised two" and rows[2002] == "fresh"
    assert 1 not in rows


def test_vacuum_vs_concurrent_branch_dml_keeps_referenced_bytes(
    spark, tmp_path
):
    """The OCC re-check must also re-list BRANCH logs: a branch DML
    committing mid-vacuum writes files into the shared root that the
    pre-scan never saw."""
    from v6spark.pipeline import create_published_branch

    root = _publish(spark, tmp_path)
    create_published_branch(spark, root, "exp")
    retract_from_published(spark, root, "doc_id = 1")  # main v2

    def racing_branch_dml():
        upsert_into_published(
            spark, root,
            spark.createDataFrame(
                [(2, "branch rev", None), (3002, "branch new", "train")],
                "doc_id long, text string, split string",
            ),
            branch="exp",
        )

    vacuum_published_files(
        spark, root, keep_last=1, _pause_before_sweep=racing_branch_dml
    )
    from v6spark.pipeline import read_published_corpus

    br = read_published_corpus(spark, root, branch="exp")
    rows = {r["doc_id"]: r["text"] for r in br.collect()}
    assert rows[2] == "branch rev" and rows[3002] == "branch new"
    assert len(rows) == 41  # branch seeded at v1 (40 docs) + 1 insert


def test_vacuum_honors_lease_acquired_during_prescan(
    spark, tmp_path, monkeypatch
):
    """A lease that becomes visible only AFTER the directory vacuum's
    retention snapshot must still protect its version's data dirs —
    txlog.vacuum_versions re-reads the lease set right before
    deleting.  Simulated by hiding the lease from the FIRST
    leased_versions call only."""
    root = _publish(spark, tmp_path, n=20)
    # v2 is a FULL republish: v1's directory becomes wholly
    # unreferenced (a retraction would keep referencing v=1's
    # surviving files and never exercise the directory delete)
    docs = spark.range(20, 40).selectExpr(
        "id as doc_id", "concat('body ', id) as text"
    )
    prepared = spark.range(20, 40).selectExpr(
        "id as doc_id", "'train' as split"
    )
    publish_corpus_committed(prepared, docs, root, n_shards=2)
    lease, v = acquire_read_lease(spark, root, version=1)

    real = txlog.leased_versions
    calls = {"n": 0}

    def hiding_first(spark_, log_dir):
        calls["n"] += 1
        if calls["n"] == 1:
            return set()  # the pre-scan ran before the lease landed
        return real(spark_, log_dir)

    monkeypatch.setattr(txlog, "leased_versions", hiding_first)
    vacuum_published_files(spark, root, keep_last=1)
    assert calls["n"] >= 2  # the late re-check actually ran
    pinned = read_published_corpus(spark, root, version=v)
    assert pinned is not None and pinned.count() == 20


def test_acquire_lease_fails_cleanly_when_vacuumed_concurrently(
    spark, tmp_path, monkeypatch
):
    """If the manifest disappears between the pre-write validation and
    the post-write re-verify, acquire must raise AND remove the dead
    lease file (a lease on vacuumed data protects nothing)."""
    root = _publish(spark, tmp_path, n=10)
    log = f"{root}/{_COMMITS}"

    real = txlog.read_version
    calls = {"n": 0}

    def vanishing_second(spark_, log_dir, version):
        calls["n"] += 1
        if calls["n"] == 2:
            return None  # vacuum won the race after the lease write
        return real(spark_, log_dir, version)

    monkeypatch.setattr(txlog, "read_version", vanishing_second)
    with pytest.raises(ValueError, match="vacuumed concurrently"):
        txlog.acquire_lease(spark, log, 1, ttl_seconds=3600)
    monkeypatch.setattr(txlog, "read_version", real)
    assert txlog.leased_versions(spark, log) == set()
