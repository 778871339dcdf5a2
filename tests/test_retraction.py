"""Row-level retraction on committed publishes
(pipeline.retract_from_published): file-level copy-on-write DELETE —
only files containing matching rows are rewritten, committed readers
flip atomically, time travel keeps the pre-retraction version until
retention, and vacuum_published_files actually purges the superseded
bytes (the right-to-be-forgotten guarantee)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from v6spark.pipeline import (
    publish_corpus_committed,
    published_path,
    read_published_corpus,
    retract_from_published,
    vacuum_published_files,
)


def _corpus(spark, n=40):
    prepared = spark.createDataFrame(
        [(i, "train" if i % 4 else "valid") for i in range(n)],
        "doc_id long, split string",
    )
    content = spark.createDataFrame(
        [(i, f"document body {i}", "secret" if i in (7, 13) else "ok")
         for i in range(n)],
        "doc_id long, text string, status string",
    )
    return prepared, content


@pytest.mark.parametrize("mode", ["rename", "put"])
def test_retract_rewrites_only_affected_files(spark, tmp_path, mode):
    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        prepared, content, root, n_shards=8, commit_mode=mode
    )
    n_before = read_published_corpus(spark, root).count()

    res = retract_from_published(
        spark, root, "status = 'secret'", commit_mode=mode
    )
    assert res["_version"] == 2
    assert res["rows_removed"] == 2
    # shard-hashed layout: 2 docs live in at most 2 of the shard
    # files; everything else is KEPT by reference, not copied
    assert 1 <= res["files_rewritten"] <= 2
    assert res["files_kept"] >= 6

    out = read_published_corpus(spark, root)
    assert out.count() == n_before - 2
    assert out.filter("status = 'secret'").count() == 0
    # untouched docs read back intact, with their split labels
    assert out.filter("doc_id = 8").select("text").collect()[0][0] == "document body 8"
    # split counts in the result dict match the actual reads
    for s, n in res["splits"].items():
        assert out.filter(F.col("split") == s).count() == n

    # time travel: version 1 still shows the secret rows
    v1 = read_published_corpus(spark, root, version=1)
    assert v1.count() == n_before
    assert v1.filter("status = 'secret'").count() == 2

    # published_path refuses to hand out a single mount root for a
    # file-level version (data spans version dirs)
    with pytest.raises(ValueError, match="file-level retraction"):
        published_path(spark, root)


@pytest.mark.parametrize("mode", ["rename", "put"])
def test_retract_crash_preserves_current_version(spark, tmp_path, mode):
    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=4, commit_mode=mode)
    with pytest.raises(RuntimeError, match="injected crash"):
        retract_from_published(
            spark, root, "status = 'secret'", commit_mode=mode,
            _fail_after="data",
        )
    out = read_published_corpus(spark, root)
    assert out.count() == 40
    assert out.filter("status = 'secret'").count() == 2
    # rerun completes at the same logical version
    res = retract_from_published(spark, root, "status = 'secret'", commit_mode=mode)
    assert res["_version"] == 2 and res["rows_removed"] == 2
    assert read_published_corpus(spark, root).filter("status = 'secret'").count() == 0


def test_retract_nothing_matches_is_a_noop(spark, tmp_path):
    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=4)
    res = retract_from_published(spark, root, "status = 'nope'")
    assert res["_version"] == 1 and res["rows_removed"] == 0
    # no new version dir left behind (publish dirs are nonce-named
    # since the OCC multi-writer change: v=000001-<nonce>)
    dirs = sorted(os.path.basename(p) for p in glob.glob(f"{root}/v=*"))
    assert len(dirs) == 1 and dirs[0].startswith("v=000001")


def test_chained_retractions_and_file_purge(spark, tmp_path):
    """Two retractions stack (each referencing surviving files across
    versions); vacuum_published_files then PURGES the superseded
    originals — the retracted bytes are gone from storage, while the
    kept files survive in place."""
    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=8)
    retract_from_published(spark, root, "status = 'secret'")
    res2 = retract_from_published(spark, root, "doc_id = 20")
    assert res2["_version"] == 3 and res2["rows_removed"] == 1

    out = read_published_corpus(spark, root)
    assert out.count() == 37
    assert out.filter("status = 'secret' or doc_id = 20").count() == 0

    # before the purge: v1 still holds files containing the secrets
    def secret_on_disk() -> bool:
        for f in glob.glob(f"{root}/v=*/split=*/**/*.parquet", recursive=True):
            with open(f, "rb") as fh:
                if b"secret" in fh.read():
                    return True
        return False

    assert secret_on_disk()
    removed = vacuum_published_files(spark, root, keep_last=1)
    assert removed > 0
    # the committed view is unchanged...
    out = read_published_corpus(spark, root)
    assert out.count() == 37
    assert out.filter("doc_id = 8").count() == 1
    # ...and the retracted bytes are actually gone
    assert not secret_on_disk()
    # v1's dir survives only as the kept-file carrier (or is gone if
    # fully drained); no unreferenced data files remain anywhere
    doc = None
    from v6spark import txlog

    _v, doc = txlog.read_latest(spark, f"{root}/_commits")
    referenced = {f"{root}/{rel}" for fl in doc["files"].values() for rel in fl}
    on_disk = set(glob.glob(f"{root}/v=*/split=*/**/*.parquet", recursive=True))
    assert on_disk == referenced


def test_retract_then_full_publish_continues_the_log(spark, tmp_path):
    """A normal publish after a retraction gets the next version and
    directory-level semantics again."""
    prepared, content = _corpus(spark, n=20)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=4)
    retract_from_published(spark, root, "doc_id = 5")
    counts = publish_corpus_committed(prepared, content, root, n_shards=4)
    assert counts["_version"] == 3
    out = read_published_corpus(spark, root)
    assert out.count() == 20  # the fresh publish has everything again
    path3, doc3 = published_path(spark, root)
    assert doc3["v"] == 3


# ------------------------------------------------------------- upsert


@pytest.mark.parametrize("mode", ["rename", "put"])
def test_upsert_updates_in_place_and_inserts(spark, tmp_path, mode):
    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=8, commit_mode=mode)

    updates = spark.createDataFrame(
        [
            (7, "REVISED body 7", "ok", None),      # update (was secret)
            (13, "REVISED body 13", "ok", None),    # update
            (100, "new doc 100", "ok", "train"),    # insert
            (101, "new doc 101", "ok", "valid"),    # insert
        ],
        "doc_id long, text string, status string, split string",
    )
    from v6spark.pipeline import upsert_into_published

    res = upsert_into_published(spark, root, updates, commit_mode=mode)
    assert res["_version"] == 2
    assert res["rows_updated"] == 2 and res["rows_inserted"] == 2
    # only the files holding doc 7 / doc 13 rewrote
    assert 1 <= res["files_rewritten"] <= 2

    out = read_published_corpus(spark, root)
    assert out.count() == 42
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[7]["text"] == "REVISED body 7" and got[7]["status"] == "ok"
    # updates do NOT move splits: doc 7 stays where it was published
    assert got[7]["split"] == ("train" if 7 % 4 else "valid")
    assert got[100]["split"] == "train" and got[101]["split"] == "valid"
    assert got[8]["text"] == "document body 8"  # untouched
    for s, n in res["splits"].items():
        assert out.filter(F.col("split") == s).count() == n
    # time travel: v1 unchanged
    v1 = read_published_corpus(spark, root, version=1)
    assert v1.count() == 40
    assert v1.filter("doc_id = 7").collect()[0]["text"] == "document body 7"


def test_upsert_crash_noop_and_validation(spark, tmp_path):
    from v6spark.pipeline import upsert_into_published

    prepared, content = _corpus(spark, n=20)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=4)

    upd = spark.createDataFrame(
        [(3, "X", "ok", None)], "doc_id long, text string, status string, split string"
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        upsert_into_published(spark, root, upd, _fail_after="data")
    assert read_published_corpus(spark, root).filter("doc_id = 3").collect()[0][
        "text"
    ] == "document body 3"
    # rerun completes
    res = upsert_into_published(spark, root, upd)
    assert res["_version"] == 2 and res["rows_updated"] == 1

    # duplicate delta keys refused
    dup = spark.createDataFrame(
        [(5, "a", "ok", None), (5, "b", "ok", None)],
        "doc_id long, text string, status string, split string",
    )
    with pytest.raises(ValueError, match="duplicate key"):
        upsert_into_published(spark, root, dup)
    # schema drift refused
    bad = spark.createDataFrame([(5, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="published schema"):
        upsert_into_published(spark, root, bad)
    # inserts without a split column refused
    noin = spark.createDataFrame(
        [(999, "z", "ok")], "doc_id long, text string, status string"
    )
    with pytest.raises(ValueError, match="'split' column"):
        upsert_into_published(spark, root, noin)
    # empty-effect delta: no new version
    nop = spark.createDataFrame(
        [], "doc_id long, text string, status string, split string"
    )
    res = upsert_into_published(spark, root, nop)
    assert res["_version"] == 2 and res["rows_updated"] == 0


def test_upsert_then_retract_then_purge_chain(spark, tmp_path):
    """The full DML lifecycle on one log: publish -> upsert ->
    retract -> file purge; every committed view exact, retracted
    bytes gone."""
    from v6spark.pipeline import upsert_into_published

    prepared, content = _corpus(spark, n=24)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=4)
    upsert_into_published(
        spark,
        root,
        spark.createDataFrame(
            [(7, "poisoned body", "bad", None)],
            "doc_id long, text string, status string, split string",
        ),
    )
    res = retract_from_published(spark, root, "status = 'bad'")
    assert res["rows_removed"] == 1
    out = read_published_corpus(spark, root)
    assert out.count() == 23 and out.filter("doc_id = 7").count() == 0
    vacuum_published_files(spark, root, keep_last=1)
    out = read_published_corpus(spark, root)
    assert out.count() == 23
    for f in glob.glob(f"{root}/v=*/split=*/**/*.parquet", recursive=True):
        with open(f, "rb") as fh:
            assert b"poisoned" not in fh.read()
