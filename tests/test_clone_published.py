"""CLONE — an independent table from a snapshot (clone_published):
hard-link reproduction of the exact referenced files, verbatim
manifest, zero data bytes moved, and (unlike manifest-reference
shallow clones) immune to the source's vacuum.
"""
from __future__ import annotations

import os

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    clone_published,
    list_published_constraints,
    publish_corpus_committed,
    published_history,
    read_published_corpus,
    read_published_keys,
    retract_from_published,
    tag_published,
    upsert_into_published,
    vacuum_published_files,
)


def _publish(spark, tmp_path, n=40, **kw):
    df = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text",
        "cast(id % 7 as long) as day",
        "case when id % 10 = 0 then 'valid' else 'train' end as split",
    )
    root = str(tmp_path / "src")
    publish_corpus_committed(
        df.selectExpr("doc_id", "split"), df.drop("split"), root,
        n_shards=4, **kw,
    )
    return root


def _rows(spark, root, **kw):
    return sorted(
        (r.doc_id, r.text, r.day)
        for r in read_published_corpus(spark, root, **kw).collect()
    )


def _up(spark, root, rows):
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            rows, "doc_id long, text string, day long, split string"
        ),
    )


def test_clone_reproduces_snapshot_and_diverges(spark, tmp_path):
    src = _publish(spark, tmp_path)                      # v1
    _up(spark, src, [(3, "edited", 1, "train")])         # v2
    dest = str(tmp_path / "dest")
    res = clone_published(spark, src, dest)
    assert res["dest_version"] == 1
    assert res["cloned_from"] == {"path": src, "version": 2}
    assert res["files_linked"] > 0
    assert _rows(spark, dest) == _rows(spark, src)
    # zero bytes copied: same inode (hard link)
    sample = next(
        os.path.join(b, f)
        for b, _d, fs in os.walk(dest)
        for f in fs
        if f.endswith(".parquet") and "split=" in b
    )
    twin = sample.replace(dest, src, 1)
    assert os.path.samefile(sample, twin)
    # divergence: DML on either side is invisible to the other
    _up(spark, dest, [(900, "clone only", 1, "train")])
    retract_from_published(spark, src, "doc_id = 7")
    assert (900, "clone only", 1) in _rows(spark, dest)
    assert (900, "clone only", 1) not in _rows(spark, src)
    assert (7, "body 7", 0) in _rows(spark, dest)
    assert (7, "body 7", 0) not in _rows(spark, src)
    # the clone's own history starts at its CLONE commit
    h = published_history(spark, dest).collect()
    assert [r.operation for r in h] == ["UPSERT", "CLONE"]


def test_clone_survives_source_vacuum(spark, tmp_path):
    src = _publish(spark, tmp_path)
    dest = str(tmp_path / "dest")
    clone_published(spark, src, dest)
    before = _rows(spark, dest)
    # a rewrite on src supersedes the originals the clone links to,
    # then the file vacuum deletes src's names for them
    retract_from_published(spark, src, "doc_id < 20")
    removed = vacuum_published_files(spark, src, keep_last=1)
    assert removed > 0
    assert _rows(spark, dest) == before  # inodes survive via dest


def test_clone_pins_version_tag_and_carries_properties(
    spark, tmp_path
):
    from v6spark.pipeline import set_published_constraint

    src = _publish(spark, tmp_path, key_bloom=True)      # v1
    tag_published(spark, src, "golden")
    set_published_constraint(spark, src, "day_ok", "day >= 0")  # v2
    _up(spark, src, [(3, "newer", 1, "train")])          # v3
    dest_v1 = str(tmp_path / "dest_v1")
    clone_published(spark, src, dest_v1, tag="golden")
    assert _rows(spark, dest_v1) == _rows(spark, src, version=1)
    dest = str(tmp_path / "dest_head")
    clone_published(spark, src, dest)
    # constraints + bloom carried and live on the clone
    assert list_published_constraints(spark, dest) == {
        "day_ok": "day >= 0"
    }
    with pytest.raises(ValueError, match="day_ok.*violated"):
        _up(spark, dest, [(901, "bad", -1, "train")])
    got = read_published_keys(spark, dest, [3])
    assert [r.text for r in got.collect()] == ["newer"]


def test_clone_refusals(spark, tmp_path):
    src = _publish(spark, tmp_path)
    dest = str(tmp_path / "dest")
    clone_published(spark, src, dest)
    with pytest.raises(ValueError, match="already holds"):
        clone_published(spark, src, dest)
    with pytest.raises(ValueError, match="mode"):
        clone_published(spark, src, str(tmp_path / "d2"), mode="ref")
    with pytest.raises(ValueError, match="no committed publish"):
        clone_published(
            spark, str(tmp_path / "empty"), str(tmp_path / "d3")
        )


def test_clone_preserves_offloaded_manifest(spark, tmp_path):
    """Above the inline threshold the snapshot's manifest keeps its
    sidecar pointer: the clone links the sidecar dir and commits the
    POINTER, not a re-inlined monolith (O(1)-manifest at any file
    count)."""
    import v6spark.pipeline as _pipeline

    prev = _pipeline._MANIFEST_INLINE_MAX
    _pipeline._MANIFEST_INLINE_MAX = 0
    try:
        src = _publish(spark, tmp_path)
        retract_from_published(spark, src, "doc_id = 5")  # file-level
        dest = str(tmp_path / "dest_off")
        clone_published(spark, src, dest)
    finally:
        _pipeline._MANIFEST_INLINE_MAX = prev
    doc = txlog.read_version(spark, f"{dest}/{_COMMITS}", 1)
    assert doc.get("manifest_ref"), "sidecar pointer must survive"
    assert "files" not in doc
    assert _rows(spark, dest) == _rows(spark, src)


def test_clone_rerun_resumes_after_crash(spark, tmp_path):
    """Crash before the dest commit leaves linked files and an empty
    log; rerunning the clone is the recovery path — already-linked
    files are skipped, never silently re-copied or crashed on."""
    import shutil

    src = _publish(spark, tmp_path)
    dest = str(tmp_path / "dest_resume")
    clone_published(spark, src, dest)
    shutil.rmtree(os.path.join(dest, "_commits"))  # simulate the crash
    res = clone_published(spark, src, dest)
    assert res["dest_version"] == 1
    assert _rows(spark, dest) == _rows(spark, src)


def test_clone_refuses_missing_bloom_sidecar(spark, tmp_path):
    """The pre-commit census covers sidecar trees too: a vacuumed
    Bloom table refuses the clone instead of committing a manifest
    whose point lookups would crash later."""
    import shutil

    src = _publish(spark, tmp_path, key_bloom=True)
    doc = txlog.read_version(spark, f"{src}/{_COMMITS}", 1)
    bloom_rel = doc["key_bloom"]["tables"][0]["path"]
    shutil.rmtree(os.path.join(src, bloom_rel))
    with pytest.raises(ValueError, match="referenced file"):
        clone_published(spark, src, str(tmp_path / "dest_nb"))


def test_clone_copy_mode(spark, tmp_path):
    src = _publish(spark, tmp_path)
    dest = str(tmp_path / "dest_copy")
    clone_published(spark, src, dest, mode="copy")
    assert _rows(spark, dest) == _rows(spark, src)
    sample = next(
        os.path.join(b, f)
        for b, _d, fs in os.walk(dest)
        for f in fs
        if f.endswith(".parquet") and "split=" in b
    )
    assert not os.path.samefile(sample, sample.replace(dest, src, 1))
