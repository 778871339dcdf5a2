"""Deletion-vector (merge-on-read) retraction on committed publishes
(pipeline.retract_from_published strategy="dv"): a DELETE records the
matching rows' (file, position) addresses in a KB-scale sidecar
instead of rewriting data files — the Delta deletion-vector /
Iceberg positional-delete pattern.  Readers apply vectors as a
broadcast anti-join on dirty files only; any later rewrite (COW
retract, upsert, compact, reshard) materializes them; vacuum keeps
sidecars alive exactly as long as their manifests."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from v6spark.pipeline import (
    compact_published,
    compaction_advice,
    publish_corpus_committed,
    published_file_census,
    published_path,
    read_published_corpus,
    read_published_keys,
    reshard_published,
    retract_from_published,
    upsert_into_published,
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


def _data_files(root):
    out = []
    for p in glob.glob(f"{root}/**", recursive=True):
        rel = os.path.relpath(p, root)
        if os.path.isfile(p) and not any(
            part.startswith(("_", ".")) for part in rel.split(os.sep)
        ):
            out.append(rel)
    return out


@pytest.mark.parametrize("mode", ["rename", "put"])
def test_dv_retract_rewrites_nothing(spark, tmp_path, mode):
    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        prepared, content, root, n_shards=8, commit_mode=mode
    )
    before = sorted(_data_files(root))
    n_before = read_published_corpus(spark, root).count()

    res = retract_from_published(
        spark, root, "status = 'secret'", commit_mode=mode, strategy="dv"
    )
    assert res["_version"] == 2
    assert res["rows_removed"] == 2
    assert res["files_rewritten"] == 0

    # every pre-existing data file is byte-untouched; the only new
    # bytes are the _dv sidecar (underscore-prefixed, excluded here)
    after = sorted(_data_files(root))
    assert before == after

    out = read_published_corpus(spark, root)
    assert out.count() == n_before - 2
    assert out.filter("status = 'secret'").count() == 0
    assert (
        out.filter("doc_id = 8").select("text").collect()[0][0]
        == "document body 8"
    )
    for s, n in res["splits"].items():
        assert out.filter(F.col("split") == s).count() == n

    # time travel: version 1 still shows the secret rows
    v1 = read_published_corpus(spark, root, version=1)
    assert v1.count() == n_before
    assert v1.filter("status = 'secret'").count() == 2

    # DV versions are file-level: no single mount root
    with pytest.raises(ValueError, match="file-level"):
        published_path(spark, root)


def test_dv_retract_chains_and_never_double_counts(spark, tmp_path):
    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=4)

    r1 = retract_from_published(
        spark, root, "doc_id in (7, 13)", strategy="dv"
    )
    assert r1["rows_removed"] == 2
    # overlapping predicate: 7 already deleted, only 9 counts
    r2 = retract_from_published(
        spark, root, "doc_id in (7, 9)", strategy="dv"
    )
    assert r2["rows_removed"] == 1
    assert r2["_version"] == 3

    out = read_published_corpus(spark, root)
    assert out.count() == 37
    assert out.filter("doc_id in (7, 9, 13)").count() == 0
    # an already-covered predicate is a no-op: nothing commits
    r3 = retract_from_published(
        spark, root, "doc_id in (7, 9)", strategy="dv"
    )
    assert r3["rows_removed"] == 0 and r3["_version"] == 3


@pytest.mark.parametrize("mode", ["rename", "put"])
def test_dv_crash_preserves_current_version(spark, tmp_path, mode):
    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        prepared, content, root, n_shards=4, commit_mode=mode
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        retract_from_published(
            spark, root, "status = 'secret'", commit_mode=mode,
            strategy="dv", _fail_after="data",
        )
    out = read_published_corpus(spark, root)
    assert out.count() == 40
    assert out.filter("status = 'secret'").count() == 2
    res = retract_from_published(
        spark, root, "status = 'secret'", commit_mode=mode, strategy="dv"
    )
    assert res["_version"] == 2 and res["rows_removed"] == 2
    assert (
        read_published_corpus(spark, root)
        .filter("status = 'secret'").count() == 0
    )


def test_dv_txn_id_replay_skips(spark, tmp_path):
    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=4)
    r1 = retract_from_published(
        spark, root, "doc_id = 7", strategy="dv", txn_id="take-1"
    )
    assert r1["rows_removed"] == 1
    r2 = retract_from_published(
        spark, root, "doc_id = 7", strategy="dv", txn_id="take-1"
    )
    assert r2.get("replayed") and r2["rows_removed"] == 0
    assert read_published_corpus(spark, root).count() == 39


def test_cow_retract_materializes_dvs_of_rewritten_files(spark, tmp_path):
    from v6spark import txlog

    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    # n_shards=1: every doc in one file per split, so the COW retract
    # rewrites the same files the DV marked
    publish_corpus_committed(prepared, content, root, n_shards=1)
    retract_from_published(spark, root, "doc_id = 7", strategy="dv")
    res = retract_from_published(spark, root, "doc_id = 13")
    assert res["rows_removed"] == 1

    _v, doc = txlog.read_latest(spark, f"{root}/_commits")
    # 7 lived in train (rewritten: dv materialized); if no dv entries
    # survive, the manifest drops the key entirely
    dv = doc.get("dv")
    assert dv is None or all(not m for m in dv["files"].values())

    out = read_published_corpus(spark, root)
    assert out.count() == 38
    assert out.filter("doc_id in (7, 13)").count() == 0


def test_upsert_on_dv_table(spark, tmp_path):
    from v6spark import txlog

    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=4)
    retract_from_published(spark, root, "doc_id = 8", strategy="dv")

    # update a live row; the DELETED key 8 re-enters as an INSERT
    delta = spark.createDataFrame(
        [(12, "updated body 12", "ok", None),
         (8, "resurrected body 8", "ok", "train")],
        "doc_id long, text string, status string, split string",
    )
    res = upsert_into_published(spark, root, delta)
    assert res["rows_updated"] == 1
    assert res["rows_inserted"] == 1

    out = read_published_corpus(spark, root)
    assert out.count() == 40
    assert (
        out.filter("doc_id = 12").select("text").collect()[0][0]
        == "updated body 12"
    )
    assert (
        out.filter("doc_id = 8").select("text").collect()[0][0]
        == "resurrected body 8"
    )
    # the dv entry for 12's file was materialized by the rewrite iff
    # 8 and 12 shared a file; either way reads are consistent and no
    # rewritten file retains a vector
    _v, doc = txlog.read_latest(spark, f"{root}/_commits")
    dv = doc.get("dv") or {"files": {}}
    for s, m in dv["files"].items():
        for rel in m:
            assert rel in doc["files"][s]


def test_compact_materializes_dvs(spark, tmp_path):
    from v6spark import txlog

    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=4)
    retract_from_published(spark, root, "status = 'secret'", strategy="dv")

    v = compact_published(spark, root)
    assert v == 3
    _v, doc = txlog.read_latest(spark, f"{root}/_commits")
    assert "dv" not in doc
    # directory-level again: mountable
    assert published_path(spark, root) is not None
    out = read_published_corpus(spark, root)
    assert out.count() == 38
    assert out.filter("status = 'secret'").count() == 0


def test_reshard_materializes_dvs(spark, tmp_path):
    from v6spark import txlog

    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=4)
    retract_from_published(spark, root, "doc_id < 4", strategy="dv")

    reshard_published(spark, root, n_shards=8)
    _v, doc = txlog.read_latest(spark, f"{root}/_commits")
    assert "dv" not in doc and doc["n_shards"] == 8
    out = read_published_corpus(spark, root)
    assert out.count() == 36
    assert out.filter("doc_id < 4").count() == 0


def test_point_lookup_respects_dvs(spark, tmp_path):
    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=4)
    retract_from_published(spark, root, "doc_id = 7", strategy="dv")

    rows = read_published_keys(spark, root, [7, 8]).collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == [8]


def test_vacuum_keeps_then_sweeps_dv_sidecars(spark, tmp_path):
    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=4)
    retract_from_published(spark, root, "doc_id = 7", strategy="dv")

    def _dv_files():
        return [
            p for p in glob.glob(f"{root}/**", recursive=True)
            if os.path.isfile(p) and "/_dv/" in p
            and not os.path.basename(p).startswith(("_", "."))
        ]

    assert _dv_files()
    # the DV manifest is the latest: its sidecar must survive vacuum
    vacuum_published_files(spark, root, keep_last=1)
    assert _dv_files()
    assert read_published_corpus(spark, root).count() == 39

    # after compaction the DV version retires; retention passes and
    # the sidecar goes with its manifest
    compact_published(spark, root)
    vacuum_published_files(spark, root, keep_last=1)
    assert not _dv_files()
    assert read_published_corpus(spark, root).count() == 39


def test_census_and_advice_count_dvs(spark, tmp_path):
    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=4)
    retract_from_published(spark, root, "status = 'secret'", strategy="dv")

    census = published_file_census(spark, root)
    assert "dv_deleted" in census.columns
    assert (
        census.agg(F.sum("dv_deleted")).collect()[0][0] == 2
    )
    adv = compaction_advice(spark, root)
    assert adv["dv_deleted_rows"] == 2


def test_schema_evolution_carries_dvs(spark, tmp_path):
    from v6spark.pipeline import evolve_published_schema

    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=4)
    retract_from_published(spark, root, "doc_id = 7", strategy="dv")
    evolve_published_schema(spark, root, [("lang", "string")])

    out = read_published_corpus(spark, root)
    assert out.count() == 39
    assert out.filter("doc_id = 7").count() == 0
    assert out.filter("lang is null").count() == 39
