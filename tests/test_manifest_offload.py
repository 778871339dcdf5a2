"""Manifest offload (pipeline._offload_manifest / _materialize_manifest):
past ``_MANIFEST_INLINE_MAX`` per-file entries, the commit JSON's
corpus-sized sections (``files``, ``col_stats``, ``file_stats``) move
to a parquet sidecar under the committing version's directory and the
doc keeps a ``manifest_ref`` pointer — so the document EVERY committed
read parses stays O(1) in corpus file count (the Iceberg manifest-file
idea; at ~1M files the inline encoding is 100s of MB of JSON).

The contract under test: with the threshold forced to 0 (everything
offloads), every verb and reader behaves IDENTICALLY to inline mode —
same rows, same pruning decisions, same DML candidate selection, same
vacuum survivors — because materialization restores the exact dicts.
"""

from __future__ import annotations

import os

import pytest

import v6spark.pipeline as pipeline
from v6spark.pipeline import (
    _materialize_manifest,
    _offload_manifest,
    acquire_read_lease,
    compact_published,
    compaction_advice,
    evolve_published_schema,
    promote_staged,
    publish_corpus_committed,
    published_file_census,
    read_published_corpus,
    read_published_keys,
    read_published_where,
    retract_from_published,
    stage_corpus_publish,
    upsert_into_published,
    vacuum_published,
    vacuum_published_files,
)


@pytest.fixture()
def offload_always(monkeypatch):
    monkeypatch.setattr(pipeline, "_MANIFEST_INLINE_MAX", 0)


def _publish(spark, root, n=48, n_shards=8, **kw):
    prepared = spark.createDataFrame(
        [(i, "train" if i % 4 else "valid") for i in range(n)],
        "doc_id long, split string",
    )
    content = spark.createDataFrame(
        [(i, i % 6, f"body {i:04d}") for i in range(n)],
        "doc_id long, day long, text string",
    )
    return publish_corpus_committed(
        prepared, content, root, n_shards=n_shards, **kw
    )


def _upsert_late(spark, root, n=12, base=1000, **kw):
    updates = spark.createDataFrame(
        [(base + i, 10 + (i % 2), f"late {i:04d}", "train")
         for i in range(n)],
        "doc_id long, day long, text string, split string",
    )
    return upsert_into_published(spark, root, updates, key_col="doc_id", **kw)


def _doc(spark, root, version=None):
    from v6spark import txlog

    if version is None:
        _v, doc = txlog.read_latest(spark, f"{root}/_commits")
        return doc
    return txlog.read_version(spark, f"{root}/_commits", version)


def _rows(df):
    return sorted(
        (r["doc_id"], r["day"], r["text"], r["split"]) for r in df.collect()
    )


# ------------------------------------------------------------- round trip


def test_offload_roundtrip_pure(tmp_path, monkeypatch):
    monkeypatch.setattr(pipeline, "_MANIFEST_INLINE_MAX", 0)
    # no Spark needed on the local pyarrow path: exact dict round trip,
    # including typed stats values, empty splits, and file order
    payload = {
        "live": "v=000001-ab",
        "splits": {"train": 3, "valid": 0},
        "files": {
            "train": ["v=1/split=train/shard=1/b.parquet",
                      "v=1/split=train/shard=0/a.parquet"],
            "valid": [],
        },
        "col_stats": {
            "train": {
                "v=1/split=train/shard=0/a.parquet": {
                    "day": [0, 5, 0],
                    "text": ["body 0000", "body 0047", 2],
                    "flag": [True, True, 0],
                    "score": [0.25, 9.75, 1],
                    "allnull": [None, None, 7],
                },
            },
        },
        "file_stats": {"train": {"v=1/split=train/shard=0/a.parquet":
                                 [0, 47, 24]}},
    }
    import copy

    original = copy.deepcopy(payload)
    slim = _offload_manifest(None, str(tmp_path), "v=000001-ab", payload)
    assert "files" not in slim and "col_stats" not in slim
    assert slim["manifest_ref"]["entries"] == 4
    assert sorted(slim["manifest_ref"]["sections"]) == [
        "col_stats", "file_stats", "files",
    ]
    # the sidecar must be under the committing version's own dir
    assert slim["manifest_ref"]["dir"] == "v=000001-ab/_manifest"
    assert os.path.isdir(tmp_path / "v=000001-ab" / "_manifest")
    back = _materialize_manifest(None, str(tmp_path), dict(slim))
    for field in ("files", "col_stats", "file_stats"):
        assert back[field] == original[field], field
    assert "manifest_ref" not in back
    # file ORDER and the drained split both survived
    assert back["files"]["valid"] == []
    assert back["files"]["train"][0].endswith("b.parquet")


def test_small_manifests_stay_inline(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _publish(spark, root)
    doc = _doc(spark, root)
    assert "manifest_ref" not in doc
    assert doc.get("col_stats")


def test_offloaded_readers_match_inline(spark, tmp_path, offload_always):
    root = str(tmp_path / "off")
    _publish(spark, root)
    doc = _doc(spark, root)
    assert "manifest_ref" in doc
    assert "col_stats" not in doc and "file_stats" not in doc

    inline_root = str(tmp_path / "inline")
    prev, pipeline._MANIFEST_INLINE_MAX = pipeline._MANIFEST_INLINE_MAX, 4096
    try:
        _publish(spark, inline_root)
    finally:
        pipeline._MANIFEST_INLINE_MAX = prev

    assert _rows(read_published_corpus(spark, root)) == _rows(
        read_published_corpus(spark, inline_root)
    )
    # same pruning DECISIONS, not just same answers
    seen_off, seen_in = {}, {}
    q = "day >= 3 AND day <= 4"
    r_off = read_published_where(
        spark, root, q, _scan_observer=lambda s, f: seen_off.update({s: f}),
    )
    r_in = read_published_where(
        spark, inline_root, q,
        _scan_observer=lambda s, f: seen_in.update({s: f}),
    )
    assert _rows(r_off) == _rows(r_in)

    def _shape(seen):
        # file names carry nonces/UUIDs — compare the decisions by the
        # stable (split, shard) coordinates of the surviving files
        return {
            s: sorted(p.split("/split=")[1].split("/part")[0] for p in f)
            for s, f in seen.items()
        }

    assert _shape(seen_off) == _shape(seen_in)


def test_point_lookup_on_offloaded(spark, tmp_path, offload_always):
    root = str(tmp_path / "corpus")
    _publish(spark, root)
    seen = {}
    out = read_published_keys(
        spark, root, [7, 12],
        _scan_observer=lambda s, f: seen.setdefault(s, f),
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [7, 12]
    total = published_file_census(spark, root).count()
    assert sum(len(f) for f in seen.values()) < total  # stats pruned


# ------------------------------------------------------------------- DML


def test_dml_chain_on_offloaded_table(spark, tmp_path, offload_always):
    root = str(tmp_path / "corpus")
    _publish(spark, root)
    r = retract_from_published(spark, root, "doc_id = 5")
    assert r["rows_removed"] == 1
    assert "manifest_ref" in _doc(spark, root)
    u = _upsert_late(spark, root)
    assert u["rows_inserted"] == 12
    # upsert candidate pruning ran off the sidecar-loaded key stats;
    # the incremental batch's files carry tight day ranges, so a
    # recent-window read opens only them
    seen = {}
    recent = read_published_where(
        spark, root, "day >= 10",
        _scan_observer=lambda s, f: seen.setdefault(s, list(f)),
    )
    assert recent.count() == 12
    census = published_file_census(spark, root)
    assert sum(len(f) for f in seen.values()) < census.count()
    n_before = census.count()
    c = compact_published(spark, root)
    assert c is not None
    assert published_file_census(spark, root).count() <= n_before
    got = read_published_corpus(spark, root)
    assert got.count() == 48 - 1 + 12
    assert "manifest_ref" in _doc(spark, root)


def test_advice_and_census_on_offloaded(spark, tmp_path, offload_always):
    root = str(tmp_path / "corpus")
    _publish(spark, root)
    adv = compaction_advice(spark, root)
    assert adv["manifest_offloaded_entries"] > 0
    assert adv["files_with_col_stats"] > 0
    rows = published_file_census(spark, root).collect()
    assert all(r["rows"] is not None for r in rows)  # key stats loaded


def test_time_travel_across_modes(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _publish(spark, root)  # v1 inline
    pipeline_max = pipeline._MANIFEST_INLINE_MAX
    pipeline._MANIFEST_INLINE_MAX = 0
    try:
        _upsert_late(spark, root)  # v2 offloaded
    finally:
        pipeline._MANIFEST_INLINE_MAX = pipeline_max
    assert read_published_corpus(spark, root, version=1).count() == 48
    assert read_published_corpus(spark, root).count() == 60
    assert "manifest_ref" in _doc(spark, root)
    assert "manifest_ref" not in _doc(spark, root, version=1)


def test_schema_evolution_carries_ref(spark, tmp_path, offload_always):
    root = str(tmp_path / "corpus")
    _publish(spark, root)
    v1_ref = _doc(spark, root)["manifest_ref"]
    evolve_published_schema(spark, root, [("license", "string")])
    doc = _doc(spark, root)
    # the evolution is manifest-only: it carries v1's POINTER verbatim
    # (cross-version ref) rather than copying megabytes of stats
    assert doc["manifest_ref"]["dir"] == v1_ref["dir"]
    df = read_published_corpus(spark, root)
    assert "license" in df.columns and df.count() == 48
    # pruning still works through the cross-version ref
    seen = {}
    out = read_published_where(
        spark, root, "day = 0",
        _scan_observer=lambda s, f: seen.setdefault(s, list(f)),
    )
    assert out.count() == 8


# ----------------------------------------------------------------- vacuum


def test_vacuum_keeps_cross_version_sidecar(spark, tmp_path, offload_always):
    root = str(tmp_path / "corpus")
    _publish(spark, root)
    v1_dir = _doc(spark, root)["manifest_ref"]["dir"].split("/", 1)[0]
    evolve_published_schema(spark, root, [("license", "string")])
    # v2 (retained) points into v1's directory: BOTH vacuums must
    # spare the sidecar even though v1's manifest itself is retired
    vacuum_published(spark, root, keep_last=1)
    vacuum_published_files(spark, root, keep_last=1)
    assert os.path.isdir(tmp_path / "corpus" / v1_dir / "_manifest")
    assert read_published_corpus(spark, root).count() == 48
    assert read_published_where(spark, root, "day = 1").count() == 8


def test_vacuum_files_forgets_retracted_bytes(
    spark, tmp_path, offload_always
):
    root = str(tmp_path / "corpus")
    _publish(spark, root)
    before = {
        r["file"] for r in published_file_census(spark, root).collect()
    }
    retract_from_published(spark, root, "doc_id = 5")
    vacuum_published_files(spark, root, keep_last=1)
    after = {
        r["file"] for r in published_file_census(spark, root).collect()
    }
    rewritten = before - after
    assert rewritten
    for rel in rewritten:
        assert not os.path.exists(tmp_path / "corpus" / rel)
    # reads + pruning intact post-sweep
    assert read_published_corpus(spark, root).count() == 47
    assert read_published_where(spark, root, "day = 5").count() == 7


def test_lost_race_cleans_sidecar_orphan(spark, tmp_path, offload_always):
    # a crashed/lost attempt's vdir (data + sidecar) is unreferenced:
    # the directory vacuum sweeps it wholesale
    root = str(tmp_path / "corpus")
    _publish(spark, root)
    _upsert_late(spark, root)
    live_refs = {
        _doc(spark, root, version=v)["manifest_ref"]["dir"].split("/")[0]
        for v in (1, 2)
    }
    # simulate an orphan: a version dir with only a sidecar, no manifest
    orphan = tmp_path / "corpus" / "v=000099-deadbeef" / "_manifest"
    orphan.mkdir(parents=True)
    (orphan / "stats-0.parquet").write_bytes(b"torn")
    vacuum_published(spark, root, keep_last=2)
    assert not orphan.exists()
    for d in live_refs:
        assert (tmp_path / "corpus" / d).exists()


def test_missing_sidecar_raises_clearly(spark, tmp_path, offload_always):
    root = str(tmp_path / "corpus")
    _publish(spark, root)
    ref_dir = _doc(spark, root)["manifest_ref"]["dir"]
    import shutil

    shutil.rmtree(tmp_path / "corpus" / ref_dir)
    with pytest.raises(IOError, match="manifest sidecar"):
        read_published_where(spark, root, "day = 0").count()


def test_dv_map_offloads_with_files(spark, tmp_path, offload_always):
    # deletion vectors ride the same sidecar: merge-on-read chains,
    # census debt accounting, and the compact that materializes them
    # all behave identically with the dv map offloaded
    root = str(tmp_path / "corpus")
    _publish(spark, root)
    r1 = retract_from_published(spark, root, "day = 2", strategy="dv")
    assert r1["rows_removed"] == 8 and r1["files_rewritten"] == 0
    r2 = retract_from_published(spark, root, "day = 3", strategy="dv")
    assert r2["rows_removed"] == 8
    doc = _doc(spark, root)
    assert "dv" not in doc and "files" not in doc
    assert "dv" in doc["manifest_ref"]["sections"]
    assert read_published_corpus(spark, root).count() == 48 - 16
    adv = compaction_advice(spark, root, max_dv_deleted_rows=4)
    assert adv["dv_deleted_rows"] == 16 and adv["needs_compaction"]
    # point lookup on a dv-deleted key: merge-on-read must drop it
    assert read_published_keys(spark, root, [2]).collect() == []
    assert compact_published(spark, root) is not None
    assert read_published_corpus(spark, root).count() == 32
    rows = published_file_census(spark, root).collect()
    assert sum(r["dv_deleted"] or 0 for r in rows) == 0  # materialized


# ------------------------------------------------------------ WAP / leases


def test_promote_offloaded_stage_and_vacuum(spark, tmp_path, offload_always):
    root = str(tmp_path / "corpus")
    prepared = spark.createDataFrame(
        [(i, "train") for i in range(24)], "doc_id long, split string"
    )
    content = spark.createDataFrame(
        [(i, i % 3, f"s {i}") for i in range(24)],
        "doc_id long, day long, text string",
    )
    name = stage_corpus_publish(prepared, content, root, n_shards=4)
    out = promote_staged(spark, root, name)
    assert out["files"] > 0
    doc = _doc(spark, root)
    # the promotion manifest has no live dirs of its own — its file
    # list and stats live in the sidecar under ITS vdir, which the
    # directory vacuum must keep via manifest_ref (not via live)
    assert "live" not in doc and "manifest_ref" in doc
    ref_dir = doc["manifest_ref"]["dir"].split("/", 1)[0]
    vacuum_published(spark, root, keep_last=1)
    assert os.path.isdir(tmp_path / "corpus" / ref_dir)
    assert read_published_corpus(spark, root).count() == 24
    assert sorted(
        r["doc_id"] for r in read_published_keys(spark, root, [3]).collect()
    ) == [3]


def test_leased_offloaded_version_survives(spark, tmp_path, offload_always):
    root = str(tmp_path / "corpus")
    _publish(spark, root)
    lease, v1 = acquire_read_lease(spark, root, ttl_seconds=3600)
    _upsert_late(spark, root)
    _upsert_late(spark, root, base=2000)
    vacuum_published_files(spark, root, keep_last=1)
    pinned = read_published_corpus(spark, root, version=v1)
    assert pinned.count() == 48
