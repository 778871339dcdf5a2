"""Write-audit-publish staging on the committed-corpus txlog.

Stage commits a full publish under <root>/_staging/<name> (own log,
invisible to corpus readers); promote adopts it by REFERENCE (a
file-level manifest, zero data movement); drop refuses while any
retained manifest references the stage.  Post-promotion DML, point
lookups, and compaction must behave exactly as on a direct publish.
"""
from __future__ import annotations

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    compact_published,
    drop_staged,
    list_staged,
    promote_staged,
    publish_corpus_committed,
    read_published_corpus,
    read_published_keys,
    read_staged_corpus,
    retract_from_published,
    stage_corpus_publish,
    upsert_into_published,
    vacuum_published_files,
)


def _frames(spark, n, body="body"):
    docs = spark.range(n).selectExpr(
        "id as doc_id", f"concat('{body} ', id) as text"
    )
    prepared = spark.range(n).selectExpr("id as doc_id", "'train' as split")
    return prepared, docs


def test_stage_is_invisible_until_promoted(spark, tmp_path):
    root = str(tmp_path / "corpus")
    prepared, docs = _frames(spark, 30)
    name = stage_corpus_publish(prepared, docs, root, n_shards=2)
    assert list_staged(spark, root) == [name]
    assert read_published_corpus(spark, root) is None  # corpus unseen
    audit = read_staged_corpus(spark, root, name)
    assert audit.count() == 30  # the audit surface
    res = promote_staged(spark, root, name)
    assert res["_version"] == 1 and res["files"] > 0
    out = read_published_corpus(spark, root)
    assert out.count() == 30
    assert out.filter("doc_id = 7").collect()[0]["text"] == "body 7"


def test_failed_audit_drops_cleanly(spark, tmp_path):
    root = str(tmp_path / "corpus")
    prepared, docs = _frames(spark, 10)
    name = stage_corpus_publish(prepared, docs, root, n_shards=2)
    assert drop_staged(spark, root, name) is True
    assert list_staged(spark, root) == []
    assert drop_staged(spark, root, name) is False  # already gone


def test_drop_refused_while_referenced(spark, tmp_path):
    root = str(tmp_path / "corpus")
    prepared, docs = _frames(spark, 20)
    name = stage_corpus_publish(prepared, docs, root, n_shards=2)
    promote_staged(spark, root, name)
    with pytest.raises(ValueError, match="referenced"):
        drop_staged(spark, root, name)
    # compaction internalizes the files into a regular version dir...
    compact_published(spark, root)
    vacuum_published_files(spark, root, keep_last=1)
    # ...after which the stage is unreferenced and reclaimable
    assert drop_staged(spark, root, name) is True
    assert read_published_corpus(spark, root).count() == 20


def test_dml_and_point_lookup_after_promotion(spark, tmp_path):
    root = str(tmp_path / "corpus")
    prepared, docs = _frames(spark, 100)
    name = stage_corpus_publish(prepared, docs, root, n_shards=4)
    promote_staged(spark, root, name)
    retract_from_published(spark, root, "doc_id = 12")
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(13, "rev 13", None), (1013, "new", "train")],
            "doc_id long, text string, split string",
        ),
    )
    out = read_published_corpus(spark, root)
    assert out.count() == 100  # -1 retract +1 insert
    assert out.filter("doc_id = 12").count() == 0
    assert out.filter("doc_id = 13").collect()[0]["text"] == "rev 13"
    scanned = []
    hit = read_published_keys(
        spark, root, [13, 50],
        _scan_observer=lambda s, fl: scanned.append(len(fl)),
    )
    assert {r["doc_id"] for r in hit.collect()} == {13, 50}
    assert 0 < sum(scanned) <= 4  # stats-pruned, staged files included


def test_promote_is_exactly_once_with_txn_id(spark, tmp_path):
    root = str(tmp_path / "corpus")
    prepared, docs = _frames(spark, 10)
    name = stage_corpus_publish(prepared, docs, root, n_shards=2)
    r1 = promote_staged(spark, root, name, txn_id="promo-1")
    r2 = promote_staged(spark, root, name, txn_id="promo-1")
    assert r2["replayed"] is True and r2["_version"] == r1["_version"]
    v, _doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    assert v == 1


def test_promote_schema_drift_guard(spark, tmp_path):
    root = str(tmp_path / "corpus")
    prepared, docs = _frames(spark, 10)
    publish_corpus_committed(prepared, docs, root, n_shards=2)
    docs2 = spark.range(10).selectExpr(
        "id as doc_id", "concat('b ', id) as text", "'mit' as license"
    )
    name = stage_corpus_publish(prepared, docs2, root, n_shards=2)
    with pytest.raises(ValueError, match="allow_schema_change"):
        promote_staged(spark, root, name)
    promote_staged(spark, root, name, allow_schema_change=True)
    assert "license" in read_published_corpus(spark, root).columns


def test_promoted_version_survives_vacuum(spark, tmp_path):
    """File-granular vacuum must not touch staged files referenced by
    the retained promotion manifest."""
    root = str(tmp_path / "corpus")
    prepared, docs = _frames(spark, 25)
    name = stage_corpus_publish(prepared, docs, root, n_shards=2)
    promote_staged(spark, root, name)
    retract_from_published(spark, root, "doc_id = 3")
    vacuum_published_files(spark, root, keep_last=1)
    assert read_published_corpus(spark, root).count() == 24


def test_concurrent_promotes_serialize(spark, tmp_path):
    """Two stages promoted from two threads: both land exactly once
    at versions 1 and 2; the corpus reads as whichever committed
    last; neither manifest is torn."""
    import threading

    root = str(tmp_path / "corpus")
    names = []
    for i, body in enumerate(("alpha", "beta")):
        prepared, docs = _frames(spark, 15, body=body)
        names.append(
            stage_corpus_publish(prepared, docs, root, n_shards=2)
        )
    errors, results = [], {}

    def promoter(name):
        try:
            results[name] = promote_staged(spark, root, name)
        except Exception as exc:  # pragma: no cover - fail loudly
            errors.append(exc)

    threads = [
        threading.Thread(target=promoter, args=(n,)) for n in names
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    assert {results[n]["_version"] for n in names} == {1, 2}
    winner = next(n for n in names if results[n]["_version"] == 2)
    body = "alpha" if winner == names[0] else "beta"
    out = read_published_corpus(spark, root)
    assert out.count() == 15
    assert out.filter("doc_id = 1").collect()[0]["text"] == f"{body} 1"


def test_promote_races_upsert(spark, tmp_path):
    """A promote and an upsert race: both commit exactly once and the
    final state is a serializable composition — either the upsert
    applied to the old corpus then the promote replaced it, or the
    promote landed first and the upsert merged into the staged data
    (the OCC loop recomputes the loser against the winner's files)."""
    import threading

    root = str(tmp_path / "corpus")
    prepared, docs = _frames(spark, 20, body="old")
    publish_corpus_committed(prepared, docs, root, n_shards=2)
    prepared2, docs2 = _frames(spark, 20, body="new")
    name = stage_corpus_publish(prepared2, docs2, root, n_shards=2)
    updates = spark.createDataFrame(
        [(5, "revised five", None)], "doc_id long, text string, split string"
    )
    errors, results = [], {}

    def promoter():
        try:
            results["promote"] = promote_staged(spark, root, name)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def upserter():
        try:
            results["upsert"] = upsert_into_published(
                spark, root, updates
            )
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [
        threading.Thread(target=promoter),
        threading.Thread(target=upserter),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    assert {results["promote"]["_version"], results["upsert"]["_version"]} \
        == {2, 3}
    out = read_published_corpus(spark, root)
    assert out.count() == 20
    text5 = out.filter("doc_id = 5").collect()[0]["text"]
    text6 = out.filter("doc_id = 6").collect()[0]["text"]
    if results["promote"]["_version"] == 3:
        # promote landed last: the staged corpus IS the final state
        assert (text5, text6) == ("new 5", "new 6")
    else:
        # upsert recomputed against the promoted files: staged body
        # everywhere except the revised key
        assert (text5, text6) == ("revised five", "new 6")
