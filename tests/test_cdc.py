"""Row-level change feed between committed corpus versions.

`published_corpus_changes` diffs the two manifests' FILE LISTS first
and reads only files present in exactly one version — scan cost
tracks the DML delta, not the corpus.  Unchanged rows inside
rewritten files (compaction, upsert survivors) are dropped by
null-safe struct equality.
"""
from __future__ import annotations

import pytest

from v6spark.pipeline import (
    compact_published,
    evolve_published_schema,
    publish_corpus_committed,
    published_corpus_changes,
    retract_from_published,
    upsert_into_published,
)


def _publish(spark, tmp_path, n=40):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text"
    )
    prepared = spark.range(n).selectExpr("id as doc_id", "'train' as split")
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=4)
    return root


def _by_type(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["_change_type"], []).append(r)
    return out


def test_upsert_changes(spark, tmp_path):
    root = _publish(spark, tmp_path)
    delta = spark.createDataFrame(
        [(5, "rev 5", None), (2005, "new doc", "train")],
        "doc_id long, text string, split string",
    )
    upsert_into_published(spark, root, delta)
    ch = published_corpus_changes(spark, root, 1)
    by = _by_type(ch)
    assert sorted(by) == ["insert", "update_postimage", "update_preimage"]
    assert [r["doc_id"] for r in by["insert"]] == [2005]
    assert by["update_preimage"][0]["text"] == "body 5"
    assert by["update_postimage"][0]["text"] == "rev 5"
    assert all(r["_commit_version"] == 2 for r in ch.collect())


def test_retract_changes_are_deletes_only(spark, tmp_path):
    root = _publish(spark, tmp_path)
    retract_from_published(spark, root, "doc_id in (3, 17)")
    ch = published_corpus_changes(spark, root, 1, 2)
    by = _by_type(ch)
    assert sorted(by) == ["delete"]
    assert sorted(r["doc_id"] for r in by["delete"]) == [3, 17]


def test_compaction_emits_zero_changes(spark, tmp_path):
    root = _publish(spark, tmp_path, n=20)
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(3, "rev 3", None)], "doc_id long, text string, split string"
        ),
    )
    v = compact_published(spark, root)
    ch = published_corpus_changes(spark, root, v - 1, v)
    assert ch is None or ch.count() == 0


def test_metadata_only_transition_is_none(spark, tmp_path):
    root = _publish(spark, tmp_path, n=20)
    evolve_published_schema(spark, root, [("license", "string")])
    assert published_corpus_changes(spark, root, 1, 2) is None


def test_changes_across_schema_evolution(spark, tmp_path):
    """Old files read typed NULLs for evolved columns; the pre-image
    carries NULL license, the post-image the upserted value."""
    root = _publish(spark, tmp_path, n=20)
    evolve_published_schema(spark, root, [("license", "string")])
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(4, "body 4", "mit", None)],
            "doc_id long, text string, license string, split string",
        ),
    )
    ch = published_corpus_changes(spark, root, 1, 3)
    by = _by_type(ch)
    assert sorted(by) == ["update_postimage", "update_preimage"]
    assert by["update_preimage"][0]["license"] is None
    assert by["update_postimage"][0]["license"] == "mit"
    assert "license" in ch.columns


def test_net_changes_across_many_versions(spark, tmp_path):
    """v1 -> v4 is the NET diff: a row inserted then retracted in the
    window never appears; an updated-twice row shows one pre/post."""
    root = _publish(spark, tmp_path)
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(6, "rev A", None), (3006, "ephemeral", "train")],
            "doc_id long, text string, split string",
        ),
    )
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(6, "rev B", None)], "doc_id long, text string, split string"
        ),
    )
    retract_from_published(spark, root, "doc_id = 3006")
    ch = published_corpus_changes(spark, root, 1)
    by = _by_type(ch)
    assert sorted(by) == ["update_postimage", "update_preimage"]
    assert by["update_preimage"][0]["text"] == "body 6"
    assert by["update_postimage"][0]["text"] == "rev B"
    assert ch.filter("doc_id = 3006").count() == 0


def test_split_move_is_an_update(spark, tmp_path):
    """The documented split-move pattern (retract + insert same key)
    surfaces as an update whose pre/post differ in `split`."""
    root = _publish(spark, tmp_path)
    retract_from_published(spark, root, "doc_id = 8")
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(8, "body 8", "valid")], "doc_id long, text string, split string"
        ),
    )
    ch = published_corpus_changes(spark, root, 1)
    by = _by_type(ch)
    assert sorted(by) == ["update_postimage", "update_preimage"]
    assert by["update_preimage"][0]["split"] == "train"
    assert by["update_postimage"][0]["split"] == "valid"


def test_unretained_version_raises(spark, tmp_path):
    root = _publish(spark, tmp_path, n=10)
    with pytest.raises(ValueError, match="retained"):
        published_corpus_changes(spark, root, 99)


def test_dv_retract_changes_are_deletes(spark, tmp_path):
    root = _publish(spark, tmp_path)
    retract_from_published(spark, root, "doc_id in (3, 17)", strategy="dv")
    ch = published_corpus_changes(spark, root, 1, 2)
    by = _by_type(ch)
    assert sorted(by) == ["delete"]
    assert sorted(r["doc_id"] for r in by["delete"]) == [3, 17]
    assert by["delete"][0]["_commit_version"] == 2


def test_dv_then_reinsert_is_an_update_across_window(spark, tmp_path):
    root = _publish(spark, tmp_path)
    retract_from_published(spark, root, "doc_id = 3", strategy="dv")
    delta = spark.createDataFrame(
        [(3, "reborn 3", "train")], "doc_id long, text string, split string"
    )
    upsert_into_published(spark, root, delta)
    # across the whole window the net effect on doc 3 is an update
    ch = published_corpus_changes(spark, root, 1)
    by = _by_type(ch)
    assert sorted(by) == ["update_postimage", "update_preimage"]
    assert by["update_preimage"][0]["text"] == "body 3"
    assert by["update_postimage"][0]["text"] == "reborn 3"


def test_compaction_of_dv_version_emits_zero_changes(spark, tmp_path):
    root = _publish(spark, tmp_path)
    retract_from_published(spark, root, "doc_id = 3", strategy="dv")
    compact_published(spark, root)
    # the dv'd row was already deleted at v2; materializing it at v3
    # changes nothing row-wise
    ch = published_corpus_changes(spark, root, 2, 3)
    assert ch is None or ch.count() == 0


def test_chained_dv_window_reports_each_delta_once(spark, tmp_path):
    root = _publish(spark, tmp_path)
    retract_from_published(spark, root, "doc_id = 3", strategy="dv")
    retract_from_published(spark, root, "doc_id = 17", strategy="dv")
    # v2 -> v3: only the second retraction's delete
    by = _by_type(published_corpus_changes(spark, root, 2, 3))
    assert sorted(by) == ["delete"]
    assert [r["doc_id"] for r in by["delete"]] == [17]
    # v1 -> v3: both
    by = _by_type(published_corpus_changes(spark, root, 1, 3))
    assert sorted(r["doc_id"] for r in by["delete"]) == [3, 17]
