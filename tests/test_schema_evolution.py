"""Additive schema evolution on committed publishes.

The r5 drift guard refuses any schema change (right default); this is
the sanctioned ADD-COLUMN path: manifest-only commit, zero data files
rewritten, old files read the added columns as typed NULLs, pinned
time-travel reads keep each version's own schema.
"""
from __future__ import annotations

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    evolve_published_schema,
    publish_corpus_committed,
    read_published_corpus,
    retract_from_published,
    upsert_into_published,
)


def _corpus(spark, n=40):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text"
    )
    prepared = spark.range(n).selectExpr(
        "id as doc_id", "'train' as split"
    )
    return prepared, docs


@pytest.mark.parametrize("mode", ["rename", "put"])
def test_evolve_add_column_reads_null_and_pins_old_schema(
    spark, tmp_path, mode
):
    prepared, docs = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        prepared, docs, root, n_shards=2, commit_mode=mode
    )
    res = evolve_published_schema(
        spark, root, [("license", "string"), ("toxicity", "double")],
        commit_mode=mode,
    )
    assert res["_version"] == 2
    assert [c[0] for c in res["schema"]] == [
        "doc_id", "text", "license", "toxicity",
    ]
    # unified read: old files expose the new columns as typed NULLs
    out = read_published_corpus(spark, root)
    assert set(out.columns) >= {"doc_id", "text", "license", "toxicity"}
    assert dict(out.dtypes)["toxicity"] == "double"
    assert out.filter("license is null").count() == 40
    # time travel: the pinned pre-evolution version keeps its schema
    v1 = read_published_corpus(spark, root, version=1)
    assert "license" not in v1.columns
    assert v1.count() == 40


def test_upsert_after_evolution_requires_and_fills_new_column(
    spark, tmp_path
):
    prepared, docs = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=2)
    evolve_published_schema(spark, root, [("license", "string")])

    # the old (pre-evolution) delta shape is now rejected
    stale = spark.createDataFrame(
        [(5, "rev 5", None)], "doc_id long, text string, split string"
    )
    with pytest.raises(ValueError, match="published schema"):
        upsert_into_published(spark, root, stale)

    updates = spark.createDataFrame(
        [(5, "rev 5", "mit", None), (999, "new doc", "apache", "train")],
        "doc_id long, text string, license string, split string",
    )
    res = upsert_into_published(spark, root, updates)
    assert res["rows_updated"] == 1 and res["rows_inserted"] == 1
    out = read_published_corpus(spark, root)
    got = {
        r["doc_id"]: (r["text"], r["license"])
        for r in out.filter("doc_id in (5, 6, 999)").collect()
    }
    assert got[5] == ("rev 5", "mit")
    assert got[999] == ("new doc", "apache")
    assert got[6] == ("body 6", None)  # untouched old row: NULL


def test_retract_on_evolved_column_is_null_safe(spark, tmp_path):
    """DELETE where license = 'mit': rows whose license is NULL (all
    pre-evolution rows) must SURVIVE — predicate-TRUE-only removal,
    the Delta DELETE contract."""
    prepared, docs = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=2)
    evolve_published_schema(spark, root, [("license", "string")])
    updates = spark.createDataFrame(
        [(5, "rev 5", "mit", None), (7, "rev 7", "mit", None)],
        "doc_id long, text string, license string, split string",
    )
    upsert_into_published(spark, root, updates)
    res = retract_from_published(spark, root, "license = 'mit'")
    assert res["rows_removed"] == 2
    out = read_published_corpus(spark, root)
    assert out.count() == 38
    assert out.filter("license is null").count() == 38


def test_evolution_guards(spark, tmp_path):
    prepared, docs = _corpus(spark, n=10)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=2)
    with pytest.raises(ValueError, match="already exists"):
        evolve_published_schema(spark, root, [("text", "string")])
    with pytest.raises(ValueError, match="valid Spark type"):
        evolve_published_schema(spark, root, [("x", "no_such_type")])
    with pytest.raises(ValueError, match="at least one"):
        evolve_published_schema(spark, root, [])
    # crash before the commit: version unchanged, schema unchanged
    with pytest.raises(RuntimeError, match="injected"):
        evolve_published_schema(
            spark, root, [("x", "string")], _fail_before_commit=True
        )
    v, doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    assert v == 1 and [c[0] for c in doc["schema"]] == ["doc_id", "text"]


def test_republish_with_evolved_schema_passes_drift_guard(
    spark, tmp_path
):
    prepared, docs = _corpus(spark, n=10)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=2)
    evolve_published_schema(spark, root, [("license", "string")])
    docs2 = docs.selectExpr("doc_id", "text", "'mit' as license")
    res = publish_corpus_committed(prepared, docs2, root, n_shards=2)
    assert res["_version"] == 3
    out = read_published_corpus(spark, root)
    assert out.filter("license = 'mit'").count() == 10
