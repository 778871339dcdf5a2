"""Manifest-pruned point lookups on committed publishes.

`read_published_keys` must touch only shard-pruned + stats-pruned
files (the _scan_observer hook records what would be opened), return
exactly the requested rows, survive DML/evolution, and work
version-pinned.
"""
from __future__ import annotations

import pytest

from v6spark.pipeline import (
    evolve_published_schema,
    publish_corpus_committed,
    read_published_keys,
    retract_from_published,
    upsert_into_published,
)


def _publish(spark, tmp_path, n=400, n_shards=16):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text"
    )
    prepared = spark.range(n).selectExpr(
        "id as doc_id",
        "case when id % 10 = 0 then 'valid' else 'train' end as split",
    )
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=n_shards)
    return root


def test_lookup_returns_exact_rows_and_prunes(spark, tmp_path):
    root = _publish(spark, tmp_path)
    scanned: list = []
    out = read_published_keys(
        spark, root, [7, 130, 260],
        _scan_observer=lambda s, fl: scanned.append((s, fl)),
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert sorted(rows) == [7, 130, 260]
    assert rows[130]["text"] == "body 130"
    assert rows[130]["split"] == "valid"
    n_files = sum(len(fl) for _s, fl in scanned)
    # 3 keys hash into at most 3 shards; stats can prune further —
    # never anywhere near the full file population
    assert 0 < n_files <= 6


def test_lookup_after_dml_and_evolution(spark, tmp_path):
    root = _publish(spark, tmp_path, n=100, n_shards=4)
    retract_from_published(spark, root, "doc_id = 30")
    evolve_published_schema(spark, root, [("license", "string")])
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(40, "rev 40", "mit", None)],
            "doc_id long, text string, license string, split string",
        ),
    )
    out = read_published_keys(spark, root, [30, 40, 41])
    rows = {r["doc_id"]: r for r in out.collect()}
    assert sorted(rows) == [40, 41]  # 30 retracted
    assert rows[40]["text"] == "rev 40" and rows[40]["license"] == "mit"
    assert rows[41]["license"] is None  # pre-evolution file, typed NULL


def test_lookup_version_pinned(spark, tmp_path):
    root = _publish(spark, tmp_path, n=50, n_shards=4)
    retract_from_published(spark, root, "doc_id = 10")
    assert read_published_keys(spark, root, [10]).count() == 0
    pinned = read_published_keys(spark, root, [10], version=1)
    assert pinned.collect()[0]["text"] == "body 10"


def test_lookup_int_typed_key_column(spark, tmp_path):
    """xxhash64 is type-sensitive: a publish whose key column is INT
    (not bigint) must still shard-prune correctly — the probe frame's
    inferred bigint would hash most keys to the WRONG shard and the
    lookup would silently return empty (regression: probe cast to the
    manifest-recorded key type)."""
    docs = spark.range(200).selectExpr(
        "cast(id as int) as doc_id", "concat('body ', id) as text"
    )
    prepared = spark.range(200).selectExpr(
        "cast(id as int) as doc_id", "'train' as split"
    )
    root = str(tmp_path / "corpus_int")
    publish_corpus_committed(prepared, docs, root, n_shards=16)
    out = read_published_keys(spark, root, [5, 77, 180])
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    assert rows == {5: "body 5", 77: "body 77", 180: "body 180"}


def test_lookup_no_match_is_empty_with_schema(spark, tmp_path):
    root = _publish(spark, tmp_path, n=20, n_shards=2)
    out = read_published_keys(spark, root, [999999])
    assert out.count() == 0
    assert "doc_id" in out.columns and "split" in out.columns
