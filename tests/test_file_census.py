"""Manifest-only file census + compaction advice.

Census values must match the actual files with ZERO file reads (the
census is asserted against a parallel truth computed by reading the
parquet); advice flags shards that accumulated DML generations and
clears after compact.
"""
from __future__ import annotations

import pytest

from v6spark.pipeline import (
    compact_published,
    compaction_advice,
    publish_corpus_committed,
    published_file_census,
    read_published_corpus,
    upsert_into_published,
)


def _publish(spark, tmp_path, n=60, n_shards=3):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text"
    )
    prepared = spark.range(n).selectExpr("id as doc_id", "'train' as split")
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=n_shards)
    return root


def test_census_matches_read_truth(spark, tmp_path):
    root = _publish(spark, tmp_path)
    census = published_file_census(spark, root)
    assert census.filter("rows is null").count() == 0
    total = census.agg({"rows": "sum"}).collect()[0][0]
    assert total == read_published_corpus(spark, root).count() == 60
    # per-shard sums match a real groupBy over the data
    truth = {
        (r["split"], int(r["shard"])): r["n"]
        for r in read_published_corpus(spark, root)
        .groupBy("split", "shard").count().withColumnRenamed("count", "n")
        .collect()
    }
    got = {
        (r["split"], r["shard"]): r["rows"]
        for r in census.groupBy("split", "shard")
        .agg({"rows": "sum"}).withColumnRenamed("sum(rows)", "rows")
        .collect()
    }
    assert got == truth


def test_advice_flags_dml_generations_and_clears_after_compact(
    spark, tmp_path
):
    root = _publish(spark, tmp_path, n=60, n_shards=2)
    assert compaction_advice(spark, root)["needs_compaction"] is False
    # rewrites leave the live set spanning multiple version dirs
    for r in range(5):
        upsert_into_published(
            spark, root,
            spark.createDataFrame(
                [(1, f"rev {r}", None)],
                "doc_id long, text string, split string",
            ),
        )
    # live files span the original publish dir plus the LATEST
    # rewrite generation (each upsert supersedes the previous one)
    adv = compaction_advice(spark, root, max_version_dirs=1)
    assert adv["needs_compaction"] is True
    assert adv["version_dirs"] == 2
    assert adv["files_unknown_stats"] == 0
    compact_published(spark, root)
    adv2 = compaction_advice(spark, root, max_version_dirs=1)
    assert adv2["needs_compaction"] is False
    assert adv2["version_dirs"] == 1
    assert read_published_corpus(spark, root).count() == 60


def test_min_rows_guard_ignores_single_file_shards(spark, tmp_path):
    """A shard already at one file cannot be improved by compaction —
    the min-rows trigger must not flag it (the actionability guard)."""
    root = _publish(spark, tmp_path, n=40, n_shards=2)
    adv = compaction_advice(
        spark, root, max_version_dirs=99, max_files_per_shard=99,
        min_rows_per_file=1_000_000,
    )
    assert adv["needs_compaction"] is False
    assert adv["shards_over"] == []
