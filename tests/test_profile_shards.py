"""Corpus profile (operators/profile.py) and shard writing
(operators/packing.py::assign_shards/write_training_shards)."""

from __future__ import annotations

from pyspark.sql import functions as F

from v6spark.operators import packing, profile
from v6spark.sources.tables import load_table


def test_corpus_profile_lattice_is_consistent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    prof = profile.corpus_profile(docs).collect()
    by_level: dict[str, list] = {}
    for r in prof:
        by_level.setdefault(r["level"], []).append(r)
    # exactly one corpus row, and the marginals add up through levels
    assert len(by_level["corpus"]) == 1
    total = by_level["corpus"][0]
    assert total["n_docs"] == docs.count()
    assert sum(r["n_docs"] for r in by_level["source"]) == total["n_docs"]
    assert sum(r["n_docs"] for r in by_level["source_lang"]) == total["n_docs"]
    assert sum(r["n_tokens"] for r in by_level["source"]) == total["n_tokens"]
    # group keys are NULL only above their level
    assert all(r["source"] is not None for r in by_level["source"])
    assert all(r["lang"] is None for r in by_level["source"])
    assert total["source"] is None and total["lang"] is None


def test_corpus_profile_single_expand(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        profile.corpus_profile(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") == 1
    assert "Python" not in plan


def test_assign_shards_deterministic_and_total(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = packing.assign_shards(docs, "doc_id", 8)
    counts = {r["shard"]: r["n"] for r in
              a.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) <= set(range(8))
    assert sum(counts.values()) == docs.count()
    # balanced-ish by the hash (500 docs over 8 shards)
    assert min(counts.values()) > 0
    b = packing.assign_shards(docs.repartition(7), "doc_id", 8)
    assert sorted(map(tuple, a.select("doc_id", "shard", "_order").collect())) == sorted(
        map(tuple, b.select("doc_id", "shard", "_order").collect())
    )


def test_write_training_shards_reproducible(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    packing.write_training_shards(docs, p1, n_shards=4)
    packing.write_training_shards(docs.repartition(5), p2, n_shards=4)
    r1 = spark.read.parquet(p1)
    r2 = spark.read.parquet(p2)
    assert r1.count() == docs.count()
    # identical shard assignment + content across runs/partitionings
    assert sorted(map(tuple, r1.select("doc_id", "shard").collect())) == sorted(
        map(tuple, r2.select("doc_id", "shard").collect())
    )
    # each shard directory holds exactly one data file
    import glob

    for k in {r["shard"] for r in r1.select("shard").distinct().collect()}:
        files = [
            f
            for f in glob.glob(f"{p1}/shard={k}/*")
            if not f.endswith((".crc", "_SUCCESS"))
        ]
        assert len(files) == 1, files
    # within-shard order is the deterministic hash order
    first = spark.read.parquet(f"{p1}/shard=0").limit(5).collect()
    again = spark.read.parquet(f"{p2}/shard=0").limit(5).collect()
    assert [r["doc_id"] for r in first] == [r["doc_id"] for r in again]
