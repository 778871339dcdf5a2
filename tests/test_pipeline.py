"""End-to-end training-corpus preparation (v6spark/pipeline.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from v6spark.pipeline import prepare_training_corpus
from v6spark.sources.tables import load_table

MAX_TOKENS = 64


def test_pipeline_on_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = prepare_training_corpus(docs, max_tokens=MAX_TOKENS).cache()
    n = out.count()
    assert 0 < n <= docs.count()
    # Each surviving doc appears exactly once.
    assert out.select("doc_id").distinct().count() == n
    # No regular bin over budget, within its (split, bin_id).
    over = (
        out.filter(~F.col("oversize"))
        .groupBy("split", "bin_id")
        .agg(F.sum("n_tokens").alias("t"))
        .filter(F.col("t") > MAX_TOKENS)
        .count()
    )
    assert over == 0
    # Bins never mix splits by construction: key includes split.
    out.unpersist()


def test_pipeline_filters_apply(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = prepare_training_corpus(
        docs, min_quality=0.3, langs=("en",), max_tokens=MAX_TOKENS
    )
    rows = out.select("quality_score", "pred_lang").collect()
    assert rows
    assert all(r["quality_score"] >= 0.3 for r in rows)
    assert all(r["pred_lang"] == "en" for r in rows)


def test_pipeline_dedups_exact_copies(spark):
    base = [(i, f"unique document number {i} with its own words") for i in range(10)]
    dups = [(100 + i, "identical boilerplate text repeated everywhere") for i in range(5)]
    docs = spark.createDataFrame(base + dups, "doc_id long, text string")
    out = prepare_training_corpus(docs, max_tokens=32)
    rows = {r["doc_id"]: r for r in out.collect()}
    # Exactly one of the 5 identical docs survives — the min id.
    survivors = [d for d in rows if d >= 100]
    assert survivors == [100]
    assert rows[100]["dup_count"] == 5
    # All unique docs survive with dup_count 1.
    assert all(rows[i]["dup_count"] == 1 for i in range(10))


def test_pipeline_near_dedup_drops_templated_copies(spark):
    """near_dedup=True also removes NEAR copies (one-token variants)
    that exact digests cannot see; the keeper is the cluster min id
    and dup_count counts exact + near losers together."""
    base = [(i, f"unique document number {i} with its own special words") for i in range(5)]
    tmpl = "the quick brown fox jumps over the lazy dog and runs far away"
    near = [(200, tmpl + " today"), (201, tmpl + " tonight"), (202, tmpl + " today")]
    docs = spark.createDataFrame(base + near, "doc_id long, text string")
    exact_only = prepare_training_corpus(docs, max_tokens=32)
    got_exact = {r["doc_id"] for r in exact_only.collect()}
    assert {200, 201} <= got_exact and 202 not in got_exact
    out = prepare_training_corpus(
        docs, max_tokens=32, near_dedup=True, min_jaccard=0.5
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # the whole template cluster collapses to its min id
    assert set(rows) == set(range(5)) | {200}
    assert rows[200]["dup_count"] == 3
    assert all(rows[i]["dup_count"] == 1 for i in range(5))


def test_pipeline_quality_gates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = prepare_training_corpus(docs, max_tokens=MAX_TOKENS).count()
    gated = prepare_training_corpus(
        docs, gopher_rules=True, repetition_gate=True, max_tokens=MAX_TOKENS
    ).count()
    assert 0 < gated <= base
    # A degenerate spam doc is dropped by the repetition gate even
    # though its quality_score alone would let it through.
    spam = spark.createDataFrame(
        [(1, "spam " * 50), (2, "the quick brown fox jumps over a lazy dog "
                               "while birds sing in the morning light")],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(spam, repetition_gate=True, max_tokens=64)
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_pipeline_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, prepare_training_corpus(docs, max_tokens=MAX_TOKENS).collect()))
    b = sorted(
        map(
            tuple,
            prepare_training_corpus(
                docs.repartition(3), max_tokens=MAX_TOKENS
            ).collect(),
        )
    )
    assert a == b


def test_media_directory_to_webdataset_end_to_end(spark, tmp_path):
    """The full multimodal story in one pass: mediadir ingest (magic
    -byte kinds) -> prepare_media_corpus (gates + perceptual dedup +
    split/shard) -> publish_corpus WebDataset tars — survivors only,
    deterministic."""
    import glob
    import os

    import numpy as np

    from v6spark.operators import multimodal as mm
    from v6spark.operators.jpeg import encode_jpeg
    from v6spark.pipeline import prepare_media_corpus, publish_corpus
    from v6spark.sources.media_datasource import register_media_source
    from v6spark.sources.trainshards import read_webdataset

    root = tmp_path / "corpus"
    root.mkdir()
    rng = np.random.default_rng(12)
    small = rng.integers(0, 255, (6, 8, 3)).astype(np.uint8)
    img = np.kron(small, np.ones((8, 8, 1), dtype=np.uint8))
    (root / "a.png").write_bytes(mm.encode_png(img))
    (root / "a_copy.jpg").write_bytes(encode_jpeg(img, quality=95))  # near-dup
    other = np.kron(rng.integers(0, 255, (6, 8, 3)).astype(np.uint8),
                    np.ones((8, 8, 1), dtype=np.uint8))
    (root / "b.png").write_bytes(mm.encode_png(other))
    (root / "junk.txt").write_bytes(b"not media")

    register_media_source(spark)
    media = spark.read.format("mediadir").load(str(root))
    prepared = prepare_media_corpus(
        media, phash_radius=4, split_weights={"train": 1.0}, n_shards=2
    )
    out = str(tmp_path / "published")
    counts = publish_corpus(
        prepared, media, out, fmt="webdataset", key_col="media_id", n_shards=2
    )
    assert counts == {"train": 2}  # near-dup loser + junk excluded
    back = read_webdataset(spark, os.path.join(out, "split=train"))
    uris = {bytes(r["content"]).decode() for r in back.collect()
            if r["column"] == "uri"}
    # the jpeg near-dup lost to the (lower-keyed-hash-id) png... or
    # vice versa: exactly one of the pair survives, plus b.png
    assert "b.png" in uris and len(uris) == 2
    assert len(uris & {"a.png", "a_copy.jpg"}) == 1
    assert glob.glob(os.path.join(out, "split=train", "*.tar"))
