"""Byte-level BPE: trainer determinism, encode correctness
(lossless byte concatenation, merge effectiveness), and the
distributed no-shuffle encode plan."""

from __future__ import annotations

import pytest

from v6spark.operators import bpe

CORPUS = [
    "the cat sat on the mat and the cat ran",
    "the dog sat on the log and the dog ran",
    "cats and dogs sat together on the mat",
    "the the the cat cat dog dog sat sat sat",
] * 5


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_train_is_deterministic_and_learns_frequent_units(spark):
    m1 = bpe.train_bpe(_df(spark), vocab_size=300)
    m2 = bpe.train_bpe(_df(spark), vocab_size=300)
    # the tiny corpus exhausts productive pairs before the cap: the
    # trainer stops when no pair repeats, never pads
    assert m1 == m2 and 0 < len(m1) <= 300 - 256
    # the corpus's most frequent word must become a single token
    sym = {bytes([b]) for b in range(256)}
    for a, b in m1:
        sym.add(a + b)
    assert b" the" in sym or b"the" in sym


def test_encode_lossless_and_compresses(spark):
    df = _df(spark)
    merges = bpe.train_bpe(df, vocab_size=320)
    enc = {r["doc_id"]: r for r in bpe.bpe_encode(df, merges).collect()}
    for i, text in enumerate(CORPUS):
        toks = [bytes(t) for t in enc[i]["tokens"]]
        # lossless: tokens concatenate back to the utf-8 bytes
        assert b"".join(toks) == text.encode()
        assert enc[i]["n_tokens"] == len(toks)
        # merges actually merge: far fewer tokens than bytes
        assert len(toks) < len(text.encode()) * 0.6
    # zero merges degenerates to raw bytes
    raw = bpe.bpe_encode(df, []).collect()[0]
    assert raw["n_tokens"] == len(CORPUS[0].encode())


def test_encode_plan_is_narrow(spark):
    df = _df(spark)
    merges = bpe.train_bpe(df, vocab_size=280)
    plan = bpe.bpe_token_counts(df, merges)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan -> project, no shuffle


def test_sampled_training_runs(spark):
    df = _df(spark)
    merges = bpe.train_bpe(df, vocab_size=280, sample_fraction=0.6, seed=1)
    assert len(merges) > 0
    # counts flow into the packing-budget shape
    counts = bpe.bpe_token_counts(df, merges).collect()
    assert all(r["n_tokens"] > 0 for r in counts)


def test_vocab_floor(spark):
    with pytest.raises(ValueError):
        bpe.train_bpe(_df(spark), vocab_size=100)


def test_pipeline_with_bpe_counts(spark):
    """prepare_training_corpus(bpe_merges=...) packs on real BPE
    counts: n_tokens matches bpe_encode exactly for every survivor."""
    from v6spark.pipeline import prepare_training_corpus

    df = _df(spark)
    merges = bpe.train_bpe(df, vocab_size=320)
    out = prepare_training_corpus(df, bpe_merges=merges, max_tokens=64)
    expect = {r["doc_id"]: r["n_tokens"] for r in bpe.bpe_encode(df, merges).collect()}
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["n_tokens"] == expect[r["doc_id"]]
