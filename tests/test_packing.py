"""Sequence packing (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from v6spark.operators import packing, text
from v6spark.sources.tables import load_table

MAX_TOKENS = 64


def _doc_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return text.token_counts(docs).select(
        "doc_id", F.col("ws_tokens").alias("n_tokens")
    )


def test_every_doc_packed_exactly_once(spark, sf_dir):
    dt = _doc_tokens(spark, sf_dir)
    packed = packing.pack_sequences(dt, MAX_TOKENS)
    assert packed.count() == dt.count()
    assert packed.select("doc_id").distinct().count() == dt.count()


def test_no_regular_bin_exceeds_budget(spark, sf_dir):
    dt = _doc_tokens(spark, sf_dir)
    packed = packing.pack_sequences(dt, MAX_TOKENS)
    over = (
        packed.filter(~F.col("oversize"))
        .groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("t"))
        .filter(F.col("t") > MAX_TOKENS)
        .count()
    )
    assert over == 0


def test_oversize_docs_isolated_and_flagged(spark):
    spark_df = spark.createDataFrame(
        [(1, 10), (2, 200), (3, 20), (4, 999)], "doc_id long, n_tokens long"
    )
    packed = packing.pack_sequences(spark_df, max_tokens=100)
    rows = {r["doc_id"]: r for r in packed.collect()}
    assert rows[2]["oversize"] and rows[4]["oversize"]
    assert not rows[1]["oversize"] and not rows[3]["oversize"]
    # Each oversize doc sits alone in its bin.
    bins = {}
    for r in rows.values():
        bins.setdefault(r["bin_id"], []).append(r["doc_id"])
    for doc in (2, 4):
        assert bins[rows[doc]["bin_id"]] == [doc]


def test_packing_deterministic(spark, sf_dir):
    dt = _doc_tokens(spark, sf_dir)
    a = sorted(map(tuple, packing.pack_sequences(dt, MAX_TOKENS).collect()))
    b = sorted(
        map(tuple, packing.pack_sequences(dt.repartition(5), MAX_TOKENS).collect())
    )
    assert a == b


def test_fill_rate_reasonable(spark, sf_dir):
    dt = _doc_tokens(spark, sf_dir)
    packed = packing.pack_sequences(dt, MAX_TOKENS, n_groups=4)
    stats = packing.packing_stats(packed, MAX_TOKENS).collect()[0]
    assert stats["n_bins"] > 0
    # FFD over many small docs should fill bins well; the loose bound
    # guards regressions without baking in corpus specifics.
    assert stats["mean_fill"] >= 0.5
    assert stats["max_fill"] <= 1.0


def test_bad_args_rejected(spark, sf_dir):
    dt = _doc_tokens(spark, sf_dir)
    for kwargs in ({"max_tokens": 0}, {"max_tokens": 64, "n_groups": 0}):
        try:
            packing.pack_sequences(dt, **kwargs)
        except ValueError:
            continue
        raise AssertionError(f"{kwargs} should be rejected")
