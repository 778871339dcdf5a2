"""TF-IDF / BM25 relevance scoring (operators/text.py).

Expected values are computed independently in plain Python on a tiny
hand-built corpus, so the Spark pipeline is checked against the
formula, not against itself.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from v6spark.operators import text
from v6spark.sources.tables import load_table

CORPUS = [
    (1, "the cat sat"),
    (2, "the dog"),
    (3, "cat cat dog"),
]


def _corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_term_doc_freq_golden(spark):
    got = {
        r["token"]: r["df"]
        for r in text.term_doc_freq(_corpus(spark)).collect()
    }
    assert got == {"the": 2, "cat": 2, "sat": 1, "dog": 2}


def test_tf_idf_golden(spark):
    n = 3
    idf = lambda df_t: math.log((n + 1) / (df_t + 1)) + 1
    expected = {
        (1, "the"): 1 * idf(2),
        (1, "cat"): 1 * idf(2),
        (1, "sat"): 1 * idf(1),
        (2, "the"): 1 * idf(2),
        (2, "dog"): 1 * idf(2),
        (3, "cat"): 2 * idf(2),
        (3, "dog"): 1 * idf(2),
    }
    rows = text.tf_idf(_corpus(spark)).collect()
    got = {(r["doc_id"], r["token"]): r["tf_idf"] for r in rows}
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-5, k


def test_tf_idf_top_terms(spark):
    rows = text.tf_idf(_corpus(spark), top_terms_per_doc=1).collect()
    best = {r["doc_id"]: r["token"] for r in rows}
    # d1: 'sat' is the rarest term; d3: doubled 'cat' wins.
    assert best == {1: "sat", 2: "dog", 3: "cat"}
    assert len(rows) == 3


def test_bm25_golden(spark):
    n, k1, b = 3, 1.2, 0.75
    dls = {1: 3, 2: 2, 3: 3}
    avgdl = sum(dls.values()) / n
    # query-term stats: df(cat)=2 {d1,d3}, df(dog)=2 {d2,d3}
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))

    def s(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    expected = {
        1: s(1, 3),
        2: s(1, 2),
        3: s(2, 3) + s(1, 3),
    }
    rows = text.bm25_score(_corpus(spark), ["cat", "dog"]).collect()
    got = {r["doc_id"]: r["bm25"] for r in rows}
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-5, k


def test_bm25_on_documents_table(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    scored = text.bm25_score(docs, ["the", "data"])
    assert scored.count() > 0
    # Scores are positive and the idf join stayed broadcast.
    assert scored.filter(F.col("bm25") <= 0).count() == 0
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # Scoring path reads the corpus once: both the idf branch and the
    # score branch consume the persisted posting relation (the parquet
    # scan text below only appears inside the cached plan definition).
    assert plan.count("InMemoryTableScan") >= 2


def test_bm25_rejects_empty_query(spark):
    try:
        text.bm25_score(_corpus(spark), [])
    except ValueError:
        return
    raise AssertionError("empty query_terms should be rejected")
