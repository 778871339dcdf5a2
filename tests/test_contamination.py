"""Benchmark decontamination (operators/contamination.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from v6spark.operators import contamination
from v6spark.sources.tables import load_table


def _frames(spark):
    docs = spark.createDataFrame(
        [
            # contains the benchmark question verbatim
            (1, "intro text here the capital of france is paris "
                "which everyone knows and some trailing words"),
            # clean document, no 5-gram overlap
            (2, "a completely unrelated document about growing "
                "tomatoes in cold climates with little sunlight"),
            # shorter than n tokens -> zero grams, never contaminated
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "the capital of france is paris")],
        "q_id long, text string",
    )
    return docs, bench


def test_report_golden(spark):
    docs, bench = _frames(spark)
    got = {
        r["doc_id"]: r
        for r in contamination.contamination_report(docs, bench, n=5).collect()
    }
    # doc 1: 16 tokens -> 12 distinct 5-grams; the benchmark's two
    # 5-grams ("the capital of france is", "capital of france is paris")
    # both occur in it.
    assert got[1]["n_grams"] == 12
    assert got[1]["n_contaminated"] == 2
    assert got[1]["is_contaminated"]
    assert got[2]["n_contaminated"] == 0 and not got[2]["is_contaminated"]
    assert got[3]["n_grams"] == 0
    assert got[3]["contaminated_frac"] == 0.0 and not got[3]["is_contaminated"]


def test_threshold_tolerates_incidental_overlap(spark):
    docs, bench = _frames(spark)
    got = {
        r["doc_id"]: r
        for r in contamination.contamination_report(
            docs, bench, n=5, max_contaminated_frac=0.5
        ).collect()
    }
    # 2/12 = 0.1667 <= 0.5 -> tolerated under the loose threshold.
    assert not got[1]["is_contaminated"]


def test_decontaminate_drops_and_preserves_schema(spark):
    docs, bench = _frames(spark)
    out = contamination.decontaminate(docs, bench, n=5)
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3]
    assert out.columns == docs.columns


def test_benchmark_side_broadcasts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    report = contamination.contamination_report(docs, bench, n=8)
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan
    # every benchmark member document is flagged against itself
    flagged = set(
        r["doc_id"]
        for r in report.filter(F.col("is_contaminated")).collect()
    )
    members = set(
        r["doc_id"]
        for r in bench.join(
            docs.withColumn(
                "has_grams",
                F.size(contamination._gram_hashes("text", 8)) > 0,
            ).filter("has_grams").select("doc_id"),
            "doc_id",
        ).collect()
    )
    assert members <= flagged


def test_near_contamination_catches_paraphrase(spark):
    """A lightly-edited benchmark copy (word substitutions that break
    every 5-gram) escapes the exact check but is caught at the
    document-fingerprint level."""
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and runs far away today")],
        "q_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # one MIDDLE word changed: every 13-gram spans it, so the
            # exact check sees zero overlap — the fingerprint doesn't
            (10, "the quick brown fox leaps over the lazy dog and runs far away today"),
            (11, "a completely unrelated document about growing tomatoes in cold climates"),
        ],
        "doc_id long, text string",
    )
    exact = contamination.contamination_report(docs, bench, n=13)
    flagged_exact = {r["doc_id"] for r in exact.collect() if r["is_contaminated"]}
    assert flagged_exact == set()  # every 13-gram was perturbed
    near = contamination.near_contamination_report(
        docs, bench, radius=10, bench_id_col="q_id"
    )
    got = {r["doc_id"]: r["bench_id"] for r in near.collect()}
    assert got == {10: 1}
    # derived content ids when the benchmark has no id column
    near2 = contamination.near_contamination_report(
        docs.select("doc_id", "text"), bench.select("text"), radius=10
    )
    assert {r["doc_id"] for r in near2.collect()} == {10}


def test_semantic_contamination_report(spark):
    """Paraphrase tier: a corpus vector nearly parallel to a
    benchmark vector is flagged at high cosine; orthogonal content is
    not; the corpus-side plan has no shuffle (broadcast bench)."""
    import numpy as np

    from v6spark.operators.contamination import semantic_contamination_report

    rng = np.random.default_rng(2)
    bench_vec = rng.normal(0, 1, 64)
    bench_vec /= np.linalg.norm(bench_vec)
    near = bench_vec + rng.normal(0, 0.05, 64)  # paraphrase-close
    ortho = rng.normal(0, 1, 64)
    ortho -= ortho @ bench_vec * bench_vec  # exactly orthogonal
    corpus = spark.createDataFrame(
        [(1, [float(x) for x in near]), (2, [float(x) for x in ortho])],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(100, [float(x) for x in bench_vec])],
        "vec_id long, embedding array<double>",
    )
    rows = semantic_contamination_report(corpus, bench, min_cosine=0.9).collect()
    assert {(r["corpus_id"], r["bench_id"]) for r in rows} == {(1, 100)}
    assert rows[0]["cosine"] > 0.9
    plan = semantic_contamination_report(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "Exchange hashpartitioning" not in plan
