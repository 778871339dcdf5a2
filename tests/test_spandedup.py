"""Substring-level dedup (operators/spandedup.py): corpus-hot span
detection + removal with planted boilerplate and exact expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from v6spark.operators.spandedup import hot_grams, hot_spans, remove_hot_spans

BOILER = "this site uses cookies to improve your experience please accept"
N = 4
MIN_DOCS = 3


def _corpus(spark):
    # every non-boilerplate token is per-doc unique, so the ONLY
    # cross-document n-grams are the planted boilerplate windows
    rows = []
    for i in range(5):
        rows.append(
            (i, f"open{i}a open{i}b open{i}c "
                f"{BOILER} "
                f"close{i}a close{i}b close{i}c")
        )
    for i in range(5, 10):
        rows.append(
            (i, f"solo{i}a solo{i}b solo{i}c solo{i}d solo{i}e "
                f"solo{i}f solo{i}g solo{i}h")
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_grams_find_only_boilerplate(spark):
    docs = _corpus(spark)
    hot = hot_grams(docs, n=N, min_docs=MIN_DOCS)
    n_hot = hot.count()
    boiler_grams = len(BOILER.split()) - N + 1
    # every boilerplate window is hot; the unique docs contribute none
    assert n_hot == boiler_grams


def test_hot_spans_cover_exactly_the_boilerplate(spark):
    docs = _corpus(spark)
    spans = hot_spans(docs, n=N, min_docs=MIN_DOCS)
    rows = spans.collect()
    # only the 5 boilerplate docs are flagged, one merged span each
    assert sorted({r["doc_id"] for r in rows}) == [0, 1, 2, 3, 4]
    assert len(rows) == 5
    b_len = len(BOILER.split())
    for r in rows:
        # boilerplate starts after the 3 unique opening tokens
        assert r["span_start"] == 3
        assert r["span_end"] == 3 + b_len


def test_remove_hot_spans_exact_rewrite(spark):
    docs = _corpus(spark)
    out = {r["doc_id"]: r for r in remove_hot_spans(docs, n=N, min_docs=MIN_DOCS).collect()}
    b_len = len(BOILER.split())
    for i in range(5):
        assert out[i]["n_tokens_removed"] == b_len
        expected = (
            f"open{i}a open{i}b open{i}c "
            f"close{i}a close{i}b close{i}c"
        )
        assert out[i]["text"] == expected
    # untouched docs keep their ORIGINAL text byte-for-byte
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    for i in range(5, 10):
        assert out[i]["n_tokens_removed"] == 0
        assert out[i]["text"] == originals[i]


def test_adjacent_hot_regions_merge_into_one_span(spark):
    """Two boilerplate blocks back to back merge into one maximal
    span (the interval fold), not a span per n-gram."""
    block = "alpha beta gamma delta epsilon zeta"
    rows = [(i, f"head{i}x {block} {block} tail{i}x") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = hot_spans(docs, n=3, min_docs=3).collect()
    assert len(spans) == 4  # one merged span per doc
    b = len(block.split())
    for r in spans:
        assert (r["span_start"], r["span_end"]) == (1, 1 + 2 * b)


def test_single_spammy_doc_cannot_promote_boilerplate(spark):
    """Distinct-doc voting: one document repeating itself does not
    create corpus-hot grams (that is repetition_signals' job)."""
    spam = " ".join(["buy cheap pills now"] * 10)
    rows = [(0, spam)] + [
        (i, f"regular document number{i} about interesting subject{i}")
        for i in range(1, 5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert hot_grams(docs, n=4, min_docs=3).count() == 0
    out = remove_hot_spans(docs, n=4, min_docs=3)
    assert out.filter(F.col("n_tokens_removed") > 0).count() == 0


def test_short_documents_pass_through(spark):
    docs = spark.createDataFrame(
        [(0, "tiny"), (1, "two words"), (2, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_hot_spans(docs, n=4, min_docs=2).collect()}
    assert out[0]["text"] == "tiny"
    assert out[1]["text"] == "two words"
    assert out[2]["text"] == ""
    assert all(out[i]["n_tokens_removed"] == 0 for i in range(3))


def test_plan_is_pure_catalyst(spark):
    """No Python eval nodes anywhere in the span-dedup path — the
    whole pipeline (shingle hashing, hot voting, interval fold,
    rewrite) stays JVM-side."""
    docs = _corpus(spark)
    plan = (
        remove_hot_spans(docs, n=N, min_docs=MIN_DOCS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_pipeline_span_dedup_stage(spark):
    """prepare_training_corpus(span_dedup=True): boilerplate is
    stripped before quality/dedup, so docs that differ ONLY in their
    boilerplate-free content all survive document dedup, and their
    token budgets exclude the stripped spans."""
    from v6spark.pipeline import prepare_training_corpus

    rows = []
    for i in range(8):
        rows.append(
            (i, f"open{i}a open{i}b open{i}c open{i}d open{i}e "
                f"{BOILER} "
                f"close{i}a close{i}b close{i}c close{i}d close{i}e")
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_training_corpus(
        docs, max_tokens=64, span_dedup=True, span_n=N,
        span_min_docs=MIN_DOCS,
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert sorted(got) == list(range(8))  # nothing lost to dedup
    # token budgets reflect the cleaned text: 10 unique tokens/doc
    assert all(got[i]["n_tokens"] == 10 for i in got)


def test_fully_covered_document_rewrites_to_empty(spark):
    """A document that is 100% boilerplate (the worst offender) must
    be emptied, not silently passed through (regression: the inner
    join dropped docs with zero surviving tokens)."""
    rows = [(i, BOILER) for i in range(4)]  # pure boilerplate docs
    rows += [(10 + i, f"real{i}a real{i}b real{i}c real{i}d real{i}e") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_hot_spans(docs, n=N, min_docs=3).collect()}
    b_len = len(BOILER.split())
    for i in range(4):
        assert out[i]["text"] == ""
        assert out[i]["n_tokens_removed"] == b_len
    for i in range(3):
        assert out[10 + i]["n_tokens_removed"] == 0


def test_rewrite_preserves_original_case(spark):
    """Detection is case-insensitive (tokens_col lowercases) but the
    rewrite keeps the surviving tokens' ORIGINAL case (regression:
    flagged docs came back fully lowercased)."""
    rows = [
        (i, f"Keep{i}A MiXeD{i} {BOILER} Tail{i}B") for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_hot_spans(docs, n=N, min_docs=3).collect()}
    for i in range(4):
        assert out[i]["text"] == f"Keep{i}A MiXeD{i} Tail{i}B"


def test_case_insensitive_detection_across_docs(spark):
    """Boilerplate differing only in CASE across documents still
    votes as one gram (lowercased detection)."""
    cases = [BOILER, BOILER.upper(), BOILER.title(), BOILER]
    rows = [(i, f"pre{i}x {cases[i]} post{i}y") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = hot_spans(docs, n=N, min_docs=4).collect()
    assert len(spans) == 4  # all four flagged despite case variance
