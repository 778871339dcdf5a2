"""Gopher-style quality gates (operators/text.py::gopher_quality_rules)."""

from __future__ import annotations

from pyspark.sql import functions as F

from v6spark.operators import text
from v6spark.sources.tables import load_table


def _run(spark, rows, **kwargs):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.gopher_quality_rules(df, **kwargs).collect()
    return {r["doc_id"]: r for r in out}


def test_each_rule_fires_on_its_violation(spark):
    good = "the quick brown fox jumps over the lazy dog and runs far away home"
    rows = [
        (1, good),
        (2, "too short"),  # token count
        (3, "internationalization telecommunications incomprehensibilities "
            "antidisestablishmentarianism counterrevolutionaries "
            "electroencephalographically internationalization "
            "telecommunications incomprehensibilities "
            "antidisestablishmentarianism counterrevolutionaries"),  # word len
        (4, "the cat ### sat ## on # the ### mat ## with # a ### hat ## now"),  # symbols
        (5, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"),  # stopwords
    ]
    got = _run(spark, rows)
    assert got[1]["passes_gopher"]
    assert not got[2]["rule_token_count"] and not got[2]["passes_gopher"]
    assert not got[3]["rule_mean_word_len"] and not got[3]["passes_gopher"]
    assert not got[4]["rule_symbol_ratio"] and not got[4]["passes_gopher"]
    assert not got[5]["rule_stopword_evidence"] and not got[5]["passes_gopher"]


def test_rules_are_narrow_and_python_free(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = text.gopher_quality_rules(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
    n = out.count()
    n_pass = out.filter(F.col("passes_gopher")).count()
    assert 0 < n_pass <= n


def test_thresholds_are_tunable(spark):
    rows = [(1, "three little words plus some more here to fill ten")]
    strict = _run(spark, rows, min_tokens=50)
    loose = _run(spark, rows, min_tokens=5)
    assert not strict[1]["rule_token_count"]
    assert loose[1]["rule_token_count"]


def _rep(spark, rows, **kwargs):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.repetition_signals(df, **kwargs).collect()
    return {r["doc_id"]: r for r in out}


def test_repetition_golden_values(spark):
    got = _rep(
        spark,
        [
            (1, "a b a b a b"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "line one here\nline one here\nline two there\nand a fourth line"),
            (4, ""),
        ],
    )
    # doc 1: "a b" occurs 3x, covers 9 of 11 chars; "a b a" 2x -> 10/11;
    # 4-gram overlap coverage exceeds the doc and clamps to 1.0.
    assert got[1]["top_2gram_char_frac"] == 0.818182
    assert got[1]["top_3gram_char_frac"] == 0.909091
    assert got[1]["top_4gram_char_frac"] == 1.0
    # fewer than 5/10 tokens of repetition -> zero dup coverage,
    # and the <10-token doc must NOT read as 1.0 (least() NULL trap).
    assert got[1]["dup_5gram_char_frac"] == 0.0
    assert got[1]["dup_10gram_char_frac"] == 0.0
    # doc 2: no 2-gram repeats -> zero evidence, not
    # len(longest gram)/len(doc).
    assert got[2]["top_2gram_char_frac"] == 0.0
    assert got[2]["dup_line_frac"] == 0.0
    # doc 3: 4 non-empty lines, one duplicated -> 1/4 of lines,
    # 2*13 of 60 chars; "here line" spans the join twice -> 18/60.
    assert got[3]["dup_line_frac"] == 0.25
    assert got[3]["dup_line_char_frac"] == 0.433333
    assert got[3]["top_2gram_char_frac"] == 0.3
    # empty doc: zero everywhere, passes.
    assert got[4]["top_2gram_char_frac"] == 0.0
    assert got[4]["passes_repetition"]


def test_repetition_gate_fires_on_spam(spark):
    got = _rep(
        spark,
        [
            (1, "spam " * 40),
            (2, "the quick brown fox jumps over a lazy dog while birds sing"),
        ],
    )
    assert not got[1]["passes_repetition"]
    assert got[1]["top_2gram_char_frac"] == 1.0
    assert got[2]["passes_repetition"]


def test_repetition_runs_on_corpus_without_python(spark, sf_dir):
    # the CATALYST engine stays available for Python-free deployments
    docs = load_table(spark, sf_dir, "documents")
    out = text.repetition_signals(docs, engine="catalyst")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    n = out.count()
    assert n == docs.count()
    n_pass = out.filter(F.col("passes_repetition")).count()
    assert 0 < n_pass <= n


def test_repetition_engines_agree(spark, sf_dir):
    """The Arrow default and the Catalyst posting path produce
    byte-identical signals over the whole corpus — the regression
    lock that lets the fast engine be the default."""
    docs = load_table(spark, sf_dir, "documents")
    cols = [
        "doc_id", "top_2gram_char_frac", "top_3gram_char_frac",
        "top_4gram_char_frac", "dup_5gram_char_frac",
        "dup_10gram_char_frac", "dup_line_frac", "dup_line_char_frac",
        "passes_repetition",
    ]
    a = sorted(
        map(tuple, text.repetition_signals(docs, engine="arrow")
            .select(*cols).collect())
    )
    b = sorted(
        map(tuple, text.repetition_signals(docs, engine="catalyst")
            .select(*cols).collect())
    )
    assert a == b
