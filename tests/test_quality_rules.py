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
