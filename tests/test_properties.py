"""Property-based tests (hypothesis) — SURVEY.md §5.2 item 3.

Algebraic laws that hold for ANY input: filter partitioning,
accounting conservation, dedup reconstruction, salted == direct
aggregation, minhash similarity bounds.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from v6spark.operators.dedup import dedup_exact
from v6spark.operators.filters import accounting_df
from v6spark.operators.skew import salted_agg, salted_broadcast_left

SETTINGS = dict(
    max_examples=8,  # each example spins Spark jobs — keep the corpus small
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.floats(
            min_value=-1000, max_value=1000, allow_nan=False, width=32
        ),  # value
    ),
    min_size=1,
    max_size=50,
)


@given(rows=rows_strategy, threshold=st.floats(min_value=-500, max_value=500))
@settings(**SETTINGS)
def test_filter_partition_law(spark, rows, threshold):
    """filter(p) and filter(not p) partition the input exactly."""
    df = spark.createDataFrame(rows, "k int, v float")
    pred = F.col("v") >= threshold
    n_kept = df.filter(pred).count()
    n_dropped = df.filter(~pred).count()
    assert n_kept + n_dropped == len(rows)
    acc = accounting_df(df, pred).collect()[0]
    assert (acc["n_kept"], acc["n_filtered_out"]) == (n_kept, n_dropped)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_salted_agg_equals_direct(spark, rows):
    """Salting must not change aggregate results (any data)."""
    df = spark.createDataFrame(rows, "k int, v double")
    direct = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("v").cast("decimal(18,6)")).cast("double"), 6).alias("s"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["sum_value"])
        for r in salted_agg(df, ["k"], "v", n_salts=4).collect()
    }
    assert salted == direct


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=20
    )
)
@settings(**SETTINGS)
def test_dedup_reconstruction(spark, texts):
    """Sum of dup_counts == row count; keepers are minimal ids; every
    distinct key appears exactly once."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_exact(df, F.col("text"), "doc_id").collect()
    assert sum(r["dup_count"] for r in out) == len(rows)
    assert len(out) == len(set(texts))
    for r in out:
        expect_keeper = min(i for i, t in rows if t == r["dedup_key"])
        assert r["keeper_id"] == expect_keeper


def test_salted_broadcast_left_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(k, i) for i in range(50) for k in ([1] * 3 + [2])], "k int, i int"
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, tag string")
    plain = left.join(right, "k").groupBy("k", "tag").count().collect()
    salted = (
        salted_broadcast_left(left, right, "k", n_salts=4)
        .groupBy("k", "tag")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
