"""Unit tests: filter operators (D1-D9 accounting contract) and
row-wise transforms (B3-B6), including the edge cases the oracle hash
can blur (NULL handling, boundary inclusivity)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from v6spark.operators import transforms
from v6spark.operators.filters import (
    FilterResult,
    accounting_df,
    exactly_k_groups,
    filter_by_group_rate,
    filter_in_ranges,
    filter_rows,
    variable_groups,
)


@pytest.fixture(scope="module")
def nums(spark):
    return spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id int, v double"
    )


def test_filter_rows_accounting(nums):
    res = filter_rows(nums, F.col("v") >= 5.0)
    assert isinstance(res, FilterResult)
    assert (res.n_kept, res.n_filtered_out, res.n_total) == (5, 5, 10)
    assert res.df.count() == 5


def test_accounting_partition_invariant(nums):
    # n_kept + n_filtered_out == n for ANY predicate (reference D9 law)
    for pred in [F.col("v") < 0, F.col("v") >= 0, F.col("id") % 3 == 0]:
        row = accounting_df(nums, pred).collect()[0]
        assert row["n_kept"] + row["n_filtered_out"] == 10


def test_filter_by_group_rate_bounds(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 0), ("b", 0), ("b", 0), ("c", 1)],
        "k string, hit int",
    )
    out = filter_by_group_rate(df, "k", F.col("hit") == 1, min_rate=0.5, max_rate=0.9)
    assert {r["k"]: r["rate"] for r in out.collect()} == {"a": pytest.approx(2 / 3, abs=1e-6)}


def test_filter_by_group_rate_histogram_contract(spark):
    """calc_histogram=True -> FilterResult with FLT_STATS histogram of
    the PRE-FILTER rate distribution (D1 reference signature)."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 0), ("b", 0), ("b", 0), ("c", 1)],
        "k string, hit int",
    )
    res = filter_by_group_rate(
        df, "k", F.col("hit") == 1, min_rate=0.5, max_rate=0.9,
        calc_histogram=True, n_bins=4,
    )
    assert isinstance(res, FilterResult)
    assert res.n_kept == 1 and res.n_filtered_out == 2  # groups, not rows
    # rates: a=0.667 -> bin 2, b=0.0 -> bin 0, c=1.0 -> closed last bin 3
    hist = {r["bucket"]: r["n"] for r in res.stats.collect()}
    assert hist == {0: 1, 2: 1, 3: 1}


def test_range_join_boundaries(spark):
    df = spark.createDataFrame(
        [(1, datetime.date(2020, 1, 1)), (2, datetime.date(2020, 6, 1)),
         (3, datetime.date(2020, 12, 31)), (4, datetime.date(2021, 1, 1))],
        "id int, d date",
    )
    ranges = spark.createDataFrame(
        [("y2020", datetime.date(2020, 1, 1), datetime.date(2021, 1, 1))],
        "range_name string, lo date, hi date",
    )
    got = sorted(r["id"] for r in filter_in_ranges(df, ranges, "d").collect())
    assert got == [1, 2, 3]  # lo inclusive, hi exclusive


def test_variable_and_exactly_k(spark):
    df = spark.createDataFrame(
        [("g1", "x"), ("g1", "y"), ("g2", "x"), ("g3", "x"), ("g3", "y"), ("g3", "z")],
        "k string, cat string",
    )
    assert {r["k"] for r in variable_groups(df, "k", "cat").collect()} == {"g1", "g3"}
    assert {r["k"] for r in exactly_k_groups(df, "k", "cat", 2).collect()} == {"g1"}


def test_mask_low_null_passthrough(spark):
    df = spark.createDataFrame([(1, 0.05), (2, 0.5), (3, None)], "id int, v double")
    got = {r["id"]: r["v"] for r in transforms.mask_low(df, "v", 0.1).collect()}
    assert got == {1: None, 2: 0.5, 3: None}


def test_recode_unknown_is_null(spark):
    df = spark.createDataFrame([("A",), ("N",), ("Z",)], "f string")
    got = [r["code"] for r in transforms.recode(df, "f", {"A": 0, "N": 1}, "code").collect()]
    assert got == [0, 1, None]


def test_subset_entities_reverse(spark):
    df = spark.createDataFrame([(i,) for i in range(5)], "id int")
    keep = {r["id"] for r in transforms.subset_entities(df, "id", [1, 3]).collect()}
    drop = {r["id"] for r in transforms.subset_entities(df, "id", [1, 3], reverse=True).collect()}
    assert keep == {1, 3} and drop == {0, 2, 4}


def test_subset_entities_df_semi_anti(spark):
    df = spark.createDataFrame([(i,) for i in range(5)], "id int")
    keep_df = spark.createDataFrame([(1,), (3,), (99,)], "id int")
    semi = {r["id"] for r in transforms.subset_entities_df(df, "id", keep_df).collect()}
    anti = {r["id"] for r in transforms.subset_entities_df(df, "id", keep_df, reverse=True).collect()}
    assert semi == {1, 3} and anti == {0, 2, 4}


def test_profile_one_pass(spark, sf_dir):
    from v6spark.operators.profile import profile
    from v6spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    prof = {r["column"]: r for r in profile(ev).collect()}
    n = ev.count()
    assert prof["event_id"]["n_rows"] == n
    assert prof["event_id"]["n_nulls"] == 0
    assert prof["event_id"]["null_rate"] == 0.0
    # HLL estimate within 5% of the exact distinct count
    exact = ev.select("user_id").distinct().count()
    assert abs(prof["user_id"]["approx_distinct"] - exact) <= max(1, exact * 0.05)
    assert prof["event_type"]["min_repr"] == "click"
    assert prof["event_type"]["max_repr"] == "view"


def test_profile_nulls_and_complex_types(spark):
    from v6spark.operators.profile import profile

    df = spark.createDataFrame(
        [(1, None, [1.0]), (2, "x", None), (3, None, [2.0])],
        "id int, s string, arr array<double>",
    )
    prof = {r["column"]: r for r in profile(df).collect()}
    assert prof["s"]["n_nulls"] == 2 and prof["s"]["null_rate"] == pytest.approx(2 / 3, abs=1e-6)
    assert prof["arr"]["min_repr"] is None  # complex types: no min/max
    assert prof["id"]["min_repr"] == "1" and prof["id"]["max_repr"] == "3"


def test_profile_dotted_and_duplicate_columns(spark):
    from v6spark.operators.profile import profile

    df = spark.createDataFrame([(1, "a"), (2, None)], ["user.id", "v"])
    rows = profile(df).collect()
    assert {r["column"] for r in rows} == {"user.id", "v"}
    dotted = [r for r in rows if r["column"] == "user.id"][0]
    assert dotted["n_nulls"] == 0 and dotted["max_repr"] == "2"
    # duplicate names after a join: two distinct rows with own stats
    a = spark.createDataFrame([(1,)], ["id"])
    b = spark.createDataFrame([(1, None), (1, 5)], ["k", "id"])
    joined = a.join(b, a.id == b.k).select(a["id"], b["id"])
    rows2 = profile(joined).collect()
    assert len(rows2) == 2
    assert sorted(r["n_nulls"] for r in rows2) == [0, 1]


def test_spread_small_input_memoized(spark):
    """Re-spreading a frame spread_small_input already returned is a
    zero-cost no-op (same object back, no re-probe): the normal shape
    when a query fn and the operator it calls both defensively spread
    the same input — the ``df.rdd`` partition-count probe is a full
    plan analysis, ~0.2 s cold per call."""
    from v6spark.operators.transforms import _SPREAD_DONE, spread_small_input

    df = spark.range(10).toDF("x")
    out = spread_small_input(df, min_partitions=8)
    assert out in _SPREAD_DONE
    assert spread_small_input(out, min_partitions=8) is out
    # a LARGER floor than the memoized one must re-probe, not skip
    wider = spread_small_input(out, min_partitions=64)
    assert wider is not out
    assert wider.rdd.getNumPartitions() == 64
    # a no-op probe (input already wide enough) is memoized too
    again = spread_small_input(wider, min_partitions=8)
    assert again is wider
