"""Golden-value unit tests for the stats operators (SURVEY.md §5.1
pattern 1: tiny hand-computable fixtures, mirroring the reference's
numpy.testing golden tests)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from v6spark.operators import stats


@pytest.fixture(scope="module")
def calls(spark):
    # long-format calls analog: (variant, sample, gt, dp)
    rows = [
        ("v1", "s1", 0, 10.0),
        ("v1", "s2", 1, 20.0),
        ("v1", "s3", None, 30.0),
        ("v1", "s4", 1, 40.0),
        ("v2", "s1", 0, 5.0),
        ("v2", "s2", 0, 5.0),
    ]
    return spark.createDataFrame(rows, "variant string, sample string, gt int, dp double")


def as_map(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


def test_rate_of_missing(calls):
    out = as_map(
        stats.rate_of(calls, ["variant"], F.col("gt").isNull(), "miss"),
        "variant",
        "miss",
    )
    assert out == {"v1": 0.25, "v2": 0.0}


def test_category_counts(calls):
    out = stats.category_counts(calls.filter("gt is not null"), ["variant", "gt"])
    got = {(r["variant"], r["gt"]): r["n"] for r in out.collect()}
    assert got == {("v1", 0): 1, ("v1", 1): 2, ("v2", 0): 2}


def test_category_shares(calls):
    out = stats.category_shares(
        calls.filter("gt is not null"), "variant", "gt"
    ).collect()
    got = {(r["variant"], r["gt"]): r["share"] for r in out}
    assert got[("v1", 0)] == pytest.approx(1 / 3, abs=1e-6)
    assert got[("v1", 1)] == pytest.approx(2 / 3, abs=1e-6)
    assert got[("v2", 0)] == 1.0


def test_major_and_minor(calls):
    called = calls.filter("gt is not null")
    maf = as_map(stats.major_category_freq(called, "variant", "gt"), "variant", "maf")
    assert maf["v1"] == pytest.approx(2 / 3, abs=1e-6)
    assert maf["v2"] == 1.0
    mac = as_map(stats.minor_category_count(called, "variant", "gt"), "variant", "mac")
    assert mac == {"v1": 1, "v2": 0}


def test_expected_het_unbiased(calls):
    # v1 called: counts (1,2) -> n=3, p=(1/3,2/3); 1-sum(p^2)=4/9; *3/2=2/3
    out = as_map(
        stats.expected_het_unbiased(calls.filter("gt is not null"), "variant", "gt"),
        "variant",
        "exp_het",
    )
    assert out["v1"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["v2"] == 0.0


def test_measure_stats(spark):
    df = spark.createDataFrame(
        [("k", 1.0), ("k", 2.0), ("k", 3.0)], "key string, l_quantity double"
    )
    row = stats.measure_stats(df, ["key"], "l_quantity").collect()[0]
    assert row["avg_quantity"] == 2.0
    assert row["min_quantity"] == 1.0
    assert row["max_quantity"] == 3.0
    assert row["std_quantity"] == pytest.approx(1.0, abs=1e-6)


def test_histogram_edges(spark):
    df = spark.createDataFrame(
        [(x,) for x in [-0.5, 0.0, 9.99, 10.0, 99.99, 100.0, 150.0]], "v double"
    )
    got = {r["bucket"]: r["n"] for r in stats.histogram(df, "v", 0.0, 100.0, 10).collect()}
    # -0.5, 100.0, 150.0 excluded; 0.0 and 9.99 -> bucket 0; 10.0 -> 1; 99.99 -> 9
    assert got == {0: 2, 1: 1, 9: 1}
