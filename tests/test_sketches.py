"""Mergeable sketches (operators/sketches.py): error bounds vs exact
answers, and the EXACT-merge property each sketch's register algebra
guarantees — merge(sketch(A), sketch(B)) == sketch(A ∪ B) to the
last register row, the invariant that makes persisted partial
sketches trustworthy."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from v6spark.operators import sketches as sk


def _frames_equal(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.fixture(scope="module")
def users(spark):
    # 100k distinct string keys, skewed repetition via modulus
    return spark.range(300_000).select(
        F.concat(F.lit("user-"), (F.col("id") % 100_000)).alias("u"),
        (F.col("id") % 4).alias("grp"),
    )


# ------------------------------------------------------------------ HLL


def test_hll_accuracy_within_published_bound(spark, users):
    est = sk.hll_estimate(sk.hll_sketch(users, "u")).collect()[0][
        "approx_distinct"
    ]
    # 1.04/sqrt(4096) = 1.6% rsd; allow 4 sigma
    assert abs(est - 100_000) / 100_000 < 4 * 1.04 / math.sqrt(4096)


def test_hll_grouped_estimates(spark, users):
    rows = {
        r["grp"]: r["approx_distinct"]
        for r in sk.hll_estimate(
            sk.hll_sketch(users, "u", ["grp"]), ["grp"]
        ).collect()
    }
    # each grp holds 25k distinct users (id % 4 aligns with % 100k)
    assert set(rows) == {0, 1, 2, 3}
    for grp, est in rows.items():
        assert abs(est - 25_000) / 25_000 < 0.1, (grp, est)


def test_hll_small_range_linear_counting(spark):
    # far below 2.5m: the linear-counting branch must be near-exact
    small = spark.range(200).select(F.concat(F.lit("k"), "id").alias("u"))
    est = sk.hll_estimate(sk.hll_sketch(small, "u")).collect()[0][
        "approx_distinct"
    ]
    assert abs(est - 200) <= 4


def test_hll_merge_equals_union_sketch(spark):
    a = spark.range(0, 6000).select(F.concat(F.lit("u"), "id").alias("u"))
    b = spark.range(3000, 9000).select(F.concat(F.lit("u"), "id").alias("u"))
    merged = sk.hll_merge(sk.hll_sketch(a, "u").union(sk.hll_sketch(b, "u")))
    assert _frames_equal(merged, sk.hll_sketch(a.union(b), "u"))


def test_hll_merge_idempotent_on_replay(spark):
    a = spark.range(5000).select(F.concat(F.lit("u"), "id").alias("u"))
    s = sk.hll_sketch(a, "u")
    assert _frames_equal(sk.hll_merge(s.union(s)), sk.hll_merge(s))


# ------------------------------------------------------------- DDSketch


@pytest.fixture(scope="module")
def lognormal(spark):
    vals = np.random.default_rng(7).lognormal(3.0, 1.5, 20_000)
    return (
        spark.createDataFrame([(float(v),) for v in vals], "x double"),
        np.sort(vals),
    )


def test_dds_relative_error_guarantee(spark, lognormal):
    df, exact = lognormal
    alpha = 0.01
    s = sk.dds_sketch(df, "x", alpha=alpha)
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    got = {r["q"]: r["value"] for r in sk.dds_quantiles(s, qs, alpha=alpha).collect()}
    n = len(exact)
    for q in qs:
        true = exact[int(math.floor(q * (n - 1)))]
        assert abs(got[q] - true) / true <= alpha * 1.001, (q, got[q], true)


def test_dds_merge_equals_union_sketch(spark, lognormal):
    df, _ = lognormal
    a, b = df.where("x < 20"), df.where("x >= 20")  # deterministic split
    merged = sk.dds_merge(
        sk.dds_sketch(a, "x").union(sk.dds_sketch(b, "x"))
    )
    assert _frames_equal(merged, sk.dds_sketch(df, "x"))


def test_dds_zero_and_negative_values(spark):
    df = spark.createDataFrame(
        [(-100.0,), (-1.0,), (0.0,), (0.0,), (1.0,), (100.0,)], "x double"
    )
    s = sk.dds_sketch(df, "x", alpha=0.01)
    # sign partitioning: zeros in their own bin, negatives ordered
    assert s.where("sign = 0").agg(F.sum("cnt")).collect()[0][0] == 2
    got = {
        r["q"]: r["value"]
        for r in sk.dds_quantiles(s, [0.0, 0.5, 1.0], alpha=0.01).collect()
    }
    assert got[0.0] < 0 and abs(got[0.0] + 100.0) / 100.0 <= 0.011
    assert got[0.5] == 0.0
    assert abs(got[1.0] - 100.0) / 100.0 <= 0.011


# ------------------------------------------------------------ Count-Min


def test_cm_never_undercounts_and_bounds_overshoot(spark):
    # zipf-ish: item i appears ~ 3000/i times
    rows = [(f"it{i}",) for i in range(1, 60) for _ in range(3000 // i)]
    df = spark.createDataFrame(rows, "k string")
    true = {}
    for (k,) in rows:
        true[k] = true.get(k, 0) + 1
    n = len(rows)
    width = 2048
    s = sk.cm_sketch(df, "k", width=width)
    items = spark.createDataFrame([(k,) for k in true], "k string")
    est = {
        r["k"]: r["approx_count"]
        for r in sk.cm_estimate(s, items, "k", width=width).collect()
    }
    eps = math.e / width
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)  # one-sided: never under
        assert est[k] <= t + 2 * eps * n, (k, est[k], t)


def test_cm_unseen_item_reads_zero_or_collision_bounded(spark):
    df = spark.createDataFrame([("a",)] * 10, "k string")
    s = sk.cm_sketch(df, "k")
    items = df.sparkSession.createDataFrame([("never-seen",)], "k string")
    est = sk.cm_estimate(s, items, "k").collect()[0]["approx_count"]
    assert est in (0, 10)  # 0 unless all 4 hashes collide (p ~ (1/2048)^4)
    assert est == 0


def test_cm_merge_equals_union_sketch(spark):
    a = spark.createDataFrame([("a",), ("b",), ("a",)], "k string")
    b = spark.createDataFrame([("b",), ("c",)], "k string")
    merged = sk.cm_merge(sk.cm_sketch(a, "k").union(sk.cm_sketch(b, "k")))
    assert _frames_equal(merged, sk.cm_sketch(a.union(b), "k"))


def test_cm_weighted(spark):
    df = spark.createDataFrame([("a", 5), ("a", 7), ("b", 1)], "k string, w int")
    s = sk.cm_sketch(df, "k", weight=F.col("w"))
    items = spark.createDataFrame([("a",), ("b",)], "k string")
    est = {
        r["k"]: r["approx_count"] for r in sk.cm_estimate(s, items, "k").collect()
    }
    assert est["a"] == 12 and est["b"] == 1


# ------------------------------------------------------------ plan shape


def test_hll_sketch_plan_is_jvm_only_single_shuffle(spark, users):
    plan = sk.hll_sketch(users, "u")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    assert plan.count("Exchange") == 1  # one agg shuffle, nothing else
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
        assert marker not in plan


# ------------------------------------------------------ HLL set ops


def test_hll_union_and_intersect_estimates(spark):
    a = spark.range(0, 40_000).select(F.concat(F.lit("u"), "id").alias("u"))
    b = spark.range(30_000, 80_000).select(F.concat(F.lit("u"), "id").alias("u"))
    sa, sb = sk.hll_sketch(a, "u"), sk.hll_sketch(b, "u")
    union = sk.hll_union_estimate(sa, sb).collect()[0]["approx_distinct_union"]
    assert abs(union - 80_000) / 80_000 < 0.07
    row = sk.hll_intersect_estimate(sa, sb).collect()[0]
    # |A ∩ B| = 10k against an 80k union: error is relative to the
    # union (documented caveat), so allow 3 x 1.6% x 80k absolute
    assert abs(row["approx_intersect"] - 10_000) <= 3 * 0.016 * 80_000
    assert abs(row["approx_a"] - 40_000) / 40_000 < 0.07
