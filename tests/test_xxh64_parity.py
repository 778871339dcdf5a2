"""Pure-Python XXH64 vs Spark's xxhash64 — EXACT parity.

The pubcorpus keys option shard-prunes with operators/xxh64 in a
JVM-free planning worker; a single mismatched bit silently returns
empty point lookups, so parity is pinned per SQL type (the hash is
type-sensitive: int and bigint lanes differ) including the chained
(seed-literal, key) shape the shard layout uses.
"""
from __future__ import annotations

import random

from pyspark.sql import functions as F

from v6spark.operators.xxh64 import shard_of, spark_xxhash64

random.seed(0xC0FFEE)

_LONGS = (
    [0, 1, -1, 42, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    + [random.randint(-2**63, 2**63 - 1) for _ in range(60)]
)
_INTS = (
    [0, 1, -1, 2**31 - 1, -(2**31)]
    + [random.randint(-2**31, 2**31 - 1) for _ in range(60)]
)
_STRS = (
    ["", "a", "doc-42", "it's", "x" * 100, "üñïçødé " * 5,
     "中文 text", "line\nbreak"]
    + ["".join(random.choices("abcdefgh0123-_/", k=random.randint(1, 40)))
       for _ in range(40)]
)


def _check(spark, vals, sql_type, seed_lit):
    df = spark.createDataFrame([(v,) for v in vals], f"k {sql_type}")
    rows = df.select(
        "k",
        F.xxhash64(F.lit(seed_lit), F.col("k")).alias("h2"),
        F.xxhash64(F.col("k")).alias("h1"),
    ).collect()
    for r in rows:
        assert r["h1"] == spark_xxhash64([(r["k"], sql_type)]), (
            sql_type, r["k"]
        )
        assert r["h2"] == spark_xxhash64(
            [(seed_lit, "int"), (r["k"], sql_type)]
        ), (sql_type, r["k"])


def test_bigint_parity(spark):
    _check(spark, _LONGS, "bigint", 0)


def test_int_parity(spark):
    _check(spark, _INTS, "int", 5)


def test_small_integrals_parity(spark):
    _check(spark, [0, 1, -1, 127, -128], "tinyint", 0)
    _check(spark, [0, 1, -1, 32767, -32768], "smallint", 3)


def test_string_parity(spark):
    _check(spark, _STRS, "string", 0)


def test_double_float_parity(spark):
    _check(spark, [0.0, -0.0, 1.5, -3.25, 1e300, 1e-300], "double", 0)
    _check(spark, [0.0, -0.0, 1.5, -3.25], "float", 0)


def test_shard_parity_matches_assign_shards(spark):
    """shard_of == the publish-time assign_shards expression for both
    key types and several (n_shards, seed) combinations."""
    from v6spark.operators.packing import assign_shards

    for sql_type, vals in (("bigint", _LONGS[:30]), ("int", _INTS[:30]),
                           ("string", _STRS[:30])):
        for ns, sd in ((16, 0), (32, 7), (5, 123)):
            df = spark.createDataFrame(
                [(v,) for v in vals], f"k {sql_type}"
            )
            rows = assign_shards(df, "k", ns, seed=sd).select(
                "k", "shard"
            ).collect()
            for r in rows:
                assert r["shard"] == shard_of(r["k"], sql_type, ns, sd), (
                    sql_type, r["k"], ns, sd
                )


def test_null_skips(spark):
    rows = spark.createDataFrame(
        [(None,)], "k string"
    ).select(F.xxhash64(F.lit(1), F.col("k")).alias("h")).collect()
    assert rows[0]["h"] == spark_xxhash64(
        [(1, "int"), (None, "string")]
    )


def test_shards_of_numpy_matches_scalar():
    """The vectorized integer lanes (the SQL writer's row routing)
    agree with the scalar shard_of on every integer type, including
    negatives, int32 wrap edges, and both lit-seed lanes."""
    import numpy as np

    from v6spark.operators.xxh64 import shards_of_numpy

    rng = random.Random(11)
    longs = (
        [rng.randint(-(1 << 63), (1 << 63) - 1) for _ in range(500)]
        + [0, -1, 1, (1 << 63) - 1, -(1 << 63)]
    )
    ints = (
        [rng.randint(-(1 << 31), (1 << 31) - 1) for _ in range(500)]
        + [0, -1, 1, (1 << 31) - 1, -(1 << 31)]
    )
    for seed in (0, 7, (1 << 40)):  # int lit seed AND bigint lit seed
        got = shards_of_numpy(np.array(longs, dtype=np.int64),
                              "bigint", 32, seed=seed)
        assert got.tolist() == [
            shard_of(k, "bigint", 32, seed=seed) for k in longs
        ]
        got_i = shards_of_numpy(np.array(ints, dtype=np.int32),
                                "int", 7, seed=seed)
        assert got_i.tolist() == [
            shard_of(k, "int", 7, seed=seed) for k in ints
        ]
    # object arrays (to_numpy fallback) and NULL rejection
    got_o = shards_of_numpy(longs[:10], "bigint", 4)
    assert got_o.tolist() == [
        shard_of(k, "bigint", 4) for k in longs[:10]
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="NULL key"):
        shards_of_numpy([1, None, 3], "bigint", 4)
    with _pytest.raises(TypeError, match="integer key lanes"):
        shards_of_numpy([1], "string", 4)
