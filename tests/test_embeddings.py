"""Embedding hygiene operators (operators/embeddings.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from v6spark.functions.arrays import cosine_similarity
from v6spark.operators import embeddings
from v6spark.sources.tables import load_table

DIM = 64  # embeddings.parquet vector length (TESTDATA)


def _emb(spark, sf_dir, n=30):
    return load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < n)


def test_l2_normalize_unit_norm(spark, sf_dir):
    rows = (
        _emb(spark, sf_dir)
        .select(embeddings.l2_normalize("embedding").alias("u"))
        .collect()
    )
    assert rows
    for r in rows:
        norm = math.sqrt(sum(x * x for x in r["u"]))
        assert abs(norm - 1.0) < 1e-9


def test_l2_normalize_zero_vector_passthrough(spark):
    df = spark.createDataFrame([([0.0] * 4,)], "embedding array<double>")
    out = df.select(embeddings.l2_normalize("embedding").alias("u")).collect()[0]
    assert out["u"] == [0.0] * 4


def test_quantize_roundtrip_error_bounded(spark, sf_dir):
    rows = (
        _emb(spark, sf_dir)
        .select(
            "embedding",
            embeddings.quantize_int8("embedding").alias("qz"),
        )
        .select(
            "embedding",
            F.col("qz.scale").alias("scale"),
            embeddings.dequantize_int8("qz").alias("back"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        bound = r["scale"] / 2 + 1e-12
        for orig, back in zip(r["embedding"], r["back"]):
            assert abs(float(orig) - back) <= bound


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([([0.0] * 4,)], "embedding array<double>")
    r = df.select(
        embeddings.quantize_int8("embedding").alias("qz")
    ).select(
        F.col("qz.scale").alias("s"), embeddings.dequantize_int8("qz").alias("b")
    ).collect()[0]
    assert r["s"] == 0.0
    assert r["b"] == [0.0] * 4


def test_quantized_cosine_close_to_exact(spark, sf_dir):
    base = _emb(spark, sf_dir, n=12).select(
        "vec_id", embeddings.dequantize_int8(
            embeddings.quantize_int8("embedding")
        ).alias("deq"), "embedding"
    )
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        cosine_similarity(F.col("a.embedding"), F.col("b.embedding")).alias("exact"),
        cosine_similarity(F.col("a.deq"), F.col("b.deq")).alias("approx"),
    )
    rows = pairs.collect()
    assert rows
    worst = max(abs(r["exact"] - r["approx"]) for r in rows)
    assert worst < 0.02  # int8 with per-vector scale: ~1e-3 typical


def test_random_project_shape_and_determinism(spark, sf_dir):
    proj = embeddings.random_project("embedding", out_dim=16, in_dim=DIM)
    a = _emb(spark, sf_dir).select("vec_id", proj.alias("p")).collect()
    b = _emb(spark, sf_dir).select("vec_id", proj.alias("p")).collect()
    assert all(len(r["p"]) == 16 for r in a)
    assert sorted(map(tuple, ((r["vec_id"], tuple(r["p"])) for r in a))) == sorted(
        map(tuple, ((r["vec_id"], tuple(r["p"])) for r in b))
    )


def test_random_project_preserves_similarity_roughly(spark, sf_dir):
    base = _emb(spark, sf_dir, n=20).select(
        "vec_id",
        "embedding",
        embeddings.random_project("embedding", out_dim=32, in_dim=DIM).alias("p"),
    )
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        cosine_similarity(F.col("a.embedding"), F.col("b.embedding")).alias("exact"),
        cosine_similarity(F.col("a.p"), F.col("b.p")).alias("approx"),
    )
    rows = pairs.collect()
    assert rows
    mean_err = sum(abs(r["exact"] - r["approx"]) for r in rows) / len(rows)
    # JL at 32 dims: coarse but correlated; mean error stays moderate.
    assert mean_err < 0.25


def test_random_project_rejects_bad_dims(spark, sf_dir):
    for od, idim in ((0, DIM), (8, 0)):
        try:
            embeddings.random_project("embedding", od, idim)
        except ValueError:
            continue
        raise AssertionError("bad dims should be rejected")
