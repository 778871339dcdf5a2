"""Tests: IVF ANN self-consistency and the stateful streaming operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from v6spark.operators.similarity import (
    ann_ivf_topk,
    cosine_topk_query,
    deterministic_centroids,
    ivf_assign_cells,
)
from v6spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)


def test_ivf_cells_partition_dataset(spark, emb):
    cents = deterministic_centroids(emb, n_cells=8)
    assigned = ivf_assign_cells(emb, cents)
    assert assigned.count() == emb.count()  # total preserved
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8)) and len(cells) > 1


def test_ivf_query_matches_bruteforce_on_probed_cells(spark, emb):
    cents = deterministic_centroids(emb, n_cells=8)
    query = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    got = ann_ivf_topk(emb, query, cents, k=5, n_probe=3).collect()
    # self-consistency: identical to exact top-k restricted to probed cells
    assigned = ivf_assign_cells(emb, cents)
    probed_cells = {r["cell"] for r in assigned.join(
        ann_ivf_topk(emb, query, cents, k=200, n_probe=3).select("vec_id"),
        "vec_id", "left_semi").select("cell").distinct().collect()}
    restricted = assigned.filter(F.col("cell").isin(list(probed_cells)))
    want = cosine_topk_query(restricted, query, k=5).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in want
    ]
    # the query vector is in the dataset -> must find itself at cosine 1
    assert got[0]["cosine"] == 1.0


def test_ivf_probe_all_equals_bruteforce(spark, emb):
    cents = deterministic_centroids(emb, n_cells=4)
    query = [float(x) for x in emb.orderBy(F.col("vec_id").desc()).limit(1).collect()[0]["embedding"]]
    full = cosine_topk_query(emb, query, k=10).collect()
    ivf_all = ann_ivf_topk(emb, query, cents, k=10, n_probe=4).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in ivf_all]


def test_stateful_session_counts_single_batch(spark, sf_dir, tmp_path_factory):
    """One micro-batch over the whole corpus: the stateful operator's
    final counts must equal the batch gaps-and-islands operator."""
    from v6spark.operators.sessionize import session_counts
    from v6spark.streaming.stateful import stateful_session_counts

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts_ns", "event_id")
    out_dir = str(tmp_path_factory.mktemp("stateful_src"))
    ev.coalesce(1).write.mode("overwrite").parquet(out_dir)  # one file -> one batch

    stream = (
        spark.readStream.schema("user_id long, ts_ns long, event_id long")
        .parquet(out_dir)
    )
    q = (
        stateful_session_counts(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: r["n_sessions"]
        for r in spark.sql("SELECT * FROM t_stateful").collect()
    }
    want = {
        r["user_id"]: r["n_sessions"]
        for r in session_counts(load_table(spark, sf_dir, "events")).collect()
    }
    assert got == want


def test_kmeans_improves_quantization(spark, emb):
    from pyspark.sql import functions as F
    from v6spark.operators.similarity import kmeans_centroids

    def total_distortion(centroids):
        assigned = ivf_assign_cells(emb, centroids)
        # distance to the assigned centroid, summed — recompute via the
        # same argmin struct to keep it cheap
        cells = []
        for idx, c in enumerate(centroids):
            cvec = F.array(*[F.lit(float(x)) for x in c])
            dist = F.aggregate(
                F.zip_with(F.col("embedding"), cvec,
                           lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
                F.lit(0.0), lambda acc, x: acc + x)
            cells.append(F.struct(dist.alias("dist"), F.lit(idx).alias("cell")))
        best = F.array_min(F.array(*cells))
        return assigned.select(best["dist"].alias("d")).agg(F.sum("d")).collect()[0][0]

    seeds = deterministic_centroids(emb, n_cells=8)
    trained = kmeans_centroids(emb, n_cells=8, n_iters=3)
    assert total_distortion(trained) < total_distortion(seeds)
    # determinism: same inputs -> identical centroids
    again = kmeans_centroids(emb, n_cells=8, n_iters=3)
    assert trained == again


def test_kmeans_parallel_init_beats_lowest_id(spark, emb):
    """Deterministic k-means||: better (or equal) starting distortion
    than lowest-id seeding with the same downstream Lloyd, and
    repartition-invariant (the sampling coin is a seeded id hash, not
    partition-dependent RNG)."""
    from pyspark.sql import functions as F
    from v6spark.operators.similarity import (
        kmeans_centroids,
        kmeans_parallel_init,
    )

    def total_distortion(centroids):
        assigned = ivf_assign_cells(emb, centroids)
        cells = []
        for idx, c in enumerate(centroids):
            cvec = F.array(*[F.lit(float(x)) for x in c])
            dist = F.aggregate(
                F.zip_with(F.col("embedding"), cvec,
                           lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
                F.lit(0.0), lambda acc, x: acc + x)
            cells.append(F.struct(dist.alias("dist"), F.lit(idx).alias("cell")))
        best = F.array_min(F.array(*cells))
        return assigned.select(best["dist"].alias("d")).agg(F.sum("d")).collect()[0][0]

    par = kmeans_parallel_init(emb, n_cells=8)
    assert len(par) == 8
    low = deterministic_centroids(emb, n_cells=8)
    assert total_distortion(par) <= total_distortion(low)
    # repartition invariance (determinism contract)
    assert kmeans_parallel_init(emb.repartition(7), n_cells=8) == par


def test_kmeans_parallel_init_escapes_bad_local_optimum(spark):
    """On clustered data the init is decisive: lowest-id seeding puts
    every seed in whichever blob owns the low ids and Lloyd cannot
    split distant blobs apart; k-means|| samples proportional to
    squared distance, covers the blobs, and lands a strictly better
    trained quantizer.  (On unstructured embeddings the two train to
    comparable distortion — this is the case that separates them.)"""
    import math

    from pyspark.sql import functions as F
    from v6spark.operators.similarity import kmeans_centroids

    # 4 tight blobs far apart in 8-d; ids ordered so the lowest ids
    # all sit inside blob 0
    rows = []
    for b in range(4):
        center = [100.0 * b * math.cos(b), 100.0 * b, 10.0 * b, -50.0 * b,
                  25.0 * b, 0.0, 5.0 * b, -b * 12.0]
        for i in range(30):
            rows.append(
                (b * 30 + i,
                 [c + ((i * 7 + d * 3) % 11 - 5) * 0.1
                  for d, c in enumerate(center)])
            )
    blobs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def distortion(centroids):
        cells = []
        for idx, c in enumerate(centroids):
            cvec = F.array(*[F.lit(float(x)) for x in c])
            dist = F.aggregate(
                F.zip_with(F.col("embedding"), cvec,
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x)
            cells.append(F.struct(dist.alias("dist"), F.lit(idx).alias("cell")))
        best = F.array_min(F.array(*cells))
        return blobs.select(best["dist"].alias("d")).agg(F.sum("d")).collect()[0][0]

    t_par = kmeans_centroids(blobs, n_cells=4, n_iters=3, init="parallel")
    t_low = kmeans_centroids(blobs, n_cells=4, n_iters=3, init="lowest_id")
    d_par, d_low = distortion(t_par), distortion(t_low)
    # parallel init must be dramatically better, not marginally
    assert d_par < d_low / 10, (d_par, d_low)
