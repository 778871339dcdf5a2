"""Persistent IVF index: build/load/query round-trip, PARTITION
PRUNING in the query scan (asserted, not assumed), incremental
append with the frozen quantizer, and parity with brute force."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from v6spark.sources import ivf_index as ivf


def _vectors(n=200, dim=16, clusters=4, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5, (clusters, dim))
    rows = []
    for i in range(n):
        c = i % clusters
        v = centers[c] + rng.normal(0, 0.3, dim)
        rows.append((i, [float(x) for x in v]))
    return rows


def test_build_query_parity_and_pruning(spark, tmp_path):
    rows = _vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    centroids = ivf.build_ivf_index(df, path, n_cells=4)
    assert len(centroids) == 4
    # cell directories on disk
    cells = sorted(glob.glob(os.path.join(path, "cell=*")))
    assert len(cells) == 4

    query = rows[10][1]
    got = ivf.ivf_index_topk(spark, path, query, k=5, n_probe=1).collect()
    assert got[0]["vec_id"] == 10  # the vector itself wins
    # parity with brute force over the whole set at n_probe = all
    from v6spark.operators.similarity import cosine_topk_query

    brute = cosine_topk_query(df, query, 5).collect()
    all_probe = ivf.ivf_index_topk(spark, path, query, k=5, n_probe=4).collect()
    assert [r["vec_id"] for r in all_probe] == [r["vec_id"] for r in brute]

    # PARTITION PRUNING: the probe predicate lands in the scan's
    # PartitionFilters (directory-level pruning), not DataFilters
    plan = ivf.ivf_index_topk(spark, path, query, k=5, n_probe=1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cell#" in plan
    assert "DataFilters: []" in plan
    # and the pruned frame's files all come from the one probed dir
    index, cents = ivf.load_ivf_index(spark, path)
    ranked = sorted(range(4), key=lambda i: sum(
        (q - c) * (q - c) for q, c in zip(query, cents[i])))
    one_cell = index.filter(F.col("cell") == ranked[0])
    n_one = one_cell.count()
    assert 0 < n_one < len(rows)
    files = one_cell.select(F.input_file_name()).distinct().collect()
    assert all(f"cell={ranked[0]}" in r[0] for r in files)


def test_append_with_frozen_quantizer(spark, tmp_path):
    rows = _vectors()
    df = spark.createDataFrame(rows[:150], "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    ivf.build_ivf_index(df, path, n_cells=4)
    more = spark.createDataFrame(rows[150:], "vec_id long, embedding array<double>")
    ivf.append_to_ivf_index(more, path)
    index, _ = ivf.load_ivf_index(spark, path)
    assert index.count() == 200
    # an appended vector is findable
    q = rows[180][1]
    got = ivf.ivf_index_topk(spark, path, q, k=1, n_probe=4).collect()
    assert got[0]["vec_id"] == 180


def test_rebuild_is_deterministic(spark, tmp_path):
    rows = _vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c1 = ivf.build_ivf_index(df, str(tmp_path / "a"), n_cells=4)
    c2 = ivf.build_ivf_index(df, str(tmp_path / "b"), n_cells=4)
    assert c1 == c2
    with pytest.raises(Exception):
        ivf.build_ivf_index(df, str(tmp_path / "a"), n_cells=4)  # mode=error
