"""The IVF index as a Spark DataSource (format("ivfindex")).

The SQL front door must return the SAME top-k as the Python helpers
(ivf_index_topk / ivf_index_topk_committed) on both layouts, plan
only the probed cells' files (the file-skip twin of the JVM path's
PartitionFilters — asserted via the scan observer), read only LIVE
generations of a committed index (crashed appends invisible), and
expose the whole thing to plain SQL.
"""
from __future__ import annotations

import json

import numpy as np
import pytest

from v6spark.sources import ivf_index as ivf
from v6spark.sources.ivfindex_source import (
    read_ivf_index_topk,
    register_ivfindex_source,
)


def _vectors(n=200, dim=16, clusters=4, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5, (clusters, dim))
    return [
        (i, [float(x) for x in centers[i % clusters]
             + rng.normal(0, 0.3, dim)])
        for i in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_parity_with_python_helpers_plain_layout(spark, tmp_path):
    rows = _vectors()
    path = str(tmp_path / "ivf")
    ivf.build_ivf_index(_df(spark, rows), path, n_cells=4)
    query = rows[10][1]
    for n_probe in (1, 2, 4):
        ref = ivf.ivf_index_topk(
            spark, path, query, k=5, n_probe=n_probe
        ).collect()
        got = read_ivf_index_topk(
            spark, path, query, k=5, n_probe=n_probe
        ).collect()
        assert [r["vec_id"] for r in got] == [r["vec_id"] for r in ref]
        assert [r["cosine"] for r in got] == pytest.approx(
            [r["cosine"] for r in ref], abs=1e-5
        )
    assert got[0]["vec_id"] == 10  # the vector itself wins


def test_committed_layout_and_file_skip(spark, tmp_path):
    rows = _vectors()
    path = str(tmp_path / "ivfc")
    ivf.build_ivf_index_committed(_df(spark, rows), path, n_cells=4)
    ivf.append_to_ivf_index_committed(
        _df(spark, [(1000 + i, v) for i, (_i, v) in
                    enumerate(rows[:8])]), path, append_id=1,
    )
    # a CRASHED append stages data but never commits: invisible
    with pytest.raises(RuntimeError, match="injected crash"):
        ivf.append_to_ivf_index_committed(
            _df(spark, [(2000, rows[0][1])]), path, append_id=2,
            _fail_after="data",
        )
    query = rows[10][1]
    ref = ivf.ivf_index_topk_committed(
        spark, path, query, k=6, n_probe=2
    ).collect()
    obs = str(tmp_path / "obs.json")
    register_ivfindex_source(spark)
    got = (
        spark.read.format("ivfindex")
        .option("query", json.dumps(query)).option("k", 6)
        .option("nProbe", 2).option("_scanObserverPath", obs)
        .load(path)
        .orderBy("cosine", ascending=False).limit(6).collect()
    )
    assert sorted(r["vec_id"] for r in got) == sorted(
        r["vec_id"] for r in ref
    )
    assert 2000 not in {r["vec_id"] for r in got}
    seen = json.load(open(obs))
    # the file skip is real: 2 of 4 cells planned, fewer files opened
    assert seen["cells_probed"] != list(range(seen["cells_total"]))
    assert len(seen["cells_probed"]) == 2
    assert 0 < len(seen["files_planned"]) < seen["files_total"]
    # every planned file is from a probed cell
    assert all(
        any(f"cell={c}" in f for c in seen["cells_probed"])
        for f in seen["files_planned"]
    )


def test_sql_surface_and_validation(spark, tmp_path):
    rows = _vectors(n=80)
    path = str(tmp_path / "ivf")
    ivf.build_ivf_index(_df(spark, rows), path, n_cells=4)
    register_ivfindex_source(spark)
    query = rows[3][1]
    (
        spark.read.format("ivfindex")
        .option("query", json.dumps(query)).option("nProbe", 4)
        .load(path).createOrReplaceTempView("ivf_v")
    )
    out = spark.sql(
        "SELECT vec_id FROM ivf_v ORDER BY cosine DESC, vec_id "
        "LIMIT 3"
    ).collect()
    assert out[0]["vec_id"] == 3

    with pytest.raises(Exception, match="query"):
        spark.read.format("ivfindex").load(path).collect()
    with pytest.raises(Exception, match="JSON array"):
        spark.read.format("ivfindex").option(
            "query", "nope"
        ).load(path).collect()
    with pytest.raises(Exception, match="dimension"):
        spark.read.format("ivfindex").option(
            "query", "[1.0, 2.0]"
        ).load(path).collect()
    with pytest.raises(Exception, match="not an IVF index"):
        spark.read.format("ivfindex").option(
            "query", json.dumps(query)
        ).load(str(tmp_path / "nothing")).collect()


def test_per_file_topk_tie_break_is_native_id_order(spark, tmp_path):
    """All-identical embeddings: every cosine ties at 1.0, so the
    per-file top-k cut is decided purely by the id tie-break — which
    must use the column's NATIVE ordering (int 9 < 10), not string
    order ('10' < '9'), to match the JVM twin."""
    vec = [1.0, 2.0, 3.0, 4.0]
    rows = [(i, vec) for i in range(30)]
    path = str(tmp_path / "ivf_ties")
    ivf.build_ivf_index(_df(spark, rows), path, n_cells=1)
    ref = ivf.ivf_index_topk(spark, path, vec, k=12, n_probe=1)
    got = read_ivf_index_topk(spark, path, vec, k=12, n_probe=1)
    assert [r["vec_id"] for r in got.collect()] == [
        r["vec_id"] for r in ref.collect()
    ] == list(range(12))
