"""txlog-committed IVF index (sources/ivf_index.py): crash-safe
incremental appends with partition pruning preserved across
generations."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from v6spark.sources import ivf_index as ivf


def _vectors(n=200, dim=8, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.normal(size=(4, dim))
    out = []
    for i in range(n):
        v = base[i % 4] + 0.05 * rng.normal(size=dim)
        out.append((i, [float(x) for x in v]))
    return out


@pytest.mark.parametrize("mode", ["rename", "put"])
def test_committed_build_append_crash_replay(spark, tmp_path, mode):
    rows = _vectors()
    path = str(tmp_path / "ivfc")
    df = spark.createDataFrame(rows[:150], "vec_id long, embedding array<double>")
    cents = ivf.build_ivf_index_committed(df, path, n_cells=4, commit_mode=mode)
    assert len(cents) == 4

    q = rows[10][1]
    got = ivf.ivf_index_topk_committed(spark, path, q, k=1, n_probe=4).collect()
    assert got[0]["vec_id"] == 10

    more = spark.createDataFrame(rows[150:], "vec_id long, embedding array<double>")
    # crash between data write and commit: committed reads unchanged
    with pytest.raises(RuntimeError, match="injected crash"):
        ivf.append_to_ivf_index_committed(
            more, path, append_id=1, commit_mode=mode, _fail_after="data"
        )
    index, _ = ivf.load_ivf_index_committed(spark, path)
    assert index.count() == 150  # the orphan generation is invisible
    # replay completes; appended vector findable
    ivf.append_to_ivf_index_committed(more, path, append_id=1, commit_mode=mode)
    index, _ = ivf.load_ivf_index_committed(spark, path)
    assert index.count() == 200
    got = ivf.ivf_index_topk_committed(spark, path, rows[180][1], k=1, n_probe=4).collect()
    assert got[0]["vec_id"] == 180
    # replay-after-commit skips (count unchanged)
    ivf.append_to_ivf_index_committed(more, path, append_id=1, commit_mode=mode)
    index, _ = ivf.load_ivf_index_committed(spark, path)
    assert index.count() == 200


def test_committed_pruning_across_generations(spark, tmp_path):
    rows = _vectors()
    path = str(tmp_path / "ivfp")
    df = spark.createDataFrame(rows[:150], "vec_id long, embedding array<double>")
    ivf.build_ivf_index_committed(df, path, n_cells=4)
    more = spark.createDataFrame(rows[150:], "vec_id long, embedding array<double>")
    ivf.append_to_ivf_index_committed(more, path)

    q = rows[10][1]
    plan = (
        ivf.ivf_index_topk_committed(spark, path, q, k=5, n_probe=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the probe predicate prunes at the DIRECTORY level in every gen
    assert "PartitionFilters: [isnotnull(cell#" in plan
    assert "DataFilters: []" in plan

    # parity with brute force at full probe over BOTH generations
    from v6spark.operators.similarity import cosine_topk_query

    full = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    brute = cosine_topk_query(full, q, 5).collect()
    got = ivf.ivf_index_topk_committed(spark, path, q, k=5, n_probe=4).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in brute]


def test_committed_compact_and_vacuum(spark, tmp_path):
    rows = _vectors()
    path = str(tmp_path / "ivfv")
    df = spark.createDataFrame(rows[:100], "vec_id long, embedding array<double>")
    ivf.build_ivf_index_committed(df, path, n_cells=4)
    for i, lo in enumerate((100, 150)):
        chunk = spark.createDataFrame(
            rows[lo : lo + 50], "vec_id long, embedding array<double>"
        )
        ivf.append_to_ivf_index_committed(chunk, path, append_id=i + 1)
    assert len(glob.glob(os.path.join(path, "gen=*"))) == 3
    v = ivf.compact_ivf_index(spark, path)
    assert v is not None
    removed = ivf.vacuum_ivf_index(spark, path)
    assert removed == 3  # the three folded generations
    index, _ = ivf.load_ivf_index_committed(spark, path)
    assert index.count() == 200
    # replayed append still skips after compaction (committed carried)
    chunk = spark.createDataFrame(rows[150:], "vec_id long, embedding array<double>")
    ivf.append_to_ivf_index_committed(chunk, path, append_id=2)
    index, _ = ivf.load_ivf_index_committed(spark, path)
    assert index.count() == 200


def test_committed_build_refuses_double_build(spark, tmp_path):
    rows = _vectors(50)
    path = str(tmp_path / "ivfd")
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ivf.build_ivf_index_committed(df, path, n_cells=4)
    with pytest.raises(ValueError, match="already holds"):
        ivf.build_ivf_index_committed(df, path, n_cells=4)


def test_concurrent_appends_via_occ(spark, tmp_path):
    """4 concurrent appenders (distinct ids) race on one index: every
    batch lands exactly once; queries see the union."""
    import threading

    rows = _vectors(300)
    path = str(tmp_path / "ivfcc")
    df = spark.createDataFrame(rows[:100], "vec_id long, embedding array<double>")
    ivf.build_ivf_index_committed(df, path, n_cells=4)

    errors = []

    def appender(i):
        try:
            chunk = spark.createDataFrame(
                rows[100 + i * 50 : 150 + i * 50],
                "vec_id long, embedding array<double>",
            )
            ivf.append_to_ivf_index_committed(chunk, path, append_id=i + 1)
        except Exception as exc:
            errors.append(exc)

    threads = [threading.Thread(target=appender, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    index, _ = ivf.load_ivf_index_committed(spark, path)
    assert index.count() == 300
    assert index.select("vec_id").distinct().count() == 300


def test_append_id_zero_is_a_real_transaction(spark, tmp_path):
    """build must not reserve id 0: a user's first append_id=0 lands
    (regression: it was silently swallowed as a committed replay)."""
    rows = _vectors(120)
    path = str(tmp_path / "ivf0")
    df = spark.createDataFrame(rows[:100], "vec_id long, embedding array<double>")
    ivf.build_ivf_index_committed(df, path, n_cells=4)
    chunk = spark.createDataFrame(rows[100:], "vec_id long, embedding array<double>")
    ivf.append_to_ivf_index_committed(chunk, path, append_id=0)
    index, _ = ivf.load_ivf_index_committed(spark, path)
    assert index.count() == 120
    # and replaying id 0 skips
    ivf.append_to_ivf_index_committed(chunk, path, append_id=0)
    index, _ = ivf.load_ivf_index_committed(spark, path)
    assert index.count() == 120
