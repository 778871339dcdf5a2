"""Txlog-committed sketch store (sources/sketch_store.py): crash-safe
incremental sketch maintenance, subset estimates without rescans,
compaction that preserves estimates exactly, and the streaming
foreachBatch updater's idempotent epoch replay."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from v6spark.operators import sketches as sk
from v6spark.sources import sketch_store as ss

SPECS = {
    "users": {"kind": "hll", "col": "user", "p": 12},
    "lat": {"kind": "dds", "col": "latency", "alpha": 0.02},
    "types": {"kind": "cm", "col": "etype", "width": 1024},
}


def _slice(spark, day: int, n: int = 4000, base: int = 0):
    """One ingest slice: n events on `day`, users base..base+n/4."""
    return spark.range(n).select(
        F.lit(day).alias("day"),
        F.concat(F.lit("u"), (F.col("id") % (n // 4)) + base).alias("user"),
        (F.col("id") % 7).cast("double").alias("latency"),
        F.concat(F.lit("t"), F.col("id") % 3).alias("etype"),
    )


def _frames_equal(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.mark.parametrize("mode", ["rename", "put"])
def test_build_append_crash_replay(spark, tmp_path, mode):
    path = str(tmp_path / "sst")
    ss.build_sketch_store(_slice(spark, 1), path, SPECS, "day", commit_mode=mode)

    # crash between data write and commit: committed readers see day 1 only
    with pytest.raises(RuntimeError, match="injected crash"):
        ss.append_sketch_store(
            _slice(spark, 2, base=500), path, append_id=1,
            commit_mode=mode, _fail_after="data",
        )
    days = {r["day"] for r in ss.read_sketch(spark, path, "users").select("day").distinct().collect()}
    assert days == {1}

    # replay completes exactly once; replay-after-commit is a no-op
    ss.append_sketch_store(_slice(spark, 2, base=500), path, append_id=1, commit_mode=mode)
    before = ss.read_sketch(spark, path, "users").count()
    ss.append_sketch_store(_slice(spark, 2, base=500), path, append_id=1, commit_mode=mode)
    assert ss.read_sketch(spark, path, "users").count() == before

    # estimates: day-1 users = 1000, day-2 users = 1000 (disjoint base)
    est = {
        r["day"]: r["approx_distinct"]
        for r in ss.sketch_distinct(spark, path, "users", by_partition=True).collect()
    }
    assert abs(est[1] - 1000) / 1000 < 0.1 and abs(est[2] - 1000) / 1000 < 0.1
    # merged across both days: 1500 distinct (u500..u999 overlap)
    both = ss.sketch_distinct(spark, path, "users").collect()[0]["approx_distinct"]
    assert abs(both - 1500) / 1500 < 0.1
    # subset estimate prunes to one slice
    only1 = ss.sketch_distinct(spark, path, "users", partitions=[1]).collect()[0][
        "approx_distinct"
    ]
    assert abs(only1 - 1000) / 1000 < 0.1


def test_estimates_match_direct_sketches_exactly(spark, tmp_path):
    """The stored registers are bit-identical to sketching the union
    directly — persistence adds nothing and loses nothing."""
    path = str(tmp_path / "sst")
    ss.build_sketch_store(_slice(spark, 1), path, SPECS, "day")
    ss.append_sketch_store(_slice(spark, 2, base=500), path)
    data = _slice(spark, 1).union(_slice(spark, 2, base=500))

    stored = sk.hll_merge(ss.read_sketch(spark, path, "users"))
    direct = sk.hll_sketch(data, "user", p=12)
    assert _frames_equal(stored, direct)

    stored_d = sk.dds_merge(ss.read_sketch(spark, path, "lat"))
    direct_d = sk.dds_sketch(data, "latency", alpha=0.02)
    assert _frames_equal(stored_d, direct_d)

    stored_c = sk.cm_merge(ss.read_sketch(spark, path, "types"))
    direct_c = sk.cm_sketch(data, "etype", width=1024)
    assert _frames_equal(stored_c, direct_c)


def test_quantiles_and_freq_from_store(spark, tmp_path):
    path = str(tmp_path / "sst")
    ss.build_sketch_store(_slice(spark, 1), path, SPECS, "day")
    got = {
        r["q"]: r["value"]
        for r in ss.sketch_quantiles(spark, path, "lat", [0.5]).collect()
    }
    # latency = id % 7: median 3, alpha=2% relative
    assert abs(got[0.5] - 3.0) / 3.0 <= 0.021
    items = spark.createDataFrame([("t0",), ("t1",), ("zzz",)], "etype string")
    freq = {
        r["etype"]: r["approx_count"]
        for r in ss.sketch_freq(spark, path, "types", items, "etype").collect()
    }
    # 4000 events % 3 types: t0 gets 1334
    assert freq["t0"] >= 1334 and freq["t1"] >= 1333
    assert freq["zzz"] == 0


def test_compact_preserves_estimates_and_vacuum_sweeps(spark, tmp_path):
    path = str(tmp_path / "sst")
    ss.build_sketch_store(_slice(spark, 1), path, SPECS, "day")
    for d in (2, 3, 4):
        ss.append_sketch_store(_slice(spark, d, base=100 * d), path)
    before = {
        r["day"]: r["approx_distinct"]
        for r in ss.sketch_distinct(spark, path, "users", by_partition=True).collect()
    }
    q_before = ss.sketch_quantiles(spark, path, "lat", [0.9]).collect()[0]["value"]

    assert ss.compact_sketch_store(spark, path) is not None
    after = {
        r["day"]: r["approx_distinct"]
        for r in ss.sketch_distinct(spark, path, "users", by_partition=True).collect()
    }
    assert after == before  # merge algebra: identical, not approximately
    assert ss.sketch_quantiles(spark, path, "lat", [0.9]).collect()[0]["value"] == q_before

    # one live generation remains; vacuum removes the folded ones
    doc = ss.store_specs(spark, path)
    assert len(doc["live"]) == 1
    removed = ss.vacuum_sketch_store(spark, path)
    assert removed >= 4
    gens = [g for g in glob.glob(f"{path}/gen=*")]
    assert len(gens) == 1

    # appends keep working post-compact (committed ids carried forward)
    ss.append_sketch_store(_slice(spark, 5, base=999), path)
    days = {r["day"] for r in ss.read_sketch(spark, path, "users").select("day").distinct().collect()}
    assert days == {1, 2, 3, 4, 5}


def test_build_refuses_double_build_and_bad_specs(spark, tmp_path):
    path = str(tmp_path / "sst")
    ss.build_sketch_store(_slice(spark, 1), path, SPECS, "day")
    with pytest.raises(ValueError, match="already holds"):
        ss.build_sketch_store(_slice(spark, 2), path, SPECS, "day")
    with pytest.raises(ValueError, match="kind"):
        ss.build_sketch_store(
            _slice(spark, 1), str(tmp_path / "x"), {"bad": {"kind": "nope", "col": "user"}}, "day"
        )
    with pytest.raises(KeyError, match="not in store"):
        ss.read_sketch(spark, path, "missing")
    with pytest.raises(ValueError, match="not hll"):
        ss.sketch_distinct(spark, path, "lat")


def test_streaming_foreach_batch_idempotent_replay(spark, tmp_path):
    """The foreachBatch updater under a REAL stream (availableNow file
    source), then a manual epoch replay: the committed-id skip makes
    the replay a no-op — registers unchanged."""
    src = str(tmp_path / "src")
    path = str(tmp_path / "sst")
    ckpt = str(tmp_path / "ckpt")
    ss.build_sketch_store(_slice(spark, 0, n=400), path, SPECS, "day")
    _slice(spark, 1, n=400, base=50).write.parquet(src)

    stream = (
        spark.readStream.schema(_slice(spark, 1).schema).parquet(src)
        .writeStream.foreachBatch(ss.sketch_update_foreach_batch(path))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination(120)
    regs = ss.read_sketch(spark, path, "users")
    n_before = regs.count()
    assert {r["day"] for r in regs.select("day").distinct().collect()} == {0, 1}

    # epoch replay: same batch df, same batch id — must skip
    ss.sketch_update_foreach_batch(path)(_slice(spark, 1, n=400, base=50), 0)
    assert ss.read_sketch(spark, path, "users").count() == n_before


def test_distinct_rollup_incremental_refresh(spark, tmp_path):
    """The continuous-aggregate-with-distinct-counts case: exact
    rollups can't merge count(distinct) across partitions; the
    register view can — and the refresh re-sketches ONLY the changed
    partition, with estimates identical to sketching the source."""
    from v6spark.sources.layout import write_partitioned
    from v6spark.sources.rollup import (
        read_distinct_rollup,
        refresh_distinct_rollup,
    )

    src = str(tmp_path / "events_by_day")
    view = str(tmp_path / "distinct_view")
    # 4 day-partitions, 500 distinct users corpus-wide
    events = spark.range(8000).select(
        (F.col("id") % 4).alias("day"),
        F.concat(F.lit("u"), (F.col("id") % 500)).alias("user"),
    )
    write_partitioned(events, src, "day")

    refreshed = refresh_distinct_rollup(spark, src, view, "day", "user")
    assert sorted(refreshed) == ["0", "1", "2", "3"]

    # merged over all partitions: 500 distinct, not sum(4 x 250)
    total = read_distinct_rollup(spark, view).collect()[0]["approx_distinct"]
    assert abs(total - 500) <= 10
    # subset estimate for one day, checked against the exact source count
    one_day_true = (
        events.where("day = 1").agg(F.countDistinct("user")).collect()[0][0]
    )
    one_day_est = read_distinct_rollup(
        spark, view, partitions=[1], partition_col="day"
    ).collect()[0]["approx_distinct"]
    assert abs(one_day_est - one_day_true) <= max(4, 0.05 * one_day_true)

    # fresh -> no-op; then mutate one partition -> only it refreshes
    assert refresh_distinct_rollup(spark, src, view, "day", "user") == []
    spark.range(100).select(
        F.concat(F.lit("brandnew"), F.col("id")).alias("user")
    ).write.mode("overwrite").parquet(src + "/day=2")
    refreshed = refresh_distinct_rollup(spark, src, view, "day", "user")
    assert refreshed == ["2"]
    day2 = read_distinct_rollup(
        spark, view, partitions=[2], partition_col="day"
    ).collect()[0]["approx_distinct"]
    assert abs(day2 - 100) <= 4
