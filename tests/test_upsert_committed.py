"""txlog-committed streaming upsert sink (streaming/events.py —
run_foreach_batch_upsert_committed): generation-per-batch merge with
manifest commit, S3-safe in put mode, replay-idempotent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from v6spark.streaming.events import (
    read_upsert_target,
    run_foreach_batch_upsert_committed,
    vacuum_upsert_target,
)


def _stream(spark, src_dir):
    return (
        spark.readStream.schema("event_id long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


@pytest.mark.parametrize("mode", ["rename", "put"])
def test_upsert_committed_merge_and_replay(spark, tmp_path, mode):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "a1"), (2, "b1")], "event_id long, v string"
    ).coalesce(1).write.parquet(src)
    run_foreach_batch_upsert_committed(
        _stream(spark, src), target, ckpt, commit_mode=mode
    )
    got = {r["event_id"]: r["v"] for r in read_upsert_target(spark, target).collect()}
    assert got == {1: "a1", 2: "b1"}

    # second file: update key 2, insert key 3
    spark.createDataFrame(
        [(2, "b2"), (3, "c1")], "event_id long, v string"
    ).coalesce(1).write.mode("append").parquet(src)
    run_foreach_batch_upsert_committed(
        _stream(spark, src), target, ckpt, commit_mode=mode
    )
    got = {r["event_id"]: r["v"] for r in read_upsert_target(spark, target).collect()}
    assert got == {1: "a1", 2: "b2", 3: "c1"}

    # re-run with the same checkpoint: nothing re-applies
    run_foreach_batch_upsert_committed(
        _stream(spark, src), target, ckpt, commit_mode=mode
    )
    got2 = {r["event_id"]: r["v"] for r in read_upsert_target(spark, target).collect()}
    assert got2 == got

    # vacuum drops superseded generations, committed view unchanged
    removed = vacuum_upsert_target(spark, target)
    assert removed >= 1
    got3 = {r["event_id"]: r["v"] for r in read_upsert_target(spark, target).collect()}
    assert got3 == got


def test_upsert_committed_empty_target_reader(spark, tmp_path):
    assert read_upsert_target(spark, str(tmp_path / "nothing")) is None
