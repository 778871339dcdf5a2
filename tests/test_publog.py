"""Publish commit log as a Spark DataSource (batch + streaming).

Batch: full lifecycle audit view. Streaming: version-offset resumable
stream of commits; `changes_foreach_batch` composes it with
`published_corpus_changes` into a row-level CDC stream whose heavy
reads are Catalyst parquet scans, not Python-source rows.
"""
from __future__ import annotations

import json
import time

from v6spark.pipeline import (
    compact_published,
    evolve_published_schema,
    publish_corpus_committed,
    retract_from_published,
    upsert_into_published,
)
from v6spark.sources.publog import (
    changes_foreach_batch,
    register_publog_source,
    stream_published_log,
)


def _publish(spark, tmp_path, n=30):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text"
    )
    prepared = spark.range(n).selectExpr("id as doc_id", "'train' as split")
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=2)
    return root


def _lifecycle(spark, tmp_path):
    root = _publish(spark, tmp_path)
    retract_from_published(spark, root, "doc_id = 3")                 # v2
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(5, "rev 5", None)], "doc_id long, text string, split string"
        ),
        txn_id="job-A",                                               # v3
    )
    evolve_published_schema(spark, root, [("license", "string")])     # v4
    compact_published(spark, root)                                    # v5
    retract_from_published(
        spark, root, "doc_id = 999999", txn_id="noop-1"               # v6
    )
    return root


def test_batch_log_reads_lifecycle(spark, tmp_path):
    root = _lifecycle(spark, tmp_path)
    register_publog_source(spark)
    log = spark.read.format("publog").load(root).orderBy("version")
    rows = log.collect()
    assert [r["version"] for r in rows] == [1, 2, 3, 4, 5, 6]
    assert [r["kind"] for r in rows] == [
        "publish", "retract", "upsert", "evolve", "compact", "noop_txn"
    ]
    assert rows[2]["txn_id"] == "job-A"
    assert rows[5]["txn_id"] == "noop-1"
    assert rows[0]["rows_total"] == 30
    assert rows[1]["rows_total"] == 29
    assert json.loads(rows[0]["splits"]) == {"train": 30}
    # the raw manifest travels for consumers that need everything
    assert json.loads(rows[4]["manifest"])["compacted_from"] == 4


def test_stream_resumes_from_offset(spark, tmp_path):
    """availableNow over the log, then more commits, then a second
    run from the same checkpoint: only the new versions arrive."""
    root = _lifecycle(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_once():
        q = (
            stream_published_log(spark, root)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = spark.read.parquet(sink)
    assert sorted(r["version"] for r in got.collect()) == [1, 2, 3, 4, 5, 6]
    retract_from_published(spark, root, "doc_id = 7")                 # v7
    run_once()
    got = spark.read.parquet(sink).orderBy("version")
    assert [r["version"] for r in got.collect()] == [1, 2, 3, 4, 5, 6, 7]
    assert got.collect()[-1]["kind"] == "retract"


def test_changes_foreach_batch_cdc(spark, tmp_path):
    """Cold start delivers the snapshot as inserts; a later batch
    delivers the net row-level changes for its version window."""
    root = _publish(spark, tmp_path, n=10)
    ckpt = str(tmp_path / "ckpt2")
    seen: list = []

    def handle(df, batch_id):
        if df is None:
            seen.append((batch_id, None))
        else:
            seen.append((batch_id, df.collect()))

    def run_once():
        q = (
            stream_published_log(spark, root)
            .writeStream.foreachBatch(changes_foreach_batch(root, handle))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert len(seen) == 1
    first = seen[0][1]
    assert {r["_change_type"] for r in first} == {"insert"}
    assert len(first) == 10
    seen.clear()

    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(2, "rev 2", None), (1002, "new", "train")],
            "doc_id long, text string, split string",
        ),
    )
    retract_from_published(spark, root, "doc_id = 4")
    run_once()
    assert len(seen) == 1
    types = sorted(r["_change_type"] for r in seen[0][1])
    assert types == [
        "delete", "insert", "update_postimage", "update_preimage"
    ]
    by = {r["_change_type"]: r for r in seen[0][1]}
    assert by["delete"]["doc_id"] == 4
    assert by["insert"]["doc_id"] == 1002
    assert by["update_postimage"]["text"] == "rev 2"
    assert all(r["_commit_version"] == 3 for r in seen[0][1])


def test_version_window_skips_manifest_parses(spark, tmp_path):
    """minVersion/maxVersion must narrow the FILENAME window before
    any manifest body is opened: commits-parsed == delta, not history
    — the tailing-consumer cost contract.  (Options, not pushFilters:
    Spark 4.1 caches pushdown plans on shared relations — see
    sources/pubcorpus.py.)"""
    from v6spark.sources import publog as plog

    root = _lifecycle(spark, tmp_path)  # versions 1..6

    parsed = []
    real = plog._decode

    def counting(raw):
        doc = real(raw)
        if doc is not None:
            parsed.append(doc.get("v"))
        return doc

    plog._decode = counting
    try:
        r = plog.PublishLogBatchReader(root, after=4, upto=6)
        rows = list(r.read(None))
        assert sorted(v for v, *_rest in rows) == [5, 6]
        assert sorted(parsed) == [5, 6]  # versions 1-4 never opened

        # streaming read(start) has the same contract
        parsed.clear()
        sr = plog.PublishLogStreamReader(root, 0)
        out, end = sr.read({"version": 4})
        assert sorted(v for v, *_r in out) == [5, 6]
        assert end == {"version": 6}
        assert sorted(parsed) == [5, 6]
    finally:
        plog._decode = real

    # end-to-end through Spark the windowed frame is correct, and a
    # later unwindowed read of the same root is NOT affected
    register_publog_source(spark)
    got = (
        spark.read.format("publog").option("minVersion", 5).load(root)
        .orderBy("version").collect()
    )
    assert [r["version"] for r in got] == [5, 6]
    full = spark.read.format("publog").load(root).count()
    assert full == 6


def test_changes_window_with_gap_predecessor_still_diffs(spark, tmp_path):
    """A permanent version GAP right below the window (an aborted
    commit_pair half) must NOT flip an already-consuming stream to the
    snapshot path — the diff runs from the nearest retained version
    below, so the window's DELETIONS are applied (snapshot-as-inserts
    would silently drop them)."""
    import pytest

    from v6spark.pipeline import atomic_published_pair

    root = _publish(spark, tmp_path, n=10)   # v1
    seen: list = []

    def handle(df, batch_id):
        seen.append(None if df is None else df.collect())

    ckpt = str(tmp_path / "ckpt_gap")

    def run_once():
        q = (
            stream_published_log(spark, root)
            .writeStream.foreachBatch(changes_foreach_batch(root, handle))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # bootstrap at v1
    seen.clear()

    # make v2 a PERMANENT GAP: an aborted pair half on this table
    other = str(tmp_path / "other")
    docs = spark.range(3).selectExpr(
        "id as doc_id", "concat('o ', id) as text"
    )
    prepared = spark.range(3).selectExpr("id as doc_id", "'train' as split")
    publish_corpus_committed(prepared, docs, other, n_shards=2)
    with pytest.raises(RuntimeError):
        atomic_published_pair(spark, [
            (root, {
                "op": "upsert",
                "updates": spark.createDataFrame(
                    [(1, "ghost", None)],
                    "doc_id long, text string, split string",
                ),
            }),
            (other, {"op": "retract", "predicate": "doc_id = 0"}),
        ], _fail_before_marker=True)

    retract_from_published(spark, root, "doc_id = 4")  # commits ABOVE gap
    run_once()
    assert len(seen) == 1 and seen[0] is not None
    types = [r["_change_type"] for r in seen[0]]
    assert types == ["delete"]  # a DIFF window, not a snapshot
    assert seen[0][0]["doc_id"] == 4


def test_changes_cold_start_after_retention(spark, tmp_path):
    """A stream starting at version 0 against a table whose early
    versions already fell out of retention must take the SNAPSHOT
    path (lo > 1 but manifest lo-1 is retired), not raise from
    published_corpus_changes."""
    from v6spark.pipeline import vacuum_published_files

    root = _publish(spark, tmp_path, n=10)
    retract_from_published(spark, root, "doc_id = 1")   # v2
    retract_from_published(spark, root, "doc_id = 2")   # v3
    vacuum_published_files(spark, root, keep_last=2)    # v1 retired
    seen: list = []

    def handle(df, batch_id):
        seen.append(None if df is None else df.collect())

    q = (
        stream_published_log(spark, root)  # startingVersion=0
        .writeStream.foreachBatch(changes_foreach_batch(root, handle))
        .option("checkpointLocation", str(tmp_path / "ckpt_cold"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(seen) == 1 and seen[0] is not None
    # the bootstrap snapshot: latest content as inserts
    assert {r["_change_type"] for r in seen[0]} == {"insert"}
    assert sorted(r["doc_id"] for r in seen[0]) == [0] + list(range(3, 10))


def test_batch_log_reads_put_mode_lifecycle(spark, tmp_path):
    """Put-mode manifests (checksum-footer commit) read identically
    through the publog source — mode-portable logs."""
    docs = spark.range(10).selectExpr(
        "id as doc_id", "concat('b ', id) as text"
    )
    prepared = spark.range(10).selectExpr("id as doc_id", "'train' as split")
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        prepared, docs, root, n_shards=2, commit_mode="put"
    )
    retract_from_published(
        spark, root, "doc_id = 2", commit_mode="put", txn_id="t-1"
    )
    register_publog_source(spark)
    log = spark.read.format("publog").load(root).orderBy("version")
    rows = log.collect()
    assert [r["kind"] for r in rows] == ["publish", "retract"]
    assert rows[1]["txn_id"] == "t-1"
    assert rows[1]["rows_total"] == 9
