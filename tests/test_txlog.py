"""Versioned-manifest transaction log (v6spark/txlog.py) — both commit
modes — plus the committed batch publish built on it (pipeline.py).

The ``put``-mode tests cover S3 semantics: there is no atomic rename,
so a crash during the manifest write (or during an emulated
copy+delete "rename") leaves a TORN object under the final name.  The
torn states here are constructed directly — a truncated checksummed
file, a garbage file — because that byte-level state is exactly what
any non-atomic writer crash produces; the reader contract is that
such files are invisible and the highest VERIFIABLE manifest is the
commit point.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from v6spark import txlog
from v6spark.pipeline import (
    publish_corpus_committed,
    published_path,
    read_published_corpus,
    vacuum_published,
)
from v6spark.streaming import neardedup


def _write_raw(spark, log_dir: str, name: str, data: bytes) -> None:
    fs, jdir, jvm = txlog._jfs(spark, log_dir)
    fs.mkdirs(jdir)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(jdir, name), True)
    try:
        out.write(data)
    finally:
        out.close()


@pytest.mark.parametrize("mode", ["rename", "put"])
def test_publish_read_roundtrip(spark, tmp_path, mode):
    log = str(tmp_path / "log")
    assert txlog.read_latest(spark, log) == (0, None)
    txlog.publish(spark, log, 1, {"live": "v=1"}, commit_mode=mode)
    txlog.publish(spark, log, 2, {"live": "v=2"}, commit_mode=mode)
    version, doc = txlog.read_latest(spark, log)
    assert version == 2
    assert doc["live"] == "v=2"
    assert doc["v"] == 2


@pytest.mark.parametrize(
    "torn",
    [
        b"",  # zero-byte object (crash immediately after create)
        b'{"v": 9, "live": "v=9"',  # truncated JSON, no footer
        b'{"v": 9, "live": "v=9"}\nsha256:deadbeef\n',  # bad checksum
        b"\xff\xfenot utf8 at all\x00",  # binary garbage
    ],
)
def test_reader_skips_torn_higher_manifest(spark, tmp_path, torn):
    """The non-atomic-rename / torn-conditional-put state: a partial
    object exists under the HIGHEST version name.  Committed reads
    fall back to the highest complete manifest — the pre-crash state."""
    log = str(tmp_path / "log")
    txlog.publish(spark, log, 1, {"live": "v=1"}, commit_mode="put")
    _write_raw(spark, log, "manifest-000000000002", torn)
    version, doc = txlog.read_latest(spark, log)
    assert version == 1
    assert doc["live"] == "v=1"


def test_put_replay_over_torn_manifest_succeeds(spark, tmp_path):
    """Replay of a publish that crashed mid-manifest-write: the torn
    object under the target name is our own crashed attempt; the
    conditional put detects, deletes, and retries."""
    log = str(tmp_path / "log")
    txlog.publish(spark, log, 1, {"live": "v=1"}, commit_mode="put")
    _write_raw(spark, log, "manifest-000000000002", b'{"v": 2, "liv')
    txlog.publish(spark, log, 2, {"live": "v=2"}, commit_mode="put")
    assert txlog.read_latest(spark, log) == (2, {"v": 2, "live": "v=2"})


def test_put_replay_after_commit_is_idempotent(spark, tmp_path):
    log = str(tmp_path / "log")
    txlog.publish(spark, log, 1, {"live": "v=1"}, commit_mode="put")
    # byte-identical replay: success, no error
    txlog.publish(spark, log, 1, {"live": "v=1"}, commit_mode="put")
    # different payload under a committed version: hard error
    with pytest.raises(IOError):
        txlog.publish(spark, log, 1, {"live": "OTHER"}, commit_mode="put")
    assert txlog.read_latest(spark, log)[1]["live"] == "v=1"


def test_vacuum_manifests_keeps_only_latest_complete(spark, tmp_path):
    log = str(tmp_path / "log")
    for v in (1, 2, 3):
        txlog.publish(spark, log, v, {"live": f"v={v}"}, commit_mode="put")
    _write_raw(spark, log, "manifest-000000000004", b"torn")
    removed = txlog.vacuum_manifests(spark, log)
    assert removed == 3  # manifests 1, 2 and the torn 4
    assert txlog.read_latest(spark, log) == (3, {"v": 3, "live": "v=3"})


def test_rename_mode_reads_put_mode_log_and_vice_versa(spark, tmp_path):
    """Logs are mode-portable: both modes write the checksum footer
    and the reader is mode-agnostic."""
    log = str(tmp_path / "log")
    txlog.publish(spark, log, 1, {"a": 1}, commit_mode="rename")
    txlog.publish(spark, log, 2, {"a": 2}, commit_mode="put")
    assert txlog.read_latest(spark, log)[0] == 2


def test_legacy_bare_json_manifest_still_reads(spark, tmp_path):
    """Back-compat: manifests written before the checksum footer
    existed (plain JSON) still count as complete."""
    log = str(tmp_path / "log")
    _write_raw(spark, log, "manifest-000000000001", b'{"live": ["x"], "committed": [0]}')
    version, doc = txlog.read_latest(spark, log)
    assert version == 1
    assert doc["live"] == ["x"]


# ---------------------------------------------------------------------------
# near-dedup crash matrix on put-mode commits (the S3-semantics variant
# of tests/test_streaming_neardedup.py's rename-mode matrix)
# ---------------------------------------------------------------------------

RADIUS = 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("window", ["index", "kept"])
def test_neardedup_put_mode_crash_matrix(spark, tmp_path, window):
    i_dir, k_dir = str(tmp_path / "idx"), str(tmp_path / "kept")
    b1 = _docs(spark, [(1, "alpha beta gamma delta"), (2, "wholly different words here")])
    neardedup.batch_near_dedup_step(
        b1, i_dir, k_dir, radius=RADIUS, batch_id=0, commit_mode="put"
    )
    before = {
        r["doc_id"]
        for r in neardedup.read_kept(spark, k_dir, i_dir).collect()
    }
    b2 = _docs(spark, [(3, "alpha beta gamma delta"), (4, "fresh novel content four")])
    with pytest.raises(RuntimeError, match="injected crash"):
        neardedup.batch_near_dedup_step(
            b2, i_dir, k_dir, radius=RADIUS, batch_id=1,
            commit_mode="put", _fail_after=window,
        )
    # committed reads unchanged by the crash
    mid = {
        r["doc_id"]
        for r in neardedup.read_kept(spark, k_dir, i_dir).collect()
    }
    assert mid == before
    # replay completes; exact duplicate 3 dropped, 4 kept
    neardedup.batch_near_dedup_step(
        b2, i_dir, k_dir, radius=RADIUS, batch_id=1, commit_mode="put"
    )
    after = {
        r["doc_id"]
        for r in neardedup.read_kept(spark, k_dir, i_dir).collect()
    }
    assert after == before | {4}
    # replay-after-commit skips outright
    neardedup.batch_near_dedup_step(
        b2, i_dir, k_dir, radius=RADIUS, batch_id=1, commit_mode="put"
    )
    assert {
        r["doc_id"]
        for r in neardedup.read_kept(spark, k_dir, i_dir).collect()
    } == after


def test_neardedup_put_mode_compact_vacuum(spark, tmp_path):
    i_dir, k_dir = str(tmp_path / "idx"), str(tmp_path / "kept")
    texts = [
        "alpha beta gamma delta epsilon",
        "seven green turtles crossed slowly",
        "quantum flux capacitors hum nightly",
    ]
    for n in range(3):
        neardedup.batch_near_dedup_step(
            _docs(spark, [(10 * n + 1, texts[n])]),
            i_dir, k_dir, radius=RADIUS, batch_id=n, commit_mode="put",
        )
    v = neardedup.compact(spark, i_dir, k_dir, commit_mode="put")
    assert v is not None
    kept = {
        r["doc_id"]
        for r in neardedup.read_kept(spark, k_dir, i_dir).collect()
    }
    assert kept == {1, 11, 21}
    assert neardedup.vacuum(spark, i_dir, k_dir) > 0
    assert {
        r["doc_id"]
        for r in neardedup.read_kept(spark, k_dir, i_dir).collect()
    } == kept


# ---------------------------------------------------------------------------
# committed batch publish (pipeline.publish_corpus_committed)
# ---------------------------------------------------------------------------


def _corpus(spark):
    prepared = spark.createDataFrame(
        [(i, "train" if i % 3 else "valid") for i in range(12)],
        "doc_id long, split string",
    )
    content = spark.createDataFrame(
        [(i, f"document body {i}") for i in range(12)],
        "doc_id long, text string",
    )
    return prepared, content


@pytest.mark.parametrize("mode", ["rename", "put"])
def test_publish_committed_crash_then_rerun(spark, tmp_path, mode):
    """Kill mid-split-write; committed readers never see the partial
    publish; the rerun lands the full corpus at the same logical
    version."""
    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    with pytest.raises(RuntimeError, match="injected crash"):
        publish_corpus_committed(
            prepared, content, root, n_shards=4, commit_mode=mode,
            _fail_after_split="train",  # valid never written
        )
    # nothing committed: readers see NO corpus, not a partial one
    assert published_path(spark, root) is None
    assert read_published_corpus(spark, root) is None
    counts = publish_corpus_committed(
        prepared, content, root, n_shards=4, commit_mode=mode
    )
    assert counts["_version"] == 1
    assert counts["train"] == 8 and counts["valid"] == 4
    out = read_published_corpus(spark, root)
    assert out.count() == 12
    assert out.filter(F.col("split") == "valid").count() == 4
    # every doc exactly once, bodies intact
    assert out.select("doc_id").distinct().count() == 12


@pytest.mark.parametrize("mode", ["rename", "put"])
def test_publish_committed_crash_preserves_previous_version(
    spark, tmp_path, mode
):
    prepared, content = _corpus(spark)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        prepared, content, root, n_shards=4, commit_mode=mode
    )
    v1 = read_published_corpus(spark, root).count()
    # second publish (larger corpus) crashes mid-way
    prepared2 = prepared.unionByName(
        spark.createDataFrame([(100, "train")], "doc_id long, split string")
    )
    content2 = content.unionByName(
        spark.createDataFrame([(100, "late doc")], "doc_id long, text string")
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        publish_corpus_committed(
            prepared2, content2, root, n_shards=4, commit_mode=mode,
            _fail_after_split="train",
        )
    # committed readers still see v1, whole and unchanged
    path1, doc1 = published_path(spark, root)
    assert doc1["v"] == 1
    assert read_published_corpus(spark, root).count() == v1
    # rerun commits v2; vacuum drops v1's directory but v2 survives
    counts = publish_corpus_committed(
        prepared2, content2, root, n_shards=4, commit_mode=mode
    )
    assert counts["_version"] == 2
    assert read_published_corpus(spark, root).count() == v1 + 1
    removed = vacuum_published(spark, root)
    assert removed >= 1
    assert read_published_corpus(spark, root).count() == v1 + 1


def test_publish_committed_rejects_bad_fmt_read(spark, tmp_path):
    prepared, content = _corpus(spark)
    root = str(tmp_path / "wd")
    publish_corpus_committed(
        prepared, content, root, fmt="webdataset", n_shards=2
    )
    resolved = published_path(spark, root)
    assert resolved is not None and resolved[1]["fmt"] == "webdataset"
    with pytest.raises(ValueError, match="parquet"):
        read_published_corpus(spark, root)


def test_publish_committed_empty_corpus_reads_as_none(spark, tmp_path):
    """A committed EMPTY publish (everything filtered out) is a valid
    state: readers get None, not an IndexError."""
    prepared = spark.createDataFrame([], "doc_id long, split string")
    content = spark.createDataFrame([], "doc_id long, text string")
    root = str(tmp_path / "empty")
    counts = publish_corpus_committed(prepared, content, root, n_shards=2)
    assert counts["_version"] == 1
    assert {k: v for k, v in counts.items() if k != "_version"} == {}
    assert published_path(spark, root) is not None  # committed...
    assert read_published_corpus(spark, root) is None  # ...but empty


def test_time_travel_reads_and_retention(spark, tmp_path):
    """Version-pinned reads see historical publishes; vacuum with
    keep_last retains them, default vacuum retires them."""
    root = str(tmp_path / "tt")
    p1 = spark.createDataFrame([(1, "train")], "doc_id long, split string")
    c1 = spark.createDataFrame([(1, "one")], "doc_id long, text string")
    publish_corpus_committed(p1, c1, root, n_shards=1)
    p2 = spark.createDataFrame(
        [(1, "train"), (2, "train")], "doc_id long, split string"
    )
    c2 = spark.createDataFrame(
        [(1, "one"), (2, "two")], "doc_id long, text string"
    )
    publish_corpus_committed(p2, c2, root, n_shards=1)

    assert read_published_corpus(spark, root).count() == 2
    assert read_published_corpus(spark, root, version=1).count() == 1
    assert read_published_corpus(spark, root, version=2).count() == 2
    assert published_path(spark, root, version=99) is None

    # keep_last=2: both versions survive the sweep
    assert vacuum_published(spark, root, keep_last=2) == 0
    assert read_published_corpus(spark, root, version=1).count() == 1
    # default retention: v1 retired, latest intact
    removed = vacuum_published(spark, root)
    assert removed == 1
    assert published_path(spark, root, version=1) is None
    assert read_published_corpus(spark, root).count() == 2


def test_publish_schema_drift_guard(spark, tmp_path):
    """A publish whose content schema drifts from the previous
    version fails at the PUBLISHER unless explicitly allowed (then
    the manifest records it)."""
    root = str(tmp_path / "drift")
    prepared = spark.createDataFrame([(1, "train")], "doc_id long, split string")
    c1 = spark.createDataFrame([(1, "one")], "doc_id long, text string")
    publish_corpus_committed(prepared, c1, root, n_shards=1)
    # same schema: fine
    publish_corpus_committed(prepared, c1, root, n_shards=1)
    # drifted schema (text -> int column added): refused...
    c2 = spark.createDataFrame(
        [(1, "one", 5)], "doc_id long, text string, extra int"
    )
    with pytest.raises(ValueError, match="schema drift"):
        publish_corpus_committed(prepared, c2, root, n_shards=1)
    # nothing was written or committed by the refused publish
    assert published_path(spark, root)[1]["v"] == 2
    # ...unless allowed, and then recorded
    counts = publish_corpus_committed(
        prepared, c2, root, n_shards=1, allow_schema_change=True
    )
    assert counts["_version"] == 3
    doc = published_path(spark, root)[1]
    assert doc["schema_changed"] is True
    assert ["extra", "int"] in doc["schema"]


def test_commit_with_retry_serializes_collisions(spark, tmp_path):
    """A writer that loses the version race re-reads and retries with
    the fresh state (the optimistic-concurrency loop)."""
    log = str(tmp_path / "occ")
    calls = []

    def update(version, doc):
        calls.append(version)
        if len(calls) == 1:
            # simulate a concurrent writer sneaking in between our
            # read and our publish attempt
            txlog.publish(spark, log, version + 1, {"live": ["other"]})
        prev = doc["live"] if doc else []
        return {"live": [*prev, f"mine-{version + 1}"]}

    v, payload = txlog.commit_with_retry(spark, log, update)
    assert v == 2
    # the retry SAW the interloper's commit and built on it
    assert payload["live"] == ["other", "mine-2"]
    assert calls == [0, 1]


def test_commit_with_retry_concurrent_threads(spark, tmp_path):
    """4 threads x 3 commits race on one rename-mode log: all 12
    land, each exactly once, every commit built on a fresh read."""
    import threading

    log = str(tmp_path / "race")
    errors = []

    def writer(wid):
        try:
            for i in range(3):
                marker = f"w{wid}-{i}"
                txlog.commit_with_retry(
                    spark, log,
                    lambda v, doc, m=marker: {
                        "live": [*(doc["live"] if doc else []), m]
                    },
                    max_retries=64,
                )
        except Exception as exc:  # surface thread failures to the test
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    version, doc = txlog.read_latest(spark, log)
    assert version == 12
    assert sorted(doc["live"]) == sorted(
        f"w{w}-{i}" for w in range(4) for i in range(3)
    )


def test_vacuum_cleans_orphan_tmp_files(spark, tmp_path):
    log = str(tmp_path / "tmps")
    txlog.publish(spark, log, 1, {"live": "v=1"})
    _write_raw(spark, log, ".manifest-000000000002.deadbeef.tmp", b"crashed")
    removed = txlog.vacuum_manifests(spark, log)
    assert removed == 1
    assert txlog.read_latest(spark, log)[0] == 1


def test_vacuum_grace_window_spares_recent_orphans(spark, tmp_path):
    """With concurrent writers, an unreferenced directory may be an
    in-flight append: vacuum inside the grace window spares it (and
    recent tmp files); grace 0 sweeps it."""
    root = str(tmp_path / "grace")
    log = f"{root}/_commits"
    txlog.publish(spark, log, 1, {"live": ["v=keep"]})
    fs, jroot, jvm = txlog._jfs(spark, root)
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(root, "v=inflight"))
    _write_raw(spark, log, ".manifest-000000000002.abc.tmp", b"inflight")
    # inside the grace window: both survive
    assert txlog.vacuum_versions(spark, root, log, "v=", grace_seconds=3600) == 0
    assert fs.exists(jvm.org.apache.hadoop.fs.Path(root, "v=inflight"))
    # no grace: dead-orphan semantics (the pre-concurrency default)
    assert txlog.vacuum_versions(spark, root, log, "v=") == 1
    assert not fs.exists(jvm.org.apache.hadoop.fs.Path(root, "v=inflight"))


def test_abort_commit_skips_publish(spark, tmp_path):
    log = str(tmp_path / "abort")
    txlog.publish(spark, log, 1, {"live": ["a"]})

    def update(version, doc):
        raise txlog.AbortCommit

    v, doc = txlog.commit_with_retry(spark, log, update)
    assert v == 1 and doc["live"] == ["a"]
    assert txlog.list_versions(spark, log) == [1]  # nothing new published


def test_published_corpus_diff_between_versions(spark, tmp_path):
    from v6spark.pipeline import published_corpus_diff

    root = str(tmp_path / "diffv")
    prepared = spark.createDataFrame(
        [(i, "train") for i in (1, 2, 3)], "doc_id long, split string"
    )
    c1 = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "doc_id long, text string"
    )
    publish_corpus_committed(prepared, c1, root, n_shards=1)
    prepared2 = spark.createDataFrame(
        [(i, "train") for i in (2, 3, 4)], "doc_id long, split string"
    )
    c2 = spark.createDataFrame(
        [(2, "two"), (3, "three CHANGED"), (4, "four")],
        "doc_id long, text string",
    )
    publish_corpus_committed(prepared2, c2, root, n_shards=1)
    got = {
        r["doc_id"]: r["status"]
        for r in published_corpus_diff(spark, root, 1).collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
    # a vacuumed old version raises clearly
    from v6spark.pipeline import vacuum_published

    vacuum_published(spark, root)
    import pytest as _p
    with _p.raises(ValueError, match="retained"):
        published_corpus_diff(spark, root, 1)


def test_manifest_decode_never_raises_on_garbage():
    """_decode is the torn-write defence: ANY byte string must come
    back as a dict (complete) or None (torn) — never an exception
    (hypothesis fuzz, mirroring the media-parser fuzz suite)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=400))
    def check(raw):
        out = txlog._decode(raw)
        assert out is None or isinstance(out, dict)

    check()
    # and a valid encode always round-trips complete
    data = txlog._encode(7, {"live": ["x"], "committed": [1, 2]})
    doc = txlog._decode(data)
    assert doc == {"v": 7, "live": ["x"], "committed": [1, 2]}
    # every truncation of a valid manifest is torn or a valid PREFIX
    # document — never an exception
    for cut in range(len(data)):
        out = txlog._decode(data[:cut])
        assert out is None or isinstance(out, dict)


def test_txlog_model_based_random_histories(spark, tmp_path):
    """Model-based check: random interleavings of commits, torn
    writes, and vacuums — after every step, read_latest must agree
    with a trivial in-memory model of the log (the invariant all the
    committed readers build on)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    op = st.one_of(
        st.tuples(st.just("commit"), st.integers(0, 9)),
        st.tuples(st.just("torn"), st.binary(max_size=30)),
        st.tuples(st.just("vacuum"), st.integers(1, 3)),
    )
    counter = [0]

    @settings(max_examples=12, deadline=None)
    @given(st.lists(op, min_size=1, max_size=8))
    def run(ops):
        counter[0] += 1
        log = str(tmp_path / f"model{counter[0]}")
        model: dict[int, dict] = {}
        for kind, arg in ops:
            if kind == "commit":
                v, payload = txlog.commit_with_retry(
                    spark, log, lambda _v, _d, a=arg: {"mark": a}
                )
                model[v] = {"v": v, **payload}
            elif kind == "torn":
                nxt = (max(model) if model else 0) + 1
                _write_raw(spark, log, f"manifest-{nxt:012d}", arg)
                # a torn write is invisible — unless the random bytes
                # happen to BE a complete manifest (bare-JSON
                # back-compat); mirror the reader's own rule
                doc = txlog._decode(arg)
                if doc is not None:
                    model[nxt] = doc
            else:  # vacuum keep_last=arg
                txlog.vacuum_manifests(spark, log, keep_last=arg)
                for v in sorted(model)[:-arg]:
                    del model[v]
            version, doc = txlog.read_latest(spark, log)
            if model:
                assert version == max(model)
                assert doc == model[version]
            else:
                assert (version, doc) == (0, None)

    run()
