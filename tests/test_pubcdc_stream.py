"""Row-level CDC through plain readStream (format("pubcorpus")).

The stream must land IDENTICAL frames to the foreachBatch composition
(publog stream + published_corpus_changes) over a real DML lifecycle
— publish, upsert, DV retract, compaction (zero rows), COW retract,
reshard — with exactly-once semantics: replaying a window from a
checkpoint regenerates byte-identical rows, and a caught-up restart
emits nothing.
"""
from __future__ import annotations

import shutil

import pytest

from v6spark.pipeline import (
    compact_published,
    publish_corpus_committed,
    published_corpus_changes,
    read_published_corpus,
    reshard_published,
    retract_from_published,
    upsert_into_published,
)
from v6spark.sources.pubcdc import stream_published_changes


def _publish(spark, tmp_path, n=40, n_shards=4):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text",
        "cast(id % 7 as long) as day",
    )
    prepared = spark.range(n).selectExpr(
        "id as doc_id",
        "case when id % 10 = 0 then 'valid' else 'train' end as split",
    )
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=n_shards)
    return root


def _rows(df_or_rows):
    rows = (
        df_or_rows.collect()
        if hasattr(df_or_rows, "collect") else df_or_rows
    )
    if not rows:
        return []
    cols = sorted(rows[0].asDict())
    return sorted(
        tuple(r[c] for c in cols) for r in rows
    )


def _step(spark, root, ckpt, starting_version=0):
    """One availableNow run: processes every pending version window,
    returns exactly that run's rows (foreachBatch — the memory sink
    cannot recover from a checkpoint)."""
    collected: list = []

    def sink(df, _bid):
        collected.extend(df.collect())

    df = stream_published_changes(
        spark, root, starting_version=starting_version
    )
    q = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return collected


def test_stream_matches_changes_foreach_batch(spark, tmp_path):
    root = _publish(spark, tmp_path)                        # v1
    ckpt = str(tmp_path / "ckpt")

    # bootstrap (startingVersion=0): snapshot as inserts at v1
    got = _step(spark, root, ckpt)
    snap = read_published_corpus(spark, root)
    assert len(got) == snap.count()
    assert {r["_change_type"] for r in got} == {"insert"}
    assert {r["_commit_version"] for r in got} == {1}
    assert sorted(r["doc_id"] for r in got) == sorted(
        r["doc_id"] for r in snap.collect()
    )
    assert "shard" not in got[0].asDict()

    # upsert (v2): one revision (+split move) and one new row
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(3, "rev 3", 99, "valid"), (1003, "new", 100, "train")],
            "doc_id long, text string, day long, split string",
        ),
    )
    got = _step(spark, root, ckpt)
    assert _rows(got) == _rows(published_corpus_changes(spark, root, 1, 2))
    by_type = {}
    for r in got:
        by_type.setdefault(r["_change_type"], []).append(r["doc_id"])
    assert by_type["insert"] == [1003]
    assert by_type["update_preimage"] == [3]  # split move = update
    assert by_type["update_postimage"] == [3]

    # DV retract (v3): deletes surface from the vector delta alone
    retract_from_published(
        spark, root, "doc_id in (11, 21)", strategy="dv"
    )
    got = _step(spark, root, ckpt)
    assert _rows(got) == _rows(published_corpus_changes(spark, root, 2, 3))
    assert sorted(r["doc_id"] for r in got) == [11, 21]
    assert {r["_change_type"] for r in got} == {"delete"}

    # compaction (v4): every file rewritten, net change ZERO rows
    compact_published(spark, root)
    got = _step(spark, root, ckpt)
    assert got == []
    assert published_corpus_changes(spark, root, 3, 4) is None or (
        published_corpus_changes(spark, root, 3, 4).count() == 0
    )

    # COW retract (v5)
    retract_from_published(spark, root, "doc_id = 7")
    got = _step(spark, root, ckpt)
    assert _rows(got) == _rows(published_corpus_changes(spark, root, 4, 5))
    assert [r["doc_id"] for r in got] == [7]

    # reshard (v6): sharding changes → key-space-sliced partitions
    # (>= 8-way since r11), identical (zero-row) net diff
    reshard_published(spark, root, n_shards=2)
    got = _step(spark, root, ckpt)
    assert _rows(got) == _rows(
        published_corpus_changes(spark, root, 5, 6) or []
    )

    # post-reshard DML keeps flowing
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(1004, "after reshard", 1, "train")],
            "doc_id long, text string, day long, split string",
        ),
    )
    got = _step(spark, root, ckpt)
    assert _rows(got) == _rows(published_corpus_changes(spark, root, 6, 7))
    assert [r["doc_id"] for r in got] == [1004]


def test_exactly_once_replay_and_caught_up_restart(spark, tmp_path):
    root = _publish(spark, tmp_path, n=30)                  # v1
    ckpt = str(tmp_path / "ckpt")
    _step(spark, root, ckpt)                                # consume v1

    frozen = str(tmp_path / "ckpt_frozen")
    shutil.copytree(ckpt, frozen)

    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(5, "rev 5", 42, "train")],
            "doc_id long, text string, day long, split string",
        ),
    )                                                       # v2
    first = _step(spark, root, ckpt)
    assert len(first) == 2  # update pre+post

    # epoch replay: a restart from the PRE-WINDOW checkpoint
    # regenerates byte-identical rows (partitions() is a pure
    # function of the endpoint manifests)
    replay = _step(spark, root, frozen)
    assert _rows(replay) == _rows(first)

    # caught-up restart: nothing new → zero rows, no duplicates
    assert _step(spark, root, ckpt) == []


def test_tail_only_and_option_validation(spark, tmp_path):
    from v6spark.sources.pubcorpus import register_pubcorpus_source

    root = _publish(spark, tmp_path, n=20)                  # v1
    retract_from_published(spark, root, "doc_id = 3")       # v2
    ckpt = str(tmp_path / "ckpt")
    # startingVersion = current: the bootstrap snapshot is skipped
    got = _step(spark, root, ckpt, starting_version=2)
    assert got == []
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(99, "tail", 1, "train")],
            "doc_id long, text string, day long, split string",
        ),
    )                                                       # v3
    got = _step(spark, root, ckpt, starting_version=2)
    assert [(r["doc_id"], r["_change_type"]) for r in got] == [
        (99, "insert"),
    ]

    register_pubcorpus_source(spark)
    # without startingVersion the stream refuses at start (the batch
    # schema would not match the change rows)
    q = (
        spark.readStream.format("pubcorpus").load(root)
        .writeStream.foreachBatch(lambda d, b: None)
        .option("checkpointLocation", str(tmp_path / "ckpt_bad"))
        .trigger(availableNow=True).start()
    )
    with pytest.raises(Exception, match="startingVersion"):
        q.awaitTermination()
    with pytest.raises(Exception, match="readStream option"):
        spark.read.format("pubcorpus").option(
            "startingVersion", 0
        ).load(root).collect()
    with pytest.raises(Exception, match="does not apply"):
        (spark.readStream.format("pubcorpus")
         .option("startingVersion", 0)
         .option("columns", "doc_id").load(root))


def test_batch_change_window_matches_stream_and_python(spark, tmp_path):
    """option("changesFrom", a)/("changesTo", b) through spark.read =
    published_corpus_changes(a, b) = what the stream emitted for the
    same window."""
    from v6spark.sources.pubcdc import read_published_changes_sql

    root = _publish(spark, tmp_path)                        # v1
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(5, "rev 5", 42, "train"), (900, "new", 1, "valid")],
            "doc_id long, text string, day long, split string",
        ),
    )                                                       # v2
    retract_from_published(spark, root, "doc_id = 11")      # v3

    got = read_published_changes_sql(spark, root, 1, 3)
    ref = published_corpus_changes(spark, root, 1, 3)
    assert sorted(got.columns) == sorted(ref.columns)
    assert _rows(got) == _rows(ref)
    # changesTo defaults to latest
    got_latest = read_published_changes_sql(spark, root, 2)
    ref_latest = published_corpus_changes(spark, root, 2, 3)
    assert _rows(got_latest) == _rows(ref_latest)
    # SQL surface
    got.createOrReplaceTempView("chg_v")
    n = spark.sql(
        "SELECT count(*) AS n FROM chg_v WHERE _change_type = 'delete'"
    ).collect()[0]["n"]
    assert n == 1
    # validation
    with pytest.raises(Exception, match="below changesFrom"):
        read_published_changes_sql(spark, root, 3, 1).collect()
    with pytest.raises(Exception, match="exclusive"):
        (spark.read.format("pubcorpus")
         .option("changesFrom", 1).option("startingVersion", 1)
         .load(root))
    with pytest.raises(Exception, match="does not apply"):
        (spark.read.format("pubcorpus")
         .option("changesFrom", 1).option("columns", "doc_id")
         .load(root))


def test_batch_window_pins_its_default_endpoint(spark, tmp_path):
    """changesTo defaulted to latest is resolved at CONSTRUCTION:
    a later commit must not change what an existing DataFrame reads
    (relation identity, same discipline as the table reader)."""
    root = _publish(spark, tmp_path, n=20)                  # v1
    retract_from_published(spark, root, "doc_id = 3")       # v2
    from v6spark.sources.pubcdc import read_published_changes_sql

    df = read_published_changes_sql(spark, root, 1)         # (1, 2]
    assert df.count() == 1
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(500, "late", 1, "train")],
            "doc_id long, text string, day long, split string",
        ),
    )                                                       # v3
    assert df.count() == 1  # still (1, 2], not (1, 3]
    with pytest.raises(Exception, match=">= 0"):
        read_published_changes_sql(spark, root, -1).collect()


def test_vals_eq_struct_and_nan():
    """Null-safe struct equality parity: NaN == NaN inside nested
    dicts/lists (a compaction window must net to zero rows even for
    NaN-bearing struct columns)."""
    from v6spark.sources.pubcdc import _vals_eq

    nan = float("nan")
    assert _vals_eq({"a": nan, "b": [1, nan]}, {"a": nan, "b": [1, nan]})
    assert not _vals_eq({"a": nan}, {"a": 1.0})
    assert not _vals_eq({"a": 1}, {"b": 1})
    assert _vals_eq([{"x": nan}], [{"x": nan}])
    assert not _vals_eq({"a": 1}, None)


def test_nested_columns_use_the_exact_row_path(spark, tmp_path):
    """Array-typed columns aren't vectorizable — the per-row
    classifier must produce the same frames (incl. NaN-inside-array
    suppression on a no-change rewrite)."""
    docs = spark.range(20).selectExpr(
        "id as doc_id",
        "array(cast(id as double), cast('NaN' as double)) as emb",
    )
    prepared = spark.range(20).selectExpr(
        "id as doc_id", "'train' as split"
    )
    root = str(tmp_path / "nested")
    publish_corpus_committed(prepared, docs, root, n_shards=2)  # v1
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(3, [99.0, 100.0], "train"), (500, [1.0, 2.0], "train")],
            "doc_id long, emb array<double>, split string",
        ),
    )                                                           # v2
    compact_published(spark, root)                              # v3

    ckpt = str(tmp_path / "ckpt")
    got = _step(spark, root, ckpt, starting_version=1)
    ref = published_corpus_changes(spark, root, 1, 3)

    def norm(rows):  # plain == can't compare NaN-bearing rows
        import math

        def fix(v):
            if isinstance(v, float) and math.isnan(v):
                return "NaN"
            if isinstance(v, list):
                return tuple(fix(x) for x in v)
            return v

        rows = rows.collect() if hasattr(rows, "collect") else rows
        return sorted(
            tuple(fix(r[c]) for c in sorted(r.asDict())) for r in rows
        )

    assert norm(got) == norm(ref)
    by_type = {}
    for r in got:
        by_type.setdefault(r["_change_type"], []).append(r["doc_id"])
    assert by_type["insert"] == [500]
    assert by_type["update_postimage"] == [3]
    # NaN-bearing unchanged rows were suppressed (compaction + the
    # 18 untouched rows emit nothing despite NaN != NaN in plain ==)
    assert len(got) == 3


def test_stream_on_a_branch(spark, tmp_path):
    """option("branch") tails the branch's manifest chain: branch DML
    flows, main stays silent (and vice versa)."""
    from v6spark.pipeline import create_published_branch
    from v6spark.sources.pubcdc import stream_published_changes

    root = _publish(spark, tmp_path, n=20)                  # v1
    create_published_branch(spark, root, "exp")
    retract_from_published(spark, root, "doc_id = 3", branch="exp")

    rows: list = []
    q = (
        stream_published_changes(
            spark, root, starting_version=1, branch="exp"
        )
        .writeStream.foreachBatch(lambda d, b: rows.extend(d.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt_b"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert [(r["doc_id"], r["_change_type"]) for r in rows] == [
        (3, "delete"),
    ]
    # main's stream from the same version sees nothing
    assert _step(spark, root, str(tmp_path / "ckpt_m"),
                 starting_version=1) == []


def test_schema_drift_mid_stream_fails_loudly(spark, tmp_path):
    """A schema evolution committed mid-stream must FAIL the next
    window (Delta CDF fail-on-schema-change): comparing rows over the
    pinned (old) columns would silently drop evolved-column-only
    updates. Restarting re-pins the new schema and works."""
    from pyspark.sql.types import StructType

    from v6spark.pipeline import evolve_published_schema
    from v6spark.sources.pubcdc import (
        PublishedChangesStreamReader,
        change_schema_ddl,
    )
    from v6spark.sources.pubcorpus import _log_dir, _read_doc

    root = _publish(spark, tmp_path, n=20, n_shards=2)
    v1_doc = _read_doc(_log_dir(root, None), 1)
    pinned = StructType.fromDDL(change_schema_ddl(v1_doc))
    reader = PublishedChangesStreamReader(root, pinned, 1)

    evolve_published_schema(spark, root, [("lang", "string")])
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(3, "body 3", 3, "en", "train")],
            "doc_id long, text string, day long, lang string, "
            "split string",
        ),
    )
    with pytest.raises(ValueError, match="changed mid-stream"):
        reader.partitions({"version": 1}, {"version": 3})
    # a restart pins the evolved schema and reads the window fine
    v3_doc = _read_doc(_log_dir(root, None), 3)
    fresh = PublishedChangesStreamReader(
        root, StructType.fromDDL(change_schema_ddl(v3_doc)), 1
    )
    parts = fresh.partitions({"version": 2}, {"version": 3})
    rows = [r for p in parts for b in fresh.read(p)
            for r in b.to_pylist()]
    assert {r["_change_type"] for r in rows} == {
        "update_preimage", "update_postimage"
    }
    assert any(r["lang"] == "en" for r in rows)


def test_duplicate_keys_refused_by_both_classifiers():
    """searchsorted (vector) and the row dict pair ONE old row per
    key: duplicate keys (possible via blind SQL appends) must raise
    the key-uniqueness contract error, not misreport the extra copy
    as delete/insert."""
    import pyarrow as pa

    from v6spark.sources.pubcdc import (
        _classify_rows,
        _classify_vector,
    )

    def tab(ids, texts):
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "text": pa.array(texts, pa.string())}
        )

    target = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()),
        ("_change_type", pa.string()), ("_commit_version", pa.int64()),
    ])
    fields = [target.field(0), target.field(1)]
    args = (fields, 0, 7, target, pa.string(), pa.int64())

    clean_old, dup_new = tab([1, 2], ["a", "b"]), tab(
        [2, 2, 3], ["b", "B", "c"]
    )
    with pytest.raises(ValueError, match="duplicate"):
        list(_classify_vector(clean_old, dup_new, *args))
    with pytest.raises(ValueError, match="duplicate"):
        list(_classify_vector(dup_new, clean_old, *args))
    with pytest.raises(ValueError, match="duplicate"):
        list(_classify_rows(clean_old, dup_new, *args))
    # unique keys still classify normally
    out = [r for b in _classify_vector(
        clean_old, tab([2, 3], ["B", "c"]), *args
    ) for r in b.to_pylist()]
    assert sorted(r["_change_type"] for r in out) == [
        "delete", "insert", "update_postimage", "update_preimage"
    ]


def test_duplicate_keys_surface_through_compact_window(spark, tmp_path):
    """End-to-end: a blind SQL append duplicates a key; the compact
    rewrite makes both copies land in one diff window — the stream
    must refuse, not emit a wrong classification."""
    from v6spark.pipeline import compact_published
    from v6spark.sources.pubcorpus import register_pubcorpus_source

    root = _publish(spark, tmp_path, n=20, n_shards=2)
    register_pubcorpus_source(spark)
    (spark.createDataFrame(
        [(3, "duplicate of 3", 99, "train")],
        "doc_id long, text string, day long, split string",
    ).write.format("pubcorpus").mode("append").save(root))
    compact_published(spark, root)
    from v6spark.sources.pubcdc import read_published_changes_sql

    with pytest.raises(Exception, match="duplicate"):
        read_published_changes_sql(spark, root, 2, 3).collect()


def test_timestamp_change_windows_match_version_windows(spark, tmp_path):
    """changesFromTimestamp/changesToTimestamp (and the streaming
    startingTimestamp) resolve to exactly the version windows their
    integer twins name — Delta CDF timestamp parity."""
    import time as _time

    from v6spark.sources.pubcorpus import register_pubcorpus_source

    root = _publish(spark, tmp_path, n=20, n_shards=2)
    t1 = _time.time()
    _time.sleep(0.6)
    retract_from_published(spark, root, "doc_id < 5")        # v2
    _time.sleep(0.6)
    t2 = _time.time()
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(100, "new", 1, "train")],
            "doc_id long, text string, day long, split string",
        ),
    )                                                        # v3
    register_pubcorpus_source(spark)

    def win(**opts):
        r = spark.read.format("pubcorpus")
        for k, v in opts.items():
            r = r.option(k, str(v))
        return _rows(r.load(root).collect())

    # (t1, latest] == (v1, latest]
    assert win(changesFromTimestamp=t1) == win(changesFrom=1)
    # (t1, t2] == (v1, v2]
    assert win(changesFromTimestamp=t1, changesToTimestamp=t2) == win(
        changesFrom=1, changesTo=2
    )
    # lower bound before the log bootstraps (changesFrom=0 semantics)
    assert win(changesFromTimestamp=t1 - 3600, changesToTimestamp=t1) \
        == win(changesFrom=0, changesTo=1)
    # exclusivity + bad upper bound are clear errors
    with pytest.raises(Exception, match="exclusive"):
        win(changesFrom=1, changesFromTimestamp=t1)
    with pytest.raises(Exception, match="no committed version"):
        win(changesFrom=1, changesToTimestamp=t1 - 3600)

    # streaming startingTimestamp == startingVersion twin
    collected: list = []
    q = (
        spark.readStream.format("pubcorpus")
        .option("startingTimestamp", str(t2)).load(root)
        .writeStream.foreachBatch(
            lambda d, b: collected.extend(d.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_ts"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    ref = spark.read.format("pubcorpus").option(
        "changesFrom", "2"
    ).load(root).collect()
    assert _rows(collected) == _rows(ref)


def test_timestamp_lower_bound_includes_at_timestamp_commit(
    spark, tmp_path
):
    """Delta CDF startingTimestamp is at-or-AFTER inclusive: a window
    started exactly at a commit's recorded time must include that
    commit (the floor is strictly-before, not at-or-before)."""
    from v6spark.pipeline import published_history
    from v6spark.sources.pubcorpus import register_pubcorpus_source

    root = _publish(spark, tmp_path, n=20, n_shards=2)       # v1
    retract_from_published(spark, root, "doc_id < 5")        # v2
    register_pubcorpus_source(spark)
    t_v2 = {
        r.version: r.timestamp
        for r in published_history(spark, root).collect()
    }[2]
    got = _rows(
        spark.read.format("pubcorpus")
        .option("changesFromTimestamp", str(t_v2))
        .load(root).collect()
    )
    ref = _rows(
        spark.read.format("pubcorpus").option("changesFrom", "1")
        .load(root).collect()
    )
    assert got == ref and len(got) == 5  # v2's deletes are inside


def test_posture_change_window_decomposes(spark, tmp_path):
    """A reshard (hash-posture change) window classifies across >= 8
    key-space partitions instead of the old single-task fallback:
    each partition owns the keys whose refined new-posture shard
    equals its slot (operators/xxh64 parity hash), the new side is
    directory-pruned to one shard per slot, and the union of slices
    reproduces the single-partition classification exactly."""
    from v6spark.sources.pubcdc import read_published_changes_sql

    root = _publish(spark, tmp_path, n=40, n_shards=4)       # v1
    reshard_published(spark, root, n_shards=6)               # v2
    upsert_into_published(                                   # v3
        spark, root,
        spark.createDataFrame(
            [(1004, "fresh", 1, "train"), (3, "edited", 3, "train")],
            "doc_id long, text string, day long, split string",
        ),
    )

    # pure reshard window (1, 2]: >= 8 planner partitions, zero rows
    w = read_published_changes_sql(spark, root, 1, 2)
    assert w.rdd.getNumPartitions() >= 8
    assert w.count() == 0

    # endpoint diff (1, 3] spans the posture change AND real DML: the
    # decomposed classification must equal the Spark-side oracle
    got = _rows(read_published_changes_sql(spark, root, 1, 3))
    ref = _rows(published_corpus_changes(spark, root, 1, 3))
    assert got == ref and len(got) >= 3  # insert + update pre/post


@pytest.mark.parametrize("n_to", [6, 12])
def test_posture_change_slices_partition_key_space(spark, tmp_path, n_to):
    """Every key belongs to EXACTLY one posture-change partition's
    key slice (no lost or double-classified rows by construction) —
    through BOTH slice strategies: refined-hash (n_new < 8 -> modulus
    n_new*m) and shard-group (n_new >= 8 -> mod min(n_new, 16))."""
    from v6spark.operators.xxh64 import shard_of
    from v6spark.sources.pubcdc import read_published_changes_sql

    root = _publish(spark, tmp_path, n=40, n_shards=4)       # v1
    reshard_published(spark, root, n_shards=n_to)            # v2
    w = read_published_changes_sql(spark, root, 1, 2)
    # reach the planner directly for the filter specs
    from v6spark.sources.pubcdc import PublishedChangesBatchReader

    rdr = PublishedChangesBatchReader(root, w.schema, 1, 2)
    specs = [p.key_filter for p in rdr.partitions()]
    assert len(specs) >= 8 and all(s is not None for s in specs)
    group_mod = specs[0][3]
    assert sorted(s[4] for s in specs) == list(range(group_mod))
    for key in (0, 1, 7, 39, 1004):
        owners = [
            s for s in specs
            if shard_of(key, s[0], s[2], s[1]) % s[3] == s[4]
        ]
        assert len(owners) == 1, key
