"""Per-file key Bloom sidecars (operators/keybloom.py + the
pipeline.publish_corpus_committed(key_bloom=True) index): point
lookups probe KB filters driver-side and open only files that claim
the key — on a hash-sharded layout where key RANGES are near-full and
min/max stats cannot refute a point key.  False positives cost an
extra file read; false negatives are impossible (build and probe
share one Python blake2b hashing, no JVM hash drift)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from v6spark.operators.keybloom import (
    build_file_blooms,
    key_bytes,
    m_bits_for,
    might_contain,
    positions,
)
from v6spark.pipeline import (
    compact_published,
    promote_staged,
    publish_corpus_committed,
    read_published_corpus,
    read_published_keys,
    retract_from_published,
    stage_corpus_publish,
    upsert_into_published,
)

# ---------------------------------------------------------------- unit


def test_key_encoding_and_positions_deterministic():
    assert key_bytes(5) == b"\x00\x00\x00\x00\x00\x00\x00\x05"
    assert key_bytes("doc-7") == b"doc-7"
    assert key_bytes(True) is None  # bools are not keys
    assert key_bytes(None) is None
    assert key_bytes(1.5) is None
    assert key_bytes(2**70) is None  # outside int64
    m = 4096
    p1, p2 = positions(42, m), positions(42, m)
    assert p1 == p2 and len(p1) == 7 and all(0 <= p < m for p in p1)
    assert positions("x", m) != positions("y", m)
    assert positions(1.5, m) is None


def test_bloom_false_positive_rate_sane():
    import numpy as np

    m = m_bits_for(1000, 1)
    arr = np.zeros(m // 8, np.uint8)
    for k in range(0, 2000, 2):  # members: even ints
        for p in positions(k, m):
            arr[p >> 3] |= np.uint8(1 << (p & 7))
    bloom = arr.tobytes()
    assert all(might_contain(bloom, k, m) for k in range(0, 2000, 2))
    fp = sum(might_contain(bloom, k, m) for k in range(1, 2000, 2))
    assert fp < 50  # ~1% design rate, generous margin


# ------------------------------------------------------------ integration


def _corpus(spark, n=48, n_shards=8, bloom=True):
    prepared = spark.createDataFrame(
        [(2 * i, "train" if i % 4 else "valid") for i in range(n)],
        "doc_id long, split string",
    )
    content = spark.createDataFrame(
        [(2 * i, f"document body {i:04d}") for i in range(n)],
        "doc_id long, text string",
    )
    return prepared, content


def _publish(spark, root, bloom=True, **kw):
    prepared, content = _corpus(spark)
    return publish_corpus_committed(
        prepared, content, root, n_shards=8, key_bloom=bloom, **kw
    )


def _lookup(spark, root, keys, **kw):
    seen: dict[str, list] = {}
    df = read_published_keys(
        spark, root, keys,
        _scan_observer=lambda s, fl: seen.setdefault(s, fl), **kw
    )
    rows = df.orderBy("doc_id").collect()
    return rows, sum(len(fl) for fl in seen.values())


def test_point_lookup_opens_fewer_files_with_blooms(spark, tmp_path):
    root_b = str(tmp_path / "bloomed")
    root_p = str(tmp_path / "plain")
    _publish(spark, root_b, bloom=True)
    _publish(spark, root_p, bloom=False)

    keys = [8, 34]  # two present even keys
    rows_b, opened_b = _lookup(spark, root_b, keys)
    rows_p, opened_p = _lookup(spark, root_p, keys)
    assert [r["doc_id"] for r in rows_b] == keys
    assert [(r["doc_id"], r["text"], r["split"]) for r in rows_b] == [
        (r["doc_id"], r["text"], r["split"]) for r in rows_p
    ]
    # each key lives in exactly one file; blooms prune the other-split
    # candidates that min/max stats cannot refute
    assert opened_b <= opened_p
    assert opened_b <= len(keys) + 1  # +1 generous fp slack

    # ABSENT key inside the live range: stats can't refute (ranges
    # straddle it), the bloom answers definitively
    rows_abs, opened_abs = _lookup(spark, root_b, [9])  # odd: never published
    assert rows_abs == []
    assert opened_abs == 0


def test_blooms_follow_upsert_and_cow_retract(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _publish(spark, root, bloom=True)
    upd = spark.createDataFrame(
        [(8, "edited body", None), (1001, "new doc", "train")],
        "doc_id long, text string, split string",
    )
    res = upsert_into_published(spark, root, upd, key_col="doc_id")
    assert res["rows_updated"] == 1 and res["rows_inserted"] == 1

    rows, opened = _lookup(spark, root, [8, 1001])
    assert [(r["doc_id"], r["text"]) for r in rows] == [
        (8, "edited body"), (1001, "new doc"),
    ]
    assert opened <= 3
    # the OLD copy of key 8's file was rewritten; its bloom entry in
    # the original sidecar refers to a dead file and must not resurrect
    # stale bytes — the manifest file list governs, blooms only prune

    res = retract_from_published(spark, root, "doc_id = 1001")
    assert res["rows_removed"] == 1
    rows, _ = _lookup(spark, root, [1001])
    assert rows == []
    rows, _ = _lookup(spark, root, [8])
    assert [r["text"] for r in rows] == ["edited body"]


def test_blooms_with_dv_retract_and_compact(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _publish(spark, root, bloom=True)
    res = retract_from_published(spark, root, "doc_id = 34", strategy="dv")
    assert res["rows_removed"] == 1
    # the bloom is a superset (file may open) but MOR drops the row
    rows, _ = _lookup(spark, root, [34])
    assert rows == []

    assert compact_published(spark, root) is not None
    rows, opened = _lookup(spark, root, [8, 40])
    assert [r["doc_id"] for r in rows] == [8, 40]
    assert opened <= 3
    rows, opened = _lookup(spark, root, [34])  # retracted + compacted away
    assert rows == [] and opened == 0


def test_blooms_survive_promotion(spark, tmp_path):
    root = str(tmp_path / "corpus")
    prepared, content = _corpus(spark)
    name = stage_corpus_publish(
        prepared, content, root, name="cand", n_shards=8, key_bloom=True
    )
    promote_staged(spark, root, name)
    rows, opened = _lookup(spark, root, [8])
    assert [r["doc_id"] for r in rows] == [8]
    assert opened <= 2
    rows, opened = _lookup(spark, root, [9])
    assert rows == [] and opened == 0


def test_string_keys_bloom(spark, tmp_path):
    root = str(tmp_path / "corpus")
    prepared = spark.createDataFrame(
        [(f"doc-{i:03d}", "train") for i in range(32)],
        "doc_id string, split string",
    )
    content = spark.createDataFrame(
        [(f"doc-{i:03d}", f"body {i}") for i in range(32)],
        "doc_id string, text string",
    )
    publish_corpus_committed(
        prepared, content, root, n_shards=4, key_bloom=True
    )
    rows, opened = _lookup(spark, root, ["doc-007"])
    assert [r["text"] for r in rows] == ["body 7"]
    assert opened <= 2
    rows, opened = _lookup(spark, root, ["doc-999"])
    assert rows == [] and opened == 0


def test_bloom_tables_survive_file_level_vacuum(spark, tmp_path):
    from v6spark.pipeline import vacuum_published_files

    root = str(tmp_path / "corpus")
    _publish(spark, root, bloom=True)
    upd = spark.createDataFrame(
        [(8, "edited", None)], "doc_id long, text string, split string"
    )
    upsert_into_published(spark, root, upd, key_col="doc_id")
    # retention drops v1 as a manifest, but v1's data files AND its
    # bloom sidecar are still referenced by the retained v2 manifest
    vacuum_published_files(spark, root, keep_last=1)
    rows, opened = _lookup(spark, root, [8])
    assert [r["text"] for r in rows] == ["edited"]
    # absent key: blooms must still answer (the sweep must not have
    # deleted the referenced sidecar tables)
    rows, opened = _lookup(spark, root, [9])
    assert rows == [] and opened == 0


def test_key_bloom_validates_key_type_before_writing(spark, tmp_path):
    prepared = spark.createDataFrame(
        [(1.5, "train")], "doc_id double, split string"
    )
    content = spark.createDataFrame(
        [(1.5, "x")], "doc_id double, text string"
    )
    root = str(tmp_path / "c")
    with pytest.raises(ValueError, match="int/string key"):
        publish_corpus_committed(
            prepared, content, root, key_bloom=True
        )
    import os

    assert not os.path.exists(root)  # nothing was written


def test_bloom_and_sketches_share_one_transaction(spark, tmp_path):
    # key_bloom + sketch_specs land under the SAME manifest commit: a
    # crash between them leaves neither visible
    from v6spark.pipeline import read_published_sketch

    root = str(tmp_path / "corpus")
    prepared, content = _corpus(spark)
    with pytest.raises(RuntimeError, match="injected crash"):
        publish_corpus_committed(
            prepared, content, root, n_shards=8, key_bloom=True,
            sketch_specs={"docs": {"kind": "hll", "expr": "doc_id"}},
            _fail_before_sketches=True,
        )
    assert read_published_corpus(spark, root) is None  # nothing visible

    publish_corpus_committed(
        prepared, content, root, n_shards=8, key_bloom=True,
        sketch_specs={"docs": {"kind": "hll", "expr": "doc_id"}},
    )
    rows, opened = _lookup(spark, root, [8])
    assert len(rows) == 1 and opened <= 2
    assert read_published_sketch(spark, root, "docs") is not None


def test_key_bloom_refuses_bad_inputs(spark, tmp_path):
    prepared, content = _corpus(spark)
    with pytest.raises(ValueError, match="parquet"):
        publish_corpus_committed(
            prepared, content, str(tmp_path / "w"), fmt="webdataset",
            key_bloom=True,
        )
    # un-bloomable key type fails the BUILD (a partial filter would
    # turn fp into dropped rows)
    df = spark.range(4).select(
        (F.col("id") + F.lit(0.5)).alias("k"),
        F.lit("f1").alias("__file"),
    )
    with pytest.raises(Exception, match="not.*bloomable|bloomable"):
        build_file_blooms(df, "k", 1024)
