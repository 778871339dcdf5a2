"""WebDataset tar + TFRecord shard publishing: wire-format
correctness (public CRC32C vectors, protobuf Example round-trip),
distributed write/read round-trips, and byte-identical reruns."""

from __future__ import annotations

import glob
import io
import os

import pytest

from v6spark.sources import trainshards as ts


def test_crc32c_public_vectors():
    assert ts.crc32c(b"") == 0x0
    assert ts.crc32c(b"123456789") == 0xE3069283
    assert ts.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert ts.crc32c(b"\xff" * 32) == 0x62A8AB43


def test_example_roundtrip_all_types():
    ex = ts.encode_example({
        "text": b"hello \xff bytes",
        "ids": [1, -2, 3_000_000_000],
        "score": 0.25,
        "tags": ["a", "bb"],
        "floats": [1.5, -2.5],
    })
    back = ts.decode_example(ex)
    assert back["text"] == [b"hello \xff bytes"]
    assert back["ids"] == [1, -2, 3_000_000_000]
    assert back["score"] == [0.25]
    assert back["tags"] == [b"a", b"bb"]
    assert back["floats"] == [1.5, -2.5]
    with pytest.raises(TypeError):
        ts.encode_example({"b": True})
    with pytest.raises(ValueError):
        ts.encode_example({"empty": []})


def test_tfrecord_framing_and_crc_detection():
    b = io.BytesIO()
    ts.write_tfrecord(b, b"first")
    ts.write_tfrecord(b, b"second record")
    assert list(ts.read_tfrecords(b.getvalue())) == [b"first", b"second record"]
    corrupted = bytearray(b.getvalue())
    corrupted[13] ^= 0x01  # flip a payload bit
    with pytest.raises(ValueError, match="CRC"):
        list(ts.read_tfrecords(bytes(corrupted)))


def _corpus(spark, n=40):
    rows = [
        (i, f"document body {i} " * (1 + i % 3), i % 5, float(i) / 7, bytes([i % 256, 255 - i % 256]))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, label int, weight double, payload binary"
    )


def test_webdataset_roundtrip_and_determinism(spark, tmp_path):
    df = _corpus(spark)
    out = str(tmp_path / "wds")
    ts.write_webdataset(df, out, key_col="doc_id", n_shards=4)
    files = sorted(glob.glob(os.path.join(out, "shard-*.tar")))
    assert 1 <= len(files) <= 4
    back = ts.read_webdataset(spark, out)
    rows = back.collect()
    # every row contributed one member per non-key column
    assert len(rows) == 40 * 4
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["key"], {})[r["column"]] = bytes(r["content"])
    assert set(by_key) == {str(i) for i in range(40)}
    assert by_key["7"]["text"] == ("document body 7 " * 2).encode()
    assert by_key["7"]["label"] == b"2"
    assert by_key["7"]["payload"] == bytes([7, 248])
    # rerun -> byte-identical shards (zeroed tar metadata + fixed order)
    digests = {f: open(f, "rb").read() for f in files}
    out2 = str(tmp_path / "wds2")
    ts.write_webdataset(df, out2, key_col="doc_id", n_shards=4)
    for f, blob in digests.items():
        f2 = os.path.join(out2, os.path.basename(f))
        assert open(f2, "rb").read() == blob


def test_tfrecord_shards_roundtrip(spark, tmp_path):
    df = _corpus(spark)
    out = str(tmp_path / "tfr")
    ts.write_tfrecord_shards(df, out, key_col="doc_id", n_shards=3)
    back = ts.read_tfrecord_shards(spark, out).collect()
    assert len(back) == 40
    examples = {ts.decode_example(bytes(r["record"]))["doc_id"][0]: ts.decode_example(bytes(r["record"])) for r in back}
    assert set(examples) == set(range(40))
    ex = examples[11]
    assert ex["text"] == [("document body 11 " * 3).encode()]
    assert ex["label"] == [1]
    assert abs(ex["weight"][0] - 11 / 7) < 1e-6
    assert ex["payload"] == [bytes([11, 244])]
    # shard assignment is keyed-hash deterministic: same shard labels
    out2 = str(tmp_path / "tfr2")
    ts.write_tfrecord_shards(df, out2, key_col="doc_id", n_shards=3)
    a = {os.path.basename(f): open(f, "rb").read()
         for f in glob.glob(os.path.join(out, "*.tfrecord"))}
    b = {os.path.basename(f): open(f, "rb").read()
         for f in glob.glob(os.path.join(out2, "*.tfrecord"))}
    assert a == b


def test_compressed_shards_roundtrip(spark, tmp_path):
    """compress=True: .tar.gz / .tfrecord.gz shards (gzip mtime=0 for
    byte-identical reruns); readers auto-detect by extension."""
    df = _corpus(spark, 20)
    wds, tfr = str(tmp_path / "wdsz"), str(tmp_path / "tfrz")
    ts.write_webdataset(df, wds, key_col="doc_id", n_shards=2, compress=True)
    files = sorted(glob.glob(os.path.join(wds, "*.tar.gz")))
    assert files and all(open(f, "rb").read(2) == b"\x1f\x8b" for f in files)
    back = ts.read_webdataset(spark, wds)
    assert back.count() == 20 * 4
    ts.write_tfrecord_shards(df, tfr, key_col="doc_id", n_shards=2, compress=True)
    recs = ts.read_tfrecord_shards(spark, tfr).collect()
    ids = {ts.decode_example(bytes(r["record"]))["doc_id"][0] for r in recs}
    assert ids == set(range(20))
    # deterministic compressed rerun
    wds2 = str(tmp_path / "wdsz2")
    ts.write_webdataset(df, wds2, key_col="doc_id", n_shards=2, compress=True)
    for f in files:
        assert open(f, "rb").read() == open(
            os.path.join(wds2, os.path.basename(f)), "rb"
        ).read()


def test_publish_corpus_per_split(spark, tmp_path):
    """pipeline verdict -> per-split shard directories in all three
    formats; only survivors publish."""
    from v6spark.pipeline import prepare_training_corpus, publish_corpus

    docs = spark.createDataFrame(
        [(i, f"document body number {i} with several words " * 3) for i in range(30)]
        + [(100, "document body number 0 with several words " * 3)],  # exact dup loser
        "doc_id long, text string",
    )
    prepared = prepare_training_corpus(
        docs, split_weights={"train": 0.8, "valid": 0.2}
    )
    out = str(tmp_path / "pub")
    counts = publish_corpus(prepared, docs, out, fmt="webdataset", n_shards=2)
    assert set(counts) <= {"train", "valid"} and sum(counts.values()) == 30
    assert 100 not in {  # the dup loser never publishes
        int(r["key"]) for r in ts.read_webdataset(
            spark, os.path.join(out, "split=train")).collect()
    }
    tfr = str(tmp_path / "pub_tfr")
    counts2 = publish_corpus(prepared, docs, tfr, fmt="tfrecord", n_shards=2)
    assert counts2 == counts
    pq = str(tmp_path / "pub_pq")
    counts3 = publish_corpus(prepared, docs, pq, fmt="parquet", n_shards=2)
    assert counts3 == counts
    assert spark.read.parquet(os.path.join(pq, "split=train")).count() == counts["train"]
