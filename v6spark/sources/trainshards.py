"""Training-shard interchange formats: WebDataset tar + TFRecord.

Parquet shards (operators/packing.py:write_training_shards) cover
Spark-to-Spark handoff; actual training stacks consume WebDataset
(tar archives of ``{key}.{ext}`` members — the multimodal loader
format) and TFRecord (length-delimited ``tf.train.Example`` records
with CRC32C framing).  Both are implemented here dependency-free:
stdlib ``tarfile``/``struct`` plus a hand-rolled protobuf wire
encoder for the three-field Example schema (the wire format is
public and tiny: varint tags, length-delimited submessages).

Scale shape:

- WRITE: ``repartition(n_shards, shard)`` hash-co-locates each
  shard, then ``foreachPartition`` STREAMS rows into per-shard
  files — no shard blob is ever materialized in memory, so shard
  size is bounded by storage, not executor heap.  Rows are
  pre-sorted with ``sortWithinPartitions`` and tar metadata is
  zeroed (mtime/uid/gid), so reruns are byte-identical —
  resumable publishing, same contract as the parquet path.
- READ: one task per shard file via Spark's ``binaryFile`` source,
  expanded to sample rows in ``mapInPandas`` — the natural
  parallelism is the shard count, which the writer chose to match
  the cluster.  (A shard must fit in one executor's memory on READ;
  writers should size ``n_shards`` for ~100 MB-1 GB shards, the
  same rule every WebDataset/TFRecord loader applies.)

The writers place files under a local/shared filesystem path (on a
real cluster: a mounted DFS/object store path — executor-local
writes land on whatever storage backs the path).
"""

from __future__ import annotations

import gzip
import io
import os
import struct
import tarfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ------------------------------------------------------------------ CRC32C

# Castagnoli CRC (reflected poly 0x82F63B78) — the TFRecord framing
# checksum; stdlib zlib.crc32 is the IEEE poly, NOT interchangeable.
# Slicing-by-8: 8 derived tables let the hot loop consume 8 bytes per
# Python iteration (~8x over the per-byte loop — this runs per
# record on GB-sized shards; a native crc32c/ISA-L library is the
# real production answer and drops in here when available).
_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)
_T = [_CRC32C_TABLE]
for _k in range(1, 8):
    _T.append([(_T[_k - 1][_i] >> 8) ^ _CRC32C_TABLE[_T[_k - 1][_i] & 0xFF]
               for _i in range(256)])


try:  # native SSE4.2/ARM implementations when a wheel is present
    from crc32c import crc32c as _native_crc32c  # type: ignore
except ImportError:
    _native_crc32c = None


def crc32c(data: bytes) -> int:
    if _native_crc32c is not None:
        return _native_crc32c(data)
    crc = 0xFFFFFFFF
    n8 = len(data) - (len(data) & 7)
    t0, t1, t2, t3, t4, t5, t6, t7 = _T
    # one C-speed unpack of the whole buffer, then 8 bytes per
    # Python iteration — no per-iteration slicing
    for w in struct.unpack(f"<{n8 >> 3}Q", data[:n8]):
        lo = (w ^ crc) & 0xFFFFFFFF
        hi = w >> 32
        crc = (
            t7[lo & 0xFF] ^ t6[(lo >> 8) & 0xFF]
            ^ t5[(lo >> 16) & 0xFF] ^ t4[lo >> 24]
            ^ t3[hi & 0xFF] ^ t2[(hi >> 8) & 0xFF]
            ^ t1[(hi >> 16) & 0xFF] ^ t0[hi >> 24]
        )
    for b in data[n8:]:
        crc = (crc >> 8) ^ t0[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ----------------------------------------------------- protobuf wire codec

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def encode_example(features: dict) -> bytes:
    """dict -> serialized ``tf.train.Example``.

    Values: ``bytes``/``str`` -> BytesList, ``int`` -> Int64List,
    ``float`` -> FloatList, and lists thereof.  Field numbers are the
    public ones: Example.features=1, Features.feature=1 (map),
    Feature.{bytes_list=1, float_list=2, int64_list=3}, each list's
    value=1.
    """
    entries = b""
    for name, value in sorted(features.items()):
        vals = value if isinstance(value, (list, tuple)) else [value]
        if not vals:
            raise ValueError(f"empty feature {name!r}")
        v0 = vals[0]
        if isinstance(v0, (bytes, str)):
            payload = b"".join(
                _ld(1, v if isinstance(v, bytes) else v.encode()) for v in vals
            )
            feature = _ld(1, payload)  # bytes_list
        elif isinstance(v0, bool):
            raise TypeError("encode bools as int explicitly")
        elif isinstance(v0, int):
            body = b"".join(_varint(v & 0xFFFFFFFFFFFFFFFF) for v in vals)
            feature = _ld(3, _pack_packed(1, body))  # int64_list, packed
        elif isinstance(v0, float):
            body = b"".join(struct.pack("<f", v) for v in vals)
            feature = _ld(2, _pack_packed(1, body))
        else:
            raise TypeError(f"unsupported feature type {type(v0)} for {name!r}")
        # map<string, Feature> entry: key=1 (string), value=2 (message)
        entries += _ld(1, _ld(1, name.encode()) + _ld(2, feature))
    return _ld(1, entries)  # Example.features


def _pack_packed(field: int, body: bytes) -> bytes:
    """Packed repeated scalar field (wire type 2)."""
    return _varint((field << 3) | 2) + _varint(len(body)) + body


def decode_example(data: bytes) -> dict:
    """Serialized Example -> {name: list} (inverse of encode_example;
    int64 values are decoded back to signed)."""
    out: dict = {}
    _tag, pos = _read_varint(data, 0)
    flen, pos = _read_varint(data, pos)
    end = pos + flen
    while pos < end:
        _etag, pos = _read_varint(data, pos)
        elen, pos = _read_varint(data, pos)
        eend = pos + elen
        name = vals = None
        while pos < eend:
            tag, pos = _read_varint(data, pos)
            ln, pos = _read_varint(data, pos)
            if tag >> 3 == 1:  # key
                name = data[pos : pos + ln].decode()
                pos += ln
            else:  # value: Feature
                fend = pos + ln
                ftag, pos = _read_varint(data, pos)
                flen2, pos = _read_varint(data, pos)
                kind = ftag >> 3
                lend = pos + flen2
                vals = []
                while pos < lend:
                    vtag, pos = _read_varint(data, pos)
                    if kind == 1:  # bytes_list: length-delimited values
                        vlen, pos = _read_varint(data, pos)
                        vals.append(data[pos : pos + vlen])
                        pos += vlen
                    elif kind == 3:  # int64_list: packed varints
                        blen, pos = _read_varint(data, pos)
                        bend = pos + blen
                        while pos < bend:
                            v, pos = _read_varint(data, pos)
                            vals.append(v - (1 << 64) if v >= 1 << 63 else v)
                    else:  # float_list: packed fixed32
                        blen, pos = _read_varint(data, pos)
                        bend = pos + blen
                        while pos < bend:
                            vals.append(struct.unpack_from("<f", data, pos)[0])
                            pos += 4
                pos = fend
        out[name] = vals
    return out


def write_tfrecord(fh, record: bytes) -> None:
    """One TFRecord: u64-LE length + masked CRC32C of the length
    bytes, payload, masked CRC32C of the payload."""
    ln = struct.pack("<Q", len(record))
    fh.write(ln)
    fh.write(struct.pack("<I", _masked_crc(ln)))
    fh.write(record)
    fh.write(struct.pack("<I", _masked_crc(record)))


def read_tfrecords(data: bytes, verify: bool = True) -> Iterator[bytes]:
    pos = 0
    while pos + 12 <= len(data):
        (ln,) = struct.unpack_from("<Q", data, pos)
        if verify:
            (got,) = struct.unpack_from("<I", data, pos + 8)
            if got != _masked_crc(data[pos : pos + 8]):
                raise ValueError(f"TFRecord length CRC mismatch at {pos}")
        start = pos + 12
        rec = data[start : start + ln]
        if verify:
            (got,) = struct.unpack_from("<I", data, start + ln)
            if got != _masked_crc(rec):
                raise ValueError(f"TFRecord data CRC mismatch at {pos}")
        yield rec
        pos = start + ln + 4


# ------------------------------------------------------------ Spark writers

def _prepare(df: DataFrame, key_col: str, n_shards: int, seed: int) -> DataFrame:
    from v6spark.operators.packing import assign_shards

    sharded = assign_shards(df, key_col, n_shards, seed=seed)
    return sharded.repartition(n_shards, F.col("shard")).sortWithinPartitions(
        "shard", "_order", key_col
    ).drop("_order")


def _shard_writer(full_path: str, compress: bool):
    """Byte sink for one shard file; gzip wraps with mtime=0 and an
    empty name so compressed reruns stay byte-identical."""
    raw = open(full_path, "wb")
    if not compress:
        return raw
    return gzip.GzipFile(filename="", mode="wb", fileobj=raw, mtime=0)


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 0,
    compress: bool = False,
) -> None:
    """Publish as WebDataset shards ``{path}/shard-%05d.tar``.

    Every non-key column becomes one tar member per row, named
    ``{key}.{column}`` — binary columns verbatim, strings UTF-8,
    numerics as their ``str()`` (the WebDataset convention: the
    extension conveys how to parse).  Deterministic: keyed-hash shard
    assignment + in-shard order + zeroed tar metadata give
    byte-identical reruns.
    """
    os.makedirs(path, exist_ok=True)
    cols = df.columns
    ext = ".tar.gz" if compress else ".tar"

    def write_partition(rows) -> None:
        tars: dict[int, tarfile.TarFile] = {}
        sinks: dict[int, object] = {}
        try:
            for row in rows:
                shard = row["shard"]
                if shard not in tars:
                    sinks[shard] = _shard_writer(
                        os.path.join(path, f"shard-{shard:05d}{ext}"), compress
                    )
                    tars[shard] = tarfile.open(fileobj=sinks[shard], mode="w")
                key = str(row[key_col])
                for c in cols:
                    if c in (key_col, "shard"):
                        continue
                    v = row[c]
                    if v is None:
                        continue
                    blob = (
                        bytes(v) if isinstance(v, (bytes, bytearray))
                        else str(v).encode()
                    )
                    info = tarfile.TarInfo(name=f"{key}.{c}")
                    info.size = len(blob)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tars[shard].addfile(info, io.BytesIO(blob))
        finally:
            for t in tars.values():
                t.close()
            for f in sinks.values():
                f.close()

    _prepare(df, key_col, n_shards, seed).foreachPartition(write_partition)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """WebDataset shards -> (shard_file, key, column, content) long
    frame: one task per tar via ``binaryFile``, member expansion in
    ``mapInPandas``.  Callers pivot columns as needed (long format
    keeps the reader schema-free, like the loaders it mirrors)."""

    def expand(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "shard_file": [], "key": [], "column": [], "content": [],
            }
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(blob)), mode="r:*") as tar:
                    for m in tar.getmembers():
                        key, _, col = m.name.rpartition(".")
                        out["shard_file"].append(os.path.basename(fpath))
                        out["key"].append(key)
                        out["column"].append(col)
                        out["content"].append(tar.extractfile(m).read())
            yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .load(os.path.join(path, "shard-*.tar*"))
        .select("path", "content")
        .mapInPandas(
            expand,
            schema="shard_file string, key string, column string, content binary",
        )
    )


def write_tfrecord_shards(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 0,
    compress: bool = False,
) -> None:
    """Publish as ``{path}/shard-%05d.tfrecord``: one Example per
    row, every column a feature (bytes/str -> BytesList, int ->
    Int64List, float -> FloatList).  Same determinism contract as
    :func:`write_webdataset`."""
    os.makedirs(path, exist_ok=True)
    cols = df.columns
    ext = ".tfrecord.gz" if compress else ".tfrecord"

    def write_partition(rows) -> None:
        files: dict[int, object] = {}
        try:
            for row in rows:
                shard = row["shard"]
                if shard not in files:
                    files[shard] = _shard_writer(
                        os.path.join(path, f"shard-{shard:05d}{ext}"), compress
                    )
                feats = {}
                for c in cols:
                    if c == "shard" or row[c] is None:
                        continue
                    v = row[c]
                    feats[c] = bytes(v) if isinstance(v, bytearray) else v
                write_tfrecord(files[shard], encode_example(feats))
        finally:
            for f in files.values():
                f.close()

    _prepare(df, key_col, n_shards, seed).foreachPartition(write_partition)


def read_tfrecord_shards(spark: SparkSession, path: str) -> DataFrame:
    """TFRecord shards -> (shard_file, record) with CRC32C verified;
    one task per shard file.  Callers decode Examples with
    :func:`decode_example` (schema-free, like the writer)."""

    def expand(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"shard_file": [], "record": []}
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if fpath.endswith(".gz"):
                    data = gzip.decompress(data)
                for rec in read_tfrecords(data):
                    out["shard_file"].append(os.path.basename(fpath))
                    out["record"].append(rec)
            yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .load(os.path.join(path, "shard-*.tfrecord*"))
        .select("path", "content")
        .mapInPandas(expand, schema="shard_file string, record binary")
    )
