"""Tests: real Zarr v2 store ingest/export (sources/zarr_store.py) —
the reference's native storage format (SURVEY.md §2.1 A1/A2)."""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from v6spark.sources import zarr_store as zs
from v6spark.sources.vcf import read_vcf

VCF_TEXT = """\
##fileformat=VCFv4.2
##INFO=<ID=NS,Number=1,Type=Integer,Description="n">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA1\tNA2\tNA3
chr1\t100\trs1\tA\tT\t50.0\tPASS\tNS=3\tGT:DP:GQ\t0/0:10:99\t0/1:20:80\t./.:.:.
chr1\t200\t.\tG\tC,T\t.\tPASS\tNS=3\tGT:DP\t1|2:5\t0/0:7\t0/1:.
chr2\t300\trs3\tC\tG\t9.5\tq10\tNS=2\tDP:GT\t4:0/0\t8:1/1\t.:./1
"""


@pytest.fixture(scope="module")
def store_pair(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("zarrio")
    vcf = d / "tiny.vcf"
    vcf.write_text(VCF_TEXT)
    variants, calls = read_vcf(spark, str(vcf))
    store = str(d / "store.zarr")
    # row_chunk=2 over 3 variants -> two variant-axis chunks incl. an
    # edge chunk, so the distributed read gets a real multi-chunk grid
    zs.write_zarr_store(variants, calls, store, row_chunk=2)
    return variants, calls, store


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_zarr_roundtrip_variants(spark, store_pair):
    """write_zarr_store -> load_zarr reproduces the VCF-ingested
    variants exactly, except FILTER collapsing through the allel-style
    boolean FILTER_PASS ('q10' -> '.') — the documented lossy field."""
    variants, _calls, store = store_pair
    v2, _ = zs.load_zarr(spark, store)
    norm = variants.withColumn(
        "filter",
        F.when(F.col("filter") == "PASS", "PASS").otherwise("."),
    )
    cols = ["variant_id", "chrom", "pos", "vcf_id", "ref", "alt", "qual", "filter"]
    got = _rows(v2, cols)
    want = _rows(norm, cols)
    # alt arrays come back as lists either way
    assert [(a, b, c, d, e, list(f), g, h) for a, b, c, d, e, f, g, h in got] == [
        (a, b, c, d, e, list(f), g, h) for a, b, c, d, e, f, g, h in want
    ]


def test_zarr_roundtrip_calls(spark, store_pair):
    """Calls round-trip exactly: GT element NULLs (the -1 sentinel),
    NULL DP/GQ, per-record FORMAT differences — all preserved."""
    _variants, calls, store = store_pair
    _, c2 = zs.load_zarr(spark, store)
    cols = ["variant_id", "chrom", "sample_id", "gt", "dp", "gq"]
    got = [
        (a, b, c, tuple(g) if g is not None else None, d, e)
        for a, b, c, g, d, e in _rows(c2, cols)
    ]
    want = [
        (a, b, c, tuple(g) if g is not None else None, d, e)
        for a, b, c, g, d, e in _rows(calls, cols)
    ]
    assert got == want


def test_zarr_feeds_facade(spark, store_pair):
    """Variations.from_zarr: a reference user's store drives the
    stats facade directly (missing rate over the loaded calls)."""
    from v6spark.genomics import Variations, calc_missing_gt

    *_, store = store_pair
    va = Variations.from_zarr(spark, store)
    assert sorted(va.samples) == ["NA1", "NA2", "NA3"]
    assert va.num_variations == 3
    rates = {
        r["variant_id"]: r["missing_rate"]
        for r in calc_missing_gt(va).collect()
    }
    # chr1:100 has one fully-missing sample of three (rate rounded to 6)
    assert abs(rates["chr1:100:A:T"] - 1 / 3) < 1e-6


def test_zarr_chunk_codecs(tmp_path):
    """Chunk decode paths: raw, zlib, gzip, blosc-memcpy with byte
    shuffle, F order, missing chunk -> fill_value, edge cropping."""
    import gzip as _gzip

    store = str(tmp_path / "s.zarr")
    arr = np.arange(20, dtype="<i4").reshape(4, 5)

    # helper writes zlib by default — full assembly equality
    zs._write_array(store, "a_zlib", arr, (2, 3))
    assert np.array_equal(zs.read_zarr_array(store, "a_zlib"), arr)

    # raw (compressor null)
    zs._write_array(store, "a_raw", arr, (3, 5), compressor=None)
    assert np.array_equal(zs.read_zarr_array(store, "a_raw"), arr)

    def put_array(name, meta, chunks):
        os.makedirs(f"{store}/{name}", exist_ok=True)
        with open(f"{store}/{name}/.zarray", "w") as fh:
            json.dump(meta, fh)
        for key, raw in chunks.items():
            with open(f"{store}/{name}/{key}", "wb") as fh:
                fh.write(raw)

    base_meta = {
        "zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<i4",
        "fill_value": 0, "order": "C", "filters": None,
    }
    vec = np.array([7, -1, 9, 1 << 20], dtype="<i4")

    # gzip compressor
    put_array(
        "a_gzip", {**base_meta, "compressor": {"id": "gzip", "level": 5}},
        {"0": _gzip.compress(vec.tobytes())},
    )
    assert np.array_equal(zs.read_zarr_array(store, "a_gzip"), vec)

    # blosc memcpy mode: stores the ORIGINAL bytes even when the
    # shuffle flag is set — c-blosc's incompressible fallback copies
    # the caller's buffer verbatim and leaves the filter bits in the
    # header (they record the request); unshuffling here (the
    # pre-r12 reader behavior) silently corrupted real stores'
    # incompressible chunks
    body = vec.tobytes()
    header = bytes([2, 1, 0x03, 4]) + len(body).to_bytes(4, "little") \
        + len(body).to_bytes(4, "little") \
        + (len(body) + 16).to_bytes(4, "little")
    put_array(
        "a_blosc",
        {**base_meta, "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1}},
        {"0": header + body},
    )
    assert np.array_equal(zs.read_zarr_array(store, "a_blosc"), vec)

    # F-order chunk
    f_arr = np.arange(6, dtype="<f8").reshape(2, 3)
    put_array(
        "a_forder",
        {
            "zarr_format": 2, "shape": [2, 3], "chunks": [2, 3],
            "dtype": "<f8", "compressor": None, "fill_value": 0.0,
            "order": "F", "filters": None,
        },
        {"0.0": f_arr.tobytes(order="F")},
    )
    assert np.array_equal(zs.read_zarr_array(store, "a_forder"), f_arr)

    # missing chunk -> fill_value
    put_array(
        "a_fill", {**base_meta, "compressor": None, "fill_value": -7}, {}
    )
    assert np.array_equal(
        zs.read_zarr_array(store, "a_fill"), np.full(4, -7, dtype="<i4")
    )


def test_zarr_honest_raises(tmp_path):
    """Genuinely library-bound paths refuse with actionable messages:
    compressed blosc codecs, object dtype, filters, v3 stores."""
    store = str(tmp_path / "s.zarr")

    def put(name, meta, chunks=None):
        os.makedirs(f"{store}/{name}", exist_ok=True)
        with open(f"{store}/{name}/.zarray", "w") as fh:
            json.dump(meta, fh)
        for key, raw in (chunks or {}).items():
            with open(f"{store}/{name}/{key}", "wb") as fh:
                fh.write(raw)

    base = {
        "zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<i4",
        "compressor": None, "fill_value": 0, "order": "C", "filters": None,
    }
    # compressed blosc frame with a codec the pure-Python path does
    # not cover (zstd = codec id 4): still an honest refusal
    header = bytes([2, 1, (4 << 5), 4]) + (8).to_bytes(4, "little") \
        + (8).to_bytes(4, "little") + (6).to_bytes(4, "little")
    put(
        "blosc_zstd",
        {**base, "compressor": {"id": "blosc", "cname": "zstd"}},
        {"0": header + b"\x01\x02"},
    )
    with pytest.raises(NotImplementedError, match="codec id 4"):
        zs.read_zarr_array(store, "blosc_zstd")

    put("objdt", {**base, "dtype": "|O"})
    with pytest.raises(NotImplementedError, match="object-dtype"):
        zs.read_zarr_array(store, "objdt")

    put("filt", {**base, "filters": [{"id": "delta"}]})
    with pytest.raises(NotImplementedError, match="filters"):
        zs.read_zarr_array(store, "filt")

    put("v3", {**base, "zarr_format": 3})
    with pytest.raises(NotImplementedError, match="v2"):
        zs.read_zarr_array(store, "v3")

    with pytest.raises(NotImplementedError, match="zstd"):
        zs._decompress(b"x", {"id": "zstd"})


def test_zarr_export_cap(spark):
    """The interop exporter refuses corpus-scale input instead of
    collecting it to the driver."""
    variants = spark.range(3).select(
        F.concat(F.lit("c:"), F.col("id")).alias("variant_id"),
        F.lit("c").alias("chrom"), F.col("id").alias("pos"),
        F.lit(None).cast("string").alias("vcf_id"),
        F.lit("A").alias("ref"), F.array(F.lit("T")).alias("alt"),
        F.lit(1.0).alias("qual"), F.lit("PASS").alias("filter"),
    )
    calls = spark.createDataFrame([], zs.CALLS_DDL)
    old = zs.MAX_EXPORT_VARIANTS
    try:
        zs.MAX_EXPORT_VARIANTS = 2
        with pytest.raises(ValueError, match="capped"):
            zs.write_zarr_store(variants, calls, "/tmp/never-written.zarr")
    finally:
        zs.MAX_EXPORT_VARIANTS = old


def _lz4_all_literals(data: bytes) -> bytes:
    """Minimal VALID LZ4 block: one all-literal sequence."""
    out = bytearray()
    n = len(data)
    out.append(min(n, 15) << 4)
    if n >= 15:
        rem = n - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += data
    return bytes(out)


def _blosc_lz4_frame(body: bytes, typesize: int, shuffle: bool,
                     split: bool) -> bytes:
    """Hand-assembled compressed blosc1 frame (lz4 codec, one block)
    matching the public c-blosc layout: 16-byte header, uint32 block
    starts, per block one [int32 cbytes][stream] per split lane."""
    nbytes = len(body)
    if shuffle:
        body = (
            np.frombuffer(body, np.uint8)
            .reshape(-1, typesize).T.tobytes()
        )
    if split:
        per = nbytes // typesize
        streams = [body[i * per:(i + 1) * per] for i in range(typesize)]
    else:
        streams = [body]
    payload = bytearray()
    for s in streams:
        c = _lz4_all_literals(s)
        payload += len(c).to_bytes(4, "little") + c
    flags = (1 << 5) | (0x01 if shuffle else 0)
    frame = bytearray()
    frame += bytes([2, 1, flags, typesize])
    frame += nbytes.to_bytes(4, "little")
    frame += nbytes.to_bytes(4, "little")          # blocksize = nbytes
    frame += (0).to_bytes(4, "little")             # cbytes patched below
    frame += (20).to_bytes(4, "little")            # bstarts[0]
    frame += payload
    frame[12:16] = len(frame).to_bytes(4, "little")
    return bytes(frame)


def test_lz4_block_decoder_vectors():
    """Hand vectors for the pure-Python LZ4 block decode: literals,
    matches, the overlapping-offset repeat idiom, and 255-extension
    literal lengths."""
    # 'abc' literals + 12-byte match at offset 3 (overlap) + 'def'
    blk = bytes([0x38]) + b"abc" + bytes([0x03, 0x00]) \
        + bytes([0x30]) + b"def"
    assert zs._lz4_block_decompress(blk, 18) == b"abc" * 5 + b"def"
    # long literal run exercises the 255-extension path
    data = bytes(range(256)) * 3
    assert zs._lz4_block_decompress(
        _lz4_all_literals(data), len(data)
    ) == data
    # wrong target length is a loud failure
    with pytest.raises(ValueError, match="expected"):
        zs._lz4_block_decompress(blk, 17)


def test_zarr_blosc_lz4_roundtrip(tmp_path):
    """Compressed blosc-lz4 chunks load bit-exact through from-scratch
    frame assembly: unshuffled-unsplit, shuffled-split (the c-blosc
    default for lz4), and shuffled-unsplit (post-1.11 SPLITMODE
    writers) — plus the real scikit-allel-shaped compressor metadata."""
    store = str(tmp_path / "s.zarr")

    def put(name, meta, chunks):
        os.makedirs(f"{store}/{name}", exist_ok=True)
        with open(f"{store}/{name}/.zarray", "w") as fh:
            json.dump(meta, fh)
        for key, raw in chunks.items():
            with open(f"{store}/{name}/{key}", "wb") as fh:
                fh.write(raw)

    vec = np.array([7, -1, 9, 1 << 20, 0, 42, -(1 << 30), 3],
                   dtype="<i4")
    meta = {
        "zarr_format": 2, "shape": [8], "chunks": [8], "dtype": "<i4",
        "fill_value": 0, "order": "C", "filters": None,
        "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5,
                       "shuffle": 1, "blocksize": 0},
    }
    for name, shuffle, split in (
        ("plain", False, False),
        ("shuffled_split", True, True),
        ("shuffled_unsplit", True, False),
    ):
        put(name, meta,
            {"0": _blosc_lz4_frame(vec.tobytes(), 4, shuffle, split)})
        assert np.array_equal(zs.read_zarr_array(store, name), vec), name

    # multi-chunk store through the full reader (edge chunk included)
    arr = np.arange(20, dtype="<i4")
    put("multi", {**meta, "shape": [20], "chunks": [8]}, {
        str(i): _blosc_lz4_frame(
            arr[i * 8:(i + 1) * 8].tobytes(), 4, True, True
        )
        for i in range(2)
    })
    # final partial chunk stored full-size (zarr pads to chunk shape)
    tail = np.zeros(8, dtype="<i4")
    tail[:4] = arr[16:]
    put("multi", {**meta, "shape": [20], "chunks": [8]}, {
        "0": _blosc_lz4_frame(arr[0:8].tobytes(), 4, True, True),
        "1": _blosc_lz4_frame(arr[8:16].tobytes(), 4, False, False),
        "2": _blosc_lz4_frame(tail.tobytes(), 4, True, False),
    })
    assert np.array_equal(zs.read_zarr_array(store, "multi"), arr)


def _lz4_greedy_compress(data: bytes) -> bytes:
    """Tiny greedy LZ4 encoder for PROPERTY-TESTING the decoder: real
    matches (hash-chain on 4-byte prefixes), proper token/extension
    encoding, LZ4's end-of-block rules (final sequence literal-only).
    Independent of the decoder's code paths, so a round-trip failure
    means one of them misreads the public format."""
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0

    def emit(lit: bytes, mlen: int | None, offset: int | None):
        lit_len = len(lit)
        token_lit = min(lit_len, 15)
        token_m = 0 if mlen is None else min(mlen - 4, 15)
        out.append((token_lit << 4) | token_m)
        if token_lit == 15:
            rem = lit_len - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(lit)
        if mlen is None:
            return
        out.append(offset & 0xFF)
        out.append(offset >> 8)
        if token_m == 15:
            rem = mlen - 4 - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)

    # matches must end >= 5 bytes before the end (last literals rule)
    while i + 4 <= n - 5:
        key = data[i:i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF and data[j:j + 4] == key:
            mlen = 4
            while i + mlen < n - 5 and data[j + mlen] == data[i + mlen]:
                mlen += 1
            emit(data[anchor:i], mlen, i - j)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(data[anchor:], None, None)
    return bytes(out)


def test_lz4_decoder_roundtrip_property():
    """Property: greedy-encoded LZ4 blocks (real matches, overlaps,
    long runs) decode back bit-exact through the pure-Python
    decoder."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=4096))
    def check(data):
        blk = _lz4_greedy_compress(data)
        assert zs._lz4_block_decompress(blk, len(data)) == data

    check()
    # targeted shapes: repetition (overlapping matches), periodic
    # patterns at every small offset, and highly compressible runs
    for data in (
        b"a" * 1000,
        b"ab" * 700,
        b"abc" * 500,
        bytes(range(7)) * 300,
        b"x" * 14 + b"the quick brown fox " * 40 + b"y" * 6,
    ):
        blk = _lz4_greedy_compress(data)
        assert len(blk) < len(data)  # matches actually fired
        assert zs._lz4_block_decompress(blk, len(data)) == data


def test_zarr_blosc_lz4_roundtrip_property():
    """Property: whole blosc-lz4 frames (greedy-compressed streams,
    shuffled/split variants, multi-block) round-trip through
    _decompress for random int arrays."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(-2**31, 2**31 - 1), min_size=1, max_size=256),
        st.booleans(),
        st.booleans(),
    )
    def check(vals, shuffle, split):
        body = np.array(vals, dtype="<i4").tobytes()
        if split and len(body) % 4:
            split = False
        frame = _blosc_lz4_frame_greedy(body, 4, shuffle, split)
        assert zs._decompress(
            frame, {"id": "blosc", "cname": "lz4"}
        ) == body

    check()


def _blosc_lz4_frame_greedy(body: bytes, typesize: int, shuffle: bool,
                            split: bool) -> bytes:
    """Like _blosc_lz4_frame but with the greedy encoder, so streams
    contain real matches."""
    nbytes = len(body)
    if shuffle:
        body = (
            np.frombuffer(body, np.uint8)
            .reshape(-1, typesize).T.tobytes()
        )
    if split:
        per = nbytes // typesize
        streams = [body[i * per:(i + 1) * per] for i in range(typesize)]
    else:
        streams = [body]
    payload = bytearray()
    for s in streams:
        c = _lz4_greedy_compress(s)
        if len(c) >= len(s) and len(s) > 0:
            c = s  # store uncompressed, cbytes == stream size marker
        payload += len(c).to_bytes(4, "little") + c
    flags = (1 << 5) | (0x01 if shuffle else 0)
    frame = bytearray()
    frame += bytes([2, 1, flags, typesize])
    frame += nbytes.to_bytes(4, "little")
    frame += nbytes.to_bytes(4, "little")
    frame += (0).to_bytes(4, "little")
    frame += (20).to_bytes(4, "little")
    frame += payload
    frame[12:16] = len(frame).to_bytes(4, "little")
    return bytes(frame)


def _blosc_zlib_frame(body: bytes, typesize: int, shuffle: bool) -> bytes:
    """Hand-assembled compressed blosc1 frame, ZLIB codec (id 3),
    one unsplit block — c-blosc never splits zlib blocks, so unsplit
    is the only real-writer layout."""
    nbytes = len(body)
    if shuffle:
        body = (
            np.frombuffer(body, np.uint8)
            .reshape(-1, typesize).T.tobytes()
        )
    import zlib as _z

    c = _z.compress(body, 5)
    payload = len(c).to_bytes(4, "little") + c
    flags = (3 << 5) | (0x01 if shuffle else 0)
    frame = bytearray()
    frame += bytes([2, 1, flags, typesize])
    frame += nbytes.to_bytes(4, "little")
    frame += nbytes.to_bytes(4, "little")          # blocksize = nbytes
    frame += (0).to_bytes(4, "little")
    frame += (20).to_bytes(4, "little")            # bstarts[0]
    frame += payload
    frame[12:16] = len(frame).to_bytes(4, "little")
    return bytes(frame)


def test_zarr_blosc_zlib_roundtrip():
    """Compressed blosc-zlib frames decode: the split-layout trial runs
    FIRST (typesize 4 divides the block) and must fail over to the
    unsplit layout with a ValueError, never an escaping zlib.error —
    c-blosc never splits zlib blocks, so every real blosc-zlib frame
    takes this fallback path."""
    vec = np.array([7, -1, 9, 1 << 20, 0, 42, -(1 << 30), 3], dtype="<i4")
    for shuffle in (False, True):
        frame = _blosc_zlib_frame(vec.tobytes(), 4, shuffle)
        got = zs._decompress(frame, {"id": "blosc", "cname": "zlib"})
        assert got == vec.tobytes(), f"shuffle={shuffle}"


def test_blosc_streams_zlib_garbage_raises_valueerror():
    """Contract regression: _blosc_streams surfaces undecodable zlib
    bytes as ValueError (the class the split-trial fallback catches),
    not zlib.error.  Layout: stream 1 stored-uncompressed (cbytes ==
    per), stream 2 an in-range length over garbage — exactly the
    mis-guessed-split shape that previously let zlib.error escape."""
    per = 8
    stored = bytes(range(per))
    garbage = b"\xff\xee\xdd\xcc\xbb\xaa"  # len != per -> zlib path
    raw = (
        per.to_bytes(4, "little") + stored
        + len(garbage).to_bytes(4, "little") + garbage
    )
    with pytest.raises(ValueError, match="zlib"):
        zs._blosc_streams(raw, 0, 2, 2 * per, codec=3)
