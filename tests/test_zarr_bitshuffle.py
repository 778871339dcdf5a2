"""Bit-shuffled blosc Zarr chunks (r12, VERDICT r11 task 3).

``zarr_store._bitunshuffle`` inverts the bitshuffle filter as a numpy
bit-plane transpose.  Because no bitshuffle/numcodecs binding exists
in this container, correctness is anchored two independent ways:

1. ``TRANS_BIT_8X8`` — the public c-blosc/bitshuffle scalar kernel's
   8x8 bit-transpose macro — is transcribed here arithmetic-for-
   arithmetic and its mapping verified EXHAUSTIVELY on all 64 unit
   vectors: in(byte k, bit j) -> out(byte j, bit k), i.e. LSB-first
   in both bit and element order (the SSE path's movemask/slli loop
   pins the same convention).  For typesize=1 the whole filter IS
   this macro applied per 8-byte group with rows scattered at
   nbyte/8 stride, so the test encoder is checked against the macro
   directly there — tying the layout to the reference C, not to our
   own inverse.
2. The documented bitshuffle invariant — the output is the transpose
   of the (elements x bits) matrix, both dimensions little-endian:
   plane B = bit B of each element's little-endian value, element i
   at plane byte i//8, bit i%8; c-blosc transposes only the leading
   multiple-of-8 element count and memcpys the tail verbatim.

The encoder below implements (2); round-trip property tests then
drive the PRODUCT decoder through whole blosc frames (lz4 greedy-
compressed split/unsplit, zlib, and multi-block) built by the same
independent frame assemblers the byte-shuffle tests use.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pytest

import v6spark.sources.zarr_store as zs
from tests.test_zarr import (
    _blosc_lz4_frame_greedy,
    _blosc_zlib_frame,
    _lz4_greedy_compress,
)

MASK64 = (1 << 64) - 1


def _trans_bit_8x8(x: int) -> int:
    """Literal transcription of c-blosc/bitshuffle's TRANS_BIT_8X8."""
    t = (x ^ (x >> 7)) & 0x00AA00AA00AA00AA
    x = (x ^ t ^ (t << 7)) & MASK64
    t = (x ^ (x >> 14)) & 0x0000CCCC0000CCCC
    x = (x ^ t ^ (t << 14)) & MASK64
    t = (x ^ (x >> 28)) & 0x00000000F0F0F0F0
    x = (x ^ t ^ (t << 28)) & MASK64
    return x


def test_trans_bit_8x8_mapping_exhaustive():
    """All 64 unit vectors: in(byte k, bit j) -> out(byte j, bit k).
    This pins the LSB-first convention the decoder relies on."""
    for k in range(8):
        for j in range(8):
            y = _trans_bit_8x8(1 << (8 * k + j))
            assert y == 1 << (8 * j + k), (k, j, hex(y))


def _bitshuffle_ref(buf: bytes, typesize: int) -> bytes:
    """Independent ENCODER (the documented bit-matrix-transpose
    invariant): plane B = bit B of each little-endian element,
    element i at plane byte i//8 bit i%8; the sub-multiple-of-8
    element tail is copied verbatim (c-blosc wrapper semantics)."""
    n = len(buf)
    if typesize < 1 or n < 8 * typesize:
        return buf
    size = n // typesize
    head = (size - size % 8) * typesize
    a = np.frombuffer(buf[:head], np.uint8).reshape(-1, typesize)
    bits = np.unpackbits(a, axis=1, bitorder="little")  # (nel, 8*ts)
    out = np.packbits(
        np.ascontiguousarray(bits.T), axis=1, bitorder="little"
    ).tobytes()
    return out + buf[head:]


def test_encoder_matches_c_macro_for_typesize1():
    """For typesize=1 the reference filter is exactly TRANS_BIT_8X8
    per 8-byte group with row kk of group w landing at byte
    kk*(n/8) + w — computed here straight from the transcribed macro
    and compared against the invariant-based encoder.  Agreement of
    the two formulations ties the layout to the C reference."""
    rng = np.random.default_rng(11)
    for n in (8, 16, 64, 1024):
        buf = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        ngroups = n // 8
        out = bytearray(n)
        for w in range(ngroups):
            x = int.from_bytes(buf[8 * w : 8 * w + 8], "little")
            y = _trans_bit_8x8(x)
            yb = y.to_bytes(8, "little")
            for kk in range(8):
                out[kk * ngroups + w] = yb[kk]
        assert bytes(out) == _bitshuffle_ref(buf, 1), n


def test_bitunshuffle_inverts_reference_encoder():
    """Random arrays, every practical typesize, multiple-of-8 and
    ragged element counts (the memcpy'd tail path)."""
    rng = np.random.default_rng(3)
    for typesize in (1, 2, 4, 8):
        for nelem in (8, 16, 24, 100, 1000, 7, 12, 33):
            buf = rng.integers(
                0, 256, nelem * typesize, dtype=np.uint8
            ).tobytes()
            enc = _bitshuffle_ref(buf, typesize)
            assert zs._bitunshuffle(enc, typesize) == buf, (
                typesize, nelem
            )
            if nelem < 8:
                assert enc == buf  # too short to transpose: verbatim


def _bitshuf_lz4_frame(body: bytes, typesize: int, split: bool) -> bytes:
    """Bit-shuffled compressed blosc1 frame via the independent
    greedy LZ4 encoder (flag 0x04 instead of 0x01)."""
    nbytes = len(body)
    shuf = _bitshuffle_ref(body, typesize)
    if split:
        per = nbytes // typesize
        streams = [shuf[i * per:(i + 1) * per] for i in range(typesize)]
    else:
        streams = [shuf]
    payload = bytearray()
    for s in streams:
        c = _lz4_greedy_compress(s)
        if len(c) >= len(s) and len(s) > 0:
            c = s
        payload += len(c).to_bytes(4, "little") + c
    frame = bytearray()
    frame += bytes([2, 1, (1 << 5) | 0x04, typesize])
    frame += nbytes.to_bytes(4, "little")
    frame += nbytes.to_bytes(4, "little")
    frame += (0).to_bytes(4, "little")
    frame += (20).to_bytes(4, "little")
    frame += payload
    frame[12:16] = len(frame).to_bytes(4, "little")
    return bytes(frame)


def test_bitshuffled_blosc_lz4_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(-2**31, 2**31 - 1), min_size=8,
                 max_size=256),
        st.booleans(),
    )
    def check(vals, split):
        body = np.array(vals, dtype="<i4").tobytes()
        frame = _bitshuf_lz4_frame(body, 4, split)
        assert zs._decompress(
            frame, {"id": "blosc", "cname": "lz4"}
        ) == body

    check()


def test_bitshuffled_blosc_zlib_roundtrip():
    """blosc-zlib with the bit-shuffle flag: zlib frames are never
    split by c-blosc, exercise the unsplit retry path."""
    rng = np.random.default_rng(5)
    vec = rng.integers(-1000, 1000, 300).astype("<i8")
    body = vec.tobytes()
    shuf = _bitshuffle_ref(body, 8)
    import zlib as _z

    c = _z.compress(shuf, 5)
    frame = bytearray()
    frame += bytes([2, 1, (3 << 5) | 0x04, 8])
    frame += len(body).to_bytes(4, "little")
    frame += len(body).to_bytes(4, "little")
    frame += (0).to_bytes(4, "little")
    frame += (20).to_bytes(4, "little")
    frame += len(c).to_bytes(4, "little") + c
    frame[12:16] = len(frame).to_bytes(4, "little")
    assert zs._decompress(bytes(frame), {"id": "blosc"}) == body


def test_bitshuffled_store_reads_end_to_end(tmp_path):
    """A .zarray-described bit-shuffled blosc-lz4 chunk loads
    bit-exact through read_zarr_array, incl. a padded edge chunk."""
    store = str(tmp_path / "s.zarr")
    name = "gt"
    arr = np.arange(-50, 50, dtype="<i2")  # 100 int16 elements
    os.makedirs(f"{store}/{name}")
    meta = {
        "zarr_format": 2, "shape": [100], "chunks": [64],
        "dtype": "<i2", "fill_value": 0, "order": "C",
        "filters": None,
        "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5,
                       "shuffle": 2},
    }
    with open(f"{store}/{name}/.zarray", "w") as fh:
        json.dump(meta, fh)
    for ci in range(2):
        chunk = np.zeros(64, dtype="<i2")
        part = arr[ci * 64 : (ci + 1) * 64]
        chunk[: len(part)] = part
        with open(f"{store}/{name}/{ci}", "wb") as fh:
            fh.write(_bitshuf_lz4_frame(chunk.tobytes(), 2, True))
    got = zs.read_zarr_array(store, name)
    assert np.array_equal(got, arr)


def test_memcpy_mode_ignores_filter_flags():
    """c-blosc's incompressible fallback stores ORIGINAL bytes with
    the filter bits still set; the reader must not unshuffle them
    (byte- OR bit-shuffle flags)."""
    body = bytes(range(64))
    for flags in (0x03, 0x06):  # memcpyed + byteshuf / + bitshuf
        frame = bytes([2, 1, flags, 4]) \
            + len(body).to_bytes(4, "little") \
            + len(body).to_bytes(4, "little") \
            + (len(body) + 16).to_bytes(4, "little") + body
        assert zs._decompress(frame, {"id": "blosc"}) == body


def test_zstd_through_codec_adapter(tmp_path):
    """zstd chunks decode when an adapter exposes decompress_zstd and
    refuse honestly when none is registered.  The fake adapter uses
    zlib as the stand-in codec — the test proves the WIRING (probe,
    payload pass-through, result use), not zstd entropy coding."""
    from v6spark.operators import codec_adapter

    class _FakeZstd:
        def decompress_zstd(self, payload: bytes) -> bytes:
            import zlib as _z

            return _z.decompress(payload)

    body = np.arange(32, dtype="<i4").tobytes()
    import zlib as _z

    payload = _z.compress(body, 6)
    codec_adapter.set_codec(_FakeZstd())
    try:
        assert zs._decompress(payload, {"id": "zstd"}) == body
    finally:
        codec_adapter.set_codec(None)
    with pytest.raises(NotImplementedError, match="decompress_zstd"):
        zs._decompress(payload, {"id": "zstd"})
    codec_adapter.reset_codec()
