"""Parser robustness fuzz: every media/metadata parser must either
succeed or raise a BOUNDED exception on arbitrary and truncated
bytes — never hang, never crash the interpreter.  This is the
contract the pipeline's ``on_error`` policy relies on: `except
Exception` only contains failures that ARE exceptions.

Two generators per parser: pure-random bytes (magic occasionally
matched by chance) and truncations of VALID fixtures (the realistic
corruption — a partial download passes the magic check and dies
deeper in the structure)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from v6spark.operators import media_metadata as mmeta
from v6spark.operators import multimodal as mm

SETTINGS = dict(max_examples=80, deadline=None)


def _call(fn, payload):
    try:
        fn(payload)
    except Exception:
        pass  # any exception is fine; hangs/segfaults are not


@given(data=st.binary(max_size=512))
@settings(**SETTINGS)
def test_sniff_and_dims_on_random_bytes(data):
    mm.sniff_format(data)  # must never raise
    _call(mm._real_dims, data)


@given(data=st.binary(max_size=512))
@settings(**SETTINGS)
def test_metadata_parsers_on_random_bytes(data):
    assert isinstance(mmeta.parse_exif(b"\xff\xd8" + data), dict)
    assert isinstance(mmeta.parse_id3(data), dict)
    assert isinstance(
        mmeta.parse_captions(data.decode("utf-8", "replace")), list
    )


@given(data=st.binary(max_size=512))
@settings(**SETTINGS)
def test_container_walks_on_random_bytes(data):
    from v6spark.operators import avi
    from v6spark.operators import media_containers as mc

    _call(avi.parse_avi_info, b"RIFF\x00\x00\x00\x00AVI " + data)
    _call(avi.avi_frame_table, b"RIFF\x00\x00\x00\x00AVI " + data)
    _call(mc.parse_mp3_info, data)
    _call(mc.parse_mp4_info, data)
    _call(mc.parse_webm_info, data)


def _fixtures():
    from v6spark.operators.avi import make_avi
    from v6spark.operators.gif import encode_gif
    from v6spark.operators.jpeg import encode_jpeg
    from v6spark.operators.media_containers import make_mp3, make_mp4, make_webm

    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    return {
        "png": mm.make_png(12, 9),
        "jpeg": encode_jpeg(img),
        "gif": encode_gif([np.zeros((6, 7), dtype=np.uint8)] * 2, pal),
        "bmp": mm.make_bmp(10, 8),
        "wav": mm.make_wav(500),
        "adpcm": mm.make_wav_adpcm(n_frames=600),
        "avi": make_avi([img]),
        "mp3": make_mp3(n_frames=3),
        "mp4": make_mp4(width=8, height=6, sample_sizes=[5, 6], seed=2),
        "webm": make_webm(width=8, height=6, frame_sizes=[4, 5], seed=2),
        "exif": mmeta.make_exif_jpeg(img, {"make": "Cam", "orientation": 3}),
        "id3": mmeta.make_id3_mp3({"title": "T"}),
    }


FIXTURES = _fixtures()


@pytest.mark.parametrize("fmt", sorted(FIXTURES))
def test_truncations_fail_cleanly(fmt):
    """Every prefix-truncation of every valid fixture either parses
    (header-only readers legitimately succeed on long prefixes) or
    raises — sweep a spread of cut points including pathological
    short ones."""
    payload = FIXTURES[fmt]
    cuts = sorted({1, 2, 3, 4, 7, 8, 11, 16, 24, 48,
                   len(payload) // 3, len(payload) // 2,
                   len(payload) - 1})
    for cut in cuts:
        trunc = payload[:cut]
        _call(mm.sniff_format, trunc)
        _call(mm._real_dims, trunc)
        _call(mm.decode_image_array, trunc)
        _call(mmeta.parse_exif, trunc)
        _call(mmeta.parse_id3, trunc)
        if fmt in ("wav", "adpcm"):
            _call(mm._wav_decode, trunc)
        if fmt == "avi":
            from v6spark.operators.avi import avi_frame_table, parse_avi_info

            _call(parse_avi_info, trunc)
            _call(avi_frame_table, trunc)


def test_bitflips_fail_cleanly():
    """Single-byte corruptions of valid fixtures (magic intact) must
    not hang or escape as non-exceptions."""
    rng = np.random.default_rng(9)
    for fmt, payload in FIXTURES.items():
        for _ in range(6):
            i = int(rng.integers(8, max(len(payload) - 1, 9)))
            bad = payload[:i] + bytes([payload[i] ^ 0xFF]) + payload[i + 1 :]
            _call(mm._real_dims, bad)
            _call(mm.decode_image_array, bad)
