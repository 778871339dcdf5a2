"""Deterministic FAKE native-codec module for adapter-seam tests.

Implements the codec_adapter hook protocol over self-describing
synthetic payloads, so tests can drive the EXACT routing a real
Pillow/PyAV deployment hits — on executors, through mapInPandas —
without any codec library in the sandbox.  Injected via
``$V6SPARK_CODEC_MODULE=tests.fake_codec`` (the production mechanism)
or ``codec_adapter.set_codec`` (driver-side unit tests).

Payload formats (magic-prefixed, unrecognizable to the built-ins):

- ``FAKEIMG`` + <H w> + <H h> + <B c>            -> image
- ``FAKEAUD`` + <I rate> + <I n_frames> + <B ch> -> audio
- video access units: any bytes; decode_video_frame returns a fixed
  2x2 RGB image derived from the slice's first byte.
"""

from __future__ import annotations

import struct

import numpy as np

IMG_MAGIC = b"FAKEIMG"
AUD_MAGIC = b"FAKEAUD"


def make_image_payload(w: int, h: int, c: int = 3) -> bytes:
    return IMG_MAGIC + struct.pack("<HHB", w, h, c)


def make_audio_payload(rate: int, n_frames: int, ch: int = 1) -> bytes:
    return AUD_MAGIC + struct.pack("<IIB", rate, n_frames, ch)


def decode_image(payload: bytes):
    if not payload.startswith(IMG_MAGIC):
        raise ValueError("fake codec: not a FAKEIMG payload")
    w, h, c = struct.unpack_from("<HHB", payload, len(IMG_MAGIC))
    arr = np.fromfunction(
        lambda y, x, k: (y * 31 + x * 7 + k * 3) % 256, (h, w, c), dtype=int
    ).astype(np.uint8)
    return w, h, c, arr


def decode_audio(payload: bytes):
    if not payload.startswith(AUD_MAGIC):
        raise ValueError("fake codec: not a FAKEAUD payload")
    rate, n_frames, ch = struct.unpack_from("<IIB", payload, len(AUD_MAGIC))
    t = np.arange(n_frames, dtype=np.float64)
    samples = np.stack(
        [1000.0 * np.sin(2 * np.pi * 440.0 * t / max(rate, 1))] * ch, axis=1
    )
    return rate, n_frames, ch, samples


def decode_video_frame(payload: bytes, codec: str):
    if not payload:
        raise ValueError("fake codec: empty access unit")
    v = payload[0]
    arr = np.full((2, 2, 3), v, dtype=np.uint8)
    return 2, 2, 3, arr


def embed_media(payload: bytes, kind: str):
    """Deterministic fake embedding: first 8 payload bytes scaled to
    [-1, 1] (shorter payloads pad at the operator layer)."""
    if not payload:
        raise ValueError("fake codec: empty payload")
    return [((b / 255.0) * 2.0 - 1.0) for b in payload[:8]]


def probe_dims(payload: bytes):
    """Headers-only probe: parses the fixed-size fake headers without
    materializing pixels/samples (the contract decode_media's
    metadata pass relies on)."""
    if payload.startswith(IMG_MAGIC):
        w, h, c = struct.unpack_from("<HHB", payload, len(IMG_MAGIC))
        return w, h, c
    if payload.startswith(AUD_MAGIC):
        rate, n_frames, ch = struct.unpack_from("<IIB", payload, len(AUD_MAGIC))
        return n_frames, rate, ch
    return None
