"""Optional native-codec adapter seam for the multimodal operators.

The built-in decoders (multimodal.py, jpeg.py, gif.py, avi.py,
media_containers.py) cover every format that can be decoded with
numpy + the standard library: PPM/PGM/BMP/PNG/JPEG/GIF pixels,
PCM/IMA-ADPCM WAV audio, MJPEG-AVI video, and container-level
metadata + frame byte-ranges for MP3/MP4/WebM.  What they CANNOT do
is entropy-decode H.264/HEVC/VP9 video or MP3/AAC audio — that
genuinely requires a codec library (Pillow, PyAV, ffmpeg).

This module is the seam those libraries plug into, designed so the
distributed plumbing (schemas, mapInPandas batch shapes, poison-row
policy) is identical with or without a native codec present:

- **Detection is at call time, on the EXECUTOR** — the adapter is
  resolved inside the Arrow batch kernels, so each executor probes
  its own environment (a cluster where only some nodes have ffmpeg
  is a misconfiguration, surfaced as per-task errors, not silently
  mixed output).
- **The adapter is a plain module/object** exposing any subset of
  the three hooks below; absent hooks mean the built-in raise
  stands.  Resolution order:

  1. ``$V6SPARK_CODEC_MODULE`` — an importable module name.  This is
     also the test seam: tests inject a deterministic fake codec and
     exercise the exact routing a real Pillow/PyAV deployment hits.
  2. Pillow (``PIL.Image``), wrapped to the hook protocol, if
     importable (images only).
  3. None — built-ins only, raises stay honest.

Hook protocol (all optional)::

    probe_dims(payload: bytes) -> (a, b, c) | None
        # HEADERS-ONLY dimension probe: (w, h, channels) for images,
        # (n_frames, rate, channels) for audio — the decode_media
        # metadata pass calls THIS, never a full decode, preserving
        # its documented headers-only cost model; return None for
        # formats the codec cannot identify cheaply
    decode_image(payload: bytes) -> (w, h, c, ndarray HxWxC uint8)
    decode_audio(payload: bytes) -> (rate, n_frames, n_channels,
                                     ndarray frames x channels)
    decode_video_frame(payload: bytes, codec: str)
        -> (w, h, c, ndarray HxWxC uint8)   # one encoded access unit
    embed_media(payload: bytes, kind: str) -> float sequence

Routing contract: a built-in decoder that raises
``NotImplementedError`` consults the adapter; any other exception
(truncated payload, corrupt header) propagates unchanged — the
adapter extends FORMAT coverage, it never papers over corrupt data.
The callers' ``on_error`` poison-row policies therefore behave
identically on both paths.
"""

from __future__ import annotations

import importlib
import io
import os

_UNSET = object()
_codec = _UNSET  # per-process cache (driver or executor)


class PillowAdapter:
    """Wrap Pillow to the hook protocol (images only).  Import-gated:
    instantiated only when ``PIL.Image`` imports, which it does not
    in this sandbox — the class is exercised through the fake-codec
    tests that drive the identical protocol."""

    def __init__(self):
        from PIL import Image  # noqa: F401 — availability probe

        self._Image = Image

    def probe_dims(self, payload: bytes):
        # Image.open is lazy — it parses headers only until .load(),
        # so this honors the metadata pass's headers-only cost model
        img = self._Image.open(io.BytesIO(payload))
        w, h = img.size
        return w, h, len(img.getbands())

    def decode_image(self, payload: bytes):
        import numpy as np

        img = self._Image.open(io.BytesIO(payload))
        img = img.convert("RGB") if img.mode not in ("L", "RGB") else img
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w, c = arr.shape
        return w, h, c, arr


def detect_codec():
    """Resolve the adapter for THIS process; see module docstring for
    the order.  Never raises — a broken ``$V6SPARK_CODEC_MODULE`` is
    a configuration error and should fail loudly, so that one case
    does raise (ImportError), by design."""
    name = os.environ.get("V6SPARK_CODEC_MODULE")
    if name:
        return importlib.import_module(name)
    try:
        return PillowAdapter()
    except ImportError:
        return None


def get_codec():
    """Cached :func:`detect_codec` (reset with :func:`set_codec`)."""
    global _codec
    if _codec is _UNSET:
        _codec = detect_codec()
    return _codec


def set_codec(codec) -> None:
    """Override (or with ``None``: clear) the cached adapter — the
    in-process test seam; ``reset_codec`` restores detection."""
    global _codec
    _codec = codec


def reset_codec() -> None:
    global _codec
    _codec = _UNSET


def try_hook(name: str, *args):
    """Invoke adapter hook ``name`` if an adapter provides it.

    Returns the hook's result, or None when no adapter / no such
    hook — the caller then raises its own honest
    ``NotImplementedError``.  Exceptions from the hook itself
    propagate (corrupt-data errors must reach the poison-row
    policy with their real class).
    """
    codec = get_codec()
    fn = getattr(codec, name, None) if codec is not None else None
    if fn is None:
        return None
    return fn(*args)
