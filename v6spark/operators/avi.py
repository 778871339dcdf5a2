"""AVI (RIFF) container parsing + MJPEG video, stdlib/numpy only.

AVI closes the real-pixel video gap left by MP4/WebM (whose H.264/
VP9 payloads honestly raise — media_containers.py): Motion-JPEG AVI
is a real-world interchange format (capture cards, webcams, OpenCV's
default writer) whose per-frame payloads are plain baseline JPEGs,
which this repo already decodes dependency-free
(operators/jpeg.py).  With this module, ``frame_sample`` over an
MJPEG AVI is END-TO-END real: container walk -> frame byte slice ->
Huffman+IDCT pixel decode -> PNG re-encode.

Reference scope (SURVEY.md §2.2, multimodal columns): the reference
treats media as opaque binary + typed metadata; this module supplies
the metadata pass (``parse_avi_info``) and the per-frame byte index
(``avi_frame_table``) that a 100 TB corpus job partitions over —
both single linear walks over the chunk structure, no frame bytes
copied until an executor slices the frames it owns.

Layout recap: ``RIFF('AVI ')`` holds ``LIST('hdrl')`` (the
``avih`` main header plus one ``LIST('strl')`` of ``strh``/``strf``
per stream) and ``LIST('movi')`` whose ``NNdc``/``NNdb``/``NNwb``
chunks carry the stream payloads (NN = zero-based stream index).
The optional trailing ``idx1`` index duplicates offsets and carries
the keyframe flag.  The frame table is built from the authoritative
movi walk; ``idx1`` (when present) contributes keyframe bits only.
"""

from __future__ import annotations

import struct

_AVIIF_KEYFRAME = 0x10


def _chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            break  # truncated chunk: stop rather than mis-slice
        yield fourcc, body, size
        pos = body + size + (size & 1)  # chunks pad to even


def make_avi(frames: list, fps: int = 10, quality: int = 85) -> bytes:
    """MJPEG AVI from HxWx3 (or HxW gray) uint8 frames.

    Each frame is JPEG-encoded via :func:`~v6spark.operators.jpeg.
    encode_jpeg` and written as a ``00dc`` chunk; a spec-shaped
    ``idx1`` index (all keyframes — MJPEG is intra-only) is appended
    so both parser paths get exercised by the fixtures.
    """
    from v6spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("make_avi needs at least one frame")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f, quality=quality) for f in frames]
    max_size = max(len(p) for p in payloads)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_size * fps,    # dwMaxBytesPerSec (upper bound)
        0,                 # dwPaddingGranularity
        0x10,              # AVIF_HASINDEX
        len(payloads), 0, 1, max_size,
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sI2H8I4h",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,            # dwScale / dwRate -> fps
        0, len(payloads), max_size,
        0xFFFFFFFF,        # dwQuality: default
        0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40, w, h, 1, 24, int.from_bytes(b"MJPG", "little"),
        w * h * 3, 0, 0, 0, 0,
    )

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = lst(b"movi", movi_body)

    # idx1 offsets are relative to the position of the 'movi' fourcc
    idx_entries, off = [], 4  # first chunk starts 4 bytes past the fourcc
    for p in payloads:
        idx_entries.append(struct.pack("<4s3I", b"00dc", _AVIIF_KEYFRAME, off, len(p)))
        off += 8 + len(p) + (len(p) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _parse_strl(data: bytes, pos: int, end: int) -> dict:
    stream: dict = {}
    for fourcc, body, size in _chunks(data, pos, end):
        if fourcc == b"strh" and size >= 48:
            fcc_type, handler, _flags, _pri, _lang, _init, scale, rate, _start, length = struct.unpack_from("<4s4s I 2H 5I", data, body)
            stream.update(
                kind={b"vids": "video", b"auds": "audio"}.get(fcc_type, fcc_type.decode("ascii", "replace")),
                codec=handler.decode("ascii", "replace").strip("\x00"),
                scale=scale, rate=rate, length=length,
            )
        elif fourcc == b"strf" and stream.get("kind") == "video" and size >= 40:
            _bisize, w, h, _planes, _bits, compression = struct.unpack_from("<I2i2HI", data, body)
            fcc = struct.pack("<I", compression)
            stream.update(width=w, height=abs(h))
            if fcc.isalnum():  # biCompression can be a fourcc or a BI_* enum
                stream["codec"] = fcc.decode("ascii")
    return stream


def parse_avi_info(payload: bytes) -> dict:
    """One linear chunk walk -> container metadata.

    Returns ``{width, height, fps, n_frames, duration_s, streams}``
    where ``streams`` is a per-stream list of
    ``{kind, codec, scale, rate, length, [width, height]}``.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    streams: list[dict] = []
    avih = None
    for fourcc, body, size in _chunks(payload, 12, len(payload)):
        if fourcc != b"LIST" or payload[body : body + 4] != b"hdrl":
            continue
        for f2, b2, s2 in _chunks(payload, body + 4, body + size):
            if f2 == b"avih" and s2 >= 40:
                avih = struct.unpack_from("<10I", payload, b2)
            elif f2 == b"LIST" and payload[b2 : b2 + 4] == b"strl":
                streams.append(_parse_strl(payload, b2 + 4, b2 + s2))
    if avih is None:
        raise ValueError("AVI without avih header")
    usec_pf, _, _, _, total_frames, _, _, _, w, h = avih
    video = next((s for s in streams if s.get("kind") == "video"), {})
    fps = (video["rate"] / video["scale"]) if video.get("scale") else (1e6 / usec_pf if usec_pf else 0.0)
    return {
        "width": w or video.get("width", 0),
        "height": h or video.get("height", 0),
        "fps": fps,
        "n_frames": total_frames,
        "duration_s": total_frames / fps if fps else 0.0,
        "streams": streams,
    }


def avi_frame_table(payload: bytes, stream: int = 0) -> list[dict]:
    """Per-frame byte index for one stream: ``[{frame_idx, offset,
    size, keyframe, timestamp_ms}]`` with ``offset`` ABSOLUTE into
    the payload (executors slice ``payload[offset:offset+size]``).

    Offsets come from the authoritative ``movi`` walk; the optional
    ``idx1`` contributes only per-frame keyframe flags (MJPEG streams
    are intra-only so a missing index defaults keyframe to True for
    MJPG, None otherwise).
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    prefix = b"%02d" % stream
    frames: list[dict] = []
    keyflags: list[bool] = []
    info = parse_avi_info(payload)
    fps = info["fps"] or 0.0
    is_mjpg = any(s.get("kind") == "video" and s.get("codec") == "MJPG" for s in info["streams"][stream : stream + 1])
    for fourcc, body, size in _chunks(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[body : body + 4] == b"movi":
            for f2, b2, s2 in _chunks(payload, body + 4, body + size):
                if f2[:2] == prefix and f2[2:] in (b"dc", b"db"):
                    frames.append({
                        "frame_idx": len(frames),
                        "offset": b2,
                        "size": s2,
                        "keyframe": True if (f2[2:] == b"db" or is_mjpg) else None,
                        "timestamp_ms": len(frames) * 1000.0 / fps if fps else None,
                    })
        elif fourcc == b"idx1":
            for off in range(body, body + size - 15, 16):
                ckid, flags = struct.unpack_from("<4sI", payload, off)
                if ckid[:2] == prefix and ckid[2:] in (b"dc", b"db"):
                    keyflags.append(bool(flags & _AVIIF_KEYFRAME))
    for fr, kf in zip(frames, keyflags):
        fr["keyframe"] = kf
    return frames
