"""Embedded media metadata: EXIF (JPEG), ID3v2 (MP3), SRT/VTT
captions — the fields corpus curation actually filters on.

Real corpora filter and join on embedded metadata: capture time and
orientation (EXIF), title/artist (ID3), and caption text aligned to
video time (SRT/VTT — the text half of a video-text training pair).
All parsers here are stdlib byte-walks over PUBLIC formats, the same
honest-decode posture as the container parsers, and every Spark
entry point is an Arrow-batched ``mapInPandas`` over payload bytes —
metadata rows out, payloads never shuffled.

``align_captions_to_frames`` is the composition piece: captions
(time ranges) x frame_index (timestamps) resolve with a range
predicate against the BROADCAST caption side per media id — each
frame picks up the caption on screen at its timestamp, the join a
video-text pairing pipeline runs before packing.
"""

from __future__ import annotations

import re
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------------ EXIF

# TIFF/EXIF tags worth surfacing (public tag ids)
_EXIF_TAGS = {
    0x010F: "make", 0x0110: "model", 0x0112: "orientation",
    0x0132: "datetime", 0x8769: "_exif_ifd",
    0x9003: "datetime_original", 0xA002: "pixel_x", 0xA003: "pixel_y",
    0x8827: "iso",
}


def _ifd_entries(data: bytes, off: int, endian: str):
    (n,) = struct.unpack_from(endian + "H", data, off)
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(endian + "HHI", data, base)
        yield tag, typ, cnt, base + 8


def _ifd_value(data: bytes, typ: int, cnt: int, vpos: int, endian: str):
    size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}.get(typ, 1) * cnt
    if size > 4:
        (vpos,) = struct.unpack_from(endian + "I", data, vpos)
    if typ == 2:  # ASCII
        raw = data[vpos : vpos + cnt]
        return raw.split(b"\x00")[0].decode("ascii", "replace")
    if typ == 3:
        return struct.unpack_from(endian + "H", data, vpos)[0]
    if typ == 4:
        return struct.unpack_from(endian + "I", data, vpos)[0]
    if typ == 5:  # rational
        num, den = struct.unpack_from(endian + "II", data, vpos)
        return num / den if den else None
    return None


def parse_exif(payload: bytes) -> dict:
    """EXIF fields from a JPEG's APP1 segment (TIFF IFD walk).

    Returns {} when no EXIF is present — absence is data, not an
    error.  Both byte orders (II/MM) handled; the EXIF sub-IFD
    (DateTimeOriginal, pixel dims, ISO) is followed one level.
    """
    pos = 2
    tiff = None
    while pos + 4 <= len(payload) and payload[pos] == 0xFF:
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        if marker == 0xE1 and payload[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = payload[pos + 10 : pos + 2 + length]
            break
        if marker == 0xDA:  # entropy data begins; no EXIF ahead
            break
        pos += 2 + length
    if tiff is None or len(tiff) < 8:
        return {}
    endian = "<" if tiff[:2] == b"II" else ">"
    (ifd0,) = struct.unpack_from(endian + "I", tiff, 4)
    out: dict = {}

    def walk(off: int) -> None:
        try:
            for tag, typ, cnt, vpos in _ifd_entries(tiff, off, endian):
                name = _EXIF_TAGS.get(tag)
                if name == "_exif_ifd":
                    (sub,) = struct.unpack_from(endian + "I", tiff, vpos)
                    walk(sub)
                elif name:
                    v = _ifd_value(tiff, typ, cnt, vpos, endian)
                    if v is not None:
                        out[name] = v
        except (struct.error, IndexError):
            pass  # truncated IFD: keep what parsed

    walk(ifd0)
    return out


def make_exif_jpeg(img, fields: dict, quality: int = 90) -> bytes:
    """Fixture: a real JPEG with a minimal valid EXIF APP1 spliced in
    (II byte order, IFD0 with the given ASCII/SHORT fields)."""
    from v6spark.operators.jpeg import encode_jpeg

    base = encode_jpeg(img, quality=quality)
    entries, blobs = [], b""
    # place value blobs after the IFD: 8 (header) + 2 + 12n + 4
    names = {v: k for k, v in _EXIF_TAGS.items()}
    items = sorted((names[k], v) for k, v in fields.items())
    blob_base = 8 + 2 + 12 * len(items) + 4
    for tag, value in items:
        if isinstance(value, int):
            entries.append(struct.pack("<HHI4s", tag, 3, 1, struct.pack("<HH", value, 0)))
        else:
            raw = value.encode() + b"\x00"
            if len(raw) <= 4:
                entries.append(struct.pack("<HHI4s", tag, 2, len(raw), raw.ljust(4, b"\x00")))
            else:
                entries.append(struct.pack("<HHII", tag, 2, len(raw), blob_base + len(blobs)))
                blobs += raw
    tiff = b"II*\x00" + struct.pack("<I", 8) \
        + struct.pack("<H", len(items)) + b"".join(entries) \
        + struct.pack("<I", 0) + blobs
    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    return base[:2] + seg + base[2:]


# ------------------------------------------------------------------- ID3v2

def parse_id3(payload: bytes) -> dict:
    """ID3v2.3/2.4 text frames (TIT2 title, TPE1 artist, TALB album,
    TYER/TDRC year) from an MP3's leading tag; {} when untagged."""
    if payload[:3] != b"ID3":
        return {}
    major = payload[3]
    size = 0
    for b in payload[6:10]:  # syncsafe
        size = (size << 7) | (b & 0x7F)
    end = 10 + size
    pos = 10
    names = {b"TIT2": "title", b"TPE1": "artist", b"TALB": "album",
             b"TYER": "year", b"TDRC": "year"}
    out: dict = {}
    while pos + 10 <= min(end, len(payload)):
        fid = payload[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break
        if major == 4:
            fsize = 0
            for b in payload[pos + 4 : pos + 8]:
                fsize = (fsize << 7) | (b & 0x7F)
        else:
            (fsize,) = struct.unpack_from(">I", payload, pos + 4)
        body = payload[pos + 10 : pos + 10 + fsize]
        name = names.get(fid)
        if name and body:
            enc, text = body[0], body[1:]
            if enc == 1 and text[:2] in (b"\xff\xfe", b"\xfe\xff"):
                out[name] = text.decode("utf-16", "replace").strip("\x00")
            elif enc == 3:
                out[name] = text.decode("utf-8", "replace").strip("\x00")
            else:
                out[name] = text.decode("latin-1", "replace").strip("\x00")
        pos += 10 + fsize
    return out


def make_id3_mp3(fields: dict, n_frames: int = 4) -> bytes:
    """Fixture: ID3v2.3 tag + valid MP3 frame stream (via make_mp3)."""
    from v6spark.operators.media_containers import make_mp3

    names = {"title": b"TIT2", "artist": b"TPE1", "album": b"TALB", "year": b"TYER"}
    body = b""
    for k, v in sorted(fields.items()):
        payload = b"\x03" + v.encode("utf-8")
        body += names[k] + struct.pack(">I", len(payload)) + b"\x00\x00" + payload
    size = len(body)
    syncsafe = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                      (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3\x03\x00\x00" + syncsafe + body + make_mp3(n_frames=n_frames)


# -------------------------------------------------------------- SRT / VTT

_TS_RE = re.compile(
    r"(?:(\d+):)?(\d{1,2}):(\d{2})[.,](\d{3})"
)


def _ts_ms(m) -> int:
    h = int(m.group(1) or 0)
    return ((h * 60 + int(m.group(2))) * 60 + int(m.group(3))) * 1000 + int(m.group(4))


def parse_captions(text: str) -> list[dict]:
    """SRT or WebVTT -> [{idx, start_ms, end_ms, text}] (one linear
    pass; cue ids/headers/NOTE blocks skipped; multi-line cue text
    joined with spaces)."""
    cues = []
    cur = None
    for line in text.splitlines():
        line = line.strip("﻿").rstrip()
        if "-->" in line:
            times = _TS_RE.findall(line) and list(_TS_RE.finditer(line))
            if times and len(times) >= 2:
                cur = {"idx": len(cues), "start_ms": _ts_ms(times[0]),
                       "end_ms": _ts_ms(times[1]), "text": []}
            continue
        if cur is not None:
            if line == "":
                if cur["text"]:
                    cur["text"] = " ".join(cur["text"])
                    cues.append(cur)
                cur = None
            elif not line.startswith("NOTE"):
                cur["text"].append(line)
    if cur is not None and cur["text"]:
        cur["text"] = " ".join(cur["text"])
        cues.append(cur)
    return cues


def caption_table(df: DataFrame, text_col: str = "payload") -> DataFrame:
    """(media_id, idx, start_ms, end_ms, text) from SRT/VTT payloads
    (bytes or string column)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "idx": [], "start_ms": [], "end_ms": [], "text": [],
            }
            for mid, raw in zip(pdf["media_id"], pdf[text_col]):
                s = raw.decode("utf-8", "replace") if isinstance(raw, (bytes, bytearray)) else (raw or "")
                for cue in parse_captions(s):
                    out["media_id"].append(mid)
                    out["idx"].append(cue["idx"])
                    out["start_ms"].append(cue["start_ms"])
                    out["end_ms"].append(cue["end_ms"])
                    out["text"].append(cue["text"])
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches,
        schema="media_id long, idx int, start_ms long, end_ms long, text string",
    )


def align_captions_to_frames(frames: DataFrame, captions: DataFrame) -> DataFrame:
    """frame_index x caption_table -> each frame with the caption on
    screen at its timestamp (NULL when none).

    Plan shape: equi-join on media_id with the caption side
    BROADCAST (captions are KBs per video against frames'
    potentially huge index), then the range predicate
    ``start_ms <= ts < end_ms`` filters in the same stage — the
    standard broadcast range join, no shuffle of the frame index.
    """
    c = captions.select(
        F.col("media_id"),
        F.col("start_ms"), F.col("end_ms"),
        F.col("text").alias("caption"),
    )
    cond = (
        (frames["media_id"] == c["media_id"])
        & (frames["timestamp_ms"] >= c["start_ms"])
        & (frames["timestamp_ms"] < c["end_ms"])
    )
    return (
        frames.join(F.broadcast(c), cond, "left")
        .drop(c["media_id"])
        .drop("start_ms", "end_ms")
    )


# ------------------------------------------------------- Spark entry point

def media_metadata(df: DataFrame) -> DataFrame:
    """(media_id, kind, metadata map<string,string>): EXIF for JPEG,
    ID3 for MP3, {} otherwise — the curation-filter fields, one
    header-level pass, payloads never shuffled."""
    from v6spark.operators.multimodal import sniff_format

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"media_id": [], "kind": [], "metadata": []}
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(p)
                fmt = sniff_format(payload)
                meta: dict = {}
                if fmt == "jpeg":
                    meta = parse_exif(payload)
                elif fmt == "mp3":
                    meta = parse_id3(payload)
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["metadata"].append({k: str(v) for k, v in meta.items()})
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches, schema="media_id long, kind string, metadata map<string,string>"
    )


# ------------------------------------------------- orientation handling

def apply_exif_orientation(img, orientation: int):
    """HxWxC array transformed per the EXIF orientation tag (1-8) —
    the standard camera-rotation normalization; unknown values pass
    through unchanged."""
    import numpy as np

    o = int(orientation)
    if o == 2:
        return img[:, ::-1]
    if o == 3:
        return img[::-1, ::-1]
    if o == 4:
        return img[::-1]
    if o == 5:
        return np.rot90(img[:, ::-1], 1)
    if o == 6:
        return np.rot90(img, 3)
    if o == 7:
        return np.rot90(img[:, ::-1], 3)
    if o == 8:
        return np.rot90(img, 1)
    return img


def oriented_phash_bytes(payload: bytes) -> int:
    """pHash with EXIF orientation applied first: a camera-rotated
    re-upload (pixels stored rotated, orientation tag set) hashes
    like its upright original — plain pHash would miss the pair."""
    from v6spark.operators.media_fingerprint import (
        _bilinear, _dct_matrix, _pack_bits, _to_gray,
    )
    from v6spark.operators.multimodal import decode_image_array, sniff_format

    import numpy as np

    _w, _h, _c, img = decode_image_array(payload)
    if sniff_format(payload) == "jpeg":
        o = parse_exif(payload).get("orientation")
        if o:
            img = apply_exif_orientation(img, o)
    small = _bilinear(_to_gray(np.ascontiguousarray(img)), 32, 32)
    d = _dct_matrix(32)
    coefs = (d @ small @ d.T)[:8, :8]
    flat = coefs.ravel()
    return _pack_bits(flat > np.median(flat[1:]))
