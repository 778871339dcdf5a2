"""MP3 / MP4 (ISO BMFF) / WebM (EBML) CONTAINER parsing, stdlib-only.

Shrinks the honest MP3/MP4/WebM gap in the multimodal tier
(SURVEY.md §2.2, multimodal columns) to exactly the entropy
decoders: what a 100 TB media-corpus metadata pass actually needs —
codec identification, duration/bitrate/timing, track geometry, and
per-frame byte segmentation (the offsets ``frame_sample`` uses to
slice encoded frames out of ``mdat``/Clusters) — is parsed for REAL
from the container structure, no external library.  What still
raises ``NotImplementedError`` is pixel/audio synthesis (H.264/VP9
reconstruction, MP3 hybrid filterbank), which is ffmpeg/libmad-class
work this environment cannot host.

MP3: frame-sync walk.  Each frame header is 4 bytes
(sync/version/layer/bitrate/samplerate/padding/channel-mode); frame
byte length and samples-per-frame follow from public tables, so one
linear walk yields frame count, duration, average bitrate, and a
VBR flag.  ID3v2 prefix tags are skipped via their syncsafe size.

MP4: box (atom) walk.  ``moov/trak/mdia/minf/stbl`` carries, per
track, the codec fourcc (``stsd``), sample sizes (``stsz``), timing
(``stts``), chunk offsets (``stco``/``co64``), and the
sample-to-chunk map (``stsc``); :func:`mp4_sample_table` resolves
the full stsc/stco/stsz join into absolute ``(offset, size, dts)``
per sample — the random-access index a distributed frame extractor
partitions over.

Fixture builders (:func:`make_mp3`, :func:`make_mp4`) emit
spec-shaped streams with synthetic payload bytes so tests can verify
the segmentation maps back to exactly the right byte slices.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------- MP3

# bitrate kbps by (mpeg1?, layer) -> index 1..14; index 0 is "free"
_BITRATE_KBPS = {
    (True, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (True, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (True, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (False, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (False, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (False, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
# sample rate Hz by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1) then 2-bit index
_SAMPLE_RATES = {
    3: [44100, 48000, 32000],  # MPEG1
    2: [22050, 24000, 16000],  # MPEG2
    0: [11025, 12000, 8000],   # MPEG2.5
}


def _mp3_frame(header: int) -> dict | None:
    """Parse one 32-bit MP3 frame header; None if not a valid sync."""
    if (header >> 21) & 0x7FF != 0x7FF:
        return None
    version_bits = (header >> 19) & 0x3
    layer_bits = (header >> 17) & 0x3
    if version_bits == 1 or layer_bits == 0:
        return None  # reserved
    layer = 4 - layer_bits  # 3->Layer I ... 1->Layer III
    bitrate_idx = (header >> 12) & 0xF
    rate_idx = (header >> 10) & 0x3
    if bitrate_idx in (0, 0xF) or rate_idx == 3:
        return None  # free-format / bad
    mpeg1 = version_bits == 3
    sample_rate = _SAMPLE_RATES[version_bits][rate_idx]
    bitrate = _BITRATE_KBPS[(mpeg1, layer)][bitrate_idx] * 1000
    padding = (header >> 9) & 0x1
    channel_mode = (header >> 6) & 0x3
    if layer == 1:
        frame_len = (12 * bitrate // sample_rate + padding) * 4
        samples = 384
    else:
        if layer == 3 and not mpeg1:
            frame_len = 72 * bitrate // sample_rate + padding
            samples = 576
        else:
            frame_len = 144 * bitrate // sample_rate + padding
            samples = 1152
    return {
        "mpeg1": mpeg1,
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": sample_rate,
        "channels": 1 if channel_mode == 3 else 2,
        "frame_len": frame_len,
        "samples": samples,
    }


def parse_mp3_info(payload: bytes) -> dict:
    """Linear frame-sync walk -> stream-level metadata.

    Returns ``{n_frames, sample_rate, channels, duration_s,
    bitrate_kbps (average), layer, mpeg1, vbr}``.  Raises
    ``ValueError`` when no valid frame sync is found (so corrupt
    payloads surface as errors, not silent zero-frame rows).
    """
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        # ID3v2: 4 syncsafe size bytes at offset 6
        size = 0
        for b in payload[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    n_frames = 0
    total_samples = 0
    total_bytes = 0
    sample_rate = channels = layer = 0
    mpeg1 = True
    bitrates: set[int] = set()
    while pos + 4 <= len(payload):
        (header,) = struct.unpack_from(">I", payload, pos)
        fr = _mp3_frame(header)
        if fr is None:
            if n_frames == 0:
                pos += 1  # resync scan until the first real frame
                continue
            break  # trailing garbage / ID3v1 tag after valid frames
        if n_frames == 0:
            sample_rate = fr["sample_rate"]
            channels = fr["channels"]
            layer = fr["layer"]
            mpeg1 = fr["mpeg1"]
        n_frames += 1
        total_samples += fr["samples"]
        total_bytes += fr["frame_len"]
        bitrates.add(fr["bitrate"])
        pos += fr["frame_len"]
    if n_frames == 0:
        raise ValueError("no MP3 frame sync found")
    duration = total_samples / sample_rate
    return {
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "channels": channels,
        "duration_s": duration,
        "bitrate_kbps": int(round(total_bytes * 8 / duration / 1000)),
        "layer": layer,
        "mpeg1": mpeg1,
        "vbr": len(bitrates) > 1,
    }


def make_mp3(
    n_frames: int = 10,
    sample_rate: int = 44100,
    bitrate_kbps: int = 128,
    channels: int = 2,
    id3: bytes | None = None,
) -> bytes:
    """Spec-shaped MPEG1 Layer III stream: valid frame headers +
    deterministic filler payload (header walk is what's under test —
    this module never claims audio synthesis)."""
    rate_idx = _SAMPLE_RATES[3].index(sample_rate)
    bitrate_idx = _BITRATE_KBPS[(True, 3)].index(bitrate_kbps)
    header = (
        (0x7FF << 21)
        | (3 << 19)  # MPEG1
        | (1 << 17)  # Layer III
        | (bitrate_idx << 12)
        | (rate_idx << 10)
        | (0 << 9)  # no padding
        | ((3 if channels == 1 else 0) << 6)
    )
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    out = bytearray()
    if id3 is not None:
        size = len(id3)
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + ss + id3
    for i in range(n_frames):
        out += struct.pack(">I", header)
        out += bytes((i + j) % 251 for j in range(frame_len - 4))
    return bytes(out)


# ---------------------------------------------------------------- MP4


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, box_end) for each top box in range."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed MP4 box structure")
        yield fourcc, body, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, path: list[bytes]):
    """Descend a fourcc path; returns (body_start, box_end) or None."""
    for fourcc, body, box_end in _walk_boxes(data, start, end):
        if fourcc == path[0]:
            if len(path) == 1:
                return body, box_end
            return _find_box(data, body, box_end, path[1:])
    return None


def _fullbox(data: bytes, body: int) -> tuple[int, int]:
    """(version, flags-skipped body offset) of a FullBox."""
    return data[body], body + 4


def _parse_stbl(data: bytes, body: int, end: int) -> dict:
    t: dict = {}
    for fourcc, b, e in _walk_boxes(data, body, end):
        if fourcc == b"stsd":
            _, p = _fullbox(data, b)
            (n_entries,) = struct.unpack_from(">I", data, p)
            entries = []
            q = p + 4
            for _ in range(n_entries):
                (esize,) = struct.unpack_from(">I", data, q)
                entries.append(data[q + 4 : q + 8].decode("latin1"))
                q += esize
            t["codecs"] = entries
        elif fourcc == b"stsz":
            _, p = _fullbox(data, b)
            uniform, count = struct.unpack_from(">II", data, p)
            if uniform:
                t["sample_sizes"] = [uniform] * count
            else:
                t["sample_sizes"] = list(
                    struct.unpack_from(f">{count}I", data, p + 8)
                )
            t["n_samples"] = count
        elif fourcc == b"stts":
            _, p = _fullbox(data, b)
            (n,) = struct.unpack_from(">I", data, p)
            t["stts"] = [
                struct.unpack_from(">II", data, p + 4 + 8 * i) for i in range(n)
            ]
        elif fourcc in (b"stco", b"co64"):
            _, p = _fullbox(data, b)
            (n,) = struct.unpack_from(">I", data, p)
            fmt = ">I" if fourcc == b"stco" else ">Q"
            width = 4 if fourcc == b"stco" else 8
            t["chunk_offsets"] = [
                struct.unpack_from(fmt, data, p + 4 + width * i)[0]
                for i in range(n)
            ]
        elif fourcc == b"stsc":
            _, p = _fullbox(data, b)
            (n,) = struct.unpack_from(">I", data, p)
            t["stsc"] = [
                struct.unpack_from(">III", data, p + 4 + 12 * i)
                for i in range(n)
            ]
    return t


def parse_mp4_info(payload: bytes) -> dict:
    """ISO BMFF structure -> ``{brand, timescale, duration_s,
    tracks: [{kind, codec, width, height, timescale, duration_s,
    n_samples}]}``.  Box walk only — no entropy decode."""
    if payload[4:8] not in (b"ftyp", b"moov", b"mdat", b"free", b"wide"):
        raise ValueError("not an ISO BMFF (MP4) payload")
    brand = payload[8:12].decode("latin1") if payload[4:8] == b"ftyp" else ""
    moov = _find_box(payload, 0, len(payload), [b"moov"])
    if moov is None:
        raise ValueError("MP4 without moov box (streaming-only fragment?)")
    mbody, mend = moov
    info: dict = {"brand": brand, "tracks": []}
    for fourcc, b, e in _walk_boxes(payload, mbody, mend):
        if fourcc == b"mvhd":
            ver, p = _fullbox(payload, b)
            if ver == 1:
                _c, _m, ts, dur = struct.unpack_from(">QQIQ", payload, p)
            else:
                _c, _m, ts, dur = struct.unpack_from(">IIII", payload, p)
            info["timescale"] = ts
            info["duration_s"] = dur / ts if ts else 0.0
        elif fourcc == b"trak":
            track: dict = {}
            tkhd = _find_box(payload, b, e, [b"tkhd"])
            if tkhd:
                ver, p = _fullbox(payload, tkhd[0])
                # width/height are the LAST two 16.16 fixed fields
                w, h = struct.unpack_from(">II", payload, tkhd[1] - 8)
                track["width"] = w >> 16
                track["height"] = h >> 16
            mdhd = _find_box(payload, b, e, [b"mdia", b"mdhd"])
            if mdhd:
                ver, p = _fullbox(payload, mdhd[0])
                if ver == 1:
                    _c, _m, ts, dur = struct.unpack_from(">QQIQ", payload, p)
                else:
                    _c, _m, ts, dur = struct.unpack_from(">IIII", payload, p)
                track["timescale"] = ts
                track["duration_s"] = dur / ts if ts else 0.0
            hdlr = _find_box(payload, b, e, [b"mdia", b"hdlr"])
            if hdlr:
                _, p = _fullbox(payload, hdlr[0])
                track["kind"] = payload[p + 4 : p + 8].decode("latin1")
            stbl = _find_box(payload, b, e, [b"mdia", b"minf", b"stbl"])
            if stbl:
                t = _parse_stbl(payload, *stbl)
                track["codec"] = (t.get("codecs") or [""])[0]
                track["n_samples"] = t.get("n_samples", 0)
            info["tracks"].append(track)
    return info


def mp4_sample_table(payload: bytes, kind: str = "vide") -> list[dict]:
    """Resolve stsc×stco×stsz×stts into absolute byte segmentation:
    one ``{sample_idx, offset, size, dts, duration}`` per sample of
    the first track whose handler matches ``kind``.

    This is the index a distributed frame extractor partitions over —
    each executor seeks straight to its samples; nothing is decoded.
    """
    moov = _find_box(payload, 0, len(payload), [b"moov"])
    if moov is None:
        raise ValueError("MP4 without moov box")
    for fourcc, b, e in _walk_boxes(payload, *moov):
        if fourcc != b"trak":
            continue
        hdlr = _find_box(payload, b, e, [b"mdia", b"hdlr"])
        if hdlr is None:
            continue
        _, p = _fullbox(payload, hdlr[0])
        if payload[p + 4 : p + 8].decode("latin1") != kind:
            continue
        stbl = _find_box(payload, b, e, [b"mdia", b"minf", b"stbl"])
        if stbl is None:
            continue
        t = _parse_stbl(payload, *stbl)
        sizes = t.get("sample_sizes", [])
        chunks = t.get("chunk_offsets", [])
        stsc = t.get("stsc", [])
        stts = t.get("stts", [])
        # expand the sample->chunk run-length map
        samples_per_chunk = []
        for i, (first_chunk, per_chunk, _desc) in enumerate(stsc):
            last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(chunks)
            samples_per_chunk += [per_chunk] * (last - (first_chunk - 1))
        # per-sample dts from stts run lengths
        deltas: list[int] = []
        for count, delta in stts:
            deltas += [delta] * count
        out = []
        si = 0
        dts = 0
        for ci, chunk_off in enumerate(chunks):
            off = chunk_off
            for _ in range(samples_per_chunk[ci] if ci < len(samples_per_chunk) else 0):
                if si >= len(sizes):
                    break
                d = deltas[si] if si < len(deltas) else 0
                out.append(
                    {
                        "sample_idx": si,
                        "offset": off,
                        "size": sizes[si],
                        "dts": dts,
                        "duration": d,
                    }
                )
                off += sizes[si]
                dts += d
                si += 1
        return out
    raise ValueError(f"no {kind!r} track found")


def _box(fourcc: bytes, *parts: bytes) -> bytes:
    body = b"".join(parts)
    return struct.pack(">I", len(body) + 8) + fourcc + body


def _full(fourcc: bytes, version: int, *parts: bytes) -> bytes:
    return _box(fourcc, bytes([version, 0, 0, 0]), *parts)


def make_mp4(
    width: int = 64,
    height: int = 48,
    sample_sizes: list[int] | None = None,
    timescale: int = 600,
    sample_duration: int = 20,
    codec: bytes = b"avc1",
    seed: int = 0,
) -> bytes:
    """Minimal ISO BMFF file with one video track: ftyp + mdat
    (deterministic per-sample payload bytes, so segmentation tests
    can check exact slices) + moov with a full stbl (2-samples-per-
    chunk stsc to exercise the run-length map)."""
    if sample_sizes is None:
        sample_sizes = [40, 25, 33, 18, 52]
    n = len(sample_sizes)
    payloads = [
        bytes((seed + i * 7 + j) % 253 for j in range(sz))
        for i, sz in enumerate(sample_sizes)
    ]
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 512), b"isomiso2mp41")
    mdat_body = b"".join(payloads)
    # chunk layout: 2 samples per chunk (last chunk may be short)
    chunk_sizes = [
        sum(sample_sizes[i : i + 2]) for i in range(0, n, 2)
    ]
    mdat_start = len(ftyp)
    first_sample_off = mdat_start + 8
    chunk_offsets = []
    off = first_sample_off
    for cs in chunk_sizes:
        chunk_offsets.append(off)
        off += cs
    mdat = _box(b"mdat", mdat_body)
    duration = n * sample_duration

    stsd = _full(
        b"stsd", 0, struct.pack(">I", 1),
        _box(
            codec,
            b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_ref_idx
            + b"\x00" * 16
            + struct.pack(">HH", width, height)
            + b"\x00" * 50,
        ),
    )
    stts = _full(b"stts", 0, struct.pack(">III", 1, n, sample_duration))
    stsc = _full(b"stsc", 0, struct.pack(">I", 1), struct.pack(">III", 1, 2, 1))
    stsz = _full(
        b"stsz", 0, struct.pack(">II", 0, n),
        struct.pack(f">{n}I", *sample_sizes),
    )
    stco = _full(
        b"stco", 0, struct.pack(">I", len(chunk_offsets)),
        struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets),
    )
    stbl = _box(b"stbl", stsd, stts, stsc, stsz, stco)
    vmhd = _full(b"vmhd", 0, b"\x00" * 8)
    dinf = _box(b"dinf", _full(b"dref", 0, struct.pack(">I", 1), _full(b"url ", 0)))
    minf = _box(b"minf", vmhd, dinf, stbl)
    hdlr = _full(b"hdlr", 0, b"\x00" * 4, b"vide", b"\x00" * 12, b"video\x00")
    mdhd = _full(
        b"mdhd", 0, struct.pack(">IIII", 0, 0, timescale, duration),
        struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    mdia = _box(b"mdia", mdhd, hdlr, minf)
    tkhd = _full(
        b"tkhd", 0,
        struct.pack(">IIII", 0, 0, 1, 0),  # created, modified, track_id, rsvd
        struct.pack(">I", duration),
        b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd, mdia)
    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, timescale, duration),
        struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    moov = _box(b"moov", mvhd, trak)
    return ftyp + mdat + moov


# ------------------------------------------------------- WebM / EBML


def _vint(data: bytes, pos: int, keep_marker: bool = False):
    """EBML variable-length integer at ``pos`` ->
    (value, next_pos, is_unknown_size).  Element IDs keep the length
    marker bit (that is how Matroska spells them); sizes strip it,
    and an all-ones size means "unknown — extends to parent end"
    (live-stream Segments)."""
    if pos >= len(data):
        raise ValueError("truncated EBML varint")
    b0 = data[pos]
    if b0 == 0:
        raise ValueError("invalid EBML varint (>8 bytes)")
    length, mask = 1, 0x80
    while not (b0 & mask):
        mask >>= 1
        length += 1
    if pos + length > len(data):
        raise ValueError("truncated EBML varint")
    val = b0 if keep_marker else (b0 & (mask - 1))
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    unknown = (not keep_marker) and val == (1 << (7 * length)) - 1
    return val, pos + length, unknown


def _ebml_children(data: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) for each child."""
    while pos < end:
        eid, p1, _ = _vint(data, pos, keep_marker=True)
        size, p2, unknown = _vint(data, p1)
        body_end = end if unknown else p2 + size
        if body_end > end:
            raise ValueError("malformed EBML: element overruns parent")
        yield eid, p2, body_end
        pos = body_end


def _ebml_uint(data: bytes, start: int, end: int) -> int:
    return int.from_bytes(data[start:end], "big")


def _ebml_float(data: bytes, start: int, end: int) -> float:
    n = end - start
    if n == 4:
        return struct.unpack(">f", data[start:end])[0]
    if n == 8:
        return struct.unpack(">d", data[start:end])[0]
    raise ValueError(f"EBML float must be 4 or 8 bytes, got {n}")


_EBML_HEADER = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_DOCTYPE = 0x4282
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIX_W = 0xB0
_PIX_H = 0xBA
_AUDIO = 0xE1
_SAMPLE_FREQ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1


def _webm_segment(payload: bytes) -> tuple[int, int]:
    if payload[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML (WebM/Matroska) payload")
    doc_type = ""
    for eid, b, e in _ebml_children(payload, 0, len(payload)):
        if eid == _EBML_HEADER:
            for cid, cb, ce in _ebml_children(payload, b, e):
                if cid == _DOCTYPE:
                    doc_type = payload[cb:ce].rstrip(b"\x00").decode("latin1")
        elif eid == _SEGMENT:
            return b, e, doc_type
    raise ValueError("EBML without Segment element")


def parse_webm_info(payload: bytes) -> dict:
    """Matroska/WebM structure -> ``{doc_type, timescale_ns,
    duration_s, tracks: [{number, kind, codec, width, height,
    sample_rate, channels}]}``.  EBML element walk only — no codec."""
    seg_b, seg_e, doc_type = _webm_segment(payload)
    info: dict = {"doc_type": doc_type, "timescale_ns": 1_000_000,
                  "duration_s": None, "tracks": []}
    duration_ticks = None
    for eid, b, e in _ebml_children(payload, seg_b, seg_e):
        if eid == _INFO:
            for cid, cb, ce in _ebml_children(payload, b, e):
                if cid == _TIMESTAMP_SCALE:
                    info["timescale_ns"] = _ebml_uint(payload, cb, ce)
                elif cid == _DURATION:
                    duration_ticks = _ebml_float(payload, cb, ce)
        elif eid == _TRACKS:
            for tid, tb, te in _ebml_children(payload, b, e):
                if tid != _TRACK_ENTRY:
                    continue
                trk: dict = {}
                for cid, cb, ce in _ebml_children(payload, tb, te):
                    if cid == _TRACK_NUMBER:
                        trk["number"] = _ebml_uint(payload, cb, ce)
                    elif cid == _TRACK_TYPE:
                        t = _ebml_uint(payload, cb, ce)
                        trk["kind"] = {1: "video", 2: "audio"}.get(t, str(t))
                    elif cid == _CODEC_ID:
                        trk["codec"] = payload[cb:ce].decode("latin1")
                    elif cid == _VIDEO:
                        for vid, vb, ve in _ebml_children(payload, cb, ce):
                            if vid == _PIX_W:
                                trk["width"] = _ebml_uint(payload, vb, ve)
                            elif vid == _PIX_H:
                                trk["height"] = _ebml_uint(payload, vb, ve)
                    elif cid == _AUDIO:
                        for aid, ab, ae in _ebml_children(payload, cb, ce):
                            if aid == _SAMPLE_FREQ:
                                trk["sample_rate"] = _ebml_float(payload, ab, ae)
                            elif aid == _CHANNELS:
                                trk["channels"] = _ebml_uint(payload, ab, ae)
                info["tracks"].append(trk)
    if duration_ticks is not None:
        info["duration_s"] = duration_ticks * info["timescale_ns"] / 1e9
    return info


def webm_block_table(payload: bytes, track_number: int | None = None) -> list[dict]:
    """Per-frame byte segmentation from Cluster SimpleBlocks/Blocks:
    ``{block_idx, track, timestamp_ns, keyframe, offset, size}`` with
    ``offset`` pointing at the ENCODED frame bytes inside the payload
    (the codec bitstream — VP8/VP9/AV1 pixel decode needs ffmpeg,
    honest scope, same contract as :func:`mp4_sample_table`).

    Laced blocks (multiple frames per block) raise
    ``NotImplementedError`` — the dominant video layout is one frame
    per SimpleBlock; lacing is an audio-packing micro-optimization.
    """
    seg_b, seg_e, _doc = _webm_segment(payload)
    scale = 1_000_000
    for eid, b, e in _ebml_children(payload, seg_b, seg_e):
        if eid == _INFO:
            for cid, cb, ce in _ebml_children(payload, b, e):
                if cid == _TIMESTAMP_SCALE:
                    scale = _ebml_uint(payload, cb, ce)
    out: list[dict] = []

    def handle_block(bb: int, be: int, cluster_ts: int, simple: bool) -> None:
        tnum, p, _ = _vint(payload, bb)
        if p + 3 > be:
            raise ValueError("truncated Matroska block header")
        rel = struct.unpack(">h", payload[p : p + 2])[0]
        flags = payload[p + 2]
        if (flags >> 1) & 0x3:
            raise NotImplementedError(
                "laced Matroska blocks not supported (one frame per "
                "SimpleBlock is the video layout; audio lacing needs a "
                "full demuxer)"
            )
        if track_number is not None and tnum != track_number:
            return
        out.append(
            {
                "block_idx": len(out),
                "track": tnum,
                "timestamp_ns": (cluster_ts + rel) * scale,
                "keyframe": bool(flags & 0x80) if simple else None,
                "offset": p + 3,
                "size": be - (p + 3),
            }
        )

    for eid, b, e in _ebml_children(payload, seg_b, seg_e):
        if eid != _CLUSTER:
            continue
        cluster_ts = 0
        for cid, cb, ce in _ebml_children(payload, b, e):
            if cid == _CLUSTER_TS:
                cluster_ts = _ebml_uint(payload, cb, ce)
            elif cid == _SIMPLE_BLOCK:
                handle_block(cb, ce, cluster_ts, simple=True)
            elif cid == _BLOCK_GROUP:
                for gid, gb, ge in _ebml_children(payload, cb, ce):
                    if gid == _BLOCK:
                        handle_block(gb, ge, cluster_ts, simple=False)
    return out


def _ebml_el(eid_bytes: bytes, body: bytes) -> bytes:
    """One EBML element with a minimal-length size varint."""
    n = len(body)
    length = 1
    while n >= (1 << (7 * length)) - 1:  # avoid the all-ones reserved value
        length += 1
    size = n | (1 << (7 * length))
    return eid_bytes + size.to_bytes(length, "big") + body


def _ebml_uint_body(v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def make_webm(
    width: int = 64,
    height: int = 48,
    frame_sizes: list[int] | None = None,
    frame_interval_ticks: int = 33,
    codec: str = "V_VP9",
    seed: int = 0,
) -> bytes:
    """Spec-shaped WebM: EBML header + Segment(Info, Tracks, one
    Cluster per 2 frames) with deterministic SimpleBlock frame bytes
    so segmentation tests can check exact slices."""
    if frame_sizes is None:
        frame_sizes = [30, 21, 44, 17, 28]
    header = _ebml_el(
        b"\x1a\x45\xdf\xa3",
        _ebml_el(b"\x42\x82", b"webm"),
    )
    info = _ebml_el(
        b"\x15\x49\xa9\x66",
        _ebml_el(b"\x2a\xd7\xb1", _ebml_uint_body(1_000_000))
        + _ebml_el(
            b"\x44\x89",
            struct.pack(">d", float(len(frame_sizes) * frame_interval_ticks)),
        ),
    )
    video = _ebml_el(
        b"\xe0",
        _ebml_el(b"\xb0", _ebml_uint_body(width))
        + _ebml_el(b"\xba", _ebml_uint_body(height)),
    )
    track = _ebml_el(
        b"\xae",
        _ebml_el(b"\xd7", _ebml_uint_body(1))
        + _ebml_el(b"\x83", _ebml_uint_body(1))  # video
        + _ebml_el(b"\x86", codec.encode("latin1"))
        + video,
    )
    tracks = _ebml_el(b"\x16\x54\xae\x6b", track)
    clusters = b""
    for c0 in range(0, len(frame_sizes), 2):
        cluster_ts = c0 * frame_interval_ticks
        body = _ebml_el(b"\xe7", _ebml_uint_body(cluster_ts))
        for i in range(c0, min(c0 + 2, len(frame_sizes))):
            frame = bytes((seed + i * 11 + j) % 247 for j in range(frame_sizes[i]))
            rel = (i - c0) * frame_interval_ticks
            blk = (
                b"\x81"  # track 1 varint
                + struct.pack(">h", rel)
                + (b"\x80" if i == c0 else b"\x00")  # keyframe flag
                + frame
            )
            body += _ebml_el(b"\xa3", blk)
        clusters += _ebml_el(b"\x1f\x43\xb6\x75", body)
    segment = _ebml_el(b"\x18\x53\x80\x67", info + tracks + clusters)
    return header + segment
