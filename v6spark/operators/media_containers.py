"""MP3 / MP4 (ISO BMFF) CONTAINER-level parsing, stdlib-only.

Shrinks the honest MP3/MP4 gap in the multimodal tier (SURVEY.md
§2.2, multimodal columns) to exactly the entropy decoders: what a
100 TB media-corpus metadata pass actually needs — codec
identification, duration/bitrate/timing, track geometry, and
per-sample byte segmentation (the offsets ``frame_sample`` uses to
slice encoded frames out of ``mdat``) — is parsed for REAL from the
container structure, no external library.  What still raises
``NotImplementedError`` is pixel/audio synthesis (H.264/H.265 CABAC +
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
