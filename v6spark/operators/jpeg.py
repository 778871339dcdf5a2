"""Baseline JPEG (ITU-T T.81) codec, numpy + stdlib only.

Clears the last compressed-image gap in the multimodal tier without
any external dependency: ``decode_jpeg`` handles baseline sequential
DCT JFIF files — 8-bit precision, grayscale or YCbCr, any sampling
factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart markers — and
``encode_jpeg`` emits spec-compliant 4:4:4 baseline files for test
fixtures and round-trip goldens.

Honesty about scope: progressive JPEG, arithmetic coding, 12-bit
precision and CMYK raise ``NotImplementedError`` — stated at the
parse site, exactly like the remaining MP3/MP4 stubs in
``multimodal.py``.

Correctness posture: the decoder is fully TABLE-DRIVEN — quantization
and Huffman tables are parsed from the stream's DQT/DHT segments,
never assumed — so decode(encode(img)) exactness does not depend on
any hardcoded table matching the spec's Annex K suggestions, and any
third-party baseline JPEG decodes the same way.  The round-trip
golden (tests/test_multimodal_vcf_compute.py) bounds reconstruction
error at high quality; dims/channels are exact.

Speed posture: this runs inside the same Arrow-batched ``mapInPandas``
kernels as the other codecs (multimodal.py) — per-image numpy work,
vectorized per 8x8-block batch (the DCT is two matmuls over ALL
blocks at once); the Huffman entropy scan is the only per-symbol
Python loop, acceptable for the decode-side feature-extraction use
and replaceable by libjpeg-turbo where installed.
"""

from __future__ import annotations

import struct

import numpy as np

# -- 8x8 DCT operator matrix: D = C @ block @ C.T, block = C.T @ D @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Annex K suggested quantization tables (used by the ENCODER only —
# the decoder reads whatever DQT carries)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
).reshape(8, 8)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ]
).reshape(8, 8)

# Annex K suggested Huffman tables (ENCODER only; carried in DHT)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    codes, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v else 0


def _amplitude(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _scaled_table(base: np.ndarray, quality: int) -> np.ndarray:
    # libjpeg quality scaling — public formula
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw_writer, zz, prev_dc, dc_codes, ac_codes) -> int:
    """Huffman-encode one zigzagged quantized block; returns its DC."""
    diff = int(zz[0]) - prev_dc
    s = _category(diff)
    code, length = dc_codes[s]
    bw_writer.write(code, length)
    if s:
        bw_writer.write(_amplitude(diff, s), s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            bw_writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        bw_writer.write(code, length)
        bw_writer.write(_amplitude(v, s), s)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        bw_writer.write(code, length)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JFIF from an HxW (gray) or HxWx3 RGB array.

    Annex-K tables scaled by ``quality`` and CARRIED in DQT/DHT —
    never assumed by the decoder.  ``subsampling`` is ``"444"`` (one
    block per component per MCU) or ``"420"`` (2x2 luma blocks + one
    block each of 2x2-box-filtered chroma per MCU — the dominant
    wild-corpus layout, and the path that exercises the decoder's
    generic MCU interleave).  ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs (the crash-resilient stream
    layout; exercises the decoder's resync path).  The 8x8 forward
    DCTs run as two matmuls over each component's whole block batch.
    """
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ncomp = img.shape
    if ncomp not in (1, 3):
        raise ValueError("encode_jpeg expects gray or RGB input")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    imgf = img.astype(np.float64)
    if ncomp == 3:
        r, g, b = imgf[..., 0], imgf[..., 1], imgf[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128,
        ]
    else:
        planes = [imgf[..., 0]]
        subsampling = "444"  # sampling factors are moot for 1 component

    sub = subsampling == "420" and ncomp == 3
    # (h_factor, v_factor) per component
    factors = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * ncomp
    hmax = max(f[0] for f in factors[:ncomp])
    vmax = max(f[1] for f in factors[:ncomp])
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    qt = [_scaled_table(_Q_LUMA, quality), _scaled_table(_Q_CHROMA, quality)]
    dc_codes = [
        _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_codes = [
        _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
        _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]

    # per-component 2D grid of zigzagged quantized blocks
    comp_grids = []
    for ci in range(ncomp):
        plane = planes[ci]
        hf, vf = factors[ci]
        if sub and ci > 0:
            # 2x2 box filter; pad odd dims by edge first
            p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
            plane = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
        rows, cols = mcus_y * 8 * vf, mcus_x * 8 * hf
        padded = np.pad(
            plane,
            ((0, rows - plane.shape[0]), (0, cols - plane.shape[1])),
            mode="edge",
        )
        brows, bcols = rows // 8, cols // 8
        blocks = (
            padded.reshape(brows, 8, bcols, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
            - 128.0
        )
        coefs = np.einsum("kn,bnm,lm->bkl", _C, blocks, _C)
        q = qt[0 if ci == 0 else 1].astype(np.float64)
        zz = np.round(coefs / q).astype(np.int32).reshape(-1, 64)[:, _ZIGZAG]
        comp_grids.append(zz.reshape(brows, bcols, 64))

    bw_writer = _BitWriter()
    prev_dc = [0] * ncomp
    mcu_index = 0
    rst = 0
    entropy = bytearray()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw_writer.flush()
                entropy += bw_writer.out
                entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw_writer = _BitWriter()
                prev_dc = [0] * ncomp
            for ci in range(ncomp):
                hf, vf = factors[ci]
                ti = 0 if ci == 0 else 1
                for by in range(vf):
                    for bx in range(hf):
                        zz = comp_grids[ci][my * vf + by, mx * hf + bx]
                        prev_dc[ci] = _encode_block(
                            bw_writer, zz, prev_dc[ci],
                            dc_codes[ti], ac_codes[ti],
                        )
            mcu_index += 1
    bw_writer.flush()
    entropy += bw_writer.out

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti in range(2 if ncomp == 3 else 1):
        zz_tbl = qt[ti].reshape(64)[_ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xFFDB, bytes([ti]) + zz_tbl)
    comp_spec = b"".join(
        bytes(
            [cid + 1, (factors[cid][0] << 4) | factors[cid][1],
             0 if cid == 0 else 1]
        )
        for cid in range(ncomp)
    )
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, ncomp) + comp_spec)
    huff = [
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ]
    if ncomp == 3:
        huff += [
            (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in huff:
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    scan_spec = b"".join(
        bytes([cid + 1, 0x00 if cid == 0 else 0x11]) for cid in range(ncomp)
    )
    out += seg(0xFFDA, bytes([ncomp]) + scan_spec + b"\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment reader: unstuffs FF00, stops at markers, and
    surfaces RSTn for the MCU loop to consume."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.n <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # pad past end
                self.n += 8
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                if self.pos + 1 >= len(self.data):
                    # keeps the codec's ValueError contract instead of
                    # an IndexError escaping the kernel
                    raise ValueError(
                        "truncated JPEG entropy stream (ends on 0xFF)"
                    )
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: stop filling; caller resyncs
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt  # EOI / next segment
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill()
        self.n -= length
        v = (self.acc >> self.n) & ((1 << length) - 1)
        return v

    def resync(self) -> None:
        """Drop pad bits, locate the RSTn, realign past it.

        The marker may not be buffered yet (the encoder pads the last
        entropy byte with 1-bits, which the symbol decode never
        consumes) — scan forward for it.  Safe because every data FF
        before the marker is stuffed as FF00.
        """
        self.acc = 0
        self.n = 0
        if self.marker is None:
            while self.pos + 1 < len(self.data):
                if (
                    self.data[self.pos] == 0xFF
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7
                ):
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is None or not (0xD0 <= self.marker <= 0xD7):
            raise ValueError("expected restart marker in entropy stream")
        self.pos += 2  # past FF Dn
        self.marker = None


class _HuffLookup:
    """Length-ordered canonical decode: (code, length) -> symbol."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.val_ptr[length] = k
                self.min_code[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.max_code[length] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, reader: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read(1)
            if self.max_code[length] >= 0 and code <= self.max_code[length]:
                if code >= self.min_code[length]:
                    return self.vals[
                        self.val_ptr[length] + code - self.min_code[length]
                    ]
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Baseline JFIF -> (w, h, c, HxWxC uint8).  Fully table-driven."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffLookup] = {}
    ac_tables: dict[int, _HuffLookup] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                )
                qt[tq] = tbl.reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                (dc_tables if tc == 0 else ac_tables)[th] = _HuffLookup(
                    bits, vals
                )
                b += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/extended JPEG modes not supported (baseline only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            return _decode_scan(
                payload, pos + 2 + length, frame, scan, qt,
                dc_tables, ac_tables, restart_interval,
            )
        pos += 2 + length
    raise ValueError("no scan data found")


def _decode_scan(
    data, pos, frame, scan, qt, dc_tables, ac_tables, restart_interval
):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"])) for c, _, _ in scan
    ]
    reader = _BitReader(data, pos)
    prev_dc = [0] * len(scan)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_index
                and mcu_index % restart_interval == 0
            ):
                reader.resync()
                prev_dc = [0] * len(scan)
            for ci, (comp, td, ta) in enumerate(scan):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = dc_tables[td].decode(reader)
                        diff = _extend(reader.read(s), s)
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            rs = ac_tables[ta].decode(reader)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.read(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZIGZAG] = zz * qt[comp["tq"]].reshape(64)[_ZIGZAG]
                        block = _C.T @ coef.reshape(8, 8) @ _C + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_index += 1
    # upsample to full resolution, crop, color-convert
    full = []
    for ci, (comp, _, _) in enumerate(scan):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // comp["v"], 0), hmax // comp["h"], 1)
        full.append(p[:h, :w])
    if len(full) == 3:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        rgb = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=-1,
        )
        img = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        return w, h, 3, img
    img = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    return w, h, 1, img
