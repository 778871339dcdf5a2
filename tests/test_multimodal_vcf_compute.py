"""Tests: multimodal plumbing (fake-decode path + stub contract),
VCF ingest parser, and the compute() materialization helper."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from v6spark.compute import compute
from v6spark.operators import multimodal as mm
from v6spark.operators.filters import filter_rows
from v6spark.sources.vcf import read_vcf, vcf_sample_names

VCF_TEXT = """\
##fileformat=VCFv4.2
##INFO=<ID=NS,Number=1,Type=Integer,Description="n">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA1\tNA2\tNA3
chr1\t100\trs1\tA\tT\t50.0\tPASS\tNS=3\tGT:DP:GQ\t0/0:10:99\t0/1:20:80\t./.:.:.
chr1\t200\t.\tG\tC,T\t.\tPASS\tNS=3\tGT:DP\t1|2:5\t0/0:7\t0/1:.
chr2\t300\trs3\tC\tG\t9.5\tq10\tNS=2\tDP:GT\t4:0/0\t8:1/1\t.:./1
"""


@pytest.fixture(scope="module")
def vcf_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("vcf") / "tiny.vcf"
    p.write_text(VCF_TEXT)
    return str(p)


def test_vcf_sample_names(spark, vcf_path):
    assert vcf_sample_names(spark, vcf_path) == ["NA1", "NA2", "NA3"]


def test_vcf_variants(spark, vcf_path):
    variants, _ = read_vcf(spark, vcf_path)
    rows = {r["variant_id"]: r for r in variants.collect()}
    assert len(rows) == 3
    v1 = rows["chr1:100:A:T"]
    assert (v1["chrom"], v1["pos"], v1["vcf_id"], v1["ref"]) == ("chr1", 100, "rs1", "A")
    assert v1["alt"] == ["T"] and v1["qual"] == 50.0
    v2 = rows["chr1:200:G:C,T"]
    assert v2["vcf_id"] is None and v2["qual"] is None  # '.' -> NULL
    assert v2["alt"] == ["C", "T"]  # multi-allelic


def test_vcf_calls_long_format(spark, vcf_path):
    _, calls = read_vcf(spark, vcf_path)
    got = {(r["variant_id"], r["sample_id"]): r for r in calls.collect()}
    assert len(got) == 9  # 3 variants x 3 samples
    assert got[("chr1:100:A:T", "NA1")]["gt"] == [0, 0]
    assert got[("chr1:100:A:T", "NA1")]["dp"] == 10
    assert got[("chr1:100:A:T", "NA3")]["gt"] == [None, None]  # ./. -> NULLs
    assert got[("chr1:100:A:T", "NA3")]["dp"] is None
    assert got[("chr1:200:G:C,T", "NA1")]["gt"] == [1, 2]  # phased | separator
    assert got[("chr1:200:G:C,T", "NA1")]["gq"] is None  # GQ absent from FORMAT
    # FORMAT order differs on chr2 (DP:GT) — field lookup is positional
    assert got[("chr2:300:C:G", "NA1")]["gt"] == [0, 0]
    assert got[("chr2:300:C:G", "NA1")]["dp"] == 4
    assert got[("chr2:300:C:G", "NA3")]["gt"] == [None, 1]


def test_vcf_feeds_stats(spark, vcf_path):
    # the ingest output flows straight into the genomic operators
    from v6spark.operators.stats import rate_of

    _, calls = read_vcf(spark, vcf_path)
    miss = rate_of(
        calls,
        ["variant_id"],
        F.col("gt")[0].isNull() & F.col("gt")[1].isNull(),
        "miss_rate",
    )
    got = {r["variant_id"]: r["miss_rate"] for r in miss.collect()}
    assert got["chr1:100:A:T"] == pytest.approx(1 / 3, abs=1e-6)
    assert got["chr1:200:G:C,T"] == 0.0


def test_multimodal_fake_decode(spark):
    media = mm.synth_media(spark, 30)
    decoded = mm.decode_media(media, fake=True)
    rows = decoded.collect()
    assert len(rows) == 30
    assert all(16 <= r["width"] <= 255 and 1 <= r["n_channels"] <= 3 for r in rows)
    # determinism: second run identical
    again = mm.decode_media(media, fake=True).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_multimodal_compressed_codecs_still_stubbed(spark):
    # synth_media payloads are hash digests — no recognizable container,
    # so the real path must refuse them honestly.
    media = mm.synth_media(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|not installed"):
        mm.decode_media(media, fake=False).collect()


def test_multimodal_real_decode_uncompressed(spark):
    media = mm.synth_real_media(spark, 12)
    got = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    assert len(got) == 12
    # ids 0,3,6,9 are PPM: dims = (8 + i%16, 6 + i%12, 3)
    for i in (0, 3, 6, 9):
        r = got[i]
        assert (r["width"], r["height"], r["n_channels"]) == (
            8 + i % 16, 6 + i % 12, 3,
        )
    # ids 1,4 are BMP: dims = (5 + i%16, 4 + i%12, 3)
    for i in (1, 4):
        r = got[i]
        assert (r["width"], r["height"], r["n_channels"]) == (
            5 + i % 16, 4 + i % 12, 3,
        )
    # ids 2,5 are WAV: width/height carry (n_frames, sample_rate)
    for i in (2, 5):
        r = got[i]
        assert r["width"] == 800 + 40 * (i % 10)
        assert r["height"] == 8000 + 4000 * (i % 3)
        assert r["n_channels"] == 1


def test_multimodal_image_resize_real(spark):
    import numpy as np

    media = mm.synth_real_media(spark, 12).filter(F.col("kind") == "image")
    out = {r["media_id"]: r for r in mm.image_resize(media, 4, 3).collect()}
    assert out
    for r in out.values():
        assert (r["width"], r["height"], r["n_channels"]) == (4, 3, 3)
        assert len(bytes(r["pixels"])) == 4 * 3 * 3
    # nearest-neighbor on the known gradient: pixel (0,0) of id 0's PPM
    # is [(0+0)%256, (0+0)%256, 0] = [0,0,0]
    assert bytes(out[0]["pixels"])[:3] == b"\x00\x00\x00"


def test_png_decode_golden_all_filters():
    """stdlib PNG decode is pixel-exact against the generator's known
    gradient, with every scanline filter type exercised (the default
    row_filters cycle 0..4) and every supported color type."""
    import numpy as np

    for color_type, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        png = mm.make_png(13, 9, seed=5, color_type=color_type)
        assert mm.sniff_format(png) == "png"
        w, h, c, img = mm._png_decode(png)
        y, x = np.mgrid[0:9, 0:13]
        planes = [(x + 5) % 256, (y + 10) % 256, (x + y + 5) % 256,
                  (x * 3 + y + 5) % 256]
        expect = np.stack(planes[:ch], axis=-1).astype(np.uint8)
        assert (w, h, c) == (13, 9, ch)
        assert np.array_equal(img, expect)


def test_png_decode_palette_and_unsupported():
    """Palette PNGs map through PLTE to RGB; 16-bit depth raises
    honestly instead of mis-decoding."""
    import struct
    import zlib

    import numpy as np

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + r.tobytes() for r in idx)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    png = (mm._PNG_MAGIC + mm._png_chunk(b"IHDR", ihdr)
           + mm._png_chunk(b"PLTE", plte)
           + mm._png_chunk(b"IDAT", zlib.compress(raw))
           + mm._png_chunk(b"IEND", b""))
    w, h, c, img = mm._png_decode(png)
    assert (w, h, c) == (3, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[1, 0].tolist() == [0, 0, 255]
    deep = (mm._PNG_MAGIC
            + mm._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
            + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + mm._png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="depth=16"):
        mm._png_decode(deep)


def _smooth_rgb(h, w):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    return np.clip(
        np.stack(
            [
                128 + 60 * np.sin(x / 9.0),
                128 + 50 * np.cos(y / 7.0),
                128 + 40 * np.sin((x + y) / 11.0),
            ],
            axis=-1,
        ),
        0,
        255,
    ).astype(np.uint8)


def test_jpeg_roundtrip_all_modes():
    """Baseline JPEG codec (operators/jpeg.py): encode->decode is
    dimension-exact and pixel-close at high quality across 4:4:4,
    4:2:0 (generic MCU interleave), and restart-marker streams.  The
    decoder is table-driven (reads DQT/DHT from the stream), so this
    round-trip is meaningful evidence, not a shared-constant echo."""
    import numpy as np

    from v6spark.operators import jpeg

    img = _smooth_rgb(37, 53)
    for kwargs, tol in (
        (dict(quality=95), 8),
        (dict(quality=95, subsampling="420"), 14),
        (dict(quality=95, restart_interval=2), 8),
        (dict(quality=95, subsampling="420", restart_interval=3), 14),
    ):
        enc = jpeg.encode_jpeg(img, **kwargs)
        assert mm.sniff_format(enc) == "jpeg"
        w, h, c, dec = jpeg.decode_jpeg(enc)
        assert (w, h, c) == (53, 37, 3), kwargs
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= tol, (kwargs, err.max())
    # grayscale
    gray = img[:, :, 0]
    w, h, c, dec = jpeg.decode_jpeg(jpeg.encode_jpeg(gray, quality=95))
    assert (w, h, c) == (53, 37, 1)
    assert np.abs(dec[:, :, 0].astype(int) - gray.astype(int)).max() <= 6
    # arithmetic coding refuses honestly (SOF9 in a synthetic header)
    import pytest as _pytest

    enc = bytearray(jpeg.encode_jpeg(img))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC9
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        jpeg.decode_jpeg(bytes(enc))


def test_jpeg_progressive_bit_identical_to_baseline():
    """Progressive (SOF2) codec: the scan script re-orders the SAME
    quantized coefficients, so decoding a progressive payload is
    bit-identical to decoding the baseline encoding of that image —
    across gray/color, 4:4:4/4:2:0, restart markers, and
    non-multiple-of-8/16 dims.  Exercises spectral selection,
    successive approximation (DC+AC first/refine), per-scan DC
    predictors, EOB-run handling, and RSTn resync in every scan
    kind."""
    import numpy as np

    from v6spark.operators import jpeg

    rng = np.random.default_rng(11)
    img = _smooth_rgb(37, 53)
    noisy = rng.integers(0, 256, (21, 19, 3), dtype=np.uint8)
    for src in (img, noisy):
        for kwargs in (
            dict(quality=90),
            dict(quality=90, subsampling="420"),
            dict(quality=60, restart_interval=3),
            dict(quality=95, subsampling="420", restart_interval=2),
        ):
            base = jpeg.decode_jpeg(jpeg.encode_jpeg(src, **kwargs))
            prog_payload = jpeg.encode_jpeg_progressive(src, **kwargs)
            assert prog_payload[:2] == b"\xff\xd8"
            assert b"\xff\xc2" in prog_payload  # SOF2 frame
            prog = jpeg.decode_jpeg(prog_payload)
            assert base[:3] == prog[:3], kwargs
            assert np.array_equal(base[3], prog[3]), kwargs
    gray = img[:, :, 0]
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(gray, quality=85))
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(gray, quality=85))
    assert base[:3] == prog[:3] and np.array_equal(base[3], prog[3])


def test_jpeg_multiscan_baseline_and_eobn():
    """Decoder generality beyond our own encoder's output: (a) a
    hand-assembled progressive AC-first stream using an EOBn>0 run
    (EOB15 over many all-zero blocks) decodes with the run applied;
    (b) `_jpeg_dims` reads SOF2 headers without entropy decode."""
    import numpy as np

    from v6spark.operators import jpeg

    img = _smooth_rgb(24, 24)
    payload = jpeg.encode_jpeg_progressive(img, quality=90)
    w, h, c = mm._jpeg_dims(payload)
    assert (w, h, c) == (24, 24, 3)

    # EOBn: decode the run-length branch directly (r=2 -> 3+ext blocks).
    # EOBn>0 symbols (0x20 here) are NOT in the Annex-K tables (that is
    # why our encoder caps EOBRUN at 1), so use a tiny custom table —
    # legitimate since the decoder is table-driven.
    bits = [0] * 16
    bits[1] = 3  # three codes of length 2
    vals = [0x03, 0x20, 0x00]
    bw = jpeg._BitWriter()
    codes = jpeg._build_codes(bits, vals)
    # block 0: coefficient 5 at k=1, then EOB2 (covers 3 more blocks + ext)
    code, ln = codes[0x03]
    bw.write(code, ln)
    bw.write(5, 3)  # amplitude of +5, category 3
    code, ln = codes[0x20]  # EOBn with r=2 -> run = (1<<2)-1 + ext
    bw.write(code, ln)
    bw.write(1, 2)  # ext bits: run = 3 + 1 = 4 following all-zero blocks
    bw.flush()
    data = bytes(bw.out) + b"\xff\xd9"
    reader = jpeg._BitReader(data, 0)
    lookup = jpeg._HuffLookup(bits, vals)
    blocks = [np.zeros(64, dtype=np.int32) for _ in range(6)]
    eobrun = 0
    eobrun = jpeg._ac_first_block(reader, lookup, blocks[0], 1, 63, 0, eobrun)
    assert blocks[0][1] == 5 and eobrun == 4
    for i in range(1, 5):
        eobrun = jpeg._ac_first_block(
            reader, lookup, blocks[i], 1, 63, 0, eobrun
        )
    assert eobrun == 0
    assert all(not blocks[i].any() for i in range(1, 5))


def test_multimodal_jpeg_through_spark(spark):
    """JPEG payloads flow through decode_media/image_resize exactly
    like the other real codecs."""
    import numpy as np

    from v6spark.operators import jpeg

    rows = [
        (
            i,
            "image",
            # even ids baseline, odd ids progressive — both flow
            # through the same sniff + kernel path
            (jpeg.encode_jpeg_progressive if i % 2 else jpeg.encode_jpeg)(
                _smooth_rgb(12 + i, 16 + i),
                quality=95,
                subsampling="420" if i % 2 else "444",
            ),
            f"synthetic://jpeg/{i}",
            "{}",
        )
        for i in range(4)
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    for i in range(4):
        assert (got[i]["width"], got[i]["height"], got[i]["n_channels"]) == (
            16 + i, 12 + i, 3,
        )
    out = mm.image_resize(media, 6, 5).collect()
    assert len(out) == 4
    for r in out:
        assert (r["width"], r["height"], r["n_channels"]) == (6, 5, 3)
        assert len(bytes(r["pixels"])) == 6 * 5 * 3


def test_gif_roundtrip_and_composition():
    """GIF codec: literal-LZW encode -> general decode is pixel-exact;
    transparency composites over the previous frame; disposal=2
    restores background; interlaced frames deinterlace."""
    import numpy as np

    from v6spark.operators import gif

    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    frames = []
    for i in range(3):
        f = np.full((8, 10), (i % 3) + 1, dtype=np.uint8)
        f[2:5, 3:7] = ((i + 1) % 3) + 1
        frames.append(f)
    enc = gif.encode_gif(frames, pal, [100, 200, 300])
    assert mm.sniff_format(enc) == "gif"
    w, h, out, delays = gif.decode_gif(enc)
    assert (w, h) == (10, 8) and delays == [100, 200, 300]
    for i in range(3):
        assert np.array_equal(out[i], pal[frames[i]]), i
    # multi-subblock + repeated-CLEAR path: one frame > 253 pixels
    big = (np.arange(64 * 64) % 4).astype(np.uint8).reshape(64, 64)
    _, _, out2, _ = gif.decode_gif(gif.encode_gif([big], pal))
    assert np.array_equal(out2[0], pal[big])


def test_frame_sample_real_gif(spark):
    """frame_sample is REAL for animated GIF: sampled frames come back
    as PNG payloads whose pixels match the composited GIF frames."""
    import numpy as np

    from v6spark.operators import gif

    pal = np.array(
        [[10, 20, 30], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
        dtype=np.uint8,
    )
    frames = [
        np.full((6, 9), (i % 3) + 1, dtype=np.uint8) for i in range(7)
    ]
    payload = gif.encode_gif(frames, pal)
    media = spark.createDataFrame(
        [(1, "video", payload, "synthetic://gif/1", "{}"),
         (2, "image", mm.make_png(5, 4), "synthetic://png/2", "{}")],
        mm.MEDIA_SCHEMA,
    )
    rows = mm.frame_sample(media, every_n=3).collect()
    # only the video row explodes; frames 0, 3, 6 sampled
    assert sorted(r["frame_idx"] for r in rows) == [0, 3, 6]
    for r in rows:
        fp = bytes(r["frame_payload"])
        assert mm.sniff_format(fp) == "png"
        w, h, c, img = mm._png_decode(fp)
        assert (w, h, c) == (9, 6, 3)
        assert np.array_equal(img, pal[frames[r["frame_idx"]]])
    # decode_media handles the GIF container too (first-frame dims)
    got = mm.decode_media(media.filter(F.col("kind") == "video")).collect()[0]
    assert (got["width"], got["height"], got["n_channels"]) == (9, 6, 3)


def test_mp3_container_parse():
    """MP3 frame-sync walk: frame count, duration, bitrate, channels
    from headers alone — with an ID3v2 prefix skipped via its
    syncsafe size, and corrupt payloads raising (not zero rows)."""
    from v6spark.operators import media_containers as mc

    mp3 = mc.make_mp3(
        n_frames=20, sample_rate=44100, bitrate_kbps=128, channels=2,
        id3=b"T" * 300,
    )
    assert mm.sniff_format(mp3) == "mp3"
    info = mc.parse_mp3_info(mp3)
    assert info["n_frames"] == 20
    assert info["sample_rate"] == 44100
    assert info["channels"] == 2
    assert abs(info["duration_s"] - 20 * 1152 / 44100) < 1e-9
    assert info["layer"] == 3 and info["mpeg1"] and not info["vbr"]
    mono = mc.parse_mp3_info(mc.make_mp3(n_frames=3, channels=1))
    assert mono["channels"] == 1 and mono["n_frames"] == 3
    with pytest.raises(ValueError, match="frame sync"):
        mc.parse_mp3_info(b"\x00" * 64)


def test_mp4_container_parse_and_segmentation():
    """ISO BMFF box walk: track geometry/codec/duration from moov,
    and the stsc(2-per-chunk run map)×stco×stsz join resolving to the
    EXACT byte slice of every sample in mdat."""
    from v6spark.operators import media_containers as mc

    sizes = [40, 25, 33, 18, 52]
    mp4 = mc.make_mp4(width=64, height=48, sample_sizes=sizes, seed=3)
    assert mm.sniff_format(mp4) == "mp4"
    info = mc.parse_mp4_info(mp4)
    assert info["brand"] == "isom"
    (trk,) = info["tracks"]
    assert (trk["width"], trk["height"]) == (64, 48)
    assert trk["kind"] == "vide" and trk["codec"] == "avc1"
    assert trk["n_samples"] == 5
    assert abs(trk["duration_s"] - 5 * 20 / 600) < 1e-12
    table = mc.mp4_sample_table(mp4)
    assert [s["size"] for s in table] == sizes
    assert [s["dts"] for s in table] == [0, 20, 40, 60, 80]
    for i, s in enumerate(table):
        expected = bytes((3 + i * 7 + j) % 253 for j in range(s["size"]))
        assert mp4[s["offset"] : s["offset"] + s["size"]] == expected
    # truncation inside mdat -> box size overruns the buffer
    with pytest.raises(ValueError, match="malformed"):
        mc.parse_mp4_info(mp4[: table[0]["offset"] + 4])
    # a well-formed file with no moov at all
    with pytest.raises(ValueError, match="moov"):
        mc.parse_mp4_info(mp4[: mp4.index(b"mdat") - 4])
    with pytest.raises(ValueError, match="no 'soun' track"):
        mc.mp4_sample_table(mp4, kind="soun")


def test_webm_container_parse_and_segmentation():
    """EBML/Matroska walk: doc type, timescale, duration, video track
    geometry/codec, and Cluster/SimpleBlock segmentation mapping to
    the exact encoded-frame byte slices (keyframe flags + cluster-
    relative timestamps resolved to ns)."""
    from v6spark.operators import media_containers as mc

    sizes = [30, 21, 44, 17, 28]
    w = mc.make_webm(width=64, height=48, frame_sizes=sizes, seed=4)
    assert mm.sniff_format(w) == "webm"
    info = mc.parse_webm_info(w)
    assert info["doc_type"] == "webm"
    assert info["timescale_ns"] == 1_000_000
    assert abs(info["duration_s"] - 5 * 33 / 1000) < 1e-12
    (trk,) = info["tracks"]
    assert (trk["width"], trk["height"]) == (64, 48)
    assert trk["kind"] == "video" and trk["codec"] == "V_VP9"
    table = mc.webm_block_table(w, track_number=1)
    assert [b["size"] for b in table] == sizes
    assert [b["timestamp_ns"] for b in table] == [
        0, 33_000_000, 66_000_000, 99_000_000, 132_000_000
    ]
    assert [b["keyframe"] for b in table] == [True, False, True, False, True]
    for i, b in enumerate(table):
        expected = bytes((4 + i * 11 + j) % 247 for j in range(b["size"]))
        assert w[b["offset"] : b["offset"] + b["size"]] == expected
    # laced blocks refuse honestly: flip the lacing bits of block 0
    laced = bytearray(w)
    laced[table[0]["offset"] - 1] |= 0x06
    with pytest.raises(NotImplementedError, match="laced"):
        mc.webm_block_table(bytes(laced), track_number=1)
    with pytest.raises(ValueError, match="EBML"):
        mc.parse_webm_info(b"\x00" * 32)
    # decode_media metadata path
    assert mm._real_dims(w) == (64, 48, 3)


def test_mp3_mp4_through_spark(spark):
    """Container formats flow through decode_media (metadata triple)
    and frame_sample (encoded MP4 samples at the every_n stride) —
    the same Arrow kernels as the pixel-real formats."""
    from v6spark.operators import media_containers as mc

    sizes = [40, 25, 33, 18, 52, 29, 61]
    mp4 = mc.make_mp4(width=32, height=24, sample_sizes=sizes, seed=9)
    mp3 = mc.make_mp3(n_frames=12, sample_rate=32000, bitrate_kbps=96)
    webm = mc.make_webm(width=16, height=12, frame_sizes=[9, 8, 7, 6], seed=2)
    media = spark.createDataFrame(
        [
            (1, "video", mp4, "synthetic://mp4/1", "{}"),
            (2, "audio", mp3, "synthetic://mp3/2", "{}"),
            (3, "video", webm, "synthetic://webm/3", "{}"),
        ],
        mm.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (32, 24, 3)
    # audio convention (same as WAV): (n_frames, sample_rate, channels)
    assert (got[2]["width"], got[2]["height"], got[2]["n_channels"]) == (12, 32000, 2)
    assert (got[3]["width"], got[3]["height"], got[3]["n_channels"]) == (16, 12, 3)
    rows = mm.frame_sample(media, every_n=3).collect()
    by_media: dict = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert sorted(r["frame_idx"] for r in by_media[1]) == [0, 3, 6]
    table = mc.mp4_sample_table(mp4)
    for r in by_media[1]:
        s = table[r["frame_idx"]]
        assert bytes(r["frame_payload"]) == mp4[s["offset"] : s["offset"] + s["size"]]
    assert sorted(r["frame_idx"] for r in by_media[3]) == [0, 3]
    blocks = mc.webm_block_table(webm, track_number=1)
    for r in by_media[3]:
        b = blocks[r["frame_idx"]]
        assert bytes(r["frame_payload"]) == webm[b["offset"] : b["offset"] + b["size"]]


def test_multimodal_png_through_spark(spark):
    """PNG payloads run through the same mapInPandas kernels as the
    other real formats: decode_media dims and image_resize pixels."""
    rows = [
        (i, "image", mm.make_png(6 + i, 4 + i, seed=i), f"synthetic://png/{i}", "{}")
        for i in range(4)
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    for i in range(4):
        assert (got[i]["width"], got[i]["height"], got[i]["n_channels"]) == (
            6 + i, 4 + i, 3,
        )
    out = {r["media_id"]: r for r in mm.image_resize(media, 4, 3).collect()}
    for r in out.values():
        assert (r["width"], r["height"], r["n_channels"]) == (4, 3, 3)
        assert len(bytes(r["pixels"])) == 4 * 3 * 3
    # nearest-neighbor anchor: pixel (0,0) of id 0 is [(0+0)%256,
    # (0+0)%256, (0+0+0)%256] = [0, 0, 0]
    assert bytes(out[0]["pixels"])[:3] == b"\x00\x00\x00"


def test_multimodal_audio_features_real(spark):
    media = mm.synth_real_media(spark, 12).filter(F.col("kind") == "audio")
    rows = mm.audio_features(media).collect()
    assert rows
    for r in rows:
        # 0.5-amplitude sine: RMS = 0.5*32767/sqrt(2) ~= 11585 (short
        # windows wander slightly); ZCR ~= 2*440/16000 = 0.055
        assert abs(r["rms"] - 11585) < 60
        assert abs(r["zcr"] - 0.055) < 0.002
        assert r["duration_ms"] == int(r["n_frames"] * 1000 / r["sample_rate"])


def test_multimodal_features_compose_with_similarity(spark):
    from v6spark.operators.similarity import cosine_pairs_bruteforce

    media = mm.synth_media(spark, 20)
    feats = mm.extract_features(media, fake=True).withColumnRenamed(
        "media_id", "vec_id"
    ).withColumnRenamed("feature", "embedding")
    pairs = cosine_pairs_bruteforce(feats)
    assert pairs.count() == 20 * 19 // 2
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in pairs.collect())


def test_frame_sample(spark):
    media = mm.synth_media(spark, 30)
    frames = mm.frame_sample(media, every_n=10, fake=True)
    rows = frames.collect()
    assert len(rows) > 0
    assert all(r["frame_idx"] % 10 == 0 for r in rows)
    n_videos = media.filter(F.col("kind") == "video").count()
    assert len({r["media_id"] for r in rows}) == n_videos


def test_compute_nested_and_filterresult(spark):
    df = spark.createDataFrame([(i,) for i in range(6)], "v int")
    fr = filter_rows(df, F.col("v") >= 3)
    out = compute(
        {"all": df, "nested": {"kept": fr}, "scalar": 42},
        shared=[df],
    )
    assert len(out["all"]) == 6
    assert out["nested"]["kept"]["n_kept"] == 3
    assert out["scalar"] == 42


def test_events_loader_contract_any_timestamp_width(spark, sf_dir, tmp_path_factory):
    """events must expose (ts timestamp, ts_ns bigint) whether the
    parquet stores INT64 nanos or a standard µs timestamp."""
    from v6spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path_factory.mktemp("ev_us"))
    ev.drop("ts_ns").write.mode("overwrite").parquet(f"{out}/events.parquet")
    back = load_table(spark, out, "events")
    assert dict(back.dtypes)["ts_ns"] == "bigint"
    a = {r["event_id"]: r["ts_ns"] for r in ev.select("event_id", "ts_ns").collect()}
    b = {r["event_id"]: r["ts_ns"] for r in back.select("event_id", "ts_ns").collect()}
    # roundtrip through a µs timestamp truncates sub-µs (source data has
    # them); the µs comparison key is preserved exactly
    assert b == {k: (v // 1000) * 1000 for k, v in a.items()}
    au = {r["event_id"]: r["ts_us"] for r in ev.select("event_id", "ts_us").collect()}
    bu = {r["event_id"]: r["ts_us"] for r in back.select("event_id", "ts_us").collect()}
    assert au == bu


def test_vcf_sample_drops_trailing_fields(spark, tmp_path_factory):
    """VCF 4.x allows a sample to omit trailing FORMAT fields; the
    parser must yield NULLs, not an ANSI element_at crash."""
    text = (
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tA\tB\n"
        "chr1\t5\t.\tA\tT\t10\tPASS\t.\tGT:DP:GQ\t0/1\t1/1:7:50\n"
    )
    p = tmp_path_factory.mktemp("vcf_trail") / "t.vcf"
    p.write_text(text)
    _, calls = read_vcf(spark, str(p))
    got = {r["sample_id"]: r for r in calls.collect()}
    assert got["A"]["gt"] == [0, 1] and got["A"]["dp"] is None and got["A"]["gq"] is None
    assert got["B"]["dp"] == 7 and got["B"]["gq"] == 50


def test_vcf_datasource_matches_expression_parser(spark, vcf_path):
    """spark.read.format('vcf') must produce the same rows as the
    Catalyst expression parser (sources/vcf.py)."""
    from v6spark.sources.vcf_datasource import register_vcf_source

    register_vcf_source(spark)
    ds_calls = spark.read.format("vcf").load(vcf_path)
    ds_variants = (
        spark.read.format("vcf").option("table", "variants").load(vcf_path)
    )
    ex_variants, ex_calls = read_vcf(spark, vcf_path)

    def norm(df, cols):
        return sorted(tuple(r) for r in df.select(*cols).collect())

    call_cols = ["variant_id", "chrom", "sample_id", "gt", "dp", "gq"]
    assert norm(ds_calls, call_cols) == norm(ex_calls, call_cols)
    var_cols = ["variant_id", "chrom", "pos", "vcf_id", "ref", "alt", "qual", "filter"]
    assert norm(ds_variants, var_cols) == norm(ex_variants, var_cols)


def test_vcf_datasource_filter_pushdown(spark, vcf_path):
    """chrom/pos predicates reach the Python DataSource reader
    (pushFilters) and the filtered results stay exact."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, StringStartsWith

    from v6spark.sources.vcf_datasource import VcfReader, register_vcf_source

    # unit: the reader consumes chrom/pos comparisons, returns the rest
    reader = VcfReader({"path": vcf_path})
    rest = list(
        reader.pushFilters(
            [
                EqualTo(("chrom",), "chr1"),
                GreaterThanOrEqual(("pos",), 150),
                StringStartsWith(("sample_id",), "NA"),  # not pushable
            ]
        )
    )
    assert [type(f).__name__ for f in rest] == ["StringStartsWith"]
    assert len(reader.pushed) == 2
    rows = [r for p in reader.partitions() for r in reader.read(p)]
    # only chr1:200 survives chrom='chr1' AND pos>=150 -> 3 call rows
    assert {r[0] for r in rows} == {"chr1:200:G:C,T"}

    # IN-list pushdown (In.value is the tuple of members)
    from pyspark.sql.datasource import In

    reader2 = VcfReader({"path": vcf_path})
    assert list(reader2.pushFilters([In(("chrom",), ("chr2", "chrX"))])) == []
    rows2 = [r for p in reader2.partitions() for r in reader2.read(p)]
    assert {r[0] for r in rows2} == {"chr2:300:C:G"}

    # end-to-end: same answer as the expression parser under the filter
    register_vcf_source(spark)
    ds = (
        spark.read.format("vcf")
        .load(vcf_path)
        .filter((F.col("chrom") == "chr1") & (F.col("pos") >= 150))
    )
    _, ex_calls = read_vcf(spark, vcf_path)
    ex = ex_calls.join(
        spark.read.format("vcf").option("table", "variants").load(vcf_path)
        .filter((F.col("chrom") == "chr1") & (F.col("pos") >= 150))
        .select("variant_id"),
        "variant_id",
        "left_semi",
    )
    cols = ["variant_id", "chrom", "sample_id", "gt", "dp", "gq"]
    assert sorted(tuple(r) for r in ds.select(*cols).collect()) == sorted(
        tuple(r) for r in ex.select(*cols).collect()
    )


def test_vcf_datasource_parallel_partitions(spark, tmp_path_factory):
    """Byte-range splitting: a multi-partition read loses and
    duplicates nothing."""
    from v6spark.sources.vcf_datasource import register_vcf_source

    register_vcf_source(spark)
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2"]
    for i in range(500):
        lines.append(
            f"chr{1 + i % 3}\t{100 + i}\trs{i}\tA\tT\t50\tPASS\t.\tGT:DP\t0/1:{i % 60}\t1/1:{(i * 7) % 60}"
        )
    p = tmp_path_factory.mktemp("bigvcf") / "big.vcf"
    p.write_text("\n".join(lines) + "\n")
    from v6spark.sources.vcf_datasource import VcfReader

    reader = VcfReader({"path": str(p), "n_partitions": "6"})
    assert len(reader.partitions()) == 6  # explicit option honored
    df = spark.read.format("vcf").option("n_partitions", "6").load(str(p))
    assert df.count() == 500 * 2
    assert df.select("variant_id").distinct().count() == 500
    # non-ASCII content across boundaries must not break byte seeks
    lines2 = ["##über ünïcode header é中文",
              "#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	sé"]
    for i in range(300):
        lines2.append(f"chré{i % 2}	{i}	.	A	T	.	PASS	.	GT	0/1")
    p2 = tmp_path_factory.mktemp("uvcf") / "u.vcf"
    p2.write_text("\n".join(lines2) + "\n", encoding="utf-8")
    df2 = spark.read.format("vcf").option("n_partitions", "5").load(str(p2))
    assert df2.count() == 300


def test_frame_index_all_containers(spark):
    """frame_index: the metadata-only per-frame table (byte ranges,
    timestamps, keyframes) across MP4/WebM/GIF — no payload copies."""
    import numpy as np

    from v6spark.operators import gif, media_containers as mc

    mp4 = mc.make_mp4(width=8, height=6, sample_sizes=[10, 11, 12], seed=1)
    webm = mc.make_webm(width=8, height=6, frame_sizes=[9, 8, 7], seed=1)
    pal = np.array([[0, 0, 0], [255, 0, 0]], dtype=np.uint8)
    gpayload = gif.encode_gif(
        [np.zeros((4, 5), dtype=np.uint8) for _ in range(3)],
        pal, delays_ms=[100, 50, 70],
    )
    media = spark.createDataFrame(
        [
            (1, "video", mp4, "s://mp4", "{}"),
            (2, "video", webm, "s://webm", "{}"),
            (3, "video", gpayload, "s://gif", "{}"),
            (4, "image", mp4, "s://ignored", "{}"),  # non-video filtered
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = mm.frame_index(media).collect()
    by_media: dict = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {1, 2, 3}
    # MP4: offsets/sizes match the sample table; dts -> ms via timescale
    table = mc.mp4_sample_table(mp4)
    for r in by_media[1]:
        s = table[r["frame_idx"]]
        assert (r["offset"], r["size"]) == (s["offset"], s["size"])
        assert abs(r["timestamp_ms"] - s["dts"] * 1000 / 600) < 1e-9
    # WebM: ns -> ms, keyframe flags carried
    blocks = mc.webm_block_table(webm, 1)
    for r in by_media[2]:
        b = blocks[r["frame_idx"]]
        assert (r["offset"], r["size"]) == (b["offset"], b["size"])
        assert r["keyframe"] == b["keyframe"]
        assert abs(r["timestamp_ms"] - b["timestamp_ns"] / 1e6) < 1e-9
    # GIF: cumulative timestamps from per-frame delays; no byte ranges
    gif_rows = sorted(by_media[3], key=lambda r: r["frame_idx"])
    assert [r["timestamp_ms"] for r in gif_rows] == [0.0, 100.0, 150.0]
    assert all(r["offset"] is None and r["size"] is None for r in gif_rows)


def test_avi_container_parse_and_index():
    """AVI: metadata via the avih/strl walk, per-frame byte ranges
    via the movi walk, keyframe bits via idx1."""
    import numpy as np

    from v6spark.operators import avi

    frames = [np.full((12, 16, 3), 30 * i, dtype=np.uint8) for i in range(5)]
    payload = avi.make_avi(frames, fps=25, quality=92)
    info = avi.parse_avi_info(payload)
    assert (info["width"], info["height"], info["n_frames"]) == (16, 12, 5)
    assert info["fps"] == 25.0
    assert info["streams"][0]["codec"] == "MJPG"
    assert abs(info["duration_s"] - 0.2) < 1e-9
    table = avi.avi_frame_table(payload)
    assert [f["frame_idx"] for f in table] == [0, 1, 2, 3, 4]
    assert all(f["keyframe"] for f in table)  # idx1 marks MJPEG intra-only
    assert table[1]["timestamp_ms"] == 40.0
    # every offset slices to a standalone baseline JPEG of the frame
    for f in table:
        sl = payload[f["offset"] : f["offset"] + f["size"]]
        assert sl[:3] == b"\xff\xd8\xff" and sl[-2:] == b"\xff\xd9"
    with pytest.raises(ValueError):
        avi.parse_avi_info(b"RIFF\x04\x00\x00\x00WAVE")


def test_frame_sample_real_mjpeg_avi(spark):
    """frame_sample over MJPEG AVI is END-TO-END real pixels:
    container walk -> JPEG entropy decode -> PNG frames whose pixels
    approximate the originals (JPEG is lossy, so tolerance-compared),
    and decode_media reads dims from headers only."""
    import numpy as np

    from v6spark.operators import avi

    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
    # smooth frames (JPEG-friendly) with a per-frame brightness shift
    frames = [
        np.clip(base.astype(int) // 2 + 20 * i, 0, 255).astype(np.uint8)
        for i in range(7)
    ]
    payload = avi.make_avi(frames, fps=10, quality=95)
    media = spark.createDataFrame(
        [(1, "video", payload, "synthetic://avi/1", "{}")],
        mm.MEDIA_SCHEMA,
    )
    rows = mm.frame_sample(media, every_n=3).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 3, 6]
    for r in rows:
        fp = bytes(r["frame_payload"])
        assert mm.sniff_format(fp) == "png"
        w, h, c, img = mm._png_decode(fp)
        assert (w, h, c) == (24, 16, 3)
        err = np.abs(img.astype(int) - frames[r["frame_idx"]].astype(int)).mean()
        assert err < 4.0, err
    got = mm.decode_media(media).collect()[0]
    assert (got["width"], got["height"], got["n_channels"]) == (24, 16, 3)
    # frame_index covers AVI with absolute byte ranges + keyframes
    idx = mm.frame_index(media).collect()
    assert len(idx) == 7
    assert all(r["keyframe"] for r in idx)
    assert idx[0]["size"] > 0 and idx[0]["offset"] > 0


def test_wav_adpcm_decode_and_features(spark):
    """IMA-ADPCM WAV (fmt tag 0x11): the block-vectorized decoder
    reconstructs the encoded sine within the codec's own SNR, and
    audio_features/decode_media consume it like PCM."""
    import numpy as np

    rate, n, freq = 8000, 4000, 440.0
    payload = mm.make_wav_adpcm(n_frames=n, rate=rate, freq=freq)
    got_rate, got_n, got_ch, samples = mm._wav_decode(payload)
    assert (got_rate, got_ch) == (rate, 1)
    assert got_n >= n  # tail block zero-padded up to samples_per_block
    t = np.arange(n)
    ref = (12000 * np.sin(2 * np.pi * freq * t / rate)).astype(np.int16)
    err = (samples[:n, 0].astype(float) - ref) ** 2
    snr = 10 * np.log10((ref.astype(float) ** 2).mean() / err.mean())
    assert snr > 20.0, snr  # IMA-ADPCM delivers ~25 dB on this tone
    media = spark.createDataFrame(
        [(1, "audio", payload, "synthetic://adpcm/1", "{}")],
        mm.MEDIA_SCHEMA,
    )
    feat = mm.audio_features(media).collect()[0]
    assert feat["sample_rate"] == rate and feat["rms"] > 6000
    dims = mm.decode_media(media).collect()[0]
    assert (dims["width"], dims["height"]) == (got_n, rate)  # (frames, rate)


def test_vcf_datasource_multibranch_scan_reuse(spark, vcf_path):
    """Two differently-filtered branches over ONE loaded VCF frame
    must both keep their rows.  Pins the scan-reuse behavior that
    bit the mediadir source (PySpark served two scans with one
    pickled reader, losing the other branch's consumed-pushdown
    rows) — the VCF source consumes chrom/pos filters, so if a Spark
    upgrade starts deduplicating these scans this test catches the
    row loss immediately."""
    from v6spark.sources.vcf_datasource import register_vcf_source

    register_vcf_source(spark)
    df = spark.read.format("vcf").option("table", "variants").load(vcf_path)
    a = df.filter("chrom = 'chr1'").select("variant_id")
    b = df.filter("chrom = 'chr2'").select("variant_id")
    u = {r["variant_id"] for r in a.unionByName(b).collect()}
    assert u == {r["variant_id"] for r in df.collect()}
    # range + equality mix across branches
    c = df.filter("pos >= 250").select("variant_id")
    d = df.filter("pos < 150").select("variant_id")
    assert c.unionByName(d).count() == c.count() + d.count() == 2
