"""Perceptual media fingerprints: pHash/dHash invariance, the audio
spectral fingerprint, STFT spectrogram, and near-dup pairing through
the shared Hamming band join."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from v6spark.operators import media_fingerprint as mf
from v6spark.operators import multimodal as mm


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def _structured_img(seed: int = 0) -> np.ndarray:
    y, x = np.mgrid[0:64, 0:96]
    return np.stack(
        [(x * 2 + seed * 37) % 256, (y * 3) % 256, ((x + y) * 2) % 256],
        axis=2,
    ).astype(np.uint8)


def _wav_payload(sig: np.ndarray, rate: int = 8000) -> bytes:
    b = io.BytesIO()
    with wave.open(b, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.clip(sig, -32768, 32767).astype("<i2").tobytes())
    return b.getvalue()


def test_phash_invariance_and_discrimination():
    """pHash survives re-encoding (PNG->JPEG at two qualities +
    4:2:0) and 2x downscale within a few bits; unrelated content
    lands near the binomial mean of 32."""
    from v6spark.operators.jpeg import encode_jpeg

    img = _structured_img()
    h_png = mf.phash_bytes(mm.encode_png(img))
    assert _ham(h_png, mf.phash_bytes(encode_jpeg(img, quality=80))) <= 2
    assert _ham(h_png, mf.phash_bytes(
        encode_jpeg(img, quality=60, subsampling="420"))) <= 6
    assert _ham(h_png, mf.phash_bytes(mm.encode_png(img[::2, ::2]))) <= 6
    other = np.random.default_rng(3).integers(0, 255, (64, 96, 3), dtype=np.uint8)
    assert _ham(h_png, mf.phash_bytes(mm.encode_png(other))) >= 16
    # dHash agrees on the same verdicts
    d_png = mf.dhash_bytes(mm.encode_png(img))
    assert _ham(d_png, mf.dhash_bytes(encode_jpeg(img, quality=80))) <= 4
    assert _ham(d_png, mf.dhash_bytes(mm.encode_png(other))) >= 16


def test_audio_fingerprint_gain_invariant():
    rng = np.random.default_rng(3)
    t = np.arange(8000)
    tone = 10000 * np.sin(2 * np.pi * 440 * t / 8000)
    fp = mf.audio_fingerprint_samples(tone)
    # re-gained + low-level noise: same fingerprint
    assert _ham(fp, mf.audio_fingerprint_samples(
        0.3 * tone + rng.normal(0, 50, 8000))) <= 3
    # different content (different spectral support): far away
    other = 10000 * np.sin(2 * np.pi * 1320 * t / 8000) \
        + 4000 * np.sin(2 * np.pi * 220 * t / 8000)
    assert _ham(fp, mf.audio_fingerprint_samples(other)) >= 7


def test_image_near_dup_pairs_spark(spark):
    """End-to-end: three encodings of one image + one unrelated image
    -> exactly the three same-content pairs, through the band join."""
    from v6spark.operators.jpeg import encode_jpeg

    img = _structured_img()
    other = np.random.default_rng(9).integers(0, 255, (48, 64, 3), dtype=np.uint8)
    rows = [
        (1, "image", mm.encode_png(img), "s://a", "{}"),
        (2, "image", encode_jpeg(img, quality=85), "s://b", "{}"),
        (3, "image", encode_jpeg(img, quality=60, subsampling="420"), "s://c", "{}"),
        (4, "image", mm.encode_png(other), "s://d", "{}"),
        (5, "video", mm.encode_png(img), "s://skip", "{}"),  # non-image filtered
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = {(r["id_a"], r["id_b"]) for r in
             mf.image_near_dup_pairs(media, radius=6).collect()}
    assert pairs == {(1, 2), (1, 3), (2, 3)}


def test_audio_near_dup_pairs_spark(spark):
    t = np.arange(8000)
    tone = 10000 * np.sin(2 * np.pi * 440 * t / 8000)
    rng = np.random.default_rng(1)
    rows = [
        (1, "audio", _wav_payload(tone), "s://a", "{}"),
        (2, "audio", _wav_payload(0.4 * tone + rng.normal(0, 40, 8000)), "s://b", "{}"),
        (3, "audio", _wav_payload(10000 * np.sin(2 * np.pi * 1320 * t / 8000)
                                  + 4000 * np.sin(2 * np.pi * 220 * t / 8000)),
         "s://c", "{}"),
        # ADPCM-compressed copy of the tone: decoder path + robustness
        (4, "audio", mm.make_wav_adpcm(n_frames=8000, rate=8000, freq=440.0),
         "s://d", "{}"),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = {(r["id_a"], r["id_b"]) for r in
             mf.audio_near_dup_pairs(media, radius=5).collect()}
    assert (1, 2) in pairs and (1, 4) in pairs and (2, 4) in pairs
    assert not any(3 in p for p in pairs)


def test_spectrogram_peak_and_shape(spark):
    rate, n_fft = 8000, 256
    t = np.arange(8000)
    freq = 1000.0
    tone = 12000 * np.sin(2 * np.pi * freq * t / rate)
    media = spark.createDataFrame(
        [(1, "audio", _wav_payload(tone), "s://a", "{}")], mm.MEDIA_SCHEMA
    )
    row = mf.audio_spectrogram(media, n_fft=n_fft).collect()[0]
    spec = np.frombuffer(row["spectrogram"], dtype=np.float32).reshape(
        row["n_frames"], row["n_bins"]
    )
    assert row["n_bins"] == n_fft // 2 + 1
    assert row["n_frames"] == (8000 - n_fft) // (n_fft // 2) + 1
    # every frame peaks at the tone's bin
    peak = spec.mean(axis=0).argmax()
    assert peak == round(freq * n_fft / rate)


def test_dct_matrix_orthonormal():
    d = mf._dct_matrix(32)
    assert np.allclose(d @ d.T, np.eye(32), atol=1e-12)


def test_prepare_media_corpus_end_to_end(spark):
    """The multimodal pipeline twin: gates + perceptual dedup + exact
    video dedup + split/shard — winners only, deterministic."""
    from v6spark.operators import avi
    from v6spark.operators.jpeg import encode_jpeg
    from v6spark.pipeline import prepare_media_corpus

    img = _structured_img()
    tiny = np.full((8, 8, 3), 128, dtype=np.uint8)  # fails min dims
    t = np.arange(8000)
    tone = 10000 * np.sin(2 * np.pi * 440 * t / 8000)
    vid = avi.make_avi([np.full((16, 16, 3), 60, dtype=np.uint8)] * 3)
    rows = [
        (1, "image", mm.encode_png(img), "s://1", "{}"),
        (2, "image", encode_jpeg(img, quality=85), "s://2", "{}"),   # near-dup of 1
        (3, "image", mm.encode_png(tiny), "s://3", "{}"),            # gated out
        (4, "audio", _wav_payload(tone), "s://4", "{}"),
        (5, "audio", _wav_payload(0.5 * tone), "s://5", "{}"),       # re-gain dup of 4
        (6, "video", vid, "s://6", "{}"),
        (7, "video", vid, "s://7", "{}"),                            # exact dup of 6
        (8, "image", mm.encode_png(
            np.random.default_rng(5).integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ), "s://8", "{}"),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = prepare_media_corpus(media, n_shards=4).collect()
    by_id = {r["media_id"]: r for r in out}
    # keepers: min-id of each duplicate group; tiny image gated out
    assert set(by_id) == {1, 4, 6, 8}
    assert by_id[1]["dup_count"] == 2
    assert by_id[4]["dup_count"] == 2
    assert by_id[6]["dup_count"] == 2
    assert by_id[8]["dup_count"] == 1
    assert all(r["split"] in ("train", "valid", "test") for r in out)
    assert all(0 <= r["shard"] < 4 for r in out)
    # deterministic: rerun yields the identical frame
    again = {r["media_id"]: r for r in prepare_media_corpus(media, n_shards=4).collect()}
    assert {k: tuple(v) for k, v in by_id.items()} == {k: tuple(v) for k, v in again.items()}


def test_mediadir_datasource(spark, tmp_path):
    """spark.read.format('mediadir'): magic-byte kinds, byte-balanced
    partitions, kind pushdown skipping payload reads, stable ids."""
    import json as _json

    from v6spark.operators import avi
    from v6spark.sources.media_datasource import (
        media_id_for,
        register_media_source,
    )

    root = tmp_path / "corpus"
    (root / "sub").mkdir(parents=True)
    img = _structured_img()
    (root / "a.png").write_bytes(mm.encode_png(img))
    (root / "sub" / "b.dat").write_bytes(  # wrong extension, real JPEG
        __import__("v6spark.operators.jpeg", fromlist=["encode_jpeg"]).encode_jpeg(img)
    )
    t = np.arange(4000)
    (root / "c.wav").write_bytes(_wav_payload(8000 * np.sin(2 * np.pi * 440 * t / 8000)))
    (root / "d.avi").write_bytes(avi.make_avi([np.full((8, 8, 3), 9, dtype=np.uint8)] * 2))
    (root / "notes.txt").write_bytes(b"not media at all")

    register_media_source(spark)
    df = spark.read.format("mediadir").load(str(root))
    rows = {r["uri"]: r for r in df.collect()}
    assert set(rows) == {"a.png", "sub/b.dat", "c.wav", "d.avi"}
    assert rows["a.png"]["kind"] == "image"
    assert rows["sub/b.dat"]["kind"] == "image"  # magic bytes beat extension
    assert rows["c.wav"]["kind"] == "audio"
    assert rows["d.avi"]["kind"] == "video"
    assert rows["a.png"]["media_id"] == media_id_for("a.png")
    assert _json.loads(rows["sub/b.dat"]["meta"])["ext"] == "dat"
    # kind pushdown (opt-in): only images come back
    imgs = spark.read.format("mediadir").option("pushdown", "true") \
        .load(str(root)).filter("kind = 'image'")
    assert {r["uri"] for r in imgs.collect()} == {"a.png", "sub/b.dat"}
    # the frame feeds the decode operators directly
    dims = {r["media_id"]: r for r in mm.decode_media(
        spark.read.format("mediadir").load(str(root))).collect()}
    assert dims[media_id_for("a.png")]["width"] == 96


def test_image_quality_features(spark):
    """Blur/entropy/contrast gates on real pixels: a sharp structured
    image scores high, a flat fill scores near zero, a blurred copy
    scores between."""
    img = _structured_img()
    flat = np.full((48, 48, 3), 77, dtype=np.uint8)
    # box-blur the structured image (valid-region averaging)
    k = 5
    pad = np.pad(img.astype(float), ((k, k), (k, k), (0, 0)), mode="edge")
    blur = sum(
        pad[dy : dy + img.shape[0], dx : dx + img.shape[1]]
        for dy in range(2 * k + 1) for dx in range(2 * k + 1)
    ) / (2 * k + 1) ** 2
    blur = blur.astype(np.uint8)
    media = spark.createDataFrame(
        [
            (1, "image", mm.encode_png(img), "s://sharp", "{}"),
            (2, "image", mm.encode_png(flat), "s://flat", "{}"),
            (3, "image", mm.encode_png(blur), "s://blur", "{}"),
            (4, "audio", _wav_payload(np.zeros(100)), "s://skip", "{}"),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in mf.image_quality_features(media).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["sharpness"] == 0.0 and rows[2]["entropy"] == 0.0
    assert rows[2]["contrast"] == 0.0 and rows[2]["brightness"] == 77.0
    assert rows[1]["sharpness"] > rows[3]["sharpness"] > 0
    assert rows[1]["entropy"] > 4.0


def test_audio_quality_features(spark):
    t = np.arange(16000)
    clean = 8000 * np.sin(2 * np.pi * 220 * t / 8000)
    clipped = np.clip(6 * clean, -32767, 32767)  # 48k amplitude -> rails
    half_silent = np.concatenate([clean[:8000], np.zeros(8000)])
    media = spark.createDataFrame(
        [
            (1, "audio", _wav_payload(clean), "s://clean", "{}"),
            (2, "audio", _wav_payload(clipped), "s://clip", "{}"),
            (3, "audio", _wav_payload(half_silent), "s://silent", "{}"),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in mf.audio_quality_features(media).collect()}
    assert rows[1]["clip_ratio"] == 0.0
    assert rows[2]["clip_ratio"] > 0.2          # hard-clipped wave sits at rails
    assert rows[1]["silence_ratio"] == 0.0
    assert abs(rows[3]["silence_ratio"] - 0.5) < 0.05
    assert rows[1]["dynamic_range_db"] < rows[3]["dynamic_range_db"]


def test_prepare_media_corpus_sharpness_gate(spark):
    from v6spark.pipeline import prepare_media_corpus

    img = _structured_img()
    flat = np.full((48, 48, 3), 90, dtype=np.uint8)
    t = np.arange(4000)
    media = spark.createDataFrame(
        [
            (1, "image", mm.encode_png(img), "s://sharp", "{}"),
            (2, "image", mm.encode_png(flat), "s://flat", "{}"),
            (3, "audio", _wav_payload(9000 * np.sin(2 * np.pi * 440 * t / 8000)),
             "s://aud", "{}"),
        ],
        mm.MEDIA_SCHEMA,
    )
    out = {r["media_id"] for r in
           prepare_media_corpus(media, min_sharpness=5.0, n_shards=2).collect()}
    assert out == {1, 3}  # flat fill fails the blur gate; audio untouched


def test_media_corpus_profile(spark):
    """One-Expand media rollup: per (kind, format) + marginals, with
    decode_media's new format column driving the lattice."""
    from v6spark.operators import avi
    from v6spark.operators.profile import media_corpus_profile

    img = _structured_img()
    t = np.arange(2000)
    media = spark.createDataFrame(
        [
            (1, "image", mm.encode_png(img), "s://1", "{}"),
            (2, "image", mm.make_bmp(10, 8), "s://2", "{}"),
            (3, "image", mm.encode_png(img[::2, ::2]), "s://3", "{}"),
            (4, "audio", _wav_payload(5000 * np.sin(2 * np.pi * 300 * t / 8000)),
             "s://4", "{}"),
            (5, "video", avi.make_avi([np.full((8, 8, 3), 7, dtype=np.uint8)]),
             "s://5", "{}"),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = media_corpus_profile(media).collect()
    by = {(r["level"], r["kind"], r["format"]): r for r in rows}
    assert by[("kind_format", "image", "png")]["n_items"] == 2
    assert by[("kind_format", "image", "bmp")]["n_items"] == 1
    assert by[("kind", "image", None)]["n_items"] == 3
    assert by[("kind_format", "video", "avi")]["n_items"] == 1
    total = by[("total", None, None)]
    assert total["n_items"] == 5
    assert total["total_bytes"] == sum(
        len(bytes(r["payload"])) for r in media.collect()
    )


def test_poison_rows_do_not_kill_the_pipeline(spark):
    """Corrupted payloads at both failure layers: garbage bytes fail
    the header pass (dropped by decode_media skip), a PNG with a
    valid header but truncated IDAT passes the metadata gate, skips
    fingerprinting, and is dropped by the blur gate."""
    from v6spark.pipeline import prepare_media_corpus

    img = _structured_img()
    good = mm.encode_png(img)
    truncated = good[: len(good) // 2]  # header OK, pixels gone
    rows = [
        (1, "image", good, "s://good", "{}"),
        (2, "image", b"\x00\x01garbage-not-a-media-file\xff", "s://junk", "{}"),
        (3, "image", truncated, "s://trunc", "{}"),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    # default skip policy: the job completes, good row survives
    out = {r["media_id"] for r in prepare_media_corpus(media, n_shards=2).collect()}
    assert 1 in out and 2 not in out
    # truncated-but-header-valid survives dedup uncompared...
    assert out == {1, 3}
    # ...and the blur gate removes it (no pixel score -> fails)
    gated = {r["media_id"] for r in prepare_media_corpus(
        media, min_sharpness=1.0, n_shards=2).collect()}
    assert gated == {1}
    # raise policy keeps fail-loud semantics
    import pytest as _pytest

    with _pytest.raises(Exception):
        prepare_media_corpus(media, on_error="raise", n_shards=2).collect()
    # census mode accounts for every row with the error class
    census = {r["media_id"]: r["format"] for r in
              mm.decode_media(media, on_error="null").collect()}
    assert census[1] == "png" and census[3] == "png"
    assert census[2].startswith("error:")


def test_mediadir_empty_and_conflicting_pushdown(spark, tmp_path):
    """Review regressions: an empty (or fully filtered-out) directory
    yields an empty frame, not a read(None) crash; pushdown is
    opt-in ADVISORY (filters always yielded back) so AND-ed filters,
    and — the hazard that motivated the default — MULTI-BRANCH reuse
    of one loaded frame, stay correct."""
    from v6spark.sources.media_datasource import register_media_source

    register_media_source(spark)
    empty = tmp_path / "empty"
    empty.mkdir()
    assert spark.read.format("mediadir").load(str(empty)).count() == 0

    root = tmp_path / "c"
    root.mkdir()
    (root / "a.png").write_bytes(mm.encode_png(_structured_img()))
    t = np.arange(1000)
    (root / "b.wav").write_bytes(_wav_payload(5000 * np.sin(2 * np.pi * 300 * t / 8000)))
    df = spark.read.format("mediadir").option("pushdown", "true").load(str(root))
    # kind = 'image' AND kind IN ('image','audio') -> image only
    got = df.filter("kind = 'image'").filter("kind in ('image','audio')").collect()
    assert {r["uri"] for r in got} == {"a.png"}
    # contradictory filters -> empty, not the union
    assert df.filter("kind = 'image'").filter("kind = 'audio'").count() == 0
    # THE multi-branch hazard: union of differently-filtered branches
    # over ONE loaded frame (PySpark may execute both scans with one
    # pickled reader — the reason pushdown defaults off)
    plain = spark.read.format("mediadir").load(str(root))
    u = plain.filter("kind = 'image'").select("uri").unionByName(
        plain.filter("kind = 'audio'").select("uri"))
    assert {r["uri"] for r in u.collect()} == {"a.png", "b.wav"}


def test_short_audio_clips_fingerprint_distinct():
    """Review regression: clips shorter than one FFT frame must not
    all collapse to fingerprint 0 (which would mutually 'duplicate'
    distinct content)."""
    t = np.arange(100)  # < n_fft=256
    a = mf.audio_fingerprint_samples(9000 * np.sin(2 * np.pi * 0.3 * t))
    b = mf.audio_fingerprint_samples(np.linspace(-9000, 9000, 100))
    assert a != 0 and b != 0 and _ham(a, b) > 6
    assert mf.audio_fingerprint_samples(np.array([])) == 0


def test_media_contamination_report(spark):
    """Corpus images perceptually matching a benchmark set are
    flagged (re-encode caught); unrelated images are not; within-side
    pairs never generate."""
    from v6spark.operators.contamination import media_contamination_report
    from v6spark.operators.jpeg import encode_jpeg

    bench_img = _structured_img()
    other = np.stack([
        np.clip(255 - 3 * np.mgrid[0:64, 0:96][0], 0, 255),
        np.full((64, 96), 40),
        np.clip(2 * np.mgrid[0:64, 0:96][1], 0, 255),
    ], axis=2).astype(np.uint8)
    corpus = spark.createDataFrame(
        [
            (1, "image", encode_jpeg(bench_img, quality=85), "s://re", "{}"),
            (2, "image", mm.encode_png(other), "s://clean", "{}"),
            (3, "image", mm.encode_png(bench_img), "s://exact", "{}"),
        ],
        mm.MEDIA_SCHEMA,
    )
    bench = spark.createDataFrame(
        [(100, "image", mm.encode_png(bench_img), "s://bench", "{}")],
        mm.MEDIA_SCHEMA,
    )
    rows = media_contamination_report(corpus, bench, radius=6).collect()
    flagged = {r["media_id"]: r["bench_id"] for r in rows}
    assert flagged == {1: 100, 3: 100}
