"""Embedded media metadata: EXIF/ID3 extraction through Spark,
SRT/VTT caption tables, and caption-to-frame alignment (broadcast
range join, plan-asserted)."""

from __future__ import annotations

import numpy as np

from v6spark.operators import media_metadata as mmeta
from v6spark.operators import multimodal as mm

SRT = """1
00:00:00,000 --> 00:00:00,250
early words

2
00:00:00,250 --> 00:00:00,600
later words
"""


def test_media_metadata_exif_and_id3(spark):
    img = np.full((16, 16, 3), 90, dtype=np.uint8)
    jpeg = mmeta.make_exif_jpeg(
        img, {"make": "TestCam", "orientation": 6, "datetime": "2024:01:02 03:04:05"}
    )
    plain = mm.encode_png(img)
    mp3 = mmeta.make_id3_mp3({"title": "Song Name", "artist": "Some Artist"})
    media = spark.createDataFrame(
        [
            (1, "image", jpeg, "s://exif", "{}"),
            (2, "image", plain, "s://plain", "{}"),
            (3, "audio", mp3, "s://id3", "{}"),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: dict(r["metadata"]) for r in
            mmeta.media_metadata(media).collect()}
    assert rows[1]["make"] == "TestCam" and rows[1]["orientation"] == "6"
    assert rows[1]["datetime"] == "2024:01:02 03:04:05"
    assert rows[2] == {}  # absence is data, not an error
    assert rows[3]["title"] == "Song Name" and rows[3]["artist"] == "Some Artist"
    # EXIF survives the real JPEG decoder (APP1 is skipped cleanly)
    from v6spark.operators.jpeg import decode_jpeg

    w, h, _c, _img = decode_jpeg(jpeg)
    assert (w, h) == (16, 16)


def test_caption_table_and_alignment(spark):
    """Captions align to AVI frame_index timestamps via the broadcast
    range join: each frame carries the cue on screen at its ts."""
    from pyspark.sql import functions as F

    from v6spark.operators.avi import make_avi

    # 5 frames at 10 fps -> timestamps 0,100,...,400 ms... use 20 fps
    # against the 0-250 / 250-600 cues: ts 0,50,...,200
    vid = make_avi([np.full((8, 8, 3), 30 * i, dtype=np.uint8) for i in range(5)], fps=20)
    media = spark.createDataFrame(
        [(1, "video", vid, "s://v", "{}"),
         (1, "caption", SRT.encode(), "s://v.srt", "{}")][:1],
        mm.MEDIA_SCHEMA,
    )
    caps = spark.createDataFrame(
        [(1, SRT.encode())], "media_id long, payload binary"
    )
    cap_table = mmeta.caption_table(caps)
    got = {r["idx"]: r for r in cap_table.collect()}
    assert got[0]["text"] == "early words" and got[1]["start_ms"] == 250
    frames = mm.frame_index(media)
    aligned = mmeta.align_captions_to_frames(frames, cap_table)
    rows = {r["frame_idx"]: r["caption"] for r in aligned.collect()}
    # ts 0,50,100,150,200 -> cues: early(0-250) covers 0..200; at 250+
    # nothing here since max ts is 200
    assert rows == {0: "early words", 1: "early words", 2: "early words",
                    3: "early words", 4: "early words"}
    # shift: 5 fps -> ts 0,200,400,600,800: frame 2,3 in later cue
    vid5 = make_avi([np.full((8, 8, 3), 9, dtype=np.uint8)] * 5, fps=5)
    media5 = spark.createDataFrame([(1, "video", vid5, "s://v5", "{}")], mm.MEDIA_SCHEMA)
    rows5 = {r["frame_idx"]: r["caption"] for r in
             mmeta.align_captions_to_frames(mm.frame_index(media5), cap_table).collect()}
    # ts 0,200 -> early cue (0-250); 400 -> later (250-600);
    # 600 is the exclusive end; 800 past everything
    assert rows5[0] == "early words" and rows5[1] == "early words"
    assert rows5[2] == "later words"
    assert rows5[3] is None and rows5[4] is None
    # plan: caption side broadcast, frame index never shuffled
    plan = mmeta.align_captions_to_frames(frames, cap_table) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_caption_parser_edge_cases():
    # VTT with hour-less timestamps, NOTE blocks, trailing cue w/o blank
    vtt = "WEBVTT\n\nNOTE comment\n\n00:01.000 --> 00:03.500\nVTT cue"
    cues = mmeta.parse_captions(vtt)
    assert cues == [{"idx": 0, "start_ms": 1000, "end_ms": 3500, "text": "VTT cue"}]
    assert mmeta.parse_captions("") == []
    assert mmeta.parse_captions("garbage\nwithout cues") == []


def test_oriented_phash_catches_rotated_reupload():
    """A camera-rotated JPEG (pixels stored rotated, EXIF orientation
    6) hashes near its upright original once orientation is applied;
    plain pHash misses the pair entirely.  Residual bits come from
    JPEG blocking quantized in the rotated frame — compare with a
    slightly wider radius than same-orientation re-encodes need."""
    y, x = np.mgrid[0:48, 0:64]
    img = np.stack([
        127 + 100 * np.sin(x / 7.0) * np.cos(y / 5.0),
        127 + 90 * np.cos(x / 9.0),
        np.clip(2 * x + y, 0, 255),
    ], axis=2).astype(np.uint8)
    rotated = np.rot90(img, 1).copy()  # stored 90 deg CCW
    tagged = mmeta.make_exif_jpeg(rotated, {"orientation": 6})
    upright = mm.encode_png(img)

    from v6spark.operators.media_fingerprint import phash_bytes

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    plain = ham(phash_bytes(tagged), phash_bytes(upright))
    oriented = ham(
        mmeta.oriented_phash_bytes(tagged), mmeta.oriented_phash_bytes(upright)
    )
    assert plain >= 16          # rotation scrambles plain pHash
    assert oriented <= 10       # orientation-normalized: near-dup
    # all 8 orientation transforms invert back to the original shape
    for o in range(1, 9):
        t = mmeta.apply_exif_orientation(img, o)
        assert t.size == img.size


def test_corpus_diff(spark):
    from v6spark.operators.profile import corpus_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same text"), (2, "changed text"), (4, "brand new")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_mediadir_ingests_captions(spark, tmp_path):
    """SRT/VTT files land in the media frame as kind='caption' and
    flow straight into caption_table; decode_media reads caption
    'dims' as (n_cues, duration_ms)."""
    from pyspark.sql import functions as F

    from v6spark.sources.media_datasource import register_media_source

    root = tmp_path / "c"
    root.mkdir()
    (root / "video1.srt").write_bytes(SRT.encode())
    (root / "talk.vtt").write_bytes(b"WEBVTT\n\n00:01.000 --> 00:02.000\nhello\n")
    (root / "img.png").write_bytes(mm.encode_png(np.full((8, 8, 3), 5, dtype=np.uint8)))
    register_media_source(spark)
    df = spark.read.format("mediadir").load(str(root))
    kinds = {r["uri"]: r["kind"] for r in df.collect()}
    assert kinds == {"video1.srt": "caption", "talk.vtt": "caption", "img.png": "image"}
    caps = mmeta.caption_table(
        df.filter("kind = 'caption'").select("media_id", "payload")
    )
    assert caps.count() == 3  # 2 srt cues + 1 vtt cue
    dims = {r["format"]: r for r in mm.decode_media(
        df.filter("kind = 'caption'")).collect()}
    assert dims["srt"]["width"] == 2 and dims["srt"]["height"] == 600
    assert dims["vtt"]["width"] == 1 and dims["vtt"]["height"] == 2000
