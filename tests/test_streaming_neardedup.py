"""Incremental streaming near-dedup (streaming/neardedup.py) and the
two-sided Hamming-ball join it is built on."""

from __future__ import annotations

from pyspark.sql import functions as F

from v6spark.operators import dedup
from v6spark.streaming import neardedup

DOC_A = "the quick brown fox jumps over the lazy dog and runs far away today"
DOC_A2 = "the quick brown fox jumps over the lazy dog and runs far away tonight"
DOC_B = "completely different content about spark query engines and shuffles everywhere"
DOC_B2 = "completely different content about spark query engines and shuffles anywhere"
# measured fixture distances (60-bit portable simhash): (1,5)=5,
# (3,6)=11, (7,8)=10, everything else >20 — radius 12 makes exactly
# those three pairs near-dups
RADIUS = 12


def test_simhash_pairs_between_cross_only(spark):
    """Cross pairs within radius are found; within-side pairs are
    never generated; distances are exact."""
    left = spark.createDataFrame(
        [(1, 0b0), (2, 0b11)], "doc_id long, simhash long"
    )
    right = spark.createDataFrame(
        [(10, 0b1), (11, (1 << 40) - 1)], "doc_id long, simhash long"
    )
    got = {
        (r["left_id"], r["right_id"]): r["hamming"]
        for r in dedup.simhash_pairs_between(
            left, right, n_bits=60, radius=2
        ).collect()
    }
    # 1-10 ham 1, 2-10 ham 1; 11 is far from both; (1,2) same-side: absent
    assert got == {(1, 10): 1, (2, 10): 1}


def test_batch_near_dedup_step_sequential(spark, tmp_path):
    """Two sequential steps: batch-2 near-dups of kept batch-1 docs are
    dropped via the index; in-batch near-dups lose to the smaller id."""
    index_dir = str(tmp_path / "index")
    kept_dir = str(tmp_path / "kept")
    b1 = spark.createDataFrame(
        [(1, DOC_A), (3, DOC_B)], "doc_id long, text string"
    )
    neardedup.batch_near_dedup_step(
        b1, index_dir, kept_dir, radius=RADIUS
    )
    b2 = spark.createDataFrame(
        # 5 near-dups kept doc 1; 7 is a fresh near-pair with 8 (7 wins)
        [(5, DOC_A2), (7, "a wholly new subject sentence about gardens and rivers flowing north"),
         (8, "a wholly new subject sentence about gardens and rivers flowing south")],
        "doc_id long, text string",
    )
    neardedup.batch_near_dedup_step(
        b2, index_dir, kept_dir, radius=RADIUS
    )
    kept = {r["doc_id"] for r in spark.read.parquet(kept_dir).collect()}
    assert kept == {1, 3, 7}
    index = {r["doc_id"] for r in spark.read.parquet(index_dir).collect()}
    assert index == {1, 3, 7}


def test_batch_step_boilerplate_beats_guard(spark, tmp_path):
    """300 byte-identical docs with a guard far below the cluster
    size: the exact pre-collapse dedups them BEFORE the guarded
    Hamming join, so exactly one survives — the failure mode of
    guard-only near-dedup, closed."""
    corpus = spark.createDataFrame(
        [(i, DOC_A) for i in range(300)] + [(900, DOC_B)],
        "doc_id long, text string",
    )
    neardedup.batch_near_dedup_step(
        corpus, str(tmp_path / "i"), str(tmp_path / "k"),
        radius=RADIUS, max_bucket_size=8,
    )
    kept = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "k")).collect()}
    assert kept == {0, 900}


def test_batch_step_custom_id_column(spark, tmp_path):
    """A non-default id column works ACROSS batches: the index is
    written with canonical (doc_id, simhash) columns whatever the
    corpus calls its id."""
    i_dir, k_dir = str(tmp_path / "i"), str(tmp_path / "k")
    b1 = spark.createDataFrame([(1, DOC_A)], "my_id long, body string")
    neardedup.batch_near_dedup_step(
        b1, i_dir, k_dir, id_col="my_id", text_col="body", radius=RADIUS
    )
    b2 = spark.createDataFrame(
        [(5, DOC_A2), (7, DOC_B)], "my_id long, body string"
    )
    neardedup.batch_near_dedup_step(
        b2, i_dir, k_dir, id_col="my_id", text_col="body", radius=RADIUS
    )
    kept = {r["my_id"] for r in spark.read.parquet(k_dir).collect()}
    assert kept == {1, 7}  # 5 lost to indexed near-neighbour 1


def test_crash_after_index_write_then_replay(spark, tmp_path):
    """Injected crash between the index write and the kept write:
    committed readers never see the half-written batch, and the
    checkpoint-style replay publishes it exactly once."""
    i_dir, k_dir = str(tmp_path / "i"), str(tmp_path / "k")
    b1 = spark.createDataFrame([(1, DOC_A), (3, DOC_B)], "doc_id long, text string")
    neardedup.batch_near_dedup_step(b1, i_dir, k_dir, radius=RADIUS, batch_id=0)
    b2 = spark.createDataFrame([(5, DOC_A2), (7, "fresh topic on tidal power")],
                               "doc_id long, text string")
    import pytest
    with pytest.raises(RuntimeError, match="injected crash"):
        neardedup.batch_near_dedup_step(
            b2, i_dir, k_dir, radius=RADIUS, batch_id=1, _fail_after="index"
        )
    # batch 1 is invisible to committed readers: index still only batch 0
    assert neardedup.committed_batch_ids(spark, i_dir) == {0}
    kept_committed = neardedup.read_kept(spark, k_dir, i_dir)
    assert {r["doc_id"] for r in kept_committed.collect()} == {1, 3}
    # replay the same epoch id: overwrites the orphan dir, commits once
    neardedup.batch_near_dedup_step(b2, i_dir, k_dir, radius=RADIUS, batch_id=1)
    assert neardedup.committed_batch_ids(spark, i_dir) == {0, 1}
    kept = neardedup.read_kept(spark, k_dir, i_dir)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 7]  # no dup 7
    index = neardedup._read_index(spark, i_dir)
    assert sorted(r["doc_id"] for r in index.collect()) == [1, 3, 7]  # no lost sigs


def test_crash_after_kept_write_then_replay(spark, tmp_path):
    """Injected crash AFTER both writes but BEFORE the commit marker —
    the exact window the old two-append design could double-publish.
    Replay overwrites both directories; committed reads stay
    exactly-once (no duplicate kept rows, no duplicate signatures)."""
    i_dir, k_dir = str(tmp_path / "i"), str(tmp_path / "k")
    b1 = spark.createDataFrame([(1, DOC_A)], "doc_id long, text string")
    import pytest
    with pytest.raises(RuntimeError, match="injected crash"):
        neardedup.batch_near_dedup_step(
            b1, i_dir, k_dir, radius=RADIUS, batch_id=0, _fail_after="kept"
        )
    assert neardedup.committed_batch_ids(spark, i_dir) == set()
    assert neardedup.read_kept(spark, k_dir, i_dir) is None
    neardedup.batch_near_dedup_step(b1, i_dir, k_dir, radius=RADIUS, batch_id=0)
    kept = neardedup.read_kept(spark, k_dir, i_dir)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    # the raw (non-manifest) read also holds one copy: the replay
    # overwrote, not appended
    assert spark.read.parquet(k_dir).count() == 1


def test_replay_after_commit_is_skipped(spark, tmp_path):
    """A batch whose marker exists is skipped outright — replay after
    a crash that happened AFTER the commit point writes nothing."""
    i_dir, k_dir = str(tmp_path / "i"), str(tmp_path / "k")
    b1 = spark.createDataFrame([(1, DOC_A), (3, DOC_B)], "doc_id long, text string")
    neardedup.batch_near_dedup_step(b1, i_dir, k_dir, radius=RADIUS, batch_id=0)
    neardedup.batch_near_dedup_step(b1, i_dir, k_dir, radius=RADIUS, batch_id=0)
    assert neardedup.committed_batch_ids(spark, i_dir) == {0}
    assert spark.read.parquet(k_dir).count() == 2  # 1 and 3, once each
    assert neardedup._read_index(spark, i_dir).count() == 2


def test_compact_vacuum_and_post_compaction_replay(spark, tmp_path):
    """Compaction folds per-epoch directories into one generation with
    identical committed reads; replayed epochs still skip after their
    directories are gone; vacuum removes superseded dirs; ingestion
    continues on top of the generation."""
    i_dir, k_dir = str(tmp_path / "i"), str(tmp_path / "k")
    b = {
        0: [(1, DOC_A), (3, DOC_B)],
        1: [(5, DOC_A2), (7, "a note about glaciers and moraines")],
        # (9, 11) measured 60-bit simhash distance: 7 (inside RADIUS)
        2: [(9, "volcanic soils drain quickly after rainfall events today")],
    }
    for bid, rows in b.items():
        neardedup.batch_near_dedup_step(
            spark.createDataFrame(rows, "doc_id long, text string"),
            i_dir, k_dir, radius=RADIUS, batch_id=bid,
        )
    before_kept = {r["doc_id"] for r in neardedup.read_kept(spark, k_dir, i_dir).collect()}
    before_idx = {r["doc_id"] for r in neardedup._read_index(spark, i_dir).collect()}
    assert before_kept == {1, 3, 7, 9}  # 5 lost to indexed 1

    v = neardedup.compact(spark, i_dir, k_dir)
    assert v is not None
    _, live, committed = neardedup._read_manifest(spark, i_dir)
    assert len(live) == 1 and committed == {0, 1, 2}
    assert {r["doc_id"] for r in neardedup.read_kept(spark, k_dir, i_dir).collect()} == before_kept
    assert {r["doc_id"] for r in neardedup._read_index(spark, i_dir).collect()} == before_idx

    # replay of epoch 1 AFTER its directory was folded away: skipped
    neardedup.batch_near_dedup_step(
        spark.createDataFrame(b[1], "doc_id long, text string"),
        i_dir, k_dir, radius=RADIUS, batch_id=1,
    )
    assert {r["doc_id"] for r in neardedup.read_kept(spark, k_dir, i_dir).collect()} == before_kept

    removed = neardedup.vacuum(spark, i_dir, k_dir)
    assert removed == 6  # 3 superseded epoch dirs per sink
    assert {r["doc_id"] for r in neardedup.read_kept(spark, k_dir, i_dir).collect()} == before_kept

    # ingestion continues on top of the generation (near-dup of kept 9)
    neardedup.batch_near_dedup_step(
        spark.createDataFrame(
            [(11, "volcanic soils drain quickly after rainfall events tonight"),
             (12, "entirely new content about harbor logistics")],
            "doc_id long, text string",
        ),
        i_dir, k_dir, radius=RADIUS, batch_id=3,
    )
    kept = {r["doc_id"] for r in neardedup.read_kept(spark, k_dir, i_dir).collect()}
    assert kept == before_kept | {12}  # 11 lost to compacted-index 9


def test_compact_crash_windows_leave_state_unchanged(spark, tmp_path):
    """A crash during either compaction write leaves committed reads
    exactly as they were; the next compaction succeeds."""
    import pytest

    i_dir, k_dir = str(tmp_path / "i"), str(tmp_path / "k")
    for bid, doc in enumerate([(1, DOC_A), (3, DOC_B)]):
        neardedup.batch_near_dedup_step(
            spark.createDataFrame([doc], "doc_id long, text string"),
            i_dir, k_dir, radius=RADIUS, batch_id=bid,
        )
    before = {r["doc_id"] for r in neardedup.read_kept(spark, k_dir, i_dir).collect()}
    for window in ("index", "kept"):
        with pytest.raises(RuntimeError, match="injected crash"):
            neardedup.compact(spark, i_dir, k_dir, _fail_after=window)
        _, live, _ = neardedup._read_manifest(spark, i_dir)
        assert len(live) == 2  # still the per-epoch dirs
        assert {r["doc_id"] for r in neardedup.read_kept(spark, k_dir, i_dir).collect()} == before
    assert neardedup.compact(spark, i_dir, k_dir) is not None
    assert {r["doc_id"] for r in neardedup.read_kept(spark, k_dir, i_dir).collect()} == before


def test_run_incremental_near_dedup_stream(spark, tmp_path):
    """File-source stream, one file per micro-batch: the cross-batch
    near-dup is dropped against the index, exactly as in batch."""
    src = tmp_path / "src"
    b1 = spark.createDataFrame([(1, DOC_A), (3, DOC_B)], "doc_id long, text string")
    b1.coalesce(1).write.mode("overwrite").parquet(str(src / "f1.parquet"))
    b2 = spark.createDataFrame([(5, DOC_A2), (6, DOC_B2), (9, "an entirely unrelated note on metallurgy and furnace temperatures")],
                               "doc_id long, text string")
    b2.coalesce(1).write.mode("overwrite").parquet(str(src / "f2.parquet"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    neardedup.run_incremental_near_dedup(
        stream,
        str(tmp_path / "index"),
        str(tmp_path / "kept"),
        str(tmp_path / "ckpt"),
        radius=RADIUS,
    )
    kept = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "kept")).collect()}
    # batches may arrive in either file order; the exact-radius losers
    # are (5 vs 1) and (6 vs 3) regardless of order
    assert kept == {1, 3, 9} or kept == {5, 6, 9}
    out = spark.read.parquet(str(tmp_path / "kept"))
    assert out.count() == 3
    # survivors' texts are pairwise non-near: re-running the batch
    # dedup over the kept set drops nothing
    sigs = dedup.simhash_signature_portable(out)
    assert dedup.simhash_pairs(sigs, n_bits=60, radius=RADIUS).count() == 0


def test_batch_image_dedup_steps(spark, tmp_path):
    """Incremental IMAGE dedup (streaming/mediadedup.py): the pHash
    signer plugs into the same transactional step — byte-identical
    copies collapse exactly, re-encoded copies lose against the
    index, distinct images survive."""
    import numpy as np

    from v6spark.operators import multimodal as mm
    from v6spark.operators.jpeg import encode_jpeg
    from v6spark.streaming import mediadedup

    # smooth fixtures: perceptual hashes are FOR natural images —
    # wrap-around sawtooths / pure noise are adversarial by design
    y, x = np.mgrid[0:48, 0:64]
    img = np.stack([
        127 + 100 * np.sin(x / 7.0) * np.cos(y / 5.0),
        127 + 90 * np.cos(x / 9.0),
        np.clip(2 * x + y, 0, 255),
    ], axis=2).astype(np.uint8)
    other = np.stack([
        np.clip(255 - 3 * y, 0, 255),
        127 + 110 * np.sin((x + 2 * y) / 11.0),
        np.clip(4 * y - x, 0, 255),
    ], axis=2).astype(np.uint8)
    schema = "media_id long, payload binary"
    index, kept = str(tmp_path / "idx"), str(tmp_path / "kept")

    b1 = spark.createDataFrame(
        [(1, mm.encode_png(img)), (2, mm.encode_png(img)),   # exact dup of 1
         (3, mm.encode_png(other))], schema)
    mediadedup.batch_image_dedup_step(b1, index, kept, radius=13, batch_id=0)
    kept1 = {r["media_id"] for r in neardedup.read_kept(spark, kept, index).collect()}
    assert kept1 == {1, 3}

    b2 = spark.createDataFrame(
        [(10, encode_jpeg(img, quality=85)),                  # near-dup of 1
         (11, mm.encode_png(other[::2, ::2])),                # near-dup of 3 (downscale)
         (12, mm.encode_png(np.stack([
             np.clip(3 * x, 0, 255), np.clip(3 * y, 0, 255),
             127 + 120 * np.cos((x - y) / 6.0),
         ], axis=2).astype(np.uint8)))], schema)
    # measured fixture distances: (1,10)=12 (q85 JPEG on a small
    # image), (3,11)=0, all cross distances >= 20 -> radius 13
    mediadedup.batch_image_dedup_step(b2, index, kept, radius=13, batch_id=1)
    kept2 = {r["media_id"] for r in neardedup.read_kept(spark, kept, index).collect()}
    assert kept2 == {1, 3, 12}
    # the index holds one 64-bit signature per survivor
    idx = spark.read.parquet(f"{index}/batch_id=0").unionByName(
        spark.read.parquet(f"{index}/batch_id=1"))
    assert {r["doc_id"] for r in idx.collect()} == {1, 3, 12}
    # replay after commit: a no-op (inherited manifest machinery)
    mediadedup.batch_image_dedup_step(b2, index, kept, radius=13, batch_id=1)
    assert {r["media_id"] for r in neardedup.read_kept(spark, kept, index).collect()} == {1, 3, 12}


def test_audio_signer_batch_steps(spark, tmp_path):
    """Audio streams share the transactional step via audio_signer:
    a re-gained copy in batch 2 loses to the indexed original."""
    import numpy as np

    from v6spark.streaming import mediadedup

    t = np.arange(8000)

    def wav(sig):
        import io
        import wave

        b = io.BytesIO()
        with wave.open(b, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(np.clip(sig, -32768, 32767).astype("<i2").tobytes())
        return b.getvalue()

    tone = 10000 * np.sin(2 * np.pi * 440 * t / 8000)
    other = 10000 * np.sin(2 * np.pi * 1320 * t / 8000) \
        + 4000 * np.sin(2 * np.pi * 220 * t / 8000)
    index, kept = str(tmp_path / "ai"), str(tmp_path / "ak")
    schema = "media_id long, payload binary"
    b1 = spark.createDataFrame([(1, wav(tone)), (2, wav(other))], schema)
    neardedup.batch_near_dedup_step(
        b1, index, kept, id_col="media_id", text_col="payload",
        n_bits=64, radius=5, batch_id=0, signer=mediadedup.audio_signer,
    )
    b2 = spark.createDataFrame([(10, wav(0.5 * tone))], schema)  # re-gain dup
    neardedup.batch_near_dedup_step(
        b2, index, kept, id_col="media_id", text_col="payload",
        n_bits=64, radius=5, batch_id=1, signer=mediadedup.audio_signer,
    )
    kept_ids = {r["media_id"] for r in neardedup.read_kept(spark, kept, index).collect()}
    assert kept_ids == {1, 2}
