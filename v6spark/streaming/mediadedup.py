"""Streaming incremental IMAGE near-dedup against a persistent
pHash index — the multimodal instance of streaming/neardedup.py.

A media crawl is naturally a stream: every micro-batch of images
must be checked against EVERYTHING kept so far, not just its own
batch.  The text machinery already solves the hard parts — the
Hamming-ball in-batch + vs-index joins, the versioned-manifest
exactly-once commit spanning both sinks, compaction/vacuum — and is
signature-agnostic end to end (the index schema is ``(doc_id,
simhash int64)``; nothing inspects the bits' provenance).  This
module supplies only the media-specific pieces:

- signer: DCT pHash over payload bytes (Arrow-batched
  ``mapInPandas``; pixels never shuffle — one int64 per image
  crosses into the joins),
- exact pre-collapse: ``sha2(payload)`` (byte-identical files
  resolve at digest cost before any decode),
- 64-bit signatures / radius tuned to pHash's regime.

Everything transactional is inherited: a replayed epoch skips or
deterministically overwrites, compaction folds batch dirs,
crash-injection semantics are the ones neardedup's tests prove.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from v6spark.streaming.neardedup import (
    batch_near_dedup_step,
    run_incremental_near_dedup,
)


def payload_signer(hash_fn, on_error: str = "raise"):
    """Factory: per-payload 64-bit hash function -> a signer
    ``(reps) -> DataFrame(doc_id, simhash)`` with the shared
    poison-row policy.  ``on_error="skip"`` drops undecodable
    payloads instead of killing the stream (an unsigned row gets no
    index entry, so the kept-sink semi-join drops it from the output
    too — poison rows are fully excluded, the same policy as the
    batch pipeline)."""

    def signer(reps: DataFrame) -> DataFrame:
        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                (content_col,) = [c for c in pdf.columns if c != "doc_id"]
                ids, sigs = [], []
                for did, p in zip(pdf["doc_id"], pdf[content_col]):
                    try:
                        sigs.append(hash_fn(bytes(p)))
                        ids.append(did)
                    except Exception:
                        if on_error == "raise":
                            raise
                yield pd.DataFrame({"doc_id": ids, "simhash": sigs})

        return reps.mapInPandas(batches, schema="doc_id long, simhash long")

    return signer


def _phash_payload(payload: bytes) -> int:
    from v6spark.operators.media_fingerprint import phash_bytes

    return phash_bytes(payload)


def _audio_payload(payload: bytes) -> int:
    import numpy as np

    from v6spark.operators.media_fingerprint import audio_fingerprint_samples
    from v6spark.operators.multimodal import _wav_decode

    _r, _n, _c, samples = _wav_decode(payload)
    return audio_fingerprint_samples(samples.astype(np.float64).mean(axis=1))


def phash_signer(reps: DataFrame, on_error: str = "raise") -> DataFrame:
    """(doc_id, payload) -> (doc_id, simhash): DCT pHash bits in the
    canonical index column (see :func:`payload_signer`)."""
    return payload_signer(_phash_payload, on_error)(reps)


def batch_image_dedup_step(
    batch_df: DataFrame,
    index_dir: str,
    kept_dir: str,
    id_col: str = "media_id",
    payload_col: str = "payload",
    radius: int = 6,
    max_bucket_size: int | None = 256,
    batch_id: int | None = None,
    on_error: str = "raise",
) -> None:
    """One incremental image-dedup step (batch backfills + tests)."""
    batch_near_dedup_step(
        batch_df,
        index_dir,
        kept_dir,
        id_col=id_col,
        text_col=payload_col,
        n_bits=64,
        radius=radius,
        max_bucket_size=max_bucket_size,
        batch_id=batch_id,
        signer=lambda reps: phash_signer(reps, on_error=on_error),
    )


def run_incremental_image_dedup(
    stream_df: DataFrame,
    index_dir: str,
    kept_dir: str,
    checkpoint_dir: str,
    id_col: str = "media_id",
    payload_col: str = "payload",
    radius: int = 6,
    max_bucket_size: int | None = 256,
    on_error: str = "raise",
) -> None:
    """Drain a (finite) image stream through incremental pHash dedup
    with the inherited exactly-once manifest commit.
    ``on_error="skip"`` keeps the stream alive past poison payloads."""
    run_incremental_near_dedup(
        stream_df,
        index_dir,
        kept_dir,
        checkpoint_dir,
        id_col=id_col,
        text_col=payload_col,
        n_bits=64,
        radius=radius,
        max_bucket_size=max_bucket_size,
        signer=lambda reps: phash_signer(reps, on_error=on_error),
    )


def audio_signer(reps: DataFrame, on_error: str = "raise") -> DataFrame:
    """(doc_id, payload) -> (doc_id, simhash) via the gain-invariant
    spectral fingerprint (see :func:`payload_signer`)."""
    return payload_signer(_audio_payload, on_error)(reps)


def run_incremental_audio_dedup(
    stream_df: DataFrame,
    index_dir: str,
    kept_dir: str,
    checkpoint_dir: str,
    id_col: str = "media_id",
    payload_col: str = "payload",
    radius: int = 5,
    max_bucket_size: int | None = 256,
    on_error: str = "raise",
) -> None:
    """Incremental audio-stream dedup vs the persistent spectral
    index — same transactional machinery, audio signer."""
    run_incremental_near_dedup(
        stream_df,
        index_dir,
        kept_dir,
        checkpoint_dir,
        id_col=id_col,
        text_col=payload_col,
        n_bits=64,
        radius=radius,
        max_bucket_size=max_bucket_size,
        signer=lambda reps: audio_signer(reps, on_error=on_error),
    )
