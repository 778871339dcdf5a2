"""Multimodal columns: image/audio/video as opaque binary + metadata.

North-star extension (SURVEY.md §2.2).  Media payloads are
``binary`` columns with a typed metadata struct; the compute pattern
is ``mapInPandas`` — Arrow-batched, schema-declared, partition-
parallel — which is the only part that matters for the engine.  The
actual codecs (Pillow/ffmpeg/torchaudio) are NOT installed in this
environment, so the decode kernels are STUBBED: ``fake=True`` runs a
deterministic synthetic decode (hash-derived dimensions/features) that
exercises the full Spark plumbing; ``fake=False`` raises
NotImplementedError where the real library call belongs.

Scale notes: payloads never pass through Python row-at-a-time — Arrow
moves each partition's binary column as one buffer; feature extraction
emits fixed-width vectors so downstream similarity search
(operators/similarity.py) composes directly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("source_uri", T.StringType()),
        T.StructField("meta_json", T.StringType()),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, "
    "n_channels int, n_bytes long"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = f"media_id long, feature array<float>"


def synth_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded digest
    bytes) for exercising the pipeline without real codecs."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        rows.append(
            (i, kinds[i % 3], payload, f"synthetic://media/{i}", '{"synthetic": true}')
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, (h[2] % 3) + 1


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary payloads to dimension metadata via mapInPandas.

    Real path (fake=False) is a stub: replace the marked line with
    Pillow / soundfile / pyav decoding.  The Spark side — Arrow batch
    iteration, declared output schema, partition parallelism — is the
    real implementation and is fully tested via the fake path.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media codecs are not installed in this environment; "
                    "wire Pillow/ffmpeg here (fake=True runs the "
                    "deterministic stub decode)"
                )
            dims = [_fake_dims(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_channels": [d[2] for d in dims],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Fixed-width feature vectors from payloads (mapInPandas).

    The fake kernel hashes the payload into FEATURE_DIM floats in
    [-1, 1] — deterministic, so tests can assert exact values; a real
    deployment swaps in an image/audio embedding model here.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "feature-extraction model not installed; fake=True "
                    "runs the deterministic stub"
                )
            feats = []
            for p in pdf["payload"]:
                digest = hashlib.sha512(bytes(p)).digest()
                feats.append(
                    [((b / 255.0) * 2.0 - 1.0) for b in digest[:FEATURE_DIM]]
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(batches, schema=FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Sample frames from video payloads (stub).

    Emits one row per sampled frame — the explode-shaped output a real
    ffmpeg kernel would produce; the fake kernel derives a
    deterministic frame count from the payload.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "ffmpeg not installed; fake=True runs the stub sampler"
                )
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(p)
                n_frames = 1 + hashlib.sha256(payload).digest()[3] % 50
                for idx in range(0, n_frames, every_n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_payload"].append(
                        hashlib.sha256(payload + idx.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "video").mapInPandas(
        batches, schema="media_id long, frame_idx int, frame_payload binary"
    )
