"""Perceptual fingerprints for images and audio + near-dup pairing.

Extends the dedup tier (SURVEY.md §2.2 — dedup families; north-star
brief: multimodal training-data pipeline) from text to media: a
64-bit perceptual hash per image/audio payload, then NEAR-DUPLICATE
PAIRS via the exact-recall Hamming-ball band join already built for
SimHash (:func:`v6spark.operators.dedup.simhash_pairs` is
signature-agnostic — any ``(id, int64)`` frame works).

Scale shape — the part that matters at 100 TB:

- Hashing is embarrassingly parallel ``mapInPandas`` over payload
  bytes: pixels/samples never leave the executor; ONE int64 per
  media row crosses into the join.  A corpus-wide image near-dup
  pass shuffles 8 bytes per image, not megapixels.
- Pairing inherits the pigeonhole band join: ``radius + 1`` bands,
  exact recall within the Hamming radius, popcount verify,
  ``max_bucket_size`` guard against degenerate clusters (solid-color
  images all hash alike — the guard is not optional on real data).

pHash recipe (public, standard): grayscale -> bilinear downscale to
``img_size`` -> 2-D DCT-II -> keep the top-left ``hash_size^2``
low-frequency block -> bit = coefficient > median(block minus DC).
Robust to re-encoding (format/quality), resizing, and small edits —
exactly the duplicates a crawl corpus contains.  dHash (horizontal
gradient sign on a ``9x8`` thumbnail) is the cheaper/weaker
alternative kept for cross-checking.

Audio fingerprint: Haitsma-Kalker-style band-energy contour — FFT
band energies averaged over frames, bit = adjacent-band energy
increase, on a log-spaced 65-band layout.  Invariant to volume
(pure scaling) and robust to mild noise; sensitive to spectral
shape, which is what distinguishes actual content.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (n x n): D @ x applies the transform."""
    k = np.arange(n)
    d = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    d *= np.sqrt(2.0 / n)
    d[0] *= np.sqrt(0.5)
    return d


def _to_gray(img: np.ndarray) -> np.ndarray:
    """HxWxC uint8 -> HxW float64 luma (ITU-R BT.601 weights)."""
    img = img.astype(np.float64)
    if img.ndim == 2:
        return img
    if img.shape[2] == 1:
        return img[:, :, 0]
    if img.shape[2] == 4:  # composite alpha over black
        a = img[:, :, 3:4] / 255.0
        img = img[:, :, :3] * a
    elif img.shape[2] == 2:  # gray + alpha
        return img[:, :, 0] * (img[:, :, 1] / 255.0)
    return img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587 + img[:, :, 2] * 0.114


def _bilinear(gray: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Deterministic bilinear resample HxW -> oh x ow (vectorized)."""
    h, w = gray.shape
    ys = np.clip((np.arange(oh) + 0.5) * h / oh - 0.5, 0, h - 1)
    xs = np.clip((np.arange(ow) + 0.5) * w / ow - 0.5, 0, w - 1)
    y0, x0 = ys.astype(int), xs.astype(int)
    y1, x1 = np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)
    fy, fx = (ys - y0)[:, None], (xs - x0)[None, :]
    g = gray
    return (
        g[y0][:, x0] * (1 - fy) * (1 - fx)
        + g[y0][:, x1] * (1 - fy) * fx
        + g[y1][:, x0] * fy * (1 - fx)
        + g[y1][:, x1] * fy * fx
    )


def _pack_bits(bits: np.ndarray) -> int:
    """<=64 bool bits (MSB first) -> signed int64 (LongType-safe)."""
    v = 0
    for b in bits.ravel():
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= 1 << 63 else v


def phash_bytes(payload: bytes, hash_size: int = 8, img_size: int = 32) -> int:
    """64-bit DCT perceptual hash of one image payload."""
    from v6spark.operators.multimodal import decode_image_array

    _w, _h, _c, img = decode_image_array(payload)
    small = _bilinear(_to_gray(img), img_size, img_size)
    d = _dct_matrix(img_size)
    coefs = (d @ small @ d.T)[:hash_size, :hash_size]
    flat = coefs.ravel()
    med = np.median(flat[1:])  # DC excluded from the threshold
    return _pack_bits(flat > med)


def dhash_bytes(payload: bytes, hash_size: int = 8) -> int:
    """64-bit horizontal-gradient difference hash of one payload."""
    from v6spark.operators.multimodal import decode_image_array

    _w, _h, _c, img = decode_image_array(payload)
    small = _bilinear(_to_gray(img), hash_size, hash_size + 1)
    return _pack_bits(small[:, 1:] > small[:, :-1])


def _hash_udf(df: DataFrame, fn, col_name: str, on_error: str = "raise", **kw) -> DataFrame:
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise/skip, got {on_error!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, vals = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    vals.append(fn(bytes(p), **kw))
                    ids.append(mid)
                except Exception:
                    # poison-row policy: a truncated payload can pass
                    # the header-only gate and still fail pixel decode
                    if on_error == "raise":
                        raise
            yield pd.DataFrame({"media_id": ids, col_name: vals})

    return df.mapInPandas(batches, schema=f"media_id long, {col_name} long")


def image_phash(
    df: DataFrame, hash_size: int = 8, img_size: int = 32,
    on_error: str = "raise",
) -> DataFrame:
    """(media_id, phash): DCT perceptual hash per image payload."""
    return _hash_udf(df.filter(F.col("kind") == "image"), phash_bytes,
                     "phash", on_error=on_error,
                     hash_size=hash_size, img_size=img_size)


def image_dhash(df: DataFrame, hash_size: int = 8, on_error: str = "raise") -> DataFrame:
    """(media_id, dhash): gradient difference hash per image payload."""
    return _hash_udf(df.filter(F.col("kind") == "image"), dhash_bytes,
                     "dhash", on_error=on_error, hash_size=hash_size)


def image_near_dup_pairs(
    df: DataFrame,
    radius: int = 6,
    max_bucket_size: int | None = 10_000,
    on_error: str = "raise",
) -> DataFrame:
    """Image near-duplicate pairs: pHash + exact-recall Hamming band
    join -> (id_a, id_b, hamming <= radius).  Re-encoded / resized /
    lightly edited copies land within a few bits; unrelated images
    sit near the binomial mean of 32."""
    from v6spark.operators.dedup import simhash_pairs

    return simhash_pairs(
        image_phash(df, on_error=on_error), id_col="media_id", sig_col="phash",
        n_bits=64, radius=radius, max_bucket_size=max_bucket_size,
    )


# ------------------------------------------------------------------- audio

def _band_edges(n_bins: int, n_bands: int) -> np.ndarray:
    """Log-spaced band edges over FFT bins 1..n_bins (DC excluded)."""
    edges = np.unique(
        np.round(np.geomspace(1, n_bins - 1, n_bands + 1)).astype(int)
    )
    # geomspace collapses at the low end for small FFTs; pad linearly
    while len(edges) < n_bands + 1:
        missing = n_bands + 1 - len(edges)
        extra = [e for e in range(1, n_bins) if e not in set(edges)][:missing]
        if not extra:  # FFT too small for n_bands distinct edges
            raise ValueError(f"n_fft too small for {n_bands} bands")
        edges = np.unique(np.concatenate([edges, extra]))
    return edges


def audio_fingerprint_samples(
    samples: np.ndarray, n_fft: int = 256, n_bands: int = 64
) -> int:
    """64-bit band-energy fingerprint of a mono sample array:
    bit b = (band b's mean energy) > (mean over all bands).

    The mean-relative threshold (rather than adjacent-band
    differences) keeps sparse spectra stable: for tonal content the
    few hot bands sit far above the mean and the silent bands far
    below, so low-level noise cannot flip bits — adjacent-band
    comparison flips randomly wherever two bands are both near zero.
    Volume-invariance is preserved (pure gain scales every band and
    the mean alike)."""
    x = samples.astype(np.float64).ravel()
    if len(x) == 0:
        return 0
    if len(x) < n_fft:
        # zero-pad a short clip to one full frame: distinct short
        # clips must get DISTINCT fingerprints (a constant sentinel
        # would make every sub-frame clip a mutual "duplicate" and
        # silently delete real content in the dedup pass)
        x = np.concatenate([x, np.zeros(n_fft - len(x))])
    n_frames = len(x) // n_fft
    frames = x[: n_frames * n_fft].reshape(n_frames, n_fft)
    spec = np.abs(np.fft.rfft(frames * np.hanning(n_fft), axis=1)) ** 2
    mean_spec = spec.mean(axis=0)
    edges = _band_edges(len(mean_spec), n_bands)
    energy = np.array([
        mean_spec[a:b].mean() for a, b in zip(edges[:-1], edges[1:])
    ])
    bits = energy > energy.mean()
    return _pack_bits(bits[:64])


def audio_fingerprint(
    df: DataFrame, n_fft: int = 256, on_error: str = "raise"
) -> DataFrame:
    """(media_id, afp): spectral-contour fingerprint per WAV payload.
    Volume-invariant (energy RATIOS relative to the band mean), so a
    re-gained copy of the same recording matches within a few bits."""

    def fp(payload: bytes, n_fft: int) -> int:
        from v6spark.operators.multimodal import _wav_decode

        _r, _n, _c, samples = _wav_decode(payload)
        return audio_fingerprint_samples(
            samples.astype(np.float64).mean(axis=1), n_fft=n_fft)

    return _hash_udf(df.filter(F.col("kind") == "audio"), fp, "afp",
                     on_error=on_error, n_fft=n_fft)


def audio_near_dup_pairs(
    df: DataFrame,
    radius: int = 6,
    max_bucket_size: int | None = 10_000,
    on_error: str = "raise",
) -> DataFrame:
    """Audio near-duplicate pairs over the spectral fingerprint —
    same Hamming band join as images; 8 bytes per clip shuffle."""
    from v6spark.operators.dedup import simhash_pairs

    return simhash_pairs(
        audio_fingerprint(df, on_error=on_error),
        id_col="media_id", sig_col="afp",
        n_bits=64, radius=radius, max_bucket_size=max_bucket_size,
    )


def audio_spectrogram(
    df: DataFrame, n_fft: int = 256, hop: int | None = None
) -> DataFrame:
    """Real STFT magnitude spectrogram per WAV payload (Hann window,
    ``np.fft.rfft``): (media_id, n_frames, n_bins, spectrogram) with
    the float32 frames x bins matrix serialized row-major — the
    training-tensor shape, computed executor-side, payloads never
    shuffled."""
    from v6spark.operators.multimodal import _wav_decode

    hop = hop or n_fft // 2

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        win = np.hanning(n_fft)
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "n_frames": [], "n_bins": [], "spectrogram": [],
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                _r, _n, _c, samples = _wav_decode(bytes(p))
                x = samples.astype(np.float64).mean(axis=1)
                starts = range(0, max(len(x) - n_fft + 1, 0), hop)
                frames = np.stack([x[s : s + n_fft] for s in starts]) \
                    if starts else np.zeros((0, n_fft))
                spec = np.abs(np.fft.rfft(frames * win, axis=1)).astype(np.float32)
                out["media_id"].append(mid)
                out["n_frames"].append(spec.shape[0])
                out["n_bins"].append(spec.shape[1])
                out["spectrogram"].append(spec.tobytes())
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "audio").mapInPandas(
        batches,
        schema="media_id long, n_frames int, n_bins int, spectrogram binary",
    )


# -------------------------------------------------------------- quality gates

def image_quality_features(df: DataFrame, on_error: str = "raise") -> DataFrame:
    """Per-image quality signals — the multimodal analog of the
    Gopher text gates, computed on REAL decoded pixels:

    - ``brightness`` / ``contrast``: luma mean / std (0-255 scale) —
      catches near-black and near-uniform captures,
    - ``sharpness``: variance of the 3x3 Laplacian response on luma —
      the standard blur detector (defocused or heavily upscaled
      images score near zero),
    - ``entropy``: Shannon entropy of the 256-bin luma histogram in
      bits (synthetic flat fills and single-tone images score low;
      natural photos sit near 6-8).

    One ``mapInPandas`` pass, pixels never shuffle; compose with a
    filter to gate a corpus: ``features.filter("sharpness > 20 AND
    entropy > 3")``.
    """
    from v6spark.operators.multimodal import decode_image_array

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "brightness": [], "contrast": [],
                "sharpness": [], "entropy": [],
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    _w, _h, _c, img = decode_image_array(bytes(p))
                except Exception:
                    if on_error == "raise":
                        raise
                    continue  # skip: undecodable pixels score nothing
                g = _to_gray(img)
                # 3x3 Laplacian via shifted sums (no scipy)
                lap = (
                    -4 * g[1:-1, 1:-1]
                    + g[:-2, 1:-1] + g[2:, 1:-1]
                    + g[1:-1, :-2] + g[1:-1, 2:]
                )
                hist = np.bincount(
                    g.astype(np.uint8).ravel(), minlength=256
                ).astype(np.float64)
                pmf = hist[hist > 0] / hist.sum()
                out["media_id"].append(mid)
                out["brightness"].append(round(float(g.mean()), 6))
                out["contrast"].append(round(float(g.std()), 6))
                out["sharpness"].append(
                    round(float(lap.var()) if lap.size else 0.0, 6)
                )
                out["entropy"].append(
                    round(float(-(pmf * np.log2(pmf)).sum()), 6)
                )
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "image").mapInPandas(
        batches,
        schema="media_id long, brightness double, contrast double, "
               "sharpness double, entropy double",
    )


def audio_quality_features(df: DataFrame, on_error: str = "raise") -> DataFrame:
    """Per-clip audio quality signals beyond the basic RMS/ZCR pair
    (:func:`~v6spark.operators.multimodal.audio_features`):

    - ``clip_ratio``: fraction of samples at or beyond 99.9% of
      int16 full scale — recording-chain clipping,
    - ``silence_ratio``: fraction of 20 ms windows whose RMS is
      under 1% of full scale — dead air,
    - ``dynamic_range_db``: 20·log10(p99.9 / max(p50, 1)) of |x| —
      compressed-to-death streams score near zero.
    """
    from v6spark.operators.multimodal import _wav_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "clip_ratio": [], "silence_ratio": [],
                "dynamic_range_db": [],
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, _n, _c, samples = _wav_decode(bytes(p))
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                x = samples.astype(np.float64).mean(axis=1)
                ax = np.abs(x)
                clip = float((ax >= 0.999 * 32767).mean()) if len(x) else 0.0
                win = max(int(rate * 0.02), 1)
                nwin = len(x) // win
                if nwin:
                    frames = x[: nwin * win].reshape(nwin, win)
                    wrms = np.sqrt((frames * frames).mean(axis=1))
                    silence = float((wrms < 0.01 * 32767).mean())
                else:
                    silence = 1.0
                if len(x):
                    hi = np.percentile(ax, 99.9)
                    lo = max(np.percentile(ax, 50.0), 1.0)
                    dr = 20.0 * np.log10(max(hi, 1.0) / lo)
                else:
                    dr = 0.0
                out["media_id"].append(mid)
                out["clip_ratio"].append(round(clip, 6))
                out["silence_ratio"].append(round(silence, 6))
                out["dynamic_range_db"].append(round(float(dr), 6))
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "audio").mapInPandas(
        batches,
        schema="media_id long, clip_ratio double, silence_ratio double, "
               "dynamic_range_db double",
    )
