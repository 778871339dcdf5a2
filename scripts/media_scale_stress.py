"""Media-pipeline scale stress: prepare_media_corpus wall-clock at
1x vs 4x synthetic media, with the dedup census.

Synthesizes a mixed corpus (images with planted near-dup clusters —
PNG/JPEG re-encodes of shared base patterns — plus audio tones with
re-gained copies and exact-dup MJPEG AVI videos), runs the full
pipeline (header gates -> perceptual dedup -> split/shard), and
records wall seconds + survivor census per scale.  Sub-linear-in-
wall growth is not expected (decode is CPU-bound and embarrassingly
parallel); the claim under test is LINEAR scaling — no quadratic
join and no driver bottleneck as the corpus grows — and a stable
dedup verdict (planted duplicate fraction recovered at both scales).

Writes STRESS_MEDIA.json.  Protocol: min of 3 runs per scale (single
-shot numbers on a shared box swing +-2x).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from v6spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "STRESS_MEDIA.json")


def synth_corpus(spark, n_clusters: int, seed: int = 7):
    """~4 rows per cluster: base PNG + JPEG re-encode (near-dup) +
    distinct singleton image + audio tone pair every 4th cluster +
    AVI exact-dup pair every 8th."""
    from v6spark.operators import multimodal as mm
    from v6spark.operators.avi import make_avi
    from v6spark.operators.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    rows = []
    nid = 0

    def nxt():
        nonlocal nid
        nid += 1
        return nid

    def block_img():
        # random 6x8 block field upsampled 8x: genuinely distinct
        # low-frequency structure per draw (measured: intra-cluster
        # pHash distance 0 across PNG/JPEG-q95, inter-cluster >= 12)
        small = rng.integers(0, 255, (6, 8, 3)).astype(np.uint8)
        return np.kron(small, np.ones((8, 8, 1), dtype=np.uint8))

    for c in range(n_clusters):
        img = block_img()
        rows.append((nxt(), "image", mm.encode_png(img), f"s://{c}/base", "{}"))
        rows.append((nxt(), "image", encode_jpeg(img, quality=95), f"s://{c}/re", "{}"))
        rows.append((nxt(), "image", mm.encode_png(block_img()), f"s://{c}/solo", "{}"))
        if c % 4 == 0:
            # spectrally-shaped noise, random per cluster — the audio
            # analog of the random block image: distinct tones can
            # legitimately share log bands (indistinguishable to a
            # band-occupancy fingerprint), random spectra cannot
            # (measured: intra <= 1 bit incl. re-gain+int16, inter >= 16)
            w = rng.normal(0, 1, 4000)
            spec = np.fft.rfft(w) * rng.choice([0.02, 1.0], size=2001)
            tone = np.fft.irfft(spec, 4000)
            tone *= 9000 / np.abs(tone).max()
            import io
            import wave

            def wav(sig):
                bb = io.BytesIO()
                with wave.open(bb, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(np.clip(sig, -32768, 32767).astype("<i2").tobytes())
                return bb.getvalue()

            rows.append((nxt(), "audio", wav(tone), f"s://{c}/tone", "{}"))
            rows.append((nxt(), "audio", wav(0.5 * tone), f"s://{c}/regain", "{}"))
        if c % 8 == 0:
            vf = np.full((16, 16, 3), 60, dtype=np.uint8)
            for bit in range(11):  # full-contrast cluster id stripes:
                # a 1-LSB pixel marker would quantize away in JPEG
                vf[:8, bit] = 255 if (c >> bit) & 1 else 0
            vid = make_avi([vf] * 2)
            rows.append((nxt(), "video", vid, f"s://{c}/v1", "{}"))
            rows.append((nxt(), "video", vid, f"s://{c}/v2", "{}"))
    from v6spark.operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA), len(rows)


def run_scale(spark, n_clusters: int, reps: int = 3) -> dict:
    from v6spark.pipeline import prepare_media_corpus

    media, n_rows = synth_corpus(spark, n_clusters)
    expected = (
        2 * n_clusters                                    # base + solo images
        + sum(1 for c in range(n_clusters) if c % 4 == 0)  # audio keepers
        + sum(1 for c in range(n_clusters) if c % 8 == 0)  # video keepers
    )
    media = media.repartition(32).persist()
    media.count()  # materialize input out of the timed region
    best = None
    for _ in range(reps):
        t0 = time.time()
        out = prepare_media_corpus(media, phash_radius=4, n_shards=32)
        survivors = out.count()
        dups = out.agg({"dup_count": "sum"}).collect()[0][0]
        wall = time.time() - t0
        best = wall if best is None else min(best, wall)
    media.unpersist()
    return {
        "clusters": n_clusters, "media_rows": n_rows,
        "survivors": survivors, "expected_survivors": expected,
        "census_exact": survivors == expected,
        "rows_in_dup_clusters": int(dups),
        "wall_sec_min_of_%d" % reps: round(best, 2),
    }


def main() -> None:
    spark = get_spark("media-stress", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    r1 = run_scale(spark, 400)
    r4 = run_scale(spark, 1600)
    ratio = r4["wall_sec_min_of_3"] / r1["wall_sec_min_of_3"]
    doc = {
        "protocol": "min-of-3 per scale; input materialized before timing",
        "scale_1x": r1,
        "scale_4x": r4,
        "wall_ratio_4x_over_1x": round(ratio, 2),
        "linear_bar": "<= 6.0 (4x data + constant overheads)",
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
