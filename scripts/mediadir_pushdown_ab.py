"""Measured benefit of the mediadir kind-pushdown: reading only the
images out of a directory dominated by video bytes.

A: `spark.read.format("mediadir").load(dir)` then `.filter(kind)`
   WITHOUT pushdown (filters suppressed by reading through a
   no-pushdown registration) — every video payload is read and
   serialized before the filter drops it.
B: the same query WITH pushFilters active — executors sniff 1 KB
   per file and skip video payload reads entirely.

Writes AB_MEDIADIR.json.  Protocol: min of 3 per side.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from v6spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "AB_MEDIADIR.json")


def build_corpus(root: str, n_images: int = 200, n_videos: int = 1500) -> dict:
    from v6spark.operators import multimodal as mm
    from v6spark.operators.avi import make_avi

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(5)
    img_bytes = vid_bytes = 0
    for i in range(n_images):
        small = rng.integers(0, 255, (6, 8, 3)).astype(np.uint8)
        payload = mm.encode_png(np.kron(small, np.ones((8, 8, 1), dtype=np.uint8)))
        open(os.path.join(root, f"img_{i:04d}.png"), "wb").write(payload)
        img_bytes += len(payload)
    # a handful of distinct encodes, replicated by byte copy: what
    # the A/B measures is payload READ bytes skipped, so file content
    # diversity is irrelevant and encode time stays trivial
    y, x = np.mgrid[0:240, 0:320]
    masters = []
    for i in range(4):
        frames = [
            np.stack([
                127 + 120 * np.sin(x / (7 + i) + f),
                127 + 120 * np.cos(y / (9 + i) + f),
                np.clip(x + y + 8 * f, 0, 255),
            ], axis=2).astype(np.uint8)
            for f in range(8)
        ]
        masters.append(make_avi(frames, quality=90))
    for i in range(n_videos):
        payload = masters[i % len(masters)]
        open(os.path.join(root, f"vid_{i:04d}.avi"), "wb").write(payload)
        vid_bytes += len(payload)
    return {"n_images": n_images, "n_videos": n_videos,
            "image_mb": round(img_bytes / 1e6, 1), "video_mb": round(vid_bytes / 1e6, 1)}


def main() -> None:
    import tempfile

    from v6spark.sources.media_datasource import MediaDirDataSource, MediaDirReader

    spark = get_spark("mediadir-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    root = tempfile.mkdtemp(prefix="mediadir_ab_")
    census = build_corpus(root)

    class NoPushReader(MediaDirReader):
        def pushFilters(self, filters):  # decline everything
            yield from filters

    class NoPushSource(MediaDirDataSource):
        @classmethod
        def name(cls) -> str:
            return "mediadir_nopush"

        def reader(self, schema):
            return NoPushReader(self.options)

    spark.dataSource.register(MediaDirDataSource)
    spark.dataSource.register(NoPushSource)

    def bench(fmt: str, push: bool) -> float:
        best = None
        for _ in range(3):
            t0 = time.time()
            n = (
                spark.read.format(fmt)
                .option("pushdown", "true" if push else "false")
                .load(root)
                .filter("kind = 'image'")
                .selectExpr("sum(length(payload))")
                .collect()[0][0]
            )
            wall = time.time() - t0
            best = wall if best is None else min(best, wall)
        assert n is not None
        return best

    no_push = bench("mediadir", False)
    push = bench("mediadir", True)
    doc = {
        "corpus": census,
        "no_pushdown_sec_min_of_3": round(no_push, 2),
        "pushdown_sec_min_of_3": round(push, 2),
        "speedup": round(no_push / push, 2),
        "mechanism": "kind pushdown sniffs 1KB per file and skips video payload reads",
        "caveat": "page-cached local fs: skipped reads are cheap here; "
                  "on object storage the skipped GETs dominate, this is the floor",
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
