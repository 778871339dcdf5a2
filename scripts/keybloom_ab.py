#!/usr/bin/env python
"""A/B: point lookups with vs without the per-file key Bloom index
(publish_corpus_committed(key_bloom=True) + read_published_keys).

The hash-sharded layout gives every file a near-full key RANGE, so
after shard-directory pruning the manifest's [min,max] key stats
cannot refute a point key — the stats-only path opens every file of
the touched shards.  The Bloom sidecars (KB parquet per split inside
the version dir) answer "definitely absent" per file driver-side.

Measured per scale: files opened + wall for a 3-key lookup and for a
3-absent-key lookup (the takedown-check / cache-miss shape), under
both publishes; and the publish wall with/without the index build
(the honest cost line).  Results must be identical rows.

Usage: python scripts/keybloom_ab.py
Writes AB_KEYBLOOM.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v6spark.pipeline import publish_corpus_committed, read_published_keys
from v6spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "AB_KEYBLOOM.json",
)

N_SHARDS = 64


def corpus(spark, n: int):
    prepared = spark.range(n).select(
        (F.col("id") * 2).alias("doc_id"),
        F.when(F.col("id") % 20 == 0, "valid")
        .when(F.col("id") % 20 == 1, "test")
        .otherwise("train")
        .alias("split"),
    )
    content = spark.range(n).select(
        (F.col("id") * 2).alias("doc_id"),
        F.concat(
            F.lit("document body "), F.col("id"), F.lit(" "),
            F.repeat(F.lit("x"), 200),
        ).alias("text"),
    )
    return prepared, content


def timed(fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return round(statistics.median(walls), 3)


def lookup(spark, root, keys):
    seen = {}
    rows = read_published_keys(
        spark, root, keys,
        _scan_observer=lambda s, fl: seen.setdefault(s, fl),
    ).collect()
    return rows, sum(len(fl) for fl in seen.values())


def run_scale(spark, n: int) -> dict:
    tmp = tempfile.mkdtemp(prefix="keybloom_ab_")
    # plain publishes FIRST: session warmup (JVM committer init, Python
    # worker spin-up) must not be billed to the bloom build
    roots = {b: os.path.join(tmp, f"c_{b}") for b in ("plain", "bloom")}
    try:
        walls_publish = {}
        for label, root in roots.items():
            prepared, content = corpus(spark, n)
            t0 = time.monotonic()
            publish_corpus_committed(
                prepared, content, root, n_shards=N_SHARDS,
                key_bloom=(label == "bloom"),
            )
            walls_publish[label] = round(time.monotonic() - t0, 3)

        present = [2 * (n // 7), 2 * (n // 3), 2 * (5 * n // 6)]
        absent = [k + 1 for k in present]  # odd: never published

        out = {"rows": n, "publish_wall_s": walls_publish, "lookups": {}}
        for name, keys in (("present_3", present), ("absent_3", absent)):
            res = {}
            for label, root in roots.items():
                rows, opened = lookup(spark, root, keys)
                res[label] = {
                    "files_opened": opened,
                    "rows": len(rows),
                    "wall_s": timed(
                        lambda r=root, k=keys: read_published_keys(
                            spark, r, k
                        ).collect()
                    ),
                }
            assert res["bloom"]["rows"] == res["plain"]["rows"]
            out["lookups"][name] = res
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    spark = get_spark("keybloom-ab", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "8")))
    out = {
        "scales": [run_scale(spark, 100_000), run_scale(spark, 1_000_000)],
        "note": (
            "hash-sharded publishes give every file a near-full key "
            "range, so stats-only point lookups open every file of the "
            "touched shards; the Bloom sidecars (built once at publish, "
            "probed driver-side from KB parquet tables) answer "
            "definitely-absent per file.  At 100 TB the files_opened "
            "delta IS the read cost; absent-key lookups (takedown "
            "checks, cache misses) drop to zero data files.  The "
            "publish_wall delta is the index build: one union scan of "
            "the fresh files' KEY COLUMN + one mapInPandas + one KB "
            "write (~1.3 s/100k keys of kernel, parallel) — at toy "
            "scale the fixed job overhead dominates the ratio; at real "
            "scale the build reads one narrow column of a corpus whose "
            "publish wrote every column."
        ),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
