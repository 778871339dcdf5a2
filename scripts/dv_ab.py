#!/usr/bin/env python
"""A/B: copy-on-write retraction vs deletion-vector (merge-on-read).

The claim under test: a small DELETE's write cost under
``strategy="dv"`` is the position sidecar (KBs), independent of the
affected files' size — while copy-on-write pays a full re-encode of
every affected file.  The price is a broadcast anti-join on the dirty
files at read time, which compaction later removes.  Both strategies
must produce IDENTICAL surviving rows.

Corpus: N docs, 64 shards x 3 splits, ~200-char bodies; the delete
touches 3 documents (3 distinct files at this layout).  Measured per
scale: retract wall + bytes written for each strategy, full-read wall
before / after (MOR overhead), and the post-compaction read wall.

Usage: python scripts/dv_ab.py
Writes AB_DV.json.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v6spark.pipeline import (
    compact_published,
    publish_corpus_committed,
    read_published_corpus,
    retract_from_published,
)
from v6spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "AB_DV.json"
)

N_SHARDS = 64


def corpus(spark, n: int):
    prepared = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 20 == 0, "valid")
        .when(F.col("id") % 20 == 1, "test")
        .otherwise("train")
        .alias("split"),
    )
    content = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id"), F.lit(" "),
                 F.repeat(F.lit("x"), 200)).alias("text"),
    )
    return prepared, content


def _dir_bytes(pattern: str) -> int:
    return sum(
        os.path.getsize(f)
        for f in glob.glob(pattern, recursive=True)
        if os.path.isfile(f)
    )


def _read_wall(spark, root) -> float:
    t0 = time.time()
    n = read_published_corpus(spark, root).count()
    return time.time() - t0, n


def run(spark, n: int) -> dict:
    targets = [n // 3, n // 2, n - 5]
    pred = f"doc_id in ({','.join(map(str, targets))})"
    walls = {}

    # --- copy-on-write arm ---
    prepared, content = corpus(spark, n)
    root = tempfile.mkdtemp(prefix="dv_ab_cow_") + "/corpus"
    publish_corpus_committed(prepared, content, root, n_shards=N_SHARDS)
    t0 = time.time()
    res_cow = retract_from_published(spark, root, pred)
    walls["cow_retract"] = time.time() - t0
    bytes_cow = _dir_bytes(f"{root}/v=000002*/**/*")
    walls["cow_read"], n_cow = _read_wall(spark, root)
    assert res_cow["rows_removed"] == 3 and n_cow == n - 3
    shutil.rmtree(os.path.dirname(root))

    # --- deletion-vector arm ---
    prepared, content = corpus(spark, n)
    root = tempfile.mkdtemp(prefix="dv_ab_dv_") + "/corpus"
    publish_corpus_committed(prepared, content, root, n_shards=N_SHARDS)
    walls["clean_read"], _ = _read_wall(spark, root)
    t0 = time.time()
    res_dv = retract_from_published(spark, root, pred, strategy="dv")
    walls["dv_retract"] = time.time() - t0
    bytes_dv = _dir_bytes(f"{root}/v=000002*/**/*")
    walls["dv_read"], n_dv = _read_wall(spark, root)
    assert res_dv["rows_removed"] == 3 and res_dv["files_rewritten"] == 0
    assert n_dv == n - 3

    t0 = time.time()
    compact_published(spark, root)
    walls["compact"] = time.time() - t0
    walls["post_compact_read"], n_c = _read_wall(spark, root)
    assert n_c == n - 3
    shutil.rmtree(os.path.dirname(root))

    return {
        "rows": n,
        "bytes_written_cow": bytes_cow,
        "bytes_written_dv": bytes_dv,
        "dv_write_reduction": round(bytes_cow / max(bytes_dv, 1), 1),
        "wall_cow_retract": round(walls["cow_retract"], 2),
        "wall_dv_retract": round(walls["dv_retract"], 2),
        "wall_read_clean": round(walls["clean_read"], 2),
        "wall_read_mor": round(walls["dv_read"], 2),
        "mor_read_overhead": round(
            walls["dv_read"] / max(walls["clean_read"], 1e-9), 2
        ),
        "wall_compact": round(walls["compact"], 2),
        "wall_read_post_compact": round(walls["post_compact_read"], 2),
        "cow_files_rewritten": res_cow["files_rewritten"],
    }


def main() -> None:
    spark = get_spark("dv-ab")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for label, n in [("scale_1x", 200_000), ("scale_10x", 2_000_000)]:
        out[label] = run(spark, n)
    out["protocol"] = (
        f"local[32], {N_SHARDS} shards x 3 splits, 3-doc DELETE; "
        "identical surviving row counts asserted in both arms; "
        "bytes = new-version dir contents (sidecar only for dv)"
    )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
