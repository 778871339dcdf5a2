#!/usr/bin/env python
"""A/B: manifest-diffed change feed + stats-pruned point lookups vs
full-corpus alternatives.

Claims under test, at two corpus scales (the scaling is the proof):

1. `published_corpus_changes` reads only files present in exactly one
   of the two manifests, so extracting the row-level changes of a
   3-doc upsert + 3-doc retract costs ~the same wall at 10x the
   corpus, while the full-read diff (`published_corpus_diff`, which
   scans both complete versions) grows with the corpus.
2. `read_published_keys` opens only shard-pruned + key-stats-pruned
   files — a 3-key lookup touches <= 6 of the file population at any
   scale, vs a full-corpus filter that scans everything.

Change-row exactness is asserted against the known delta at both
scales.

Usage: python scripts/cdc_ab.py
Writes AB_CDC.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v6spark.pipeline import (
    publish_corpus_committed,
    published_corpus_changes,
    published_corpus_diff,
    read_published_corpus,
    read_published_keys,
    retract_from_published,
    upsert_into_published,
)
from v6spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "AB_CDC.json"
)

N_SHARDS = 64


def corpus(spark, n: int):
    prepared = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 20 == 0, "valid")
        .otherwise("train")
        .alias("split"),
    )
    content = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document body "), F.col("id"), F.lit(" "),
            F.repeat(F.lit("x"), 200),
        ).alias("text"),
    )
    return prepared, content


def run_scale(spark, n: int) -> dict:
    root = tempfile.mkdtemp(prefix="cdc_ab_")
    try:
        prepared, content = corpus(spark, n)
        publish_corpus_committed(
            prepared, content, root, n_shards=N_SHARDS
        )  # v1
        upd = spark.createDataFrame(
            [(5, "revised five", None), (6, "revised six", None),
             (7, "revised seven", None), (n + 1, "brand new", "train")],
            "doc_id long, text string, split string",
        )
        upsert_into_published(spark, root, upd)                       # v2
        retract_from_published(
            spark, root, "doc_id in (11, 12, 13)"
        )                                                              # v3

        # structural census: the change feed reads only files present
        # in exactly one of the two manifests; the full diff reads both
        # versions wholesale
        from v6spark import txlog
        from v6spark.pipeline import _COMMITS, _published_split_files

        d1 = txlog.read_version(spark, f"{root}/{_COMMITS}", 1)
        d3 = txlog.read_version(spark, f"{root}/{_COMMITS}", 3)
        f1 = _published_split_files(spark, root, d1)
        f3 = _published_split_files(spark, root, d3)
        files_read_change_feed = sum(
            len(set(f1.get(s, [])) ^ set(f3.get(s, [])))
            for s in set(f1) | set(f3)
        )
        files_read_full_diff = sum(
            len(fl) for fl in f1.values()
        ) + sum(len(fl) for fl in f3.values())

        t0 = time.time()
        ch = published_corpus_changes(spark, root, 1, 3)
        by_type = {
            r["_change_type"]: r["n"]
            for r in ch.groupBy("_change_type").count()
            .withColumnRenamed("count", "n").collect()
        }
        wall_changes = time.time() - t0
        assert by_type == {
            "delete": 3, "insert": 1,
            "update_preimage": 3, "update_postimage": 3,
        }, by_type

        t0 = time.time()
        diff = published_corpus_diff(spark, root, 1, 3)
        diff.groupBy("status").count().collect()
        wall_full_diff = time.time() - t0

        total_files = sum(
            1
            for _base, _dirs, files in os.walk(root)
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )

        scanned: list = []
        t0 = time.time()
        hit = read_published_keys(
            spark, root, [5, 42, n - 1],
            _scan_observer=lambda s, fl: scanned.append(len(fl)),
        )
        n_hit = hit.count()
        wall_lookup = time.time() - t0
        assert n_hit == 3, n_hit
        files_opened = sum(scanned)

        t0 = time.time()
        full = read_published_corpus(spark, root)
        assert full.filter(F.col("doc_id").isin([5, 42, n - 1])).count() == 3
        wall_full_filter = time.time() - t0

        return {
            "rows": n,
            "total_parquet_files": total_files,
            "files_read_change_feed": files_read_change_feed,
            "files_read_full_diff": files_read_full_diff,
            "wall_change_feed_s": round(wall_changes, 2),
            "wall_full_diff_s": round(wall_full_diff, 2),
            "change_feed_speedup": round(wall_full_diff / wall_changes, 2),
            "lookup_files_opened": files_opened,
            "wall_point_lookup_s": round(wall_lookup, 2),
            "wall_full_filter_s": round(wall_full_filter, 2),
            "lookup_speedup": round(wall_full_filter / wall_lookup, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark("cdc-ab")
    out = {
        "scale_1x": run_scale(spark, 200_000),
        "scale_10x": run_scale(spark, 2_000_000),
    }
    s1, s10 = out["scale_1x"], out["scale_10x"]
    out["change_feed_wall_ratio_10x_over_1x"] = round(
        s10["wall_change_feed_s"] / s1["wall_change_feed_s"], 2
    )
    out["full_diff_wall_ratio_10x_over_1x"] = round(
        s10["wall_full_diff_s"] / s1["wall_full_diff_s"], 2
    )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
