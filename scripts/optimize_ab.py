#!/usr/bin/env python
"""A/B: incremental OPTIMIZE vs full compact on a fragmented corpus.

The claim under test: after small appends fragment a handful of
(split, shard) groups, optimize_published folds ONLY those groups —
its wall tracks the fragmented bytes, while compact_published
rewrites the whole corpus and tracks corpus size.  At 10x the corpus
with the SAME appends, the incremental wall should stay ~flat and
the full-compact wall should grow ~10x.

Corpus: N docs, 64 shards x 3 splits, then 3 small appends (36 rows
each) through the SQL writer.  Both verbs run from the same
fragmented version (the compact run re-creates the corpus).
Row-exactness asserted after each fold.

Usage: python scripts/optimize_ab.py
Writes AB_OPTIMIZE.json.
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
    compact_published,
    optimize_published,
    publish_corpus_committed,
    read_published_corpus,
)
from v6spark.session import get_spark
from v6spark.sources.pubcorpus import register_pubcorpus_source

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "AB_OPTIMIZE.json",
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
        (F.col("id") % 7).cast("long").alias("day"),
    )
    return prepared, content


def fragmented(spark, n: int) -> str:
    root = tempfile.mkdtemp(prefix=f"optab_{n}_")
    prepared, content = corpus(spark, n)
    publish_corpus_committed(prepared, content, root, n_shards=N_SHARDS)
    register_pubcorpus_source(spark)
    for i in range(3):
        lo = n + i * 36
        spark.range(lo, lo + 36).selectExpr(
            "id as doc_id",
            "concat('appended ', id) as text",
            "cast(id % 7 as long) as day",
            "'train' as split",
        ).write.format("pubcorpus").mode("append").save(root)
    return root


def run_scale(spark, n: int) -> dict:
    out = {"rows": n}
    root = fragmented(spark, n)
    try:
        expect = read_published_corpus(spark, root).count()
        t0 = time.monotonic()
        # small-files-only bin packing (the Delta minFileSize shape):
        # the 36-row append files fold, the packed publish files are
        # never rewritten — the wall must track appended bytes alone
        res = optimize_published(spark, root, max_file_rows=1000)
        out["wall_optimize_small_only"] = round(time.monotonic() - t0, 2)
        out["small_groups_rewritten"] = res["groups_rewritten"]
        out["small_files_folded"] = res["files_folded"]
        assert read_published_corpus(spark, root).count() == expect
        t0 = time.monotonic()
        # full-group fold (restores exact training order per shard)
        res = optimize_published(spark, root)
        out["wall_optimize_full_groups"] = round(time.monotonic() - t0, 2)
        out["groups_rewritten"] = res["groups_rewritten"]
        out["files_folded"] = res["files_folded"]
        out["files_kept"] = res["files_kept"]
        assert read_published_corpus(spark, root).count() == expect
    finally:
        shutil.rmtree(root, ignore_errors=True)
    root = fragmented(spark, n)
    try:
        expect = read_published_corpus(spark, root).count()
        t0 = time.monotonic()
        compact_published(spark, root)
        out["wall_full_compact"] = round(time.monotonic() - t0, 2)
        assert read_published_corpus(spark, root).count() == expect
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main():
    spark = get_spark("optimize-ab")
    out = {
        "scale_1x": run_scale(spark, 200_000),
        "scale_10x": run_scale(spark, 2_000_000),
    }
    out["small_only_wall_ratio_10x"] = round(
        out["scale_10x"]["wall_optimize_small_only"]
        / max(out["scale_1x"]["wall_optimize_small_only"], 1e-9), 2,
    )
    out["full_groups_wall_ratio_10x"] = round(
        out["scale_10x"]["wall_optimize_full_groups"]
        / max(out["scale_1x"]["wall_optimize_full_groups"], 1e-9), 2,
    )
    out["full_compact_wall_ratio_10x"] = round(
        out["scale_10x"]["wall_full_compact"]
        / max(out["scale_1x"]["wall_full_compact"], 1e-9), 2,
    )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
