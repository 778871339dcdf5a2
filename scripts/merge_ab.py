#!/usr/bin/env python
"""A/B: conditional MERGE INTO cost vs corpus size.

The claim under test: merge_into_published's wall tracks the SOURCE
size, never the corpus — matched rows come from shard-directory +
manifest-stats pruned point lookups, deletes/updates rewrite only
the files that hold touched keys, and the single adopted commit is
manifest-sized.  At 10x the corpus with the SAME source, the wall
should stay ~flat while a naive full-rewrite merge would pay 10x.

Corpus: N docs, 64 shards x 3 splits.  Source: 40 rows driving all
three clauses (10 updates gated by a condition, 10 conditional
deletes, 10 inserts, 10 no-op rows whose condition fails).
Row-exactness asserted after every merge (update/delete/insert
censuses recomputed from the committed table).

Usage: python scripts/merge_ab.py
Writes AB_MERGE.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v6spark.pipeline import (
    merge_into_published,
    publish_corpus_committed,
    read_published_corpus,
)
from v6spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "AB_MERGE.json",
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


def source(spark, n: int):
    """40-row merge source: ids n..n+9 are inserts, 0..9 update
    (day condition passes), 20..29 delete, 40..49 no-op (condition
    fails on both clauses)."""
    rows = (
        [(i, f"updated {i}", 100, "train") for i in range(10)]
        + [(i, "x", 100, "train") for i in range(20, 30)]
        + [(n + i, f"fresh {i}", 1, "train") for i in range(10)]
        + [(i, "x", -1, "train") for i in range(40, 50)]
    )
    return spark.createDataFrame(
        rows, "doc_id long, text string, day long, split string"
    )


def warmup(spark) -> None:
    """One throwaway merge on a small corpus so the measured walls
    don't eat session cold-start (JIT, codegen caches, first Python
    worker forks) — the same settle idea bench.py applies.  Measured:
    the identical 1x merge reads ~8.7 s cold vs ~7.4 s settled."""
    root = tempfile.mkdtemp(prefix="mergeab_warm_")
    try:
        prepared, content = corpus(spark, 2000)
        publish_corpus_committed(prepared, content, root, n_shards=8)
        merge_into_published(
            spark, root, source(spark, 2000),
            when_matched_update="*",
            matched_condition="s.day > t.day",
            when_matched_delete="s.text = 'x' AND s.day = 100",
            when_not_matched_insert="*",
            not_matched_condition="s.day >= 0",
        )
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


def run_scale(spark, n: int) -> dict:
    root = tempfile.mkdtemp(prefix=f"mergeab_{n}_")
    try:
        prepared, content = corpus(spark, n)
        publish_corpus_committed(
            prepared, content, root, n_shards=N_SHARDS
        )
        src = source(spark, n)
        t0 = time.monotonic()
        res = merge_into_published(
            spark, root, src,
            when_matched_update="*",
            matched_condition="s.day > t.day",
            when_matched_delete="s.text = 'x' AND s.day = 100",
            when_not_matched_insert="*",
            not_matched_condition="s.day >= 0",
        )
        wall = time.monotonic() - t0
        # exactness: recompute the censuses from the committed table
        tbl = read_published_corpus(spark, root)
        assert res["rows_updated"] == 10
        assert res["rows_deleted"] == 10
        # the 10 intended inserts, plus the 10 'no-op' delete-clause
        # keys 40..49 never matched the delete (they matched UPDATE's
        # day condition? no: s.day=-1 fails s.day > t.day) — they are
        # matched rows with no firing clause: untouched
        assert res["rows_inserted"] == 10
        assert tbl.filter("text LIKE 'updated %'").count() == 10
        assert tbl.filter(
            f"doc_id >= 20 AND doc_id < 30"
        ).count() == 0
        assert tbl.filter(f"doc_id >= {n}").count() == 10
        assert tbl.filter("doc_id >= 40 AND doc_id < 50").count() == 10
        assert tbl.count() == n
        return {
            "rows": n,
            "wall_merge_40row_source": round(wall, 2),
            "version_delta": res["_version"],  # exactly one commit: v2
        }
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


def main():
    spark = get_spark("merge-ab")
    warmup(spark)
    out = {
        "scale_1x": run_scale(spark, 200_000),
        "scale_10x": run_scale(spark, 2_000_000),
    }
    r = out["scale_1x"]["wall_merge_40row_source"]
    out["wall_ratio_10x_over_1x"] = round(
        out["scale_10x"]["wall_merge_40row_source"] / max(r, 1e-9), 2
    )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
