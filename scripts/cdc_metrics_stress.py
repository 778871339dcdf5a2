#!/usr/bin/env python
"""Stress: incremental metric maintenance cost vs corpus scale.

The claim: maintaining per-split metric totals from the change feed
costs proportional to the DML delta (files the DML touched), while
the recompute a system without incremental maintenance pays scans the
whole corpus.  Protocol, at 1x and 10x corpus scale:

  publish -> initial metrics (one full fold, both approaches pay it)
  -> R rounds of {3-doc upsert + 2-doc retract + incremental update}
  measured against R full recomputes over the same states, plus the
  files-read census (the structural proof: local walls at these toy
  sizes are overhead-bound, the file counts are what scale).

The incremental update is measured by invoking the maintenance
function directly on the unseen publog window (exactly what each
micro-batch executes), so the number is the maintenance operation —
manifest listing + change-frame read + fold + OCC commit — without
the fixed Structured Streaming engine startup (~seconds per
availableNow run locally, amortized to noise in a long-running
stream).

Exactness asserted every round: incremental totals == full recompute
totals (exact — the metrics are counts and length sums).

Usage: python scripts/cdc_metrics_stress.py
Writes STRESS_CDCAGG.json.
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
    read_published_corpus,
    retract_from_published,
    upsert_into_published,
)
from v6spark.session import get_spark
from v6spark.streaming.cdcagg import (
    metrics_foreach_batch,
    read_corpus_metrics,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "STRESS_CDCAGG.json",
)

METRICS = {"docs": "1", "chars": "length(text)"}
ROUNDS = 5


def recompute(spark, root):
    df = read_published_corpus(spark, root)
    return {
        r["split"]: {"docs": float(r["docs"]), "chars": float(r["chars"])}
        for r in df.groupBy("split").agg(
            F.count(F.lit(1)).cast("double").alias("docs"),
            F.sum(F.length("text")).cast("double").alias("chars"),
        ).collect()
    }


def run_scale(spark, n: int) -> dict:
    root = tempfile.mkdtemp(prefix="cdcagg_corpus_")
    agg = tempfile.mkdtemp(prefix="cdcagg_state_")
    ckpt = tempfile.mkdtemp(prefix="cdcagg_ckpt_")
    try:
        prepared = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 20 == 0, "valid")
            .otherwise("train").alias("split"),
        )
        content = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("document body "), F.col("id"), F.lit(" "),
                F.repeat(F.lit("x"), 120),
            ).alias("text"),
        )
        publish_corpus_committed(prepared, content, root, n_shards=64)

        from v6spark import txlog
        from v6spark.pipeline import _COMMITS, _published_split_files
        from v6spark.sources.publog import register_publog_source

        register_publog_source(spark)
        fn = metrics_foreach_batch(root, agg, METRICS)
        last_seen = 0

        def run_incremental(batch_id):
            # exactly what one micro-batch executes: the unseen publog
            # window through the maintenance function
            nonlocal last_seen
            batch = (
                spark.read.format("publog").load(root)
                .filter(f"version > {last_seen}")
            )
            fn(batch, batch_id)
            last_seen = max(
                r["version"] for r in batch.select("version").collect()
            )

        t0 = time.time()
        run_incremental(0)  # initial snapshot fold (full scan, once)
        wall_initial = time.time() - t0
        assert read_corpus_metrics(spark, agg) == recompute(spark, root)

        wall_incr = 0.0
        wall_reco = 0.0
        files_incr = 0
        total_files = sum(
            len(fl) for fl in _published_split_files(
                spark, root,
                txlog.read_latest(spark, f"{root}/{_COMMITS}")[1],
            ).values()
        )
        for r in range(ROUNDS):
            base = 100 + r * 10
            upsert_into_published(
                spark, root,
                spark.createDataFrame(
                    [(base, f"revised body {base} round {r}", None),
                     (base + 1, f"revised body {base+1} round {r}", None),
                     (n + r + 1, f"inserted in round {r}", "train")],
                    "doc_id long, text string, split string",
                ),
            )
            retract_from_published(
                spark, root, f"doc_id in ({base + 5}, {base + 6})"
            )
            d_old = txlog.read_version(
                spark, f"{root}/{_COMMITS}", last_seen
            )
            d_new = txlog.read_latest(spark, f"{root}/{_COMMITS}")[1]
            f_old = _published_split_files(spark, root, d_old)
            f_new = _published_split_files(spark, root, d_new)
            files_incr += sum(
                len(set(f_old.get(s, [])) ^ set(f_new.get(s, [])))
                for s in set(f_old) | set(f_new)
            )
            t0 = time.time()
            run_incremental(r + 1)
            wall_incr += time.time() - t0
            t0 = time.time()
            full = recompute(spark, root)
            wall_reco += time.time() - t0
            assert read_corpus_metrics(spark, agg) == full, (
                f"round {r}: incremental != recompute"
            )
        return {
            "rows": n,
            "rounds": ROUNDS,
            "total_parquet_files": total_files,
            "files_read_incremental_total": files_incr,
            "files_read_recompute_total": total_files * ROUNDS,
            "wall_initial_fold_s": round(wall_initial, 2),
            "wall_incremental_total_s": round(wall_incr, 2),
            "wall_recompute_total_s": round(wall_reco, 2),
            "incremental_speedup": round(wall_reco / wall_incr, 2),
        }
    finally:
        for d in (root, agg, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    spark = get_spark("cdcagg-stress")
    out = {
        "scale_1x": run_scale(spark, 2_000_000),
        "scale_10x": run_scale(spark, 20_000_000),
    }
    s1, s10 = out["scale_1x"], out["scale_10x"]
    out["incremental_wall_ratio_10x_over_1x"] = round(
        s10["wall_incremental_total_s"] / s1["wall_incremental_total_s"], 2
    )
    out["recompute_wall_ratio_10x_over_1x"] = round(
        s10["wall_recompute_total_s"] / s1["wall_recompute_total_s"], 2
    )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
