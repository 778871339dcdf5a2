#!/usr/bin/env python
"""A/B: manifest-level data skipping (read_published_where) vs a full
scan + filter, on the workload where skipping actually pays —
INCREMENTAL INGESTION.  A corpus is published once (days 0..D0), then
grown by a series of upserts each carrying one later day; because
every upsert's files span only that day's range, the manifest's
per-column min/max stats make a recent-window read
(``day >= <last>``) open only the newest files, while the baseline
reads the whole corpus to answer the same question.

Both paths must return IDENTICAL rows.  Measured per scale: files
opened vs total live files, bytes in the opened files vs total bytes,
and wall clock for each path (medians of 3).  At 100 TB the file
ratio IS the read ratio: the pruning decision costs one manifest read
(KBs), zero parquet footers.

Also reported: the same selective predicate on the FIRST version
(hash-sharded, day uncorrelated with files) — honest evidence that
skipping needs layout/ingestion correlation; it prunes ~nothing
there, and correctness is unaffected.

Usage: python scripts/prune_ab.py
Writes AB_PRUNE.json.
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

from v6spark.pipeline import (
    compact_published,
    publish_corpus_committed,
    read_published_corpus,
    read_published_where,
    upsert_into_published,
)
from v6spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "AB_PRUNE.json",
)

N_SHARDS = 32
BASE_DAYS = 8
N_UPSERTS = 6


def base_corpus(spark, n: int):
    prepared = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 20 == 0, "valid").otherwise("train")
        .alias("split"),
    )
    content = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % BASE_DAYS).alias("day"),
        F.concat(
            F.lit("document body "), F.col("id"), F.lit(" "),
            F.repeat(F.lit("x"), 200),
        ).alias("text"),
    )
    return prepared, content


def delta(spark, n_base: int, i: int, n_rows: int):
    day = BASE_DAYS + i
    return spark.range(n_rows).select(
        (F.col("id") + n_base + i * n_rows).alias("doc_id"),
        F.lit(day).alias("day"),
        F.concat(F.lit("late body "), F.col("id")).alias("text"),
        F.lit("train").alias("split"),
    )


def timed(fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return round(statistics.median(walls), 3)


def live_bytes(root: str, rels) -> int:
    return sum(os.path.getsize(os.path.join(root, rel)) for rel in rels)


def observe(spark, root, predicate, version=None):
    seen = {}
    read_published_where(
        spark, root, predicate, version=version,
        _scan_observer=lambda s, fl: seen.setdefault(s, fl),
    )
    return [rel for fl in seen.values() for rel in fl]


def run_scale(spark, n_base: int, n_delta: int) -> dict:
    tmp = tempfile.mkdtemp(prefix="prune_ab_")
    root = os.path.join(tmp, "corpus")
    try:
        prepared, content = base_corpus(spark, n_base)
        publish_corpus_committed(
            prepared, content, root, n_shards=N_SHARDS
        )
        for i in range(N_UPSERTS):
            upsert_into_published(
                spark, root, delta(spark, n_base, i, n_delta),
                key_col="doc_id",
            )
        last_day = BASE_DAYS + N_UPSERTS - 1
        pred = f"day >= {last_day}"

        all_files = observe(spark, root, "day IS NOT NULL")
        hit_files = observe(spark, root, pred)

        pruned = read_published_where(spark, root, pred)
        full = read_published_corpus(spark, root).filter(pred)
        n_pruned = pruned.count()
        n_full = full.count()
        assert n_pruned == n_full == n_delta, (n_pruned, n_full)
        ids_match = (
            pruned.select("doc_id").exceptAll(full.select("doc_id")).count()
            == 0
            and full.select("doc_id").exceptAll(pruned.select("doc_id"))
            .count() == 0
        )

        wall_pruned = timed(
            lambda: read_published_where(spark, root, pred).count()
        )
        wall_full = timed(
            lambda: read_published_corpus(spark, root).filter(pred).count()
        )

        # DNF-lite: an OR of conjunct groups prunes per-disjunct — a
        # file is opened iff SOME disjunct can match it.  Train files
        # with old days refute both disjuncts; the valid split and the
        # recent upserts survive one each.
        or_pred = f"day >= {last_day} OR split = 'valid'"
        or_hit = observe(spark, root, or_pred)
        n_or = read_published_where(spark, root, or_pred).count()
        n_or_full = (
            read_published_corpus(spark, root).filter(or_pred).count()
        )
        assert n_or == n_or_full, (n_or, n_or_full)

        # the honest negative: v1 is hash-sharded, day spans every file
        v1_all = observe(spark, root, "day IS NOT NULL", version=1)
        v1_hit = observe(spark, root, "day >= 1", version=1)

        # plain compaction re-packs by shard hash: ingestion
        # correlation is destroyed, the same predicate stops pruning
        compact_published(spark, root)
        pc_all = observe(spark, root, "day IS NOT NULL")
        pc_hit = observe(spark, root, pred)
        # OPTIMIZE ZORDER BY (day): curve-segment files restore
        # arbitrary-predicate skipping on the clustered column
        compact_published(spark, root, cluster_by=["day"])
        zc_all = observe(spark, root, "day IS NOT NULL")
        zc_hit = observe(spark, root, pred)
        n_zc = read_published_where(spark, root, pred).count()
        assert n_zc == n_delta, n_zc
        wall_zc = timed(
            lambda: read_published_where(spark, root, pred).count()
        )

        return {
            "rows_base": n_base,
            "rows_per_upsert": n_delta,
            "upserts": N_UPSERTS,
            "predicate": pred,
            "files_opened": f"{len(hit_files)}/{len(all_files)}",
            "bytes_opened": live_bytes(root, hit_files),
            "bytes_total": live_bytes(root, all_files),
            "rows_returned": n_pruned,
            "results_identical": bool(ids_match),
            "wall_pruned_s": wall_pruned,
            "wall_full_scan_s": wall_full,
            "or_predicate": or_pred,
            "or_files_opened": f"{len(or_hit)}/{len(all_files)}",
            "or_rows_returned": n_or,
            "or_results_identical": bool(n_or == n_or_full),
            "v1_unclustered_files_opened": f"{len(v1_hit)}/{len(v1_all)}",
            "after_plain_compact_files": f"{len(pc_hit)}/{len(pc_all)}",
            "after_zorder_compact_files": f"{len(zc_hit)}/{len(zc_all)}",
            "after_zorder_bytes_opened": live_bytes(root, zc_hit),
            "after_zorder_bytes_total": live_bytes(root, zc_all),
            "after_zorder_wall_s": wall_zc,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    spark = get_spark("prune-ab", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "8")))
    out = {
        "scales": [
            run_scale(spark, 40_000, 1_000),
            run_scale(spark, 400_000, 10_000),
        ],
        "note": (
            "read_published_where prunes from manifest col_stats alone "
            "(zero footer reads); each upsert's files carry a tight day "
            "range, so the recent-window read opens only them — the "
            "files_opened ratio IS the 100 TB read ratio.  The or_* "
            "lines show DNF-lite disjunction pruning: day >= D OR "
            "split = 'valid' opens only the recent upserts plus the "
            "valid split — a file is skipped only when EVERY disjunct "
            "refutes it.  The v1 line "
            "shows the same predicate on the hash-sharded first publish "
            "prunes nothing (day spans every file): skipping needs "
            "ingestion/layout correlation.  The compaction lines show "
            "the full lifecycle: a plain compact re-packs by shard hash "
            "and destroys the correlation (pruning stops), and "
            "compact_published(cluster_by=['day']) — OPTIMIZE ZORDER — "
            "restores arbitrary-predicate skipping on the clustered "
            "column, rows identical throughout."
        ),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
