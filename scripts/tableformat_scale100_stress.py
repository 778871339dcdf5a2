#!/usr/bin/env python
"""100x-scale table-format lifecycle evidence (r12, VERDICT r11 task 2).

The query tier has STRESS_SCALE100; this gives the table format the
same treatment: the design claims every lookup/DML verb's cost tracks
the DELTA (or the answer), never the corpus — this run proves it at
100x the 1x corpus by holding the DELTA FIXED while the corpus grows
100x.  That is the sharper experiment than tableformat_stress.py's
10x run (which scales the delta WITH the corpus, so delta-bound steps
legitimately grow there): here a flat wall is the design claim
verified, and only the explicitly corpus-bound step (publish — a full
write by definition) is allowed to track the corpus.

Lifecycle at each scale (1x = 40k rows, 100x = 4M rows; delta = 1 000
rows and merge source = 3 x 250 rows at BOTH scales):

  1. publish v1 with key Bloom index + HLL sketch  [corpus-bound]
  2. upsert a 1 000-row day-8 delta                [delta-bound]
  3. ``where`` read of that day (file skipping)    [answer-bound]
  4. Bloom + key-stats point lookups, present and
     absent keys (absent must open 0 files)        [answer-bound]
  5. copy-on-write retract of the day-8 sliver     [delta-bound:
     rewrites only the sliver's files]
  6. upsert a day-9 delta, then DV retract of it   [delta-bound:
     rewrites NOTHING, writes a KB sidecar]
  7. MERGE INTO with a 750-row source
     (250 update / 250 delete / 250 insert)        [delta-bound]
  8. CDC window over the DV-retract version        [delta-bound]
  9. one small SQL append + incremental OPTIMIZE   [delta-bound:
     only slivers fold, packed shards never rewrite]
 10. vacuum dry-run audit                          [manifest-bound]

Every count is closed-form at both scales.  Results land as the
``scale100`` section of STRESS_TABLEFORMAT.json (read-modify-write;
the 10x lifecycle sections are untouched) and are pinned by
tests/test_stress_artifacts.py::test_tableformat_scale100_section.

Usage: python scripts/tableformat_scale100_stress.py
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
    merge_into_published,
    optimize_published,
    publish_corpus_committed,
    read_published_corpus,
    read_published_keys,
    read_published_where,
    retract_from_published,
    upsert_into_published,
    vacuum_published_files,
)
from v6spark.session import get_spark
from v6spark.sources.pubcdc import read_published_changes_sql
from v6spark.sources.pubcorpus import register_pubcorpus_source

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "STRESS_TABLEFORMAT.json",
)

N_SHARDS = 32
BASE_DAYS = 8
N_DELTA = 1_000       # FIXED at both scales — the experiment's point
N_MERGE = 250


def run_scale(spark, n_base: int) -> dict:
    tmp = tempfile.mkdtemp(prefix="tf100_")
    root = os.path.join(tmp, "corpus")
    walls: dict[str, float] = {}
    extra: dict[str, object] = {}

    def step(name):
        class _T:
            def __enter__(self):
                self.t0 = time.monotonic()

            def __exit__(self, *a):
                walls[name] = round(time.monotonic() - self.t0, 3)

        return _T()

    try:
        prepared = spark.range(n_base).select(
            (F.col("id") * 2).alias("doc_id"),
            F.when(F.col("id") % 20 == 0, "valid").otherwise("train")
            .alias("split"),
        )
        content = spark.range(n_base).select(
            (F.col("id") * 2).alias("doc_id"),
            (F.col("id") % BASE_DAYS).alias("day"),
            F.concat(F.lit("v1 body "), F.col("id"), F.lit(" "),
                     F.repeat(F.lit("x"), 120)).alias("text"),
        )
        # 1. publish — the one corpus-bound step by definition
        with step("publish"):
            publish_corpus_committed(
                prepared, content, root, n_shards=N_SHARDS,
                key_bloom=True,
                sketch_specs={"docs": {"kind": "hll", "expr": "doc_id"}},
            )

        def delta_frame(day: int, key_base: int):
            return spark.range(N_DELTA).select(
                (F.col("id") * 2 + key_base).alias("doc_id"),
                F.lit(day).alias("day"),
                F.concat(F.lit(f"day{day} body "), F.col("id"))
                .alias("text"),
                F.lit("train").alias("split"),
            )

        # 2. delta-sized upsert (new keys -> pure sliver append)
        with step("upsert_delta"):
            res = upsert_into_published(
                spark, root, delta_frame(BASE_DAYS, 2_000_000_000),
                key_col="doc_id",
            )
        assert res["rows_inserted"] == N_DELTA, res

        # 3. answer-bound where read: only the sliver's files open
        seen: dict[str, list] = {}
        with step("where_read"):
            got = read_published_where(
                spark, root, f"day = {BASE_DAYS}",
                _scan_observer=lambda s, fl: seen.setdefault(s, fl),
            ).count()
        assert got == N_DELTA, (got, N_DELTA)
        all_seen: dict[str, list] = {}
        read_published_where(
            spark, root, "doc_id IS NOT NULL",
            _scan_observer=lambda s, fl: all_seen.setdefault(s, fl),
        )
        files_hit = sum(len(f) for f in seen.values())
        files_all = sum(len(f) for f in all_seen.values())
        assert files_hit < files_all
        extra["where_files"] = f"{files_hit}/{files_all}"

        # 4. point lookups — present key in the 100x-bigger base
        # shards (Bloom + key stats prune to the owning files), and
        # an absent key that must open ZERO data files
        present = [2 * (n_base // 7), 2_000_000_000 + 4]
        absent = [k + 1 for k in present]
        with step("lookup_present"):
            rows = read_published_keys(spark, root, present).collect()
        assert len(rows) == 2, rows
        ab_seen: dict[str, list] = {}
        with step("lookup_absent"):
            arows = read_published_keys(
                spark, root, absent,
                _scan_observer=lambda s, fl: ab_seen.setdefault(s, fl),
            ).collect()
        assert arows == []
        extra["absent_lookup_files_opened"] = sum(
            len(f) for f in ab_seen.values()
        )

        # 5. copy-on-write retract of the day-8 sliver: rewrites only
        # the files that CONTAIN matching rows — the 1 000-row sliver,
        # not the 4M-row base
        with step("cow_retract"):
            res = retract_from_published(
                spark, root, f"day = {BASE_DAYS}", strategy="rewrite"
            )
        assert res["rows_removed"] == N_DELTA, res
        extra["cow_files_rewritten"] = res["files_rewritten"]
        live = n_base
        assert read_published_corpus(spark, root).count() == live

        # 6. DV retract: rewrites NOTHING at any corpus size
        with step("upsert_delta2"):
            upsert_into_published(
                spark, root, delta_frame(BASE_DAYS + 1, 3_000_000_000),
                key_col="doc_id",
            )
        with step("dv_retract"):
            res = retract_from_published(
                spark, root, f"day = {BASE_DAYS + 1}", strategy="dv"
            )
        assert res["rows_removed"] == N_DELTA, res
        assert res["files_rewritten"] == 0, res
        dv_version = res["_version"]
        assert read_published_corpus(spark, root).count() == live

        # 7. MERGE INTO, 750-row source — cost tracks len(source)
        merge_src = (
            spark.range(N_MERGE).select(
                (F.col("id") * 2).alias("doc_id"),
                F.lit(0).alias("day"),
                F.lit("merged update").alias("text"),
                F.lit("train").alias("split"),
            )
            .unionByName(spark.range(N_MERGE).select(
                (F.col("id") * 2 + 2 * N_MERGE).alias("doc_id"),
                F.lit(-1).alias("day"),
                F.lit("x").alias("text"),
                F.lit("train").alias("split"),
            ))
            .unionByName(spark.range(N_MERGE).select(
                (F.col("id") * 2 + 9_000_000_000).alias("doc_id"),
                F.lit(5).alias("day"),
                F.lit("merged insert").alias("text"),
                F.lit("train").alias("split"),
            ))
        )
        with step("merge_into"):
            mres = merge_into_published(
                spark, root, merge_src, key_col="doc_id",
                when_matched_update="*",
                matched_condition="s.day >= 0",
                when_matched_delete="s.day < 0",
                when_not_matched_insert="*",
            )
        assert mres["rows_updated"] == N_MERGE, mres
        assert mres["rows_deleted"] == N_MERGE, mres
        assert mres["rows_inserted"] == N_MERGE, mres
        assert read_published_corpus(spark, root).count() == live

        # 7b. file-level rewrite pruning: an update whose keys all
        # hash into ONE shard must rewrite only that shard's files —
        # the manifest key-stats + directory pruning claim at the
        # file level.  (The step-7 merge's 250 hash-scattered keys
        # touch all 32 shards by construction — one file per shard
        # here — so its rewrite set is the whole base; the posture
        # for scattered point updates at scale is DV retract +
        # insert, step 6, or key-clustered multi-file shards where
        # stats-pruning bounds the set, shown here.)
        # the seed literal must be INT to reproduce assign_shards'
        # F.lit(0) hash input (xxhash64 is type-sensitive); keys
        # < 1000 are excluded — step 7 updated/deleted those
        one_shard_keys = [
            r[0]
            for r in spark.range(n_base)
            .selectExpr("id * 2 AS doc_id")
            .where(f"doc_id >= 1000 AND "
                   f"pmod(xxhash64(0, doc_id), {N_SHARDS}) = 0")
            .limit(N_MERGE)
            .collect()
        ]
        clustered = spark.createDataFrame(
            [(k,) for k in one_shard_keys], "doc_id long"
        ).selectExpr(
            "doc_id",
            "cast(0 as long) AS day",
            "'clustered update' AS text",
            "'train' AS split",
        )
        with step("upsert_one_shard"):
            ures = upsert_into_published(
                spark, root, clustered, key_col="doc_id"
            )
        assert ures["rows_updated"] == N_MERGE, ures
        extra["one_shard_files_rewritten"] = ures["files_rewritten"]
        assert ures["files_rewritten"] < ures["files_kept"], ures
        assert read_published_corpus(spark, root).count() == live

        # 8. CDC window over the DV retract — exactly the delta rows
        with step("cdc_window"):
            ch = read_published_changes_sql(
                spark, root, dv_version - 1, dv_version
            )
            n_del = ch.filter("_change_type = 'delete'").count()
        assert n_del == N_DELTA, (n_del, N_DELTA)

        # 9. small SQL append, then INCREMENTAL optimize: only the
        # sliver files fold; the packed base shards never rewrite
        register_pubcorpus_source(spark)
        n_app = 128
        with step("sql_append"):
            spark.range(n_app).selectExpr(
                "id * 2 + 11000000000 as doc_id",
                "cast(2 as long) as day",
                "concat('appended ', id) as text",
                "'train' as split",
            ).write.format("pubcorpus").mode("append").save(root)
        live2 = live + n_app
        assert read_published_corpus(spark, root).count() == live2
        with step("incremental_optimize"):
            ores = optimize_published(spark, root, max_file_rows=4096)
        assert ores["groups_rewritten"] > 0, ores
        extra["optimize_files_folded"] = ores["files_folded"]
        assert read_published_corpus(spark, root).count() == live2

        # 10. vacuum dry-run: manifest-bound audit, no data touched
        with step("vacuum_dry_run"):
            audit = vacuum_published_files(
                spark, root, keep_last=1, dry_run=True
            )
        extra["vacuum_dry_run_files"] = len(audit["files"])
        assert read_published_corpus(spark, root).count() == live2

        return {
            "rows_base": n_base,
            "delta_rows": N_DELTA,
            "merge_rows": f"u{N_MERGE}/d{N_MERGE}/i{N_MERGE}",
            "all_counts_exact": True,
            "walls_s": walls,
            **extra,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    spark = get_spark("tableformat-scale100", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    # throwaway lifecycle absorbs session JIT/codegen cold-start so
    # both measured scales run warm (same protocol as
    # tableformat_stress.py and bench.py)
    run_scale(spark, 40_000)
    s1 = run_scale(spark, 40_000)
    s100 = run_scale(spark, 4_000_000)
    ratios = {
        k: (round(s100["walls_s"][k] / s1["walls_s"][k], 2)
            if s1["walls_s"][k] > 0 else None)
        for k in s1["walls_s"]
    }
    section = {
        "note": (
            "delta held FIXED (1 000 rows; merge 3x250) while the "
            "corpus grows 100x (40k -> 4M rows, 32 shards both): a "
            "flat wall IS the design claim (lookup/DML cost tracks "
            "the delta or the answer, never the corpus) verified at "
            "100x.  publish is corpus-bound by definition — a full "
            "write — and is the only step allowed to track the "
            "corpus.  Every count closed-form at both scales; the "
            "absent-key lookup opens 0 data files at 100x, the DV "
            "retract rewrites 0 files at 100x, incremental OPTIMIZE "
            "folds only the appended slivers.  COW-rewrite verbs "
            "track the TOUCHED FILES: the step-7 merge's 250 "
            "hash-scattered update keys touch all 32 single-file "
            "shards by construction (its ratio is rewrite-bytes, "
            "honestly corpus-coupled in this worst-case geometry — "
            "the scattered-update posture at scale is the DV path), "
            "while upsert_one_shard confines 250 keys to one shard "
            "and rewrites only that shard's files "
            "(one_shard_files_rewritten << files_kept at both "
            "scales)."
        ),
        "corpus_bound_steps": ["publish"],
        "scale_1x": s1,
        "scale_100x": s100,
        "wall_ratio_100x_over_1x": ratios,
    }
    with open(OUT) as fh:
        doc = json.load(fh)
    doc["scale100"] = section
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps({"scale100_ratios": ratios}, sort_keys=True))


if __name__ == "__main__":
    main()
