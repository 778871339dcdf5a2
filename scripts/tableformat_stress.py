#!/usr/bin/env python
"""End-to-end table-format lifecycle stress: every r6 surface in ONE
composed run, with closed-form assertions at each step and wall
ratios across a 10x scale-up.

Lifecycle (per scale):
  1. publish v1 with key Bloom index + HLL sketch, tag it "baseline"
  2. six incremental upserts (one later day each)
  3. selective recent-window read via manifest data skipping
  4. point lookups — present and absent keys — via the Bloom index
  5. deletion-vector retract of one ingested day (merge-on-read)
  6. OPTIMIZE ZORDER compact on the day column (materializes DVs,
     rebuilds stats/bloom, restores arbitrary-predicate skipping)
  7. vacuum with keep_last=1 — the TAGGED v1 must survive and read
     back byte-exact while untagged intermediates are reclaimed

Every count is closed-form (no tolerance): the corpus is constructed
so each step's expected rows are computable.  The wall ratios show
the maintenance/read costs scale with the DELTA or the ANSWER, not
the corpus.

Usage: python scripts/tableformat_stress.py
Writes STRESS_TABLEFORMAT.json.
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
    publish_corpus_committed,
    read_published_corpus,
    read_published_keys,
    read_published_where,
    retract_from_published,
    tag_published,
    upsert_into_published,
    vacuum_published_files,
)
from v6spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "STRESS_TABLEFORMAT.json",
)

N_SHARDS = 32
BASE_DAYS = 8
N_UPSERTS = 6


def run_scale(spark, n_base: int) -> dict:
    n_delta = n_base // 40
    tmp = tempfile.mkdtemp(prefix="tableformat_")
    root = os.path.join(tmp, "corpus")
    walls: dict[str, float] = {}

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
        with step("publish"):
            publish_corpus_committed(
                prepared, content, root, n_shards=N_SHARDS,
                key_bloom=True,
                sketch_specs={"docs": {"kind": "hll", "expr": "doc_id"}},
            )
        tag_published(spark, root, "baseline")

        with step("upserts_x6"):
            for i in range(N_UPSERTS):
                day = BASE_DAYS + i
                delta = spark.range(n_delta).select(
                    (F.col("id") * 2 + 2_000_000_000 + i * 10_000_000)
                    .alias("doc_id"),
                    F.lit(day).alias("day"),
                    F.concat(F.lit(f"day{day} body "), F.col("id"))
                    .alias("text"),
                    F.lit("train").alias("split"),
                )
                res = upsert_into_published(
                    spark, root, delta, key_col="doc_id"
                )
                assert res["rows_inserted"] == n_delta, res

        # 3. manifest data skipping: last two ingested days
        pred = f"day >= {BASE_DAYS + N_UPSERTS - 2}"
        seen: dict[str, list] = {}
        with step("skipping_read"):
            got = read_published_where(
                spark, root, pred,
                _scan_observer=lambda s, fl: seen.setdefault(s, fl),
            ).count()
        assert got == 2 * n_delta, (got, 2 * n_delta)
        all_seen: dict[str, list] = {}
        read_published_where(
            spark, root, "doc_id IS NOT NULL",
            _scan_observer=lambda s, fl: all_seen.setdefault(s, fl),
        )
        files_hit = sum(len(f) for f in seen.values())
        files_all = sum(len(f) for f in all_seen.values())
        assert files_hit < files_all

        # 4. Bloom point lookups
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
        absent_files = sum(len(f) for f in ab_seen.values())

        # 5. DV retract of the first ingested day
        with step("dv_retract"):
            res = retract_from_published(
                spark, root, f"day = {BASE_DAYS}", strategy="dv"
            )
        assert res["rows_removed"] == n_delta, res
        assert res["files_rewritten"] == 0
        live = n_base + (N_UPSERTS - 1) * n_delta
        assert read_published_corpus(spark, root).count() == live

        # 6. OPTIMIZE ZORDER on day: DVs materialize, skipping restored
        with step("zorder_compact"):
            v = compact_published(spark, root, cluster_by=["day"])
        assert v is not None
        zc_seen: dict[str, list] = {}
        got = read_published_where(
            spark, root, pred,
            _scan_observer=lambda s, fl: zc_seen.setdefault(s, fl),
        ).count()
        assert got == 2 * n_delta
        zc_all: dict[str, list] = {}
        read_published_where(
            spark, root, "doc_id IS NOT NULL",
            _scan_observer=lambda s, fl: zc_all.setdefault(s, fl),
        )
        zc_hit = sum(len(f) for f in zc_seen.values())
        zc_total = sum(len(f) for f in zc_all.values())
        assert zc_hit < zc_total
        assert read_published_corpus(spark, root).count() == live

        # 6b. the SQL front door reads the SAME bytes: pubcorpus frame
        # content-hash-identical to read_published_corpus on the
        # post-ZORDER state, and the where option opens the same files
        from v6spark.sources.pubcorpus import register_pubcorpus_source

        register_pubcorpus_source(spark)

        def _sig(df):
            cols = sorted(c for c in df.columns if c != "shard")
            # xor-fold: order-insensitive and overflow-free (a SUM of
            # 64-bit hashes trips ANSI overflow)
            return df.select(
                F.expr(
                    "bit_xor(xxhash64("
                    + ", ".join(f"`{c}`" for c in cols)
                    + "))"
                ).alias("h"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]

        with step("pubcorpus_full_read"):
            src_sig = _sig(spark.read.format("pubcorpus").load(root))
        ref_sig = _sig(read_published_corpus(spark, root))
        assert (src_sig["h"], src_sig["n"]) == (ref_sig["h"], ref_sig["n"])
        obs = os.path.join(tmp, "obs.json")
        with step("pubcorpus_where_read"):
            n_src_where = (
                spark.read.format("pubcorpus")
                .option("where", pred)
                .option("_scanObserverPath", obs)
                .load(root).count()
            )
        assert n_src_where == 2 * n_delta
        with open(obs) as fh:
            src_files = sum(len(v) for v in json.load(fh).values())
        assert src_files == zc_hit, (src_files, zc_hit)

        # 6c. r8: projected where read — option("columns") narrows
        # the DECODE, not just the frame: with text dominating the
        # row, a doc_id,day read decodes a small fraction of the
        # surviving files' bytes; row groups the predicate refutes
        # never decode (recorded; single-row-group files can't skip)
        dec_dir = os.path.join(tmp, "dec")
        os.makedirs(dec_dir)
        with step("pubcorpus_projected_where_read"):
            n_proj = (
                spark.read.format("pubcorpus")
                .option("where", pred)
                .option("columns", "doc_id,day")
                .option("_decodeObserverDir", dec_dir)
                .load(root).count()
            )
        assert n_proj == 2 * n_delta
        recs = [
            json.load(open(os.path.join(dec_dir, f)))
            for f in os.listdir(dec_dir)
        ]
        b_sel = sum(r["bytes_selected"] for r in recs)
        b_tot = sum(r["bytes_total"] for r in recs)
        rg_read = sum(r["row_groups_read"] for r in recs)
        rg_tot = sum(r["row_groups_total"] for r in recs)
        assert 0 < b_sel < b_tot, (b_sel, b_tot)

        # 6c-b. r8: row-group skipping demo — after ZORDER the
        # FILE-level stats are already day-exact, so nothing is left
        # to skip inside surviving files (pubcorpus_row_groups above
        # reads full).  This step shows the intra-file path on the
        # shape it exists for: files that SPAN the predicate column
        # (day-sorted rows, many row groups per file — the pre-layout
        # state of any freshly ingested table).  Counts stay exact.
        rg_root = os.path.join(tmp, "rgdemo")
        rg_n = n_base // 4
        rg_prep = spark.range(rg_n).select(
            F.col("id").alias("doc_id"), F.lit("train").alias("split")
        )
        rg_content = spark.range(rg_n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % BASE_DAYS).alias("day"),
            F.concat(F.lit("rg body "), F.col("id")).alias("text"),
        )
        publish_corpus_committed(
            rg_prep, rg_content, rg_root, n_shards=4
        )
        import pathlib

        import pyarrow.parquet as _pq

        for p in pathlib.Path(rg_root).rglob("*"):
            rel = str(p.relative_to(rg_root))
            if not p.is_file() or "split=" not in rel \
                    or p.name.startswith(("_", ".")):
                continue
            t = _pq.read_table(str(p)).sort_by("day")
            _pq.write_table(t, str(p), row_group_size=512)
            crc = p.with_name(f".{p.name}.crc")
            if crc.exists():
                crc.unlink()
        rg_dec = os.path.join(tmp, "rg_dec")
        os.makedirs(rg_dec)
        with step("rowgroup_skip_read"):
            rg_got = (
                spark.read.format("pubcorpus")
                .option("where", "day = 3")
                .option("_decodeObserverDir", rg_dec)
                .load(rg_root).count()
            )
        assert rg_got == rg_n // BASE_DAYS, (rg_got, rg_n)
        assert rg_got == read_published_where(
            spark, rg_root, "day = 3"
        ).count()
        rg_recs = [
            json.load(open(os.path.join(rg_dec, f)))
            for f in os.listdir(rg_dec)
        ]
        rg_demo_read = sum(r["row_groups_read"] for r in rg_recs)
        rg_demo_tot = sum(r["row_groups_total"] for r in rg_recs)
        assert rg_demo_read < rg_demo_tot, (rg_demo_read, rg_demo_tot)

        # 6d. r8: the row-level CDC stream tails the DV-retract +
        # ZORDER window through plain readStream (per-shard Python
        # classify): net change = exactly the day-8 deletes, the
        # full-rewrite compaction contributes ZERO rows
        from v6spark.sources.pubcdc import stream_published_changes

        cdc_counts: list = []
        with step("cdc_stream_window"):
            q = (
                stream_published_changes(
                    spark, root, starting_version=1 + N_UPSERTS
                )
                .writeStream.foreachBatch(
                    lambda d, b: cdc_counts.append((
                        d.filter("_change_type = 'delete'").count(),
                        d.count(),
                    ))
                )
                .option(
                    "checkpointLocation", os.path.join(tmp, "ckpt")
                )
                .trigger(availableNow=True).start()
            )
            q.awaitTermination()
        cdc_deletes = sum(d for d, _n in cdc_counts)
        cdc_total = sum(n for _d, n in cdc_counts)
        assert cdc_deletes == n_delta, (cdc_deletes, n_delta)
        assert cdc_total == n_delta, (cdc_total, n_delta)

        # 6e. r9: conditional MERGE — one committed version carrying
        # updates + deletes + inserts (delete count == insert count,
        # so the live total is unchanged: closed-form throughout)
        n_m = max(n_delta // 4, 10)
        merge_src = (
            spark.range(n_m).select(
                (F.col("id") * 2).alias("doc_id"),       # matched: update
                F.lit(0).alias("day"),
                F.lit("merged update").alias("text"),
                F.lit("train").alias("split"),
                F.lit("u").alias("_act"),
            )
            .unionByName(spark.range(n_m).select(
                # day BASE_DAYS+2 upsert keys: SURVIVING rows (the DV
                # retract removed day BASE_DAYS, i.e. the i=0 batch)
                (F.col("id") * 2 + 2_000_000_000 + 2 * 10_000_000)
                .alias("doc_id"),
                F.lit(-1).alias("day"),                  # matched: delete
                F.lit("x").alias("text"),
                F.lit("train").alias("split"),
                F.lit("d").alias("_act"),
            ))
            .unionByName(spark.range(n_m).select(
                (F.col("id") * 2 + 9_000_000_000).alias("doc_id"),
                F.lit(5).alias("day"),                   # unmatched: insert
                F.lit("merged insert").alias("text"),
                F.lit("train").alias("split"),
                F.lit("i").alias("_act"),
            ))
        )
        from v6spark.pipeline import merge_into_published

        with step("merge_into"):
            mres = merge_into_published(
                spark, root, merge_src.drop("_act"),
                key_col="doc_id",
                when_matched_update="*",
                matched_condition="s.day >= 0",
                when_matched_delete="s.day < 0",
                when_not_matched_insert="*",
            )
        assert mres["rows_updated"] == n_m, mres
        assert mres["rows_deleted"] == n_m, mres
        assert mres["rows_inserted"] == n_m, mres
        assert read_published_corpus(spark, root).count() == live

        # 6f. r9: history — the Python surface and the SQL metadata
        # table agree row-for-row; the merge is ONE commit
        from v6spark.pipeline import published_history

        with step("history_read"):
            hist = published_history(spark, root).collect()
        ops = {r.version: r.operation for r in hist}
        assert ops[mres["_version"]] == "MERGE"
        assert ops[1] == "PUBLISH"
        sql_hist = (
            spark.read.format("pubcorpus").option("meta", "history")
            .load(root).collect()
        )
        assert sorted(map(tuple, sql_hist)) == sorted(map(tuple, hist))

        # 6g. r9: CHECK constraint — set validates the WHOLE table
        # (one scan), then a violating merge refuses atomically
        from v6spark.pipeline import set_published_constraint

        with step("constraint_set"):
            set_published_constraint(spark, root, "day_ok", "day >= 0")
        bad = spark.range(1).select(
            F.lit(4).alias("doc_id"), F.lit(-5).alias("day"),
            F.lit("bad").alias("text"), F.lit("train").alias("split"),
        )
        try:
            merge_into_published(
                spark, root, bad, key_col="doc_id",
                when_matched_update="*",
            )
            raise AssertionError("constraint must refuse the merge")
        except ValueError as exc:
            assert "day_ok" in str(exc)
        assert read_published_corpus(spark, root).count() == live

        # 6h. r9: small SQL appends (constraint-checked per Arrow
        # batch, JVM-free) then INCREMENTAL optimize — only the
        # appended slivers fold, packed files never rewrite
        register_pubcorpus_source(spark)
        n_app = max(n_delta // 8, 8)
        with step("sql_appends_x2"):
            for i in range(2):
                spark.range(n_app).selectExpr(
                    f"id * 2 + {11_000_000_000 + i * 1_000_000}"
                    " as doc_id",
                    "cast(2 as long) as day",
                    "concat('appended ', id) as text",
                    "'train' as split",
                ).write.format("pubcorpus").mode("append").save(root)
        live2 = live + 2 * n_app
        assert read_published_corpus(spark, root).count() == live2
        from v6spark.pipeline import optimize_published

        with step("incremental_optimize"):
            ores = optimize_published(
                spark, root, max_file_rows=max(n_app, 64)
            )
        assert ores["groups_rewritten"] > 0, ores
        assert read_published_corpus(spark, root).count() == live2

        # 6i. r9: RESTORE — undo the optimize in O(manifest); the
        # content is layout-identical, so every count holds
        from v6spark.pipeline import restore_published

        with step("restore"):
            rres = restore_published(
                spark, root, version=ores["_version"] - 1
            )
        assert rres["restored_from"] == ores["_version"] - 1
        assert read_published_corpus(spark, root).count() == live2

        # 7. vacuum (dry-run audit first, then the real sweep must
        # match it exactly): tagged v1 survives, reads back exact
        with step("vacuum_dry_run"):
            audit = vacuum_published_files(
                spark, root, keep_last=1, dry_run=True
            )
        assert read_published_corpus(spark, root).count() == live2
        with step("vacuum"):
            swept = vacuum_published_files(spark, root, keep_last=1)
        assert swept == (
            len(audit["files"]) + len(audit["directories"])
        ), (swept, {k: len(v) for k, v in audit.items()})
        base = read_published_corpus(spark, root, tag="baseline")
        assert base.count() == n_base
        r0 = base.filter("doc_id = 0").collect()[0]
        assert r0["text"].startswith("v1 body 0 ")
        cur = read_published_corpus(spark, root).count()
        assert cur == live2
        tag_sig = _sig(
            spark.read.format("pubcorpus").option("tag", "baseline")
            .load(root)
        )
        assert tag_sig["n"] == n_base

        return {
            "rows_base": n_base,
            "rows_per_upsert": n_delta,
            "live_rows_final": live2,
            "merge_rows": f"u{n_m}/d{n_m}/i{n_m}",
            "history_sql_parity": True,
            "constraint_refused_atomically": True,
            "incremental_optimize_folded": ores["files_folded"],
            "restore_version": rres["_version"],
            "vacuum_audit_exact": True,
            "skipping_files": f"{files_hit}/{files_all}",
            "zorder_files": f"{zc_hit}/{zc_total}",
            "pubcorpus_hash_identical": True,
            "pubcorpus_where_files": f"{src_files}/{zc_total}",
            "pubcorpus_projected_bytes": f"{b_sel}/{b_tot}",
            "pubcorpus_row_groups": f"{rg_read}/{rg_tot}",
            "rowgroup_demo_groups": f"{rg_demo_read}/{rg_demo_tot}",
            "cdc_stream_net_deletes": cdc_deletes,
            "absent_lookup_files_opened": absent_files,
            "walls_s": walls,
            "all_counts_exact": True,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    spark = get_spark("tableformat-stress", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "8")))
    # settle pass (bench.py's warm-up idea): the FIRST lifecycle of a
    # session eats JIT/codegen/Python-worker cold-start, which
    # previously landed entirely on scale_1x and made the 10x ratios
    # read sub-1 for corpus-bound steps (r9 verdict: publish read
    # 13.0 s at 1x vs 5.2 s at 10x, ratio 0.40 — uninterpretable).
    # A throwaway lifecycle at the 1x size absorbs it so both
    # measured scales run warm (smaller sizes break the row-group
    # skipping demo's geometry — its files must span >1 row group).
    run_scale(spark, 40_000)
    s1 = run_scale(spark, 40_000)
    s2 = run_scale(spark, 400_000)
    # same lifecycle with every manifest offloaded (threshold 0): the
    # whole consumer surface must behave identically above the
    # manifest-offload threshold — closed-form counts equal, skipping
    # still selective, tagged v1 still byte-exact after vacuum
    import v6spark.pipeline as _pipeline

    prev = _pipeline._MANIFEST_INLINE_MAX
    _pipeline._MANIFEST_INLINE_MAX = 0
    try:
        s1_off = run_scale(spark, 40_000)
    finally:
        _pipeline._MANIFEST_INLINE_MAX = prev
    for k in ("rows_base", "live_rows_final", "skipping_files",
              "zorder_files"):
        assert s1_off[k] == s1[k], (k, s1_off[k], s1[k])
    ratios = {
        k: (round(s2["walls_s"][k] / s1["walls_s"][k], 2)
            if s1["walls_s"][k] > 0 else None)
        for k in s1["walls_s"]
    }
    out = {
        "scale_1x": s1,
        "scale_10x": s2,
        "scale_1x_manifest_offloaded": s1_off,
        "wall_ratio_10x_over_1x": ratios,
        "note": (
            "one composed lifecycle: ACID publish (+Bloom index + HLL "
            "sketch, one transaction) -> tag -> 6 incremental upserts "
            "-> manifest data skipping -> Bloom point lookups -> DV "
            "retract -> OPTIMIZE ZORDER (materializes DVs, rebuilds "
            "stats+bloom) -> vacuum with the tagged v1 surviving "
            "byte-exact.  Every count closed-form at both scales; "
            "lookup/skipping walls are ~flat across 10x (cost tracks "
            "the answer), upsert/retract track the delta, and only the "
            "full-rewrite steps (publish, zorder compact) track the "
            "corpus.  scale_1x_manifest_offloaded reruns the whole "
            "lifecycle with _MANIFEST_INLINE_MAX=0 (every manifest "
            "offloaded to its parquet sidecar): closed-form counts and "
            "skipping selectivity asserted equal to inline mode.  r7: "
            "the pubcorpus DataSource reads the post-ZORDER state "
            "content-hash-identical to read_published_corpus, its "
            "where option opens exactly the files read_published_where "
            "opens (pubcorpus_where_files), and the tagged v1 reads "
            "back through option('tag') after the vacuum.  r8: the "
            "projected where read (option('columns','doc_id,day')) "
            "decodes pubcorpus_projected_bytes of the surviving "
            "files' bytes (text excluded from the decode), "
            "pubcorpus_row_groups records footer-stat row-group "
            "skipping on the ZORDERed files (full: file-level stats "
            "are already day-exact there, nothing intra-file left), "
            "rowgroup_demo_groups shows the intra-file path on "
            "day-SPANNING files (the pre-layout ingest shape) with "
            "exact counts, and the readStream CDC feed tails the "
            "DV-retract + ZORDER window to exactly the net deletes "
            "(the full rewrite contributes zero rows)."
        ),
    }
    # Read-modify-write: other stress scripts (cdc_stream_stress.py)
    # merge their own sections into this file; preserve any keys we
    # did not produce ourselves instead of clobbering the whole doc.
    try:
        with open(OUT) as fh:
            doc = json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        doc = {}
    doc.update(out)
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
