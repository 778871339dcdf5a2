#!/usr/bin/env python
"""CDC stream stress at 10x: a 100k-row DML window through
``readStream.format("pubcorpus")`` with closed-form counts, per-window
walls across a 10x base scale-up, and the reshard window's
key-space-sliced parallel classification exercised explicitly.

What it proves (VERDICT r8 #6 'done' shape):

- the full multi-version consume through the SQL readStream front door
  is EXACT (insert / delete / update_preimage / update_postimage
  counts are closed-form) at 1x and 10x base;
- per-window planning is PER-SHARD in the common case: the
  DV-retract window's wall tracks the DELTA (newly-marked positions
  are read position-restricted), so it stays ~flat across 10x base;
  the insert-only window tracks the appended files; only the
  upsert window (whose rewrite physically touches every shard's
  files) and the RESHARD window (shard posture changed → key-space
  slices classify the rewrite in parallel, netting zero rows) track
  the base;
- partition counts are recorded per window, showing 32-way per-shard
  decomposition for the DML windows and >= 8 key-space slices for
  the reshard window (r11; previously a single-partition fallback
  measured at 5.25x for 10x data).

Usage: python scripts/cdc_stream_stress.py
Merges a "cdc_stream_scale" section into STRESS_TABLEFORMAT.json.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from v6spark.pipeline import (
    publish_corpus_committed,
    reshard_published,
    retract_from_published,
    upsert_into_published,
)
from v6spark.session import get_spark
from v6spark.sources.pubcorpus import register_pubcorpus_source

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "STRESS_TABLEFORMAT.json",
)

N_SHARDS = 32
W_INSERT = 50_000   # appended rows (insert-only window)
W_DELETE = 10_000   # DV-retracted rows (delta-tracked window)
W_UPDATE = 50_000   # updated keys (per-shard classify window)
# -> the composite DML window the stream consumes is >100k rows:
#    50k inserts + 10k deletes + 50k pre + 50k post = 160k change rows


def _docs(spark, lo, n, tag="v1"):
    return spark.range(lo, lo + n).selectExpr(
        "id as doc_id",
        f"concat('{tag} body ', id) as text",
        "cast(id % 100 as long) as day",
        "case when id % 10 = 0 then 'valid' else 'train' end as split",
    )


def run_scale(spark, n_base: int) -> dict:
    tmp = tempfile.mkdtemp(prefix="cdcstream_")
    root = os.path.join(tmp, "corpus")
    walls: dict[str, float] = {}
    try:
        df = _docs(spark, 0, n_base)
        publish_corpus_committed(
            df.selectExpr("doc_id", "split"), df.drop("split"),
            root, n_shards=N_SHARDS,
        )                                                     # v1

        # v2: insert-only window (blind append through the SQL writer)
        register_pubcorpus_source(spark)
        (_docs(spark, n_base, W_INSERT, tag="new")
         .write.format("pubcorpus").mode("append").save(root))

        # v3: DV delete window — classification is position-restricted
        # to the newly-marked rows, so its cost tracks the DELTA
        retract_from_published(
            spark, root, f"doc_id < {W_DELETE}", strategy="dv"
        )

        # v4: update window — rewrites the shard files holding the
        # matched keys (with 50k random keys: every shard)
        upsert_into_published(
            spark, root,
            _docs(spark, W_DELETE, W_UPDATE, tag="rev"),
        )

        # full consume through the SQL readStream front door
        counts: dict[str, int] = {}
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("pubcorpus")
            .option("startingVersion", "1").load(root)
            .writeStream.foreachBatch(
                lambda d, b: [
                    counts.__setitem__(
                        r["_change_type"],
                        counts.get(r["_change_type"], 0) + r["n"],
                    )
                    for r in d.groupBy("_change_type").count()
                    .withColumnRenamed("count", "n").collect()
                ]
            )
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        walls["stream_consume_all"] = round(time.perf_counter() - t0, 3)
        assert counts.get("insert", 0) == W_INSERT, counts
        assert counts.get("delete", 0) == W_DELETE, counts
        assert counts.get("update_preimage", 0) == W_UPDATE, counts
        assert counts.get("update_postimage", 0) == W_UPDATE, counts

        # per-window walls + partition counts (batch change windows:
        # the same planner the stream uses, window-addressable)
        from v6spark.sources.pubcdc import PublishedChangesBatchReader
        from v6spark.sources.pubcorpus import _log_dir, _read_doc
        from v6spark.sources.pubcdc import change_schema_ddl
        from pyspark.sql.types import StructType

        parts_per_window: dict[str, int] = {}

        def window(name, lo, hi, expect_rows):
            doc = _read_doc(_log_dir(root, None), hi)
            rdr = PublishedChangesBatchReader(
                root, StructType.fromDDL(change_schema_ddl(doc)),
                lo, hi,
            )
            parts = rdr.partitions()
            parts_per_window[name] = len(parts)
            t0 = time.perf_counter()
            got = (
                spark.read.format("pubcorpus")
                .option("changesFrom", str(lo))
                .option("changesTo", str(hi))
                .load(root).count()
            )
            walls[name] = round(time.perf_counter() - t0, 3)
            assert got == expect_rows, (name, got, expect_rows)

        window("window_insert_only", 1, 2, W_INSERT)
        window("window_dv_delete", 2, 3, W_DELETE)
        window("window_upsert", 3, 4, 2 * W_UPDATE)

        # v5: RESHARD — posture change: key-space-sliced partitions
        t0 = time.perf_counter()
        reshard_published(spark, root, n_shards=N_SHARDS + 16)
        walls["reshard_verb"] = round(time.perf_counter() - t0, 3)
        window("window_reshard", 4, 5, 0)
        assert parts_per_window["window_reshard"] >= 8

        return {
            "rows_base": n_base,
            "change_rows_consumed": sum(counts.values()),
            "counts": counts,
            "partitions_per_window": parts_per_window,
            "walls_s": walls,
            "all_counts_exact": True,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    spark = get_spark("cdc-stream-stress", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    s1 = run_scale(spark, 200_000)
    s10 = run_scale(spark, 2_000_000)
    ratios = {
        k: (round(s10["walls_s"][k] / s1["walls_s"][k], 2)
            if s1["walls_s"][k] > 0 else None)
        for k in s1["walls_s"]
    }
    section = {
        "scale_1x": s1,
        "scale_10x": s10,
        "wall_ratio_10x_over_1x": ratios,
        "note": (
            "160k-change-row DML window (50k inserts + 10k DV deletes "
            "+ 50k updates) consumed through "
            "readStream.format('pubcorpus') with exact closed-form "
            "counts at 200k and 2M base rows.  Per-window walls via "
            "the batch change reader (same planner): the DV-delete "
            "window is position-restricted to the delta "
            "(~flat across 10x); the insert window reads only the "
            "appended files; the upsert window classifies the "
            "rewritten shard files per-shard in parallel "
            "(partitions_per_window shows the 32-way decomposition) "
            "and tracks the rewritten bytes; the reshard window "
            "(shard posture changed; nets zero rows) classifies in "
            "parallel key-space slices since r11 — each slice owns "
            "the keys whose refined new-posture shard equals its "
            "slot, so the old single-task fallback's 5.25x scaling "
            "is gone."
        ),
    }
    try:
        with open(OUT) as fh:
            doc = json.load(fh)
    except FileNotFoundError:
        doc = {}
    doc["cdc_stream_scale"] = section
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps({
        "cdc_stream_walls_1x": s1["walls_s"],
        "cdc_stream_walls_10x": s10["walls_s"],
        "ratio": ratios,
        "partitions_1x": s1["partitions_per_window"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
