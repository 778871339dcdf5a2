#!/usr/bin/env python
"""Manifest-offload A/B: inline commit JSON vs parquet stats sidecar.

The commit document is parsed by EVERY committed read.  Its per-file
sections (DML ``files`` lists, ``col_stats``, ``file_stats``) grow
with corpus file count: at the ~200k-file scale a 100 TB publish
reaches (500 MB files x 200k), the inline encoding is tens-to-hundreds
of MB of JSON decoded per read_latest.  _offload_manifest moves those
sections to a columnar sidecar under the committing version's dir and
leaves an O(1) pointer doc.

Two measurements:

1. SYNTHETIC DRIVER COST at 200k files (no Spark): inline JSON
   encode/decode wall + bytes vs offload write / materialize wall +
   bytes, plus the pruning-loop wall both modes (identical by
   construction — materialization restores the same dicts).  This is
   the per-read metadata tax the offload removes for readers that
   never need per-file detail, and bounds it for those that do.

2. REAL END-TO-END at small scale (Spark, 50k rows): publish + DML +
   selective read wall with the threshold forced to 0 (everything
   offloads) vs default inline — showing the sidecar costs nothing
   measurable when small, so the threshold default is safe.

Usage: python scripts/manifest_offload_ab.py
Prints one JSON line; the round artifact is AB_MANIFEST.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 200_000
SHARDS = 256


def synthetic():
    import v6spark.pipeline as pipeline
    from v6spark.operators.pruning import file_can_match, parse_conjuncts

    files, col_stats, file_stats = [], {}, {}
    for i in range(N_FILES):
        rel = (
            f"v=000001-abcd1234/split=train/shard={i % SHARDS}/"
            f"part-{i:06d}-0123456789abcdef.c000.snappy.parquet"
        )
        files.append(rel)
        day_lo = i // 100  # ingestion-correlated: tight per-file ranges
        col_stats[rel] = {
            "day": [day_lo, day_lo + 1, 0],
            "text": [f"body {i:07d}", f"body {i + 99:07d}", 3],
            "score": [i * 0.5, i * 0.5 + 50.0, 0],
        }
        file_stats[rel] = [i * 10, i * 10 + 9, 1000]
    payload = {
        "live": ["v=000001-abcd1234"],
        "fmt": "parquet",
        "splits": {"train": N_FILES * 1000},
        "files": {"train": files},
        "col_stats": {"train": col_stats},
        "file_stats": {"train": file_stats},
    }

    t0 = time.perf_counter()
    raw = json.dumps(payload, sort_keys=True).encode()
    t_encode = time.perf_counter() - t0
    t0 = time.perf_counter()
    decoded = json.loads(raw)
    t_decode = time.perf_counter() - t0
    inline_bytes = len(raw)

    conj = parse_conjuncts("day >= 100 AND day < 120")

    def prune(doc):
        cs = doc["col_stats"]["train"]
        return [
            rel for rel in doc["files"]["train"]
            if file_can_match(conj, cs.get(rel))
        ]

    t0 = time.perf_counter()
    kept_inline = prune(decoded)
    t_prune = time.perf_counter() - t0

    root = "/tmp/v6spark_manifest_ab"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    prev = pipeline._MANIFEST_INLINE_MAX
    pipeline._MANIFEST_INLINE_MAX = 0
    try:
        t0 = time.perf_counter()
        slim = pipeline._offload_manifest(
            None, root, "v=000001-abcd1234", dict(payload)
        )
        t_offload = time.perf_counter() - t0
    finally:
        pipeline._MANIFEST_INLINE_MAX = prev
    slim_bytes = len(json.dumps(slim, sort_keys=True).encode())
    sidecar_dir = os.path.join(root, slim["manifest_ref"]["dir"])
    sidecar_bytes = sum(
        os.path.getsize(os.path.join(sidecar_dir, f))
        for f in os.listdir(sidecar_dir)
    )
    t0 = time.perf_counter()
    mat = pipeline._materialize_manifest(None, root, dict(slim))
    t_materialize = time.perf_counter() - t0
    t0 = time.perf_counter()
    kept_off = prune(mat)
    t_prune_off = time.perf_counter() - t0
    assert kept_off == kept_inline
    assert mat["col_stats"] == payload["col_stats"]
    shutil.rmtree(root, ignore_errors=True)
    return {
        "n_files": N_FILES,
        "inline_doc_mb": round(inline_bytes / 1e6, 2),
        "offloaded_doc_bytes": slim_bytes,
        "sidecar_mb": round(sidecar_bytes / 1e6, 2),
        "sec_json_encode": round(t_encode, 3),
        "sec_json_decode_per_read": round(t_decode, 3),
        "sec_offload_write": round(t_offload, 3),
        "sec_materialize": round(t_materialize, 3),
        "sec_prune_200k_files": round(t_prune, 3),
        "sec_prune_200k_files_offloaded": round(t_prune_off, 3),
        "files_kept_by_prune": len(kept_inline),
    }


def real(spark):
    import v6spark.pipeline as pipeline
    from v6spark.pipeline import (
        publish_corpus_committed,
        read_published_where,
        upsert_into_published,
    )
    from pyspark.sql import functions as F

    base = "/tmp/v6spark_manifest_ab_real"
    shutil.rmtree(base, ignore_errors=True)
    out = {}
    # first pass warms the JVM (codegen, shuffle services); only the
    # second pass per mode is recorded — without this, whichever mode
    # runs first eats the warm-up and the comparison is noise
    for pass_no in (0, 1):
        for mode, thresh in (("inline", 4096), ("offloaded", 0)):
            _run_mode(spark, base, mode, thresh, pass_no, out)
    shutil.rmtree(base, ignore_errors=True)
    return out


def _run_mode(spark, base, mode, thresh, pass_no, out):
    import v6spark.pipeline as pipeline
    from v6spark.pipeline import (
        publish_corpus_committed,
        read_published_where,
        upsert_into_published,
    )
    from pyspark.sql import functions as F

    if True:
        root = f"{base}/{mode}-{pass_no}"
        docs = spark.range(50_000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 500).alias("day"),
            F.concat(F.lit("body "), F.col("id")).alias("text"),
        )
        prepared = docs.select("doc_id", F.lit("train").alias("split"))
        prev = pipeline._MANIFEST_INLINE_MAX
        pipeline._MANIFEST_INLINE_MAX = thresh
        try:
            t0 = time.perf_counter()
            publish_corpus_committed(
                prepared, docs, root, n_shards=32,
            )
            t_pub = time.perf_counter() - t0
            delta = spark.range(50_000, 51_000).select(
                F.col("id").alias("doc_id"),
                F.lit(999).alias("day"),
                F.concat(F.lit("late "), F.col("id")).alias("text"),
                F.lit("train").alias("split"),
            )
            t0 = time.perf_counter()
            upsert_into_published(spark, root, delta, key_col="doc_id")
            t_dml = time.perf_counter() - t0
            t0 = time.perf_counter()
            n = read_published_where(spark, root, "day = 999").count()
            t_read = time.perf_counter() - t0
        finally:
            pipeline._MANIFEST_INLINE_MAX = prev
        assert n == 1000, n
        if pass_no == 1:
            out[mode] = {
                "sec_publish": round(t_pub, 2),
                "sec_upsert": round(t_dml, 2),
                "sec_selective_read": round(t_read, 2),
            }


def main():
    syn = synthetic()
    from v6spark.session import get_spark

    spark = get_spark("manifest-ab", cpus=8)
    try:
        r = real(spark)
    finally:
        spark.stop()
    print(json.dumps({
        "metric": "manifest_offload_ab",
        "synthetic_200k_files": syn,
        "real_50k_rows": r,
        "note": (
            "synthetic: per-read driver cost of corpus-sized manifest "
            "sections at 200k files — the inline doc is decoded on "
            "EVERY committed read, while the offloaded doc is O(1) and "
            "the sidecar loads only for readers needing per-file "
            "detail (pruning, census, DML candidate selection, "
            "vacuum).  real: forcing offload at small scale costs "
            "nothing measurable, so the 4096-entry default threshold "
            "only ever removes work.  Pruning decisions are identical "
            "in both modes by construction (asserted)."
        ),
    }))


if __name__ == "__main__":
    main()
