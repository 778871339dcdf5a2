#!/usr/bin/env python
"""Committed-IVF ingest stress: build 100k vectors, 10 crash-safe
appends of 10k, query-latency trajectory across generations, compact,
vacuum — exact census asserted at every stage and full-probe parity
vs brute force at the end.

What this pins at scale: the generation layout's read cost grows with
the LIVE GENERATION COUNT (more directories listed per query), not
with data volume — and compact() folds it back to one.  Vectors are
Spark-generated (hash-derived components, deterministic), dim 64.

Usage: python scripts/ivf_scale_stress.py
Writes STRESS_IVF.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v6spark.session import get_spark
from v6spark.sources import ivf_index as ivf

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "STRESS_IVF.json",
)
DIM = 64
N_BASE = 100_000
N_APPEND = 10_000
N_APPENDS = 10
N_CELLS = 32


def vectors(spark, lo: int, n: int):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)).cast("double")
                / 500.0
                - 1.0
            ),
        ).alias("embedding"),
    )


def timed_query(spark, path, q, n_probe=4):
    t0 = time.perf_counter()
    rows = ivf.ivf_index_topk_committed(
        spark, path, q, k=10, n_probe=n_probe
    ).collect()
    return time.perf_counter() - t0, rows


def main() -> None:
    spark = get_spark(
        "ivf-stress", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = "/tmp/v6spark_ivf_stress"
    shutil.rmtree(path, ignore_errors=True)

    q = [((h * 37 + 11) % 1000) / 500.0 - 1.0 for h in range(DIM)]

    t0 = time.time()
    ivf.build_ivf_index_committed(
        vectors(spark, 0, N_BASE), path, n_cells=N_CELLS, sample_fraction=0.1
    )
    build_sec = round(time.time() - t0, 2)
    timed_query(spark, path, q)  # warm codegen before the trajectory

    walls = []
    t0 = time.time()
    for i in range(N_APPENDS):
        ivf.append_to_ivf_index_committed(
            vectors(spark, N_BASE + i * N_APPEND, N_APPEND), path,
            append_id=i + 1,
        )
        w, _ = timed_query(spark, path, q)
        walls.append(round(w, 3))
    append_sec = round(time.time() - t0, 2)

    index, _ = ivf.load_ivf_index_committed(spark, path)
    total = N_BASE + N_APPENDS * N_APPEND
    assert index.count() == total, "census after appends"

    w_pre, rows_pre = timed_query(spark, path, q, n_probe=N_CELLS)
    t0 = time.time()
    assert ivf.compact_ivf_index(spark, path) is not None
    compact_sec = round(time.time() - t0, 2)
    removed = ivf.vacuum_ivf_index(spark, path)
    assert removed == N_APPENDS + 1, removed
    index, _ = ivf.load_ivf_index_committed(spark, path)
    assert index.count() == total, "census after compact+vacuum"
    w_post, rows_post = timed_query(spark, path, q, n_probe=N_CELLS)
    assert [r["vec_id"] for r in rows_pre] == [r["vec_id"] for r in rows_post]

    # full-probe parity vs brute force over all vectors
    from v6spark.operators.similarity import cosine_topk_query

    brute = cosine_topk_query(vectors(spark, 0, total), q, 10).collect()
    _, full = timed_query(spark, path, q, n_probe=N_CELLS)
    assert [r["vec_id"] for r in full] == [r["vec_id"] for r in brute], (
        "full-probe != brute force"
    )

    doc = {
        "vectors_total": total,
        "dim": DIM,
        "n_cells": N_CELLS,
        "build_sec_100k": build_sec,
        "appends": N_APPENDS,
        "append_batch": N_APPEND,
        "appends_total_sec": append_sec,
        "query_wall_per_generation": walls,
        "query_wall_11gens_full_probe": round(w_pre, 3),
        "compact_sec": compact_sec,
        "vacuumed_dirs": removed,
        "query_wall_post_compact_full_probe": round(w_post, 3),
        "exactness": (
            "census asserted after appends and after compact+vacuum; "
            "full-probe top-10 == brute force over all 200k"
        ),
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(doc, indent=1))
    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
