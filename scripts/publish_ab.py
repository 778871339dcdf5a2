#!/usr/bin/env python
"""ACID-publish overhead A/B: publish_corpus vs publish_corpus_committed.

The committed path buys crash-atomicity (partial publishes invisible,
version-pinned reads) for the price of one version-directory level and
one manifest write per publish.  This measures that price on a
200k-doc synthetic corpus (Spark-generated, ~230-byte bodies, three
splits) at parquet fmt / 32 shards: identical shard writes, so any
delta is the commit machinery.

Usage: python scripts/publish_ab.py
Prints one JSON line; the round artifact is AB_PUBLISH.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v6spark.pipeline import (
    publish_corpus,
    publish_corpus_committed,
    read_published_corpus,
)
from v6spark.session import get_spark

N_DOCS = 200_000
REPS = 3


def corpus(spark):
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document body "),
            F.col("id"),
            F.lit(" "),
            F.repeat(F.concat(F.lit("tok"), (F.col("id") % 97)), 30),
        ).alias("text"),
    )
    prepared = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 100 < 98, "train")
        .when(F.col("doc_id") % 100 == 98, "valid")
        .otherwise("test")
        .alias("split"),
    )
    return prepared, docs


def main() -> None:
    spark = get_spark(
        "publish-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    prepared, content = corpus(spark)
    prepared.persist().count()
    content.persist().count()

    plain_times, committed_times = [], []
    base = "/tmp/v6spark_publish_ab"
    for i in range(REPS + 1):  # rep 0 is the untimed warmup
        for d in ("plain", "committed"):
            shutil.rmtree(f"{base}/{d}", ignore_errors=True)
        t0 = time.perf_counter()
        publish_corpus(prepared, content, f"{base}/plain", n_shards=32)
        t_plain = time.perf_counter() - t0
        t0 = time.perf_counter()
        publish_corpus_committed(
            prepared, content, f"{base}/committed", n_shards=32
        )
        t_comm = time.perf_counter() - t0
        if i:
            plain_times.append(t_plain)
            committed_times.append(t_comm)
        print(
            f"[ab] rep{i}: plain={t_plain:.2f}s committed={t_comm:.2f}s",
            file=sys.stderr,
        )

    n = read_published_corpus(spark, f"{base}/committed").count()
    assert n == N_DOCS, n
    p = round(statistics.median(plain_times), 3)
    c = round(statistics.median(committed_times), 3)
    out = {
        "metric": "acid_publish_overhead",
        "n_docs": N_DOCS,
        "splits": 3,
        "n_shards": 32,
        "sec_plain": p,
        "sec_committed": c,
        "overhead_frac": round((c - p) / p, 4),
        "reps": REPS,
        "committed_readback_rows": n,
        "note": (
            "identical shard writes; delta = version dir + manifest "
            "commit + per-file key min/max stats AND per-column "
            "min/max/null-count stats (both from pyarrow footer "
            "metadata, no Spark job) + committed-file listing "
            "(os.walk local fast path).  Crash-atomicity, "
            "version-pinned reads, manifest-only DML candidate "
            "pruning, and read_published_where data skipping for "
            "this price.  key_bloom=False here; the Bloom-index "
            "build cost is measured separately in AB_KEYBLOOM."
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
