#!/usr/bin/env python
"""Substring-dedup scale stress: planted boilerplate at 1x/10x with
EXACT removal censuses asserted, wall measured.

Corpus: Spark-generated docs of ~40 unique tokens each; a planted
20-token boilerplate block is injected into 30% of documents (the
web reality: cookie banners on a third of the crawl).  Expectations
are closed-form: exactly the injected docs are flagged, each loses
exactly the boilerplate token count, clean docs keep byte-identical
text.

Scale shape under test: both shuffles carry (doc_id, pos) ints +
8-byte gram hashes — wall should track the corpus-size growth
sublinearly at these sizes (fixed overheads amortize).

Usage: python scripts/spandedup_scale_stress.py
Writes STRESS_SPANDEDUP.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v6spark.operators.spandedup import remove_hot_spans
from v6spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "STRESS_SPANDEDUP.json",
)

BOILER_TOKENS = 20
UNIQUE_TOKENS = 40
BOILER_FRAC_MOD = 10  # doc_id % 10 < 3 -> 30% carry boilerplate
N = 8


def corpus(spark, n_docs: int):
    uniq = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(UNIQUE_TOKENS - 1)),
            lambda j: F.concat(F.lit("u"), F.col("id"), F.lit("x"), j),
        ),
    )
    boiler = " ".join(f"boiler{k}" for k in range(BOILER_TOKENS))
    half = UNIQUE_TOKENS // 2
    head = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(half - 1)),
            lambda j: F.concat(F.lit("u"), F.col("id"), F.lit("x"), j),
        ),
    )
    tail = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(half), F.lit(UNIQUE_TOKENS - 1)),
            lambda j: F.concat(F.lit("u"), F.col("id"), F.lit("x"), j),
        ),
    )
    injected = F.concat_ws(" ", head, F.lit(boiler), tail)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % BOILER_FRAC_MOD < 3, injected)
        .otherwise(uniq)
        .alias("text"),
    )


def run(spark, n_docs: int) -> dict:
    docs = corpus(spark, n_docs)
    t0 = time.time()
    out = remove_hot_spans(docs, n=N, min_docs=5).persist()
    n_flagged = out.filter(F.col("n_tokens_removed") > 0).count()
    wall = time.time() - t0
    expected_flagged = sum(1 for i in range(n_docs) if i % BOILER_FRAC_MOD < 3)
    assert n_flagged == expected_flagged, (n_flagged, expected_flagged)
    removed = out.agg(F.sum("n_tokens_removed")).collect()[0][0]
    assert removed == expected_flagged * BOILER_TOKENS, removed
    # clean docs byte-identical
    n_dirty_clean = (
        out.filter(F.col("n_tokens_removed") == 0)
        .join(docs.withColumnRenamed("text", "orig"), "doc_id")
        .filter(F.col("text") != F.col("orig"))
        .count()
    )
    assert n_dirty_clean == 0
    out.unpersist()
    return {
        "docs": n_docs,
        "flagged": n_flagged,
        "tokens_removed": int(removed),
        "wall_sec": round(wall, 2),
    }


def main() -> None:
    spark = get_spark(
        "span-stress", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, 1_000)  # un-timed warmup (one-off codegen)
    r1 = run(spark, 20_000)
    r10 = run(spark, 200_000)
    doc = {
        "scale_1x": r1,
        "scale_10x": r10,
        "wall_ratio_10x_over_1x": round(r10["wall_sec"] / r1["wall_sec"], 2),
        "exactness": (
            "flagged-doc and removed-token censuses closed-form exact; "
            "clean docs byte-identical"
        ),
        "protocol": "one un-timed 1k-doc warmup absorbs one-off JVM codegen",
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
