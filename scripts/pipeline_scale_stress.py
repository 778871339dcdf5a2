#!/usr/bin/env python
"""Scale-stress the training-data pipeline tier (documents corpus).

The bench documents table tops out at 5,000 rows (sf0.1); this
replicates it N× with shifted ids and textually distinct variants
(so exact dedup cannot collapse the copies and packing sees real
work), then times the pipeline-tier operators at both scales:

- prepare_training_corpus (quality -> lang -> dedup -> split -> pack)
- bm25_score (single-scan posting pipeline)
- pack_sequences alone (the applyInPandas stage)
- tf_idf (vocabulary-broadcast join)
- repetition_signals (tagged n-gram posting path)
- contamination_report (fixed-size benchmark side, broadcast)
- redact_pii (narrow regexp chain — the linearity control)
- corpus_profile (single-Expand rollup)
- assign_shards (narrow keyed-hash deal)

A healthy result is ~linear or sub-linear wall-clock growth and
unchanged plan shapes.  Usage:
    python scripts/pipeline_scale_stress.py [factor] [out_dir]
Prints one JSON line with per-operator seconds and ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v6spark.operators import contamination, packing, profile, text
from v6spark.pipeline import prepare_training_corpus
from v6spark.session import get_spark
from v6spark.sources.tables import load_table

SHIFT = 1_000_000_000


def build_scaled_docs(spark, src_dir: str, out_path: str, factor: int) -> None:
    """N textually DISTANT copies of the documents corpus.

    Each copy permutes the five most frequent letters (`etaon`) —
    nearly every word changes, so copies are NOT near-dups of each
    other (3-shingle Jaccard across copies ~0) while each copy keeps
    the base corpus's internal duplicate/near-dup structure intact.
    That makes the scaled corpus the density-preserving scale model:
    near-dedup workload (candidate pairs) grows LINEARLY with the
    factor, which is what a bigger real corpus does.  (The earlier
    `" variant{i}"` suffix made all N copies of a doc mutual
    near-dups — cluster sizes growing with the factor, pair workload
    growing quadratically: that pathological shape is
    scripts/dedup_scale_stress.py's job, not this linearity check.)
    """
    from itertools import permutations

    perms = list(permutations("etaon"))
    docs = load_table(spark, src_dir, "documents")
    parts = []
    for i in range(factor):
        perm = "".join(perms[i % len(perms)])
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * SHIFT)).alias("doc_id"),
                F.translate(F.col("text"), "etaon", perm).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(out_path)


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def run_ops(spark, docs, bench) -> dict[str, float]:
    dt = text.token_counts(docs).select(
        "doc_id", F.col("ws_tokens").cast("long").alias("n_tokens")
    )
    ops = {
        "pipeline": lambda: _noop(prepare_training_corpus(docs, max_tokens=512)),
        # the near-dedup upgrade (VERDICT r3 item 5): exact collapse ->
        # representative-only MinHash-LSH (guarded) -> verified pairs ->
        # keeper clustering, inside the same end-to-end plan
        "pipeline_neardedup": lambda: _noop(
            prepare_training_corpus(docs, max_tokens=512, near_dedup=True)
        ),
        "bm25": lambda: _noop(text.bm25_score(docs, ["the", "data", "model"])),
        "pack": lambda: _noop(packing.pack_sequences(dt, 512)),
        "tf_idf": lambda: _noop(text.tf_idf(docs, top_terms_per_doc=5)),
        "repetition": lambda: _noop(text.repetition_signals(docs)),
        "contamination": lambda: _noop(
            contamination.contamination_report(docs, bench, n=8)
        ),
        "pii": lambda: _noop(text.redact_pii(docs)),
        "corpus_profile": lambda: _noop(profile.corpus_profile(docs)),
        "shards": lambda: _noop(packing.assign_shards(docs, "doc_id", 64)),
    }
    out = {}
    for name, fn in ops.items():
        times = []
        for _ in range(3):
            spark.catalog.clearCache()  # each run pays its own persists
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        out[name] = round(min(times), 3)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v6spark_docs_scaled"
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = f"{out_dir}/documents.parquet"
    spark = get_spark(
        "pipeline-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(out_path):
        print(f"[scale] building {factor}x documents at {out_path}", file=sys.stderr)
        build_scaled_docs(spark, src_dir, out_path, factor)

    base_docs = load_table(spark, src_dir, "documents")
    scaled_docs = spark.read.parquet(out_path)
    n_base, n_scaled = base_docs.count(), scaled_docs.count()

    # Benchmark side stays FIXED across scales (eval suites don't grow
    # with the corpus) — contamination should scale in the corpus side.
    bench = base_docs.filter(F.col("doc_id") % 50 == 0).select("text")

    base = run_ops(spark, base_docs, bench)
    scaled = run_ops(spark, scaled_docs, bench)
    ratios = {
        k: (round(scaled[k] / base[k], 2) if base[k] else None) for k in base
    }
    # per-document throughput: the honest linearity signal when the
    # base numbers are fixed-cost dominated (a 5k-doc run is mostly
    # job-launch/persist overhead — its wall-clock ratio then
    # OVERSTATES growth even when per-doc cost fell 10x)
    ms_per_doc = {
        k: {
            "base": round(base[k] * 1000 / n_base, 4),
            "scaled": round(scaled[k] * 1000 / n_scaled, 4),
        }
        for k in base
    }

    # guard-drop census for the near-dedup stage at scale: how many
    # would-be candidate pairs the max_bucket_size guard refuses — the
    # evidence that nothing quadratic runs unguarded (the exact
    # pre-collapse inside near_dup_keepers routes boilerplate around
    # the guard, so the drops are degenerate-bucket noise, not lost
    # recall on representatives)
    from v6spark.operators.dedup import bucket_size_histogram, minhash_buckets

    guard = 64  # near_dup_keepers' default max_bucket_size
    hist = bucket_size_histogram(
        minhash_buckets(scaled_docs), ["bucket"], max_bucket_size=guard
    ).collect()
    admitted = sum(
        r["candidate_pairs"] for r in hist if not r["over_guard"]
    )
    dropped = sum(r["candidate_pairs"] for r in hist if r["over_guard"])
    census = {
        "guard": guard,
        "admitted_pairs": admitted,
        "dropped_pairs": dropped,
    }
    print(
        f"[scale] near-dedup guard census at {factor}x: "
        f"{admitted} admitted / {dropped} dropped candidate pairs",
        file=sys.stderr,
    )
    for k in base:
        print(
            f"[scale] {k}: {base[k]}s ({n_base} docs) -> "
            f"{scaled[k]}s ({n_scaled} docs, {ratios[k]}x wall at {factor}x data)",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "factor": factor,
                "n_base": n_base,
                "n_scaled": n_scaled,
                "base": base,
                "scaled": scaled,
                "ratio": ratios,
                "ms_per_doc": ms_per_doc,
                "neardedup_guard_census": census,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
