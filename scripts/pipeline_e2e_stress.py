#!/usr/bin/env python
"""End-to-end pipeline stress with CLOSED-FORM censuses at >=50x.

Composes every r5/r6 stage on a PLANTED corpus whose structure makes
each stage's effect exactly countable:

    prepare_training_corpus(span_dedup, near_dedup, gopher_rules,
                            repetition_gate, bpe_merges)
        -> publish_corpus_committed(sketch_specs)   (ACID, registers)
        -> retract_from_published                   (file-level DELETE)
        -> published_corpus_diff                    (per-doc census)

Planted structure per copy (the corpus scales by textually-permuted
copies, so cross-copy docs are never near-dups — density-preserving):

- A = 2000 unique good docs; 1000 of them carry a 40-token boilerplate
  span shared ONLY by them (span dedup must flag exactly those and
  remove exactly 40 tokens each);
- B = 500 near-dup PAIRS (1000 docs, ~0.93 shingle-Jaccard within a
  pair) carrying an invariant marker token — near-dedup must keep
  exactly one per pair;
- C = 300 gopher-fail docs (16-char nonsense words: mean-word-length
  and stopword rules both fail);
- D = 200 repetition-fail docs (30 identical lines each).

Expected survivors per copy: A + B/2 = 2500.  Retraction predicate
hits the marker token: exactly 500 per copy.  Every census is asserted
EXACTLY at both scales; the artifact records walls + ratios.

Usage: python scripts/pipeline_e2e_stress.py [factor]  (default 50)
Prints one JSON line (STRESS_PIPELINE.json's refresh).
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

from v6spark.operators.spandedup import remove_hot_spans
from v6spark.pipeline import (
    prepare_training_corpus,
    publish_corpus_committed,
    published_corpus_diff,
    read_published_corpus,
    read_published_sketch,
    retract_from_published,
)
from v6spark.session import get_spark

SHIFT = 1_000_000_000
# letters 'etaon' are permuted per copy; the marker avoids them all
MARKER = "zqzmrkzq"
BOILER = (
    "the terms of service for this site remain the sole property of "
    "the operating company and any reuse of the published material "
    "requires the prior written consent of the owner in every case "
    "and the policy applies to all visitors"
)  # exactly 40 whitespace tokens (asserted below)
assert len(BOILER.split()) == 40, len(BOILER.split())
A_N, B_PAIRS, C_N, D_N = 2000, 500, 300, 200
BOILER_DOCS = 1000


def _words(doc_id: int, n: int, salt: int) -> str:
    """n distinct pseudo-random words; salt mixes in the copy index so
    the SAME doc slot in two copies shares no content words (cross-copy
    docs must never be near-dups — density-preserving scaling).  The
    word alphabet avoids digits so per-word shape stays constant."""
    out = []
    for k in range(n):
        v = (doc_id * 1_000_003 + k * 8191 + salt * 999_983_111) % (26 ** 6)
        w = []
        for _ in range(6):
            w.append(chr(ord("a") + v % 26))
            v //= 26
        out.append("".join(w))
    return " ".join(out)


def build_corpus(spark, out_path: str, factor: int):
    """All copies generated directly with a per-copy word salt.

    (An earlier letter-permutation scaling broke the censuses: the
    permutation alphabet missed the synthetic words, so copies were
    cross-copy near-dups, and it destroyed stopwords, so gopher failed
    good docs in non-identity copies.  Per-copy salted generation keeps
    every planted property exact at every factor.)
    """
    rows = []
    for c in range(factor):
        off = c * SHIFT
        for i in range(A_N):
            body = (
                f"the data of {_words(i, 40, c * 7 + 1)} is item{c}x{i}"
            )
            if i < BOILER_DOCS:
                body = body + " " + BOILER
            rows.append((off + i, body))
        for p in range(B_PAIRS):
            base = (
                f"the note for {MARKER} "
                f"{_words(10_000 + p, 40, c * 11 + 3)} is kept"
            )
            rows.append((off + 2000 + p, base))
            rows.append((off + 2500 + p, base + " plus extra trailing remark"))
        for i in range(C_N):
            w = f"qqqqqqqqqq{c:03d}{i:03d}"  # 16 chars, copy+doc unique
            rows.append((off + 3000 + i, " ".join([w] * 12)))
        for i in range(D_N):
            rows.append(
                (off + 3300 + i,
                 f"this line {c}x{i} repeats again and here\n" * 30)
            )
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(out_path)
    )


def run_scale(spark, docs, f: int, work_dir: str) -> dict:
    res: dict = {"factor": f}
    n_docs = docs.count()
    assert n_docs == 3500 * f, (n_docs, f)
    res["n_docs"] = n_docs

    # --- span census (standalone, closed-form exact) ---
    t0 = time.perf_counter()
    spans = remove_hot_spans(docs, n=8, min_docs=5)
    flagged, removed = spans.agg(
        F.sum(F.when(F.col("n_tokens_removed") > 0, 1).otherwise(0)),
        F.sum("n_tokens_removed"),
    ).collect()[0]
    res["span_sec"] = round(time.perf_counter() - t0, 2)
    assert flagged == BOILER_DOCS * f, (flagged, BOILER_DOCS * f)
    assert removed == 40 * BOILER_DOCS * f, (removed, 40 * BOILER_DOCS * f)
    res["span_flagged"] = flagged
    res["span_tokens_removed"] = removed

    # --- BPE merges from a fixed-size sample (tokenizer side input) ---
    from v6spark.operators.bpe import train_bpe

    t0 = time.perf_counter()
    merges = train_bpe(docs.limit(500), vocab_size=306)
    res["bpe_train_sec"] = round(time.perf_counter() - t0, 2)

    # --- the full composed pipeline ---
    t0 = time.perf_counter()
    survivors = prepare_training_corpus(
        docs,
        span_dedup=True,
        near_dedup=True,
        gopher_rules=True,
        repetition_gate=True,
        bpe_merges=merges,
        max_tokens=512,
    ).localCheckpoint(eager=True)
    n_surv = survivors.count()
    res["pipeline_sec"] = round(time.perf_counter() - t0, 2)
    assert n_surv == 2500 * f, (n_surv, 2500 * f)
    res["survivors"] = n_surv
    # keeper multiplicities: B keepers carry dup_count=2, A dup_count=1
    dc = {
        r["dup_count"]: r["n"]
        for r in survivors.groupBy("dup_count")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert dc.get(1, 0) == A_N * f and dc.get(2, 0) == B_PAIRS * f, dc

    # --- ACID publish with transactional sketches ---
    root = f"{work_dir}/corpus"
    t0 = time.perf_counter()
    pub = publish_corpus_committed(
        survivors,
        docs,
        root,
        n_shards=32,
        sketch_specs={
            "distinct_docs": {"kind": "hll", "expr": "doc_id"},
            "text_len": {"kind": "dds", "expr": "length(text)"},
        },
    )
    res["publish_sec"] = round(time.perf_counter() - t0, 2)
    assert sum(v for k, v in pub.items() if k != "_version") == 2500 * f
    regs, spec = read_published_sketch(spark, root, "distinct_docs")
    from v6spark.operators import sketches as _sk

    est = _sk.hll_estimate(regs, p=spec["p"]).collect()[0][0]
    assert abs(est - 2500 * f) / (2500 * f) < 0.05, est
    res["hll_estimate"] = round(float(est), 1)

    # --- file-level retraction of exactly the B keepers ---
    t0 = time.perf_counter()
    ret = retract_from_published(spark, root, f"text LIKE '%{MARKER}%'")
    res["retract_sec"] = round(time.perf_counter() - t0, 2)
    assert ret["rows_removed"] == B_PAIRS * f, ret
    res["rows_removed"] = ret["rows_removed"]
    res["files_rewritten"] = ret["files_rewritten"]
    res["files_kept"] = ret["files_kept"]
    assert read_published_corpus(spark, root).count() == 2000 * f

    # --- release census between the two committed versions ---
    t0 = time.perf_counter()
    diff = published_corpus_diff(spark, root, 1, 2)
    counts = {
        r["status"]: r["n"]
        for r in diff.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    res["diff_sec"] = round(time.perf_counter() - t0, 2)
    assert counts.get("removed", 0) == B_PAIRS * f, counts
    assert counts.get("added", 0) == 0 and counts.get("changed", 0) == 0, counts
    res["diff_counts"] = counts
    return res


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    spark = get_spark(
        "pipeline-e2e", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="v6spark_e2e_")
    try:
        p1 = f"{tmp}/docs_1x.parquet"
        pf = f"{tmp}/docs_{factor}x.parquet"
        build_corpus(spark, p1, 1)
        build_corpus(spark, pf, factor)

        # warmup absorbs one-off JVM codegen
        spark.read.parquet(p1).count()

        r1 = run_scale(spark, spark.read.parquet(p1), 1, f"{tmp}/w1")
        rf = run_scale(spark, spark.read.parquet(pf), factor, f"{tmp}/wf")
        stages = [
            "span_sec", "pipeline_sec", "publish_sec", "retract_sec",
            "diff_sec",
        ]
        total1 = sum(r1[s] for s in stages)
        totalf = sum(rf[s] for s in stages)
        out = {
            "factor": factor,
            "stages_1x": {s: r1[s] for s in stages},
            "stages_scaled": {s: rf[s] for s in stages},
            "wall_1x": round(total1, 2),
            "wall_scaled": round(totalf, 2),
            "wall_ratio": round(totalf / total1, 2),
            "censuses": {
                "survivors": rf["survivors"],
                "span_flagged": rf["span_flagged"],
                "span_tokens_removed": rf["span_tokens_removed"],
                "rows_removed": rf["rows_removed"],
                "files_rewritten": rf["files_rewritten"],
                "diff_counts": rf["diff_counts"],
                "hll_estimate": rf["hll_estimate"],
            },
            "exactness": (
                "every census closed-form exact at BOTH scales: survivors "
                "2500/copy (near-dup pairs collapse, gopher+repetition "
                "planted failures drop), span dedup flags exactly the "
                "boilerplate carriers and removes exactly 40 tokens each, "
                "retraction removes exactly the marker keepers, diff "
                "reports removed-only"
            ),
            "protocol": "one un-timed read warmup; composed stages timed "
                        "individually; ACID publish includes register "
                        "sketches in the same commit",
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
