#!/usr/bin/env python
"""100x scale evidence for the judged suite (STRESS_SCALE100.json).

The bench corpus (sf0.1) is fixed-overhead-dominated: warm p50 is
~0.3 s, so the judged plans had never been exercised where DATA
dominates.  This script replicates the fact tables 100-fold
(key-shifted: ~60M lineitem, 10M events, 500k documents, 200k
embeddings — dimension tables stay 1x, as dimensions do) and, for the
ten heaviest judged queries, records:

- wall seconds at sf0.1 and at 100x (warm, min of 2 runs, results
  sunk to the noop format — no driver collect in the timed region);
- the wall RATIO — sub-linear (< 100, in practice < ~40 on 32 cores)
  means fixed overhead amortized away and the plan parallelized
  instead of hitting a cliff;
- PLAN IDENTITY: the PLAN_LOCK fingerprint (shuffle / join-strategy /
  Python-eval node counts) re-derived at 100x and diffed against the
  sf0.1 fingerprint.  Broadcasts must stay broadcast (the dims did
  not grow), aggregates stay two-phase, no Python eval node appears.
  A fingerprint diff is recorded verbatim — an AQE-coalesce count
  changing is explainable; a BroadcastHashJoin degrading to
  SortMergeJoin is a scale bug.

Replica document text is SALTED (every inter-word gap gains a
replica tag): a bigger corpus should keep the same near-duplicate
density, not gain 100-member exact-twin groups — verbatim copies
would grow the near-dup PAIR LIST (the query's answer) quadratically,
which no engine can make sub-linear.  The boilerplate-cluster axis is
stressed separately (STRESS_DEDUP's max_bucket_size corpus).

Usage: python scripts/scale100_stress.py [factor] [out_dir]
Writes STRESS_SCALE100.json (read-modify-write; preserves foreign
sections per the shared-artifact protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gen_plan_lock import explain_formatted, fingerprint  # noqa: E402
from v6spark.plans import REGISTRY
from v6spark.session import get_spark
from v6spark.sources.tables import TABLE_NAMES, load_table

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "STRESS_SCALE100.json",
)

# Plan diffs that are CORRECT adaptive behavior, not scale bugs:
# each entry names the query and the reason the fingerprint may
# legally differ between scales.  Anything not listed here that
# diffs fails all_plans_identical.
EXPLAINED_DIFFS = {
    "q_dedup_minhash": (
        "the candidate-pair enrichment joins (pairs x signatures) "
        "flip from broadcast-hash to sort-merge once documents "
        "outgrow autoBroadcastJoinThreshold — BOTH join sides scale "
        "with the corpus, so sort-merge is the correct cluster-scale "
        "strategy and the sf0.1 broadcast is Catalyst's small-input "
        "opportunism; the dimension-style broadcasts the suite pins "
        "(q_join_multi's dims) must NOT flip, and don't."
    ),
}

# the ten heaviest judged queries by BENCH warm wall
HEAVY = [
    "q_measure_stats",
    "q_join_multi",
    "q_dedup_minhash",
    "q_similarity_ann",
    "q_dedup_simhash",
    "q_math_funcs",
    "q_region_range_join",
    "q_text_quality",
    "q_event_tumbling",
    "q_window_running",
]

KEY_SHIFT = 1_000_000_000  # far above any real key

# (table, key column to shift) — facts replicate, dims stay 1x
FACTS = [
    ("lineitem", "l_orderkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]


def build_scaled(spark, src_dir: str, out_dir: str, factor: int) -> None:
    for name, key in FACTS:
        base = load_table(spark, src_dir, name)
        for derived in ("ts_ns", "ts_us"):
            if derived in base.columns:
                base = base.drop(derived)
        scaled = None
        for i in range(factor):
            part = base.withColumn(key, F.col(key) + F.lit(i * KEY_SHIFT))
            if name == "documents":
                # SALT each replica's text (every inter-word gap gains
                # a replica tag, so every shingle differs between
                # replicas): a 100x-bigger corpus should have the same
                # near-duplicate DENSITY, not 100x-deeper duplicate
                # MULTIPLICITY — with verbatim copies every document
                # gains 99 exact twins and the near-dup PAIR LIST (the
                # query's answer) grows quadratically, which no engine
                # can make sub-linear.  Boilerplate-cluster defense is
                # a separate axis, stressed by STRESS_DEDUP's
                # max_bucket_size pathological corpus.
                part = part.withColumn(
                    "text",
                    F.regexp_replace(
                        F.col("text"), " ", f" r{i} "
                    ),
                )
            scaled = part if scaled is None else scaled.unionByName(part)
        scaled.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"[scale100] wrote {name} x{factor}", file=sys.stderr)
    fact_names = {n for n, _k in FACTS}
    for name in TABLE_NAMES:
        if name in fact_names:
            continue
        df = load_table(spark, src_dir, name)
        for derived in ("ts_ns", "ts_us"):
            if derived in df.columns:
                df = df.drop(derived)
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def time_query(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    REGISTRY[name].spark_fn(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v6spark_scale100"
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "scale100", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{out_dir}/embeddings.parquet"):
        print(f"[scale100] building {factor}x corpus at {out_dir}",
              file=sys.stderr)
        t0 = time.perf_counter()
        build_scaled(spark, src_dir, out_dir, factor)
        print(f"[scale100] build took {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)

    # settle: one throwaway pass so neither scale eats cold-start
    time_query(spark, "q_window_running", src_dir)

    section: dict = {"factor": factor, "queries": {}}
    plan_ok = True
    for name in HEAVY:
        base = min(time_query(spark, name, src_dir) for _ in range(2))
        scaled = min(time_query(spark, name, out_dir) for _ in range(2))
        fp_base = fingerprint(
            explain_formatted(spark, REGISTRY[name].spark_fn(spark, src_dir))
        )
        fp_scaled = fingerprint(
            explain_formatted(spark, REGISTRY[name].spark_fn(spark, out_dir))
        )
        diff = {
            k: [fp_base.get(k, 0), fp_scaled.get(k, 0)]
            for k in sorted(set(fp_base) | set(fp_scaled))
            if fp_base.get(k, 0) != fp_scaled.get(k, 0)
        }
        entry = {
            "wall_base_s": base,
            "wall_100x_s": scaled,
            "ratio": round(scaled / base, 1) if base else None,
            "plan_identical": not diff,
        }
        if diff:
            entry["plan_diff"] = diff
            if name in EXPLAINED_DIFFS:
                entry["diff_explained"] = EXPLAINED_DIFFS[name]
            else:
                plan_ok = False
        # the specific 100 TB hazards, asserted explicitly (a Python
        # eval node or cartesian appearing at scale is never OK; a
        # sort-merge join is OK only under an explained diff)
        for hazard in ("SortMergeJoin", "BatchEvalPython",
                       "ArrowEvalPython", "CartesianProduct"):
            if fp_scaled.get(hazard, 0) > fp_base.get(hazard, 0):
                if hazard == "SortMergeJoin" and name in EXPLAINED_DIFFS:
                    continue
                entry[f"hazard_{hazard}"] = fp_scaled[hazard]
                plan_ok = False
        section["queries"][name] = entry
        print(f"[scale100] {name}: {base}s -> {scaled}s "
              f"({entry['ratio']}x) plan_identical={not diff}",
              file=sys.stderr)
    section["all_plans_identical_or_explained"] = plan_ok
    section["note"] = (
        "walls are warm min-of-2 with results sunk to the noop sink; "
        "ratio is 100x-wall over sf0.1-wall on the same 32 cores — "
        "sub-linear (<<100) means fixed overhead amortized and the "
        "plan parallelized; plan_identical compares PLAN_LOCK "
        "fingerprints (shuffle/join/Python-eval node counts) between "
        "scales, so a broadcast degrading to sort-merge or a Python "
        "node appearing at scale is caught even when the wall looks "
        "fine. Dimension tables stay 1x (broadcast sides must stay "
        "broadcast); fact keys are shifted per replica so joins stay "
        "semantically valid, and replica document text is salted so "
        "near-duplicate DENSITY stays constant (verbatim replication "
        "would grow the near-dup pair list — the query's answer — "
        "quadratically, which no engine can make sub-linear; the "
        "boilerplate-cluster axis is stressed separately by "
        "STRESS_DEDUP's max_bucket_size pathological corpus)."
    )

    try:
        with open(OUT) as fh:
            doc = json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        doc = {}
    doc["scale100"] = section
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps(section))
    spark.stop()


if __name__ == "__main__":
    main()
