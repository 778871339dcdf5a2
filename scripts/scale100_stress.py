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

# Wall numbers are min-of-REPS: the sandbox host shows intermittent
# multi-second stalls that rove across queries (r12 session 3 measured
# the same tree reading 11.4-17.2 s for q_dedup_minhash at 100x within
# one hour); the minimum over repeated warm runs is the robust
# estimator under one-sided noise, and two reps dodge a stall too
# rarely.
REPS = int(os.environ.get("V6SPARK_SCALE_REPS", "3"))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "STRESS_SCALE100.json",
)

# Plan diffs that are CORRECT adaptive behavior, not scale bugs:
# each entry names the query and the reason the fingerprint may
# legally differ between scales.  Anything not listed here that
# diffs fails all_plans_identical.
EXPLAINED_DIFFS = {
    "q_join_multi": (
        "the pre-aggregated-fact x orders join flips from broadcast "
        "to sort-merge once orders outgrows autoBroadcastJoinThreshold "
        "— orders is a FACT that scales with the corpus, and the "
        "query's own docstring designs for exactly this ('at 100 TB, "
        "where orders no longer broadcasts and that join becomes a "
        "shuffle, the fact side is pre-reduced 4x first'); the "
        "dimension chain customer -> nation -> region stays broadcast "
        "(nation/region are hinted and must never flip)."
    ),
    "q_similarity_ann": (
        "the within-cell candidate self-join (bucketed embeddings on "
        "both sides) flips from broadcast-hash to sort-merge once the "
        "embedding table outgrows autoBroadcastJoinThreshold — both "
        "sides are corpus-sized, so sort-merge is the correct "
        "cluster-scale strategy."
    ),
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

# Super-linear wall ratios that are PROPERTIES OF THE QUERY, not
# engine bugs — recorded next to the measurement so the number reads
# honestly.  EMPTY since round 11: q_similarity_ann, the one entry
# this mechanism was built for, was re-pinned at 14 occupancy-bounded
# hyperplanes (16384 cells), so the judged plan itself is
# now the scale path and its ratio is asserted like everyone else's
# (tests/test_stress_artifacts.py).
RATIO_NOTES: dict[str, str] = {}

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
                # SALT each replica's text with a per-replica letter
                # SUBSTITUTION CIPHER: token count and lengths stay
                # IDENTICAL to the base corpus (so per-doc work is
                # comparable across scales), while every shingle
                # differs between replicas — a 100x-bigger corpus
                # should have the same near-duplicate DENSITY, not
                # 100x-deeper duplicate MULTIPLICITY.  With verbatim
                # copies every document gains 99 exact twins and the
                # near-dup PAIR LIST (the query's answer) grows
                # quadratically, which no engine can make sub-linear.
                # (A tag-injection salt was tried first and rejected:
                # it doubled token counts, silently doubling the
                # per-doc work being measured.)  Boilerplate-cluster
                # defense is a separate axis, stressed by
                # STRESS_DEDUP's max_bucket_size pathological corpus.
                lo = "abcdefghijklmnopqrstuvwxyz"
                coprimes = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
                a, b = coprimes[i % 12], i // 12
                cipher = "".join(
                    lo[(a * idx + b) % 26] for idx in range(26)
                )
                part = part.withColumn(
                    "text", F.translate(F.col("text"), lo, cipher)
                )
            if name == "embeddings" and i > 0:
                # same reasoning in vector space: verbatim replica
                # vectors give every embedding 99 identical twins in
                # the same LSH cell, blowing the bucket self-join up
                # quadratically.  Replicas i>0 get deterministic
                # hash-noise vectors (uniform in [-1, 1), seeded by
                # the already-shifted vec_id) so cell occupancy stays
                # density-comparable while the engine still faces
                # 100x the vectors.
                part = part.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, j) -> "
                        "cast(pmod(xxhash64(vec_id * 64 + j), 2000000)"
                        " as double) / 1000000.0 - 1.0)"
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


def ann_scaled_params(spark, src_dir: str, out_dir: str) -> dict:
    """The ANN scale story, measured.  Since round 11 the judged
    query ITSELF pins the occupancy-bounded 14-plane set (16384
    cells: ~12 vectors/cell at 200k vectors), so the main
    scale100 section now carries the scale-sane ratio directly.  This
    companion section records the judged-pin walls at both scales plus
    the HISTORICAL 6-plane counterfactual (r10: base 1.039 s, 100x
    ratio 811.4 — cell occupancy grew linearly with the corpus, the
    within-cell join quadratically), so the re-pin's effect stays
    legible without re-running a ~14-minute counterfactual query."""
    import time as _time

    from v6spark.operators.similarity import ann_lsh_pairs
    from v6spark.operators.transforms import spread_small_input

    def wall(sf_dir, n_planes):
        emb = spread_small_input(load_table(spark, sf_dir, "embeddings"))
        t0 = _time.perf_counter()
        (
            ann_lsh_pairs(emb, n_planes=n_planes, dim=64, min_cosine=0.2)
            .write.mode("overwrite").format("noop").save()
        )
        return round(_time.perf_counter() - t0, 3)

    base = min(wall(src_dir, 14) for _ in range(REPS))
    scaled = min(wall(out_dir, 14) for _ in range(REPS))
    return {
        "judged_n_planes": 14,
        "wall_base_judged_planes_s": base,
        "wall_100x_judged_planes_s": scaled,
        "ratio": round(scaled / base, 1) if base else None,
        "counterfactual_6planes_r10": {
            "wall_base_s": 1.039,
            "ratio_100x": 811.4,
            "note": (
                "the pre-r11 judged pin, measured in round 10 and "
                "kept for the record: 64 cells made occupancy grow "
                "linearly with the corpus and the within-cell "
                "candidate join quadratically."
            ),
        },
        "note": (
            "the judged query pins 14 hyperplanes (16384 cells) "
            "since round 11 — cell occupancy stays bounded through the "
            "100x corpus, so the judged plan is the scale path; "
            "growing the corpus further scales the parameter, not "
            "the design (ann_lsh_topk takes n_planes as input: "
            "cells x4 per 2 planes), or moves to the partition-"
            "pruned persistent IVF index (sources/ivf_index.py)."
        ),
    }


def _merge_out(key: str, section: dict) -> None:
    try:
        with open(OUT) as fh:
            doc = json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        doc = {}
    doc[key] = section
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "ann_scaled"]
    ann_only = "ann_scaled" in sys.argv[1:]
    factor = int(args[0]) if args else 100
    out_dir = args[1] if len(args) > 1 else "/tmp/v6spark_scale100"
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

    if ann_only:
        section = ann_scaled_params(spark, src_dir, out_dir)
        _merge_out("scale100_ann_scaled_params", section)
        print(json.dumps(section))
        spark.stop()
        return

    # settle: one throwaway pass so neither scale eats cold-start
    time_query(spark, "q_window_running", src_dir)

    section: dict = {"factor": factor, "queries": {}}
    plan_ok = True
    for name in HEAVY:
        base = min(time_query(spark, name, src_dir) for _ in range(REPS))
        scaled = min(time_query(spark, name, out_dir) for _ in range(REPS))
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
        if name in RATIO_NOTES:
            entry["ratio_note"] = RATIO_NOTES[name]
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

    _merge_out("scale100", section)
    _merge_out(
        "scale100_ann_scaled_params",
        ann_scaled_params(spark, src_dir, out_dir),
    )
    print(json.dumps(section))
    spark.stop()


if __name__ == "__main__":
    main()
