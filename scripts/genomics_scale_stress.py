#!/usr/bin/env python
"""Genomics-facade scale stress (VERDICT r4 #8): the §2.1 reference
pipeline — load -> remove_low_call_rate_vars -> filter_by_maf ->
filter_samples -> compute() — at 1x/10x/50x synthetic cohorts with
PLANTED structure, so every kept/filtered count has an exact
closed-form expectation, asserted (not eyeballed) at each scale.

Planted bands by variant index v (V divisible by 10, S even):
- v % 10 == 0: low-call-rate — only S/10 samples called (rate 0.1)
  -> dropped by remove_low_call_rate_vars(min_call_rate=0.5);
- v % 10 == 1: fixed — every genotype [0,0] (major-allele freq 1.0)
  -> dropped by filter_by_maf(max_allowable_maf=0.95);
- otherwise: fully called, gt [0,1] for the first S/2 samples and
  [0,0] for the rest (maf 0.75) -> kept by both.

So kept after the chain is exactly 0.8*V, and after
filter_samples(first S/2) the calls relation is exactly 0.8*V * S/2
rows.  Everything is generated with Spark expressions over
``spark.range`` cross joins — no driver-side row lists — so the
generator itself scales.

Usage: python scripts/genomics_scale_stress.py
Writes STRESS_GENOMICS.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v6spark import genomics as g
from v6spark.compute import compute
from v6spark.genomics import FLT_VARS, N_FILTERED_OUT, N_KEPT, Variations
from v6spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "STRESS_GENOMICS.json",
)


def synth(spark, n_variants: int, n_samples: int) -> Variations:
    assert n_variants % 10 == 0 and n_samples % 2 == 0
    variants = spark.range(n_variants).select(
        F.concat_ws(":", F.lit("chr1"), F.col("id"), F.lit("A"), F.lit("T"))
        .alias("variant_id"),
        F.lit("chr1").alias("chrom"),
        F.col("id").alias("pos"),
        F.lit(None).cast("string").alias("vcf_id"),
        F.lit("A").alias("ref"),
        F.array(F.lit("T")).alias("alt"),
        F.lit(50.0).alias("qual"),
        F.lit("PASS").alias("filter"),
    )
    v = spark.range(n_variants).withColumnRenamed("id", "v")
    s = spark.range(n_samples).withColumnRenamed("id", "s")
    band = F.col("v") % 10
    missing = (band == 0) & (F.col("s") >= n_samples // 10)
    het = (band > 1) & (F.col("s") < n_samples // 2)
    gt = (
        F.when(missing, F.array(F.lit(None).cast("int"), F.lit(None).cast("int")))
        .when(het, F.array(F.lit(0), F.lit(1)))
        .otherwise(F.array(F.lit(0), F.lit(0)))
    )
    calls = v.crossJoin(s).select(
        F.concat_ws(":", F.lit("chr1"), F.col("v"), F.lit("A"), F.lit("T"))
        .alias("variant_id"),
        F.lit("chr1").alias("chrom"),
        F.concat(F.lit("smp"), F.col("s")).alias("sample_id"),
        gt.alias("gt"),
        F.lit(30).alias("dp"),
        F.lit(99).alias("gq"),
    )
    return Variations(variants, calls)


def run(spark, n_variants: int, n_samples: int) -> dict:
    vs = synth(spark, n_variants, n_samples)
    keep_samples = [f"smp{i}" for i in range(n_samples // 2)]
    t0 = time.time()
    r1 = g.remove_low_call_rate_vars(vs, min_call_rate=0.5)
    r2 = g.filter_by_maf(r1[FLT_VARS], max_allowable_maf=0.95)
    vs3 = g.filter_samples(r2[FLT_VARS], keep_samples)
    out = compute(
        {
            "maf": g.calc_maf_by_gt(vs3),
            "call_rate": g.calc_called_gt(vs3),
            "n_calls": vs3.calls.agg(F.count(F.lit(1)).alias("n")),
        }
    )
    wall = time.time() - t0

    exp_low = n_variants // 10  # band 0
    exp_fixed = n_variants // 10  # band 1
    exp_kept = n_variants - exp_low - exp_fixed
    assert r1[N_FILTERED_OUT] == exp_low, (r1[N_FILTERED_OUT], exp_low)
    assert r1[N_KEPT] == n_variants - exp_low
    assert r2[N_FILTERED_OUT] == exp_fixed, (r2[N_FILTERED_OUT], exp_fixed)
    assert r2[N_KEPT] == exp_kept
    n_calls = out["n_calls"][0]["n"]
    assert n_calls == exp_kept * (n_samples // 2), n_calls
    assert len(out["maf"]) == exp_kept
    # every surviving variant is the het band: maf exactly 0.75 on
    # the kept half-cohort ([0,1] genotypes only -> maf 0.5)
    mafs = {r["maf"] for r in out["maf"]}
    rates = {r["call_rate"] for r in out["call_rate"]}
    assert mafs == {0.5}, mafs
    assert rates == {1.0}, rates
    return {
        "variants": n_variants,
        "samples": n_samples,
        "calls": n_variants * n_samples,
        "kept_variants": r2[N_KEPT],
        "dropped_low_call_rate": r1[N_FILTERED_OUT],
        "dropped_fixed_maf": r2[N_FILTERED_OUT],
        "published_calls": n_calls,
        "wall_sec": round(wall, 2),
    }


def main() -> None:
    spark = get_spark(
        "genomics-stress", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, 100, 20)  # un-timed warmup: one-off JVM codegen
    r1 = run(spark, 2_000, 100)  # 200k calls
    r10 = run(spark, 20_000, 100)  # 2M calls
    r50 = run(spark, 20_000, 500)  # 10M calls
    doc = {
        "scale_1x": r1,
        "scale_10x": r10,
        "scale_50x": r50,
        "wall_ratio_10x_over_1x": round(r10["wall_sec"] / r1["wall_sec"], 2),
        "wall_ratio_50x_over_1x": round(r50["wall_sec"] / r1["wall_sec"], 2),
        "exactness": "all kept/dropped/published counts asserted closed-form",
        "protocol": "one un-timed 100-variant warmup absorbs one-off JVM codegen",
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
