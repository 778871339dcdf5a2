"""Golden tests for the Variations facade — the reference's own test
pattern (tiny fixture, hand-computed expectations; SURVEY.md §5.1),
including the reference's composed-pipeline example (§3.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from v6spark import genomics as g
from v6spark.genomics import FLT_VARS, N_FILTERED_OUT, N_KEPT, Variations

VCF_TEXT = """\
##fileformat=VCFv4.2
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2\ts3\ts4
chr1\t100\trs1\tA\tT\t50\tPASS\t.\tGT:DP:GQ\t0/0:10:99\t0/1:20:90\t1/1:30:85\t./.:.:.
chr1\t200\trs2\tG\tC\t90\tPASS\t.\tGT:DP:GQ\t0/0:4:99\t0/0:50:99\t0/0:50:99\t0/0:50:99
chr2\t300\trs3\tC\tG\t10\tPASS\t.\tGT:DP:GQ\t0/1:15:50\t0/1:15:50\t1/1:15:99\t0/0:15:99
chr2\t400\trs4\tT\tA\t99\tPASS\t.\tGT:DP:GQ\t./.:.:.\t./.:.:.\t./.:.:.\t0/1:9:99
"""


@pytest.fixture(scope="module")
def vs(spark, tmp_path_factory) -> Variations:
    p = tmp_path_factory.mktemp("gvcf") / "g.vcf"
    p.write_text(VCF_TEXT)
    return Variations.from_vcf(spark, str(p))


def by_var(df, col):
    return {r["variant_id"]: r[col] for r in df.collect()}


def test_container_surface(vs):
    assert vs.samples == ["s1", "s2", "s3", "s4"]
    assert vs.num_variations == 4
    assert g.GT_FIELD in vs.keys()
    assert vs[g.QUAL_FIELD].columns == ["variant_id", "qual"]
    assert vs[g.GT_FIELD].count() == 16


def test_samples_cardinality_guard(vs, monkeypatch):
    """`samples` materializes the cohort on the driver — bounded by
    domain, and guarded: over-cap cardinality errors instead of
    collecting an arbitrarily large entity list."""
    import pytest

    monkeypatch.setattr(Variations, "MAX_SAMPLES", 3)
    with pytest.raises(ValueError, match="more than 3 distinct sample ids"):
        _ = vs.samples
    monkeypatch.setattr(Variations, "MAX_SAMPLES", 4)
    assert vs.samples == ["s1", "s2", "s3", "s4"]


def test_calc_missing_and_called(vs):
    miss = by_var(g.calc_missing_gt(vs), "missing_rate")
    assert miss == {"chr1:100:A:T": 0.25, "chr1:200:G:C": 0.0, "chr2:300:C:G": 0.0, "chr2:400:T:A": 0.75}
    n_called = by_var(g.calc_called_gt(vs, rates=False), "n_called")
    assert n_called["chr2:400:T:A"] == 1


def test_maf_mac_het(vs):
    maf = by_var(g.calc_maf_by_gt(vs), "maf")
    # chr1:100 called alleles: 0,0,0,1,1,1 -> maf 0.5
    assert maf["chr1:100:A:T"] == 0.5
    assert maf["chr1:200:G:C"] == 1.0
    # chr2:300: alleles 0,1,0,1,1,1,0,0 -> 4/8
    assert maf["chr2:300:C:G"] == 0.5
    mac = by_var(g.calc_mac(vs), "mac")
    assert mac == {"chr1:100:A:T": 3, "chr1:200:G:C": 0, "chr2:300:C:G": 4, "chr2:400:T:A": 1}
    het = by_var(g.calc_obs_het(vs), "obs_het")
    assert het["chr1:100:A:T"] == pytest.approx(1 / 3, abs=1e-6)
    assert het["chr1:200:G:C"] == 0.0
    assert het["chr2:300:C:G"] == 0.5
    assert het["chr2:400:T:A"] == 1.0


def test_exp_het(vs):
    # chr1:100: counts (3,3), n=6 -> (1 - 0.5)*6/5 = 0.6
    exp = by_var(g.calc_unbiased_exp_het(vs), "exp_het")
    assert exp["chr1:100:A:T"] == pytest.approx(0.6, abs=1e-6)
    assert exp["chr1:200:G:C"] == 0.0


def test_allele_freq_and_counts(vs):
    counts = g.count_alleles(vs)
    got = {(r["variant_id"], r["allele"]): r["n"] for r in counts.collect()}
    assert got[("chr1:100:A:T", 0)] == 3 and got[("chr1:100:A:T", 1)] == 3
    freq = g.calc_allele_freq(vs)
    fget = {(r["variant_id"], r["allele"]): r["freq"] for r in freq.collect()}
    assert fget[("chr2:300:C:G", 1)] == 0.5


def test_mat012(vs):
    dosage = {
        (r["variant_id"], r["sample_id"]): r["dosage"]
        for r in g.gts_as_mat012(vs).collect()
    }
    assert dosage[("chr1:100:A:T", "s1")] == 0
    assert dosage[("chr1:100:A:T", "s2")] == 1
    assert dosage[("chr1:100:A:T", "s3")] == 2
    assert dosage[("chr1:100:A:T", "s4")] is None


def test_depth_masking(vs):
    masked = g.min_depth_gt_to_missing(vs, min_depth=10)
    miss = by_var(g.calc_missing_gt(masked), "missing_rate")
    # chr1:200 s1 has DP=4 -> masked; chr2:400 s4 DP=9 -> masked (now all 4 missing)
    assert miss["chr1:200:G:C"] == 0.25
    assert miss["chr2:400:T:A"] == 1.0


def test_filter_samples(vs):
    sub = g.filter_samples(vs, ["s1", "s2"])
    assert sub.samples == ["s1", "s2"]
    rev = g.filter_samples(vs, ["s1"], reverse=True)
    assert rev.samples == ["s2", "s3", "s4"]


def test_call_rate_filter_contract(vs):
    res = g.remove_low_call_rate_vars(vs, min_call_rate=0.5)
    assert set(res) == {FLT_VARS, N_KEPT, N_FILTERED_OUT}
    assert res[N_KEPT] == 3 and res[N_FILTERED_OUT] == 1
    kept_ids = {r["variant_id"] for r in res[FLT_VARS].variants.collect()}
    assert "chr2:400:T:A" not in kept_ids
    # calls pruned consistently
    assert res[FLT_VARS].calls.filter(F.col("variant_id") == "chr2:400:T:A").count() == 0


def test_call_rate_filter_histogram(vs):
    """Reference signature: remove_low_call_rate_vars(..., calc_histogram=True)
    returns FLT_STATS = np.histogram of the pre-filter call rates."""
    from v6spark.genomics import COUNTS, EDGES, FLT_STATS

    res = g.remove_low_call_rate_vars(
        vs, min_call_rate=0.5, calc_histogram=True, n_bins=4
    )
    assert set(res) == {FLT_VARS, N_KEPT, N_FILTERED_OUT, FLT_STATS}
    assert res[N_KEPT] == 3 and res[N_FILTERED_OUT] == 1
    hist = res[FLT_STATS]
    assert hist[EDGES] == [0.0, 0.25, 0.5, 0.75, 1.0]
    # pre-filter call rates: 0.75, 1.0, 1.0, 0.25 -> bins [0, 1, 0, 3]
    # (0.25 and 0.75 are left bin edges; numpy closes the last bin, so
    # both 1.0 rates join 0.75 in bin 3)
    assert hist[COUNTS] == [0, 1, 0, 3]
    assert sum(hist[COUNTS]) == res[N_KEPT] + res[N_FILTERED_OUT]


def test_call_rate_filter_count_mode(vs):
    """rates=False: the threshold is an absolute called count
    (reference's count-based D1 mode)."""
    # called counts per variant: 3, 4, 4, 1
    res = g.remove_low_call_rate_vars(vs, min_call_rate=4, rates=False)
    assert res[N_KEPT] == 2 and res[N_FILTERED_OUT] == 2
    kept = {r["variant_id"] for r in res[FLT_VARS].variants.collect()}
    assert kept == {"chr1:200:G:C", "chr2:300:C:G"}


def test_maf_and_qual_filters(vs):
    res = g.filter_by_maf(vs, max_allowable_maf=0.95)
    assert res[N_KEPT] == 3  # chr1:200 (maf 1.0) dropped
    res2 = g.filter_by_snp_qual(vs, min_qual=50)
    assert res2[N_KEPT] == 3  # chr2:300 qual 10 dropped


def test_region_filter(vs):
    res = g.filter_variations_in_regions(vs, [("chr1", 100, 200)])
    assert {r["variant_id"] for r in res[FLT_VARS].variants.collect()} == {"chr1:100:A:T"}
    rev = g.filter_variations_in_regions(vs, [("chr1", 100, 200)], reverse=True)
    assert rev[N_KEPT] == 3


def test_variable_and_biallelic(vs):
    assert g.keep_variable_variations(vs)[N_KEPT] == 3  # chr1:200 invariant
    assert g.keep_biallelic(vs)[N_KEPT] == 3


def test_reference_pipeline_composition(vs, spark):
    """The reference's §3.2 composed pipeline, verbatim shape."""
    from v6spark.compute import compute

    r1 = g.remove_low_call_rate_vars(vs, min_call_rate=0.5)
    r2 = g.filter_by_maf(r1[FLT_VARS], max_allowable_maf=0.95)
    r3 = g.filter_samples(r2[FLT_VARS], ["s1", "s2", "s3"])
    result = compute(
        {
            "vars": r3.variants,
            "counts": {"cr": r1[N_KEPT], "maf": r2[N_KEPT]},
        }
    )
    assert result["counts"] == {"cr": 3, "maf": 2}
    assert {r["variant_id"] for r in result["vars"]} == {"chr1:100:A:T", "chr2:300:C:G"}


def test_setitem_variant_field(vs):
    maf = g.calc_maf_by_gt(vs)
    vs2 = Variations(vs.variants, vs.calls)
    vs2["/variations/maf"] = maf
    back = vs2["/variations/maf"]
    assert set(back.columns) == {"variant_id", "maf"}
    got = {r["variant_id"]: r["maf"] for r in back.collect()}
    assert got["chr1:100:A:T"] == 0.5
    assert "/variations/maf" in vs2.keys()


def test_setitem_call_field_and_shape_check(vs):
    vs2 = Variations(vs.variants, vs.calls)
    vs2["/calls/dosage"] = g.gts_as_mat012(vs2)
    assert vs2["/calls/dosage"].count() == 16
    with pytest.raises(ValueError, match="exactly one"):
        vs2["/calls/bad"] = vs2.calls  # too many value columns
    with pytest.raises(KeyError):
        vs2["elsewhere/x"] = g.calc_maf_by_gt(vs2)


def test_save_committed_roundtrip_and_versioning(vs, spark, tmp_path):
    """ACID save (r5): both tables commit atomically; version-pinned
    loads; retention sweep."""
    root = str(tmp_path / "store")
    assert vs.save_committed(root) == 1
    got = Variations.load_committed(spark, root)
    assert got.num_variations == vs.num_variations
    assert got.calls.count() == vs.calls.count()

    # second version: a filtered cohort
    flt = g.remove_low_call_rate_vars(vs, min_call_rate=0.5)[FLT_VARS]
    assert flt.save_committed(root) == 2
    assert Variations.load_committed(spark, root).num_variations == flt.num_variations
    # time travel back to the full cohort
    assert (
        Variations.load_committed(spark, root, version=1).num_variations
        == vs.num_variations
    )
    # retention: default keeps only the latest
    removed = Variations.vacuum_committed(spark, root)
    assert removed == 1
    with pytest.raises(ValueError, match="no committed"):
        Variations.load_committed(spark, root, version=1)
    assert Variations.load_committed(spark, root).num_variations == flt.num_variations
