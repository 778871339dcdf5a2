"""Guard against stress-artifact clobbering.

STRESS_TABLEFORMAT.json is a shared artifact: tableformat_stress.py
writes the table-lifecycle sections and cdc_stream_stress.py merges a
`cdc_stream_scale` section into the same file.  A whole-file
`json.dump` in either script silently deletes the other's evidence
(this happened in round 9 — the 160k-change-row CDC readStream 10x
section survived only in git history).  Both scripts now
read-modify-write; this test asserts the required sections coexist in
the committed snapshot so a regression is caught immediately.
"""
from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(ROOT, name)
    with open(path) as fh:
        return json.load(fh)


def test_tableformat_stress_sections_coexist():
    doc = _load("STRESS_TABLEFORMAT.json")
    # tableformat_stress.py's own sections
    for key in ("scale_1x", "scale_10x", "wall_ratio_10x_over_1x"):
        assert key in doc, f"tableformat section {key!r} missing"
    # cdc_stream_stress.py's merged section must not be clobbered
    assert "cdc_stream_scale" in doc, (
        "cdc_stream_scale section missing — a stress rerun clobbered "
        "the shared artifact (both scripts must read-modify-write)"
    )
    cdc = doc["cdc_stream_scale"]
    assert "walls_1x" in json.dumps(cdc) or "1x" in json.dumps(cdc)


def test_stress_scripts_read_modify_write():
    """Source-level guard: no bare whole-file json.dump of the shared
    artifact without first loading the existing document."""
    for script in ("tableformat_stress.py", "cdc_stream_stress.py"):
        src = open(os.path.join(ROOT, "scripts", script)).read()
        assert "STRESS_TABLEFORMAT" in src
        # both must read the existing doc before writing
        assert "with open(OUT) as" in src or "with open(OUT, \"r\")" in src, (
            f"{script} writes the shared artifact without reading the "
            "existing document first"
        )


def test_scale100_sections_present_and_classified():
    """STRESS_SCALE100 must carry the 10-query 100x section with
    every plan diff either empty or explained, plus the ANN
    companion section recording the judged 14-plane pin at both
    scales (and the historical 6-plane counterfactual)."""
    doc = _load("STRESS_SCALE100.json")
    sec = doc["scale100"]
    assert sec["factor"] == 100
    assert len(sec["queries"]) == 10
    assert sec["all_plans_identical_or_explained"] is True
    for name, e in sec["queries"].items():
        if not e["plan_identical"]:
            assert e.get("diff_explained"), name
        # Python eval nodes / cartesians at scale are never OK
        assert "hazard_BatchEvalPython" not in e, name
        assert "hazard_ArrowEvalPython" not in e, name
        assert "hazard_CartesianProduct" not in e, name
    # the r11 re-pin (6 -> 14 occupancy-bounded hyperplanes) makes
    # the judged ANN query's scaling a REAL bound, not a ratio_note.
    # r12 pins the ABSOLUTE 100x wall as the primary bound: the r12
    # base-side speedups shrank every ratio's denominator (sub-second
    # 1x walls swing +-30% run-to-run on this machine), so the ratio
    # keeps generous noise headroom while the absolute wall — the
    # engineered quantity — is tight (5.2-5.4 s measured for 100x
    # data vs r10's 6-plane 811x blowup).
    ann_judged = sec["queries"]["q_similarity_ann"]
    assert "ratio_note" not in ann_judged
    assert ann_judged["wall_100x_s"] <= 8.0, ann_judged
    assert ann_judged["ratio"] <= 20, ann_judged["ratio"]
    ann = doc["scale100_ann_scaled_params"]
    assert ann["judged_n_planes"] == 14
    assert ann["counterfactual_6planes_r10"]["ratio_100x"] > 100


def test_tableformat_scale100_section():
    """The r12 100x table-format evidence (VERDICT r11 task 2): the
    delta is held FIXED while the corpus grows 100x, so a flat wall
    IS the verified design claim (lookup/DML cost tracks the delta or
    the answer, never the corpus).  Pins the section's structure and
    the claims that must not regress: absent lookups open zero data
    files, DV retract rewrites nothing, the one-shard update rewrites
    only that shard's files, and every delta/answer-bound ratio stays
    far from corpus-bound (corpus grew 100x; generous noise headroom
    at 3.0 for sub-second steps)."""
    doc = _load("STRESS_TABLEFORMAT.json")
    sec = doc["scale100"]
    assert sec["corpus_bound_steps"] == ["publish"]
    s1, s100 = sec["scale_1x"], sec["scale_100x"]
    assert s100["rows_base"] == 100 * s1["rows_base"]
    assert s1["delta_rows"] == s100["delta_rows"]
    for s in (s1, s100):
        assert s["all_counts_exact"] is True
        assert s["absent_lookup_files_opened"] == 0
        # the one-shard update's rewrite set is that shard's files,
        # invariant to corpus size
        assert s["one_shard_files_rewritten"] <= 4
    assert s1["one_shard_files_rewritten"] == s100["one_shard_files_rewritten"]
    ratios = sec["wall_ratio_100x_over_1x"]
    for step, r in ratios.items():
        if step in sec["corpus_bound_steps"]:
            continue
        assert r <= 3.0, (step, r)


def test_stream_recall_decomposition():
    """The r12 recall decomposition (VERDICT r11 task 5): the
    streaming near-dedup's sub-100% planted recall must be entirely
    the fixture's own out-of-radius tail — an in-radius miss would be
    a REAL gap (the Hamming band join is pigeonhole-exact within
    radius), so it is pinned to zero, and the categories must
    account for every plant."""
    doc = _load("STRESS_STREAM.json")
    dec = doc["recall_decomposition"]
    assert dec["missed_in_radius"] == 0
    assert (
        dec["caught_in_radius"]
        + dec["caught_beyond_radius"]
        + dec["missed_beyond_radius"]
        + dec["missed_in_radius"]
        == doc["planted_near_dups"]
    )
