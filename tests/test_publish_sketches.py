"""Publish-time sketches: one transaction covers data + registers.

`publish_corpus_committed(sketch_specs=...)` writes HLL/DDSketch
register tables inside the version directory before the manifest
commits; `published_corpus_drift` answers distinct/quantile drift
between versions from registers alone — zero corpus rescans.
"""
from __future__ import annotations

import glob

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    publish_corpus_committed,
    published_corpus_drift,
    read_published_corpus,
    read_published_sketch,
)

SPECS = {
    "distinct_docs": {"kind": "hll", "expr": "doc_id"},
    "text_len": {"kind": "dds", "expr": "length(text)"},
}


def _frames(spark, n=200, body="body"):
    docs = spark.range(n).selectExpr(
        "id as doc_id", f"concat('{body} ', id) as text"
    )
    prepared = spark.range(n).selectExpr("id as doc_id", "'train' as split")
    return prepared, docs


def test_sketches_commit_with_data_and_estimate_well(spark, tmp_path):
    prepared, docs = _frames(spark)
    root = str(tmp_path / "corpus")
    res = publish_corpus_committed(
        prepared, docs, root, n_shards=2, sketch_specs=SPECS
    )
    assert res["_version"] == 1
    _v, doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    assert set(doc["sketches"]) == {"distinct_docs", "text_len"}
    regs, spec = read_published_sketch(spark, root, "distinct_docs")
    assert spec["kind"] == "hll"
    # register-only distinct estimate within HLL error of 200
    from v6spark.operators import sketches as _sk

    est = _sk.hll_estimate(regs, p=spec["p"]).collect()[0][0]
    assert abs(est - 200) / 200 < 0.1


def test_crash_between_data_and_sketches_leaves_neither_visible(
    spark, tmp_path
):
    prepared, docs = _frames(spark, n=50)
    root = str(tmp_path / "corpus")
    with pytest.raises(RuntimeError, match="injected crash between"):
        publish_corpus_committed(
            prepared, docs, root, n_shards=2, sketch_specs=SPECS,
            _fail_before_sketches=True,
        )
    # no commit: corpus unreadable, no manifest, no registers visible
    assert read_published_corpus(spark, root) is None
    v, doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    assert v == 0 and doc is None
    # rerun succeeds and is complete (orphan of the crash is ignored)
    res = publish_corpus_committed(
        prepared, docs, root, n_shards=2, sketch_specs=SPECS
    )
    assert res["_version"] == 1
    assert read_published_corpus(spark, root).count() == 50
    regs, _spec = read_published_sketch(spark, root, "text_len")
    assert regs.count() > 0


def test_drift_between_versions_from_registers_alone(spark, tmp_path):
    prepared, docs = _frames(spark, n=200, body="x")
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        prepared, docs, root, n_shards=2, sketch_specs=SPECS
    )
    # v2: half the docs, much longer bodies
    prepared2, _ = _frames(spark, n=100)
    docs2 = spark.range(100).selectExpr(
        "id as doc_id",
        "concat('a very much longer body than before ', id) as text",
    )
    publish_corpus_committed(
        prepared2, docs2, root, n_shards=2, sketch_specs=SPECS
    )
    drift = published_corpus_drift(spark, root, 1, 2)
    rows = {(r["sketch"], r["metric"]): r for r in drift.collect()}
    d = rows[("distinct_docs", "approx_distinct")]
    assert d["old"] > d["new"] and abs(d["old"] - 200) / 200 < 0.1
    p50 = rows[("text_len", "p50")]
    assert p50["new"] > p50["old"]  # longer bodies
    assert p50["delta"] == pytest.approx(p50["new"] - p50["old"])


def test_drift_matches_exact_recompute(spark, tmp_path):
    """The register-only drift numbers must track an EXACT recompute
    over the version-pinned corpus reads within the sketches' error
    bounds (HLL p=12: a few percent; DDSketch alpha=0.01: 2% relative
    on quantile values) — the evidence that a release gate can trust
    the zero-rescan path."""
    prepared, docs = _frames(spark, n=300, body="w")
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        prepared, docs, root, n_shards=2, sketch_specs=SPECS
    )
    prepared2, _ = _frames(spark, n=120)
    docs2 = spark.range(120).selectExpr(
        "id as doc_id",
        "concat('a substantially longer body string here ', id) as text",
    )
    publish_corpus_committed(
        prepared2, docs2, root, n_shards=2, sketch_specs=SPECS
    )
    drift = published_corpus_drift(spark, root, 1, 2, quantiles=(0.5, 0.9))
    rows = {(r["sketch"], r["metric"]): r for r in drift.collect()}

    def exact(version):
        df = read_published_corpus(spark, root, version=version)
        nd = df.selectExpr("count(distinct doc_id) as n").collect()[0]["n"]
        qs = df.selectExpr(
            "percentile(length(text), array(0.5, 0.9)) as q"
        ).collect()[0]["q"]
        return nd, {0.5: qs[0], 0.9: qs[1]}

    nd1, q1 = exact(1)
    nd2, q2 = exact(2)
    d = rows[("distinct_docs", "approx_distinct")]
    assert abs(d["old"] - nd1) / nd1 < 0.05
    assert abs(d["new"] - nd2) / nd2 < 0.05
    assert d["delta"] == pytest.approx(d["new"] - d["old"])
    for q, label in ((0.5, "p50"), (0.9, "p90")):
        r = rows[("text_len", label)]
        assert abs(r["old"] - q1[q]) / q1[q] < 0.02, (label, r["old"], q1[q])
        assert abs(r["new"] - q2[q]) / q2[q] < 0.02, (label, r["new"], q2[q])
        assert r["delta"] == pytest.approx(r["new"] - r["old"])


def test_drift_requires_sketches_on_both_sides(spark, tmp_path):
    prepared, docs = _frames(spark, n=20)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=2)
    publish_corpus_committed(
        prepared, docs, root, n_shards=2, sketch_specs=SPECS
    )
    with pytest.raises(ValueError, match="BOTH versions"):
        published_corpus_drift(spark, root, 1, 2)


def test_sketch_dirs_are_invisible_to_data_readers(spark, tmp_path):
    prepared, docs = _frames(spark, n=30)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        prepared, docs, root, n_shards=2, sketch_specs=SPECS
    )
    out = read_published_corpus(spark, root)
    assert out.count() == 30
    assert set(out.columns) == {"doc_id", "text", "shard", "split"}
    # registers really are on disk inside the version dir
    assert glob.glob(f"{root}/v=*/_sketch/distinct_docs/*.parquet")
