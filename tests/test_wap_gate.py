"""The full write-audit-publish composition: prepare -> stage ->
audit -> (drop | promote).

A release gate audits the EXACT committed bytes of a staged publish
(quality census, PII count, leakage report), drops on failure, and
promotes only a clean stage; consumers see nothing until the gate
passes.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from v6spark.operators.text import redact_pii
from v6spark.pipeline import (
    drop_staged,
    list_staged,
    prepare_training_corpus,
    promote_staged,
    read_published_corpus,
    read_staged_corpus,
    stage_corpus_publish,
)


def _raw_docs(spark, with_pii: bool):
    rows = [
        (i, "the quick brown fox jumps over the lazy dog the weather "
            f"report number {i} says mild rain with some sun later")
        for i in range(40)
    ]
    if with_pii:
        rows.append((900, "contact me at leaked.address@example.com for "
                          "the quick brown fox weather report details"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _stage(spark, root, docs):
    prepared = prepare_training_corpus(docs, min_quality=0.0)
    content = docs.join(
        prepared.select("doc_id"), "doc_id", "left_semi"
    )
    return stage_corpus_publish(
        prepared.select("doc_id", "split"), content, root, n_shards=2
    )


def test_gate_drops_dirty_stage_and_promotes_clean_one(spark, tmp_path):
    root = str(tmp_path / "corpus")

    # stage a corpus with a planted PII document
    dirty = _stage(spark, root, _raw_docs(spark, with_pii=True))
    audit = read_staged_corpus(spark, root, dirty)
    n_pii = (
        redact_pii(audit, text_col="text")
        .filter(F.col("n_email") > 0)
        .count()
    )
    assert n_pii == 1  # the gate catches the planted email
    assert drop_staged(spark, root, dirty) is True
    assert read_published_corpus(spark, root) is None  # nothing leaked

    # scrub upstream, restage, audit clean, promote
    clean = _stage(spark, root, _raw_docs(spark, with_pii=False))
    audit = read_staged_corpus(spark, root, clean)
    assert (
        redact_pii(audit, text_col="text").filter("n_email > 0").count()
        == 0
    )
    res = promote_staged(spark, root, clean, txn_id="release-1")
    assert res["_version"] == 1
    out = read_published_corpus(spark, root)
    assert out.count() == audit.count() > 0
    assert list_staged(spark, root) == [clean]  # reclaimable later
