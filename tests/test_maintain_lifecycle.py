"""Auto-OPTIMIZE lifecycle: 10 DML rounds under maintain_published.

The scheduled-maintenance contract (VERDICT r8 #5 'done' shape): a
nightly ``maintain_published`` run must fire a compaction EXACTLY when
``compaction_advice`` crosses its thresholds — never on a healthy
table — keep row counts exact through every compact+vacuum, and leave
the table folded back to one version directory with pruning/point
lookups working.
"""
from __future__ import annotations

from v6spark.pipeline import (
    compaction_advice,
    maintain_published,
    publish_corpus_committed,
    read_published_corpus,
    read_published_keys,
    retract_from_published,
    upsert_into_published,
)


def _publish(spark, tmp_path, n=60):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text",
        "cast(id % 7 as long) as day",
    )
    prepared = spark.range(n).selectExpr(
        "id as doc_id",
        "case when id % 10 = 0 then 'valid' else 'train' end as split",
    )
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=2)
    return root


def test_ten_dml_rounds_trigger_exactly_the_advised_compactions(
    spark, tmp_path
):
    root = _publish(spark, tmp_path)
    # model of the table: doc_id -> (text, day, split)
    model = {
        i: (f"body {i}", i % 7,
            "valid" if i % 10 == 0 else "train")
        for i in range(60)
    }
    threshold = 3  # version dirs before maintenance compacts
    compactions = []
    advice_log = []
    for rnd in range(10):
        if rnd % 3 == 0:
            victim = sorted(model)[rnd]
            retract_from_published(spark, root, f"doc_id = {victim}")
            del model[victim]
        elif rnd % 3 == 1:
            doc_id = 1000 + rnd
            upsert_into_published(
                spark, root,
                spark.createDataFrame(
                    [(doc_id, f"new {rnd}", rnd, "train")],
                    "doc_id long, text string, day long, split string",
                ),
            )
            model[doc_id] = (f"new {rnd}", rnd, "train")
        else:
            victim = max(model)
            upsert_into_published(
                spark, root,
                spark.createDataFrame(
                    [(victim, f"rev {rnd}", rnd, model[victim][2])],
                    "doc_id long, text string, day long, split string",
                ),
            )
            model[victim] = (f"rev {rnd}", rnd, model[victim][2])

        advice = compaction_advice(
            spark, root, max_version_dirs=threshold
        )
        rep = maintain_published(
            spark, root, keep_last=2, max_version_dirs=threshold
        )
        advice_log.append(advice["needs_compaction"])
        # maintenance acted EXACTLY when the advice said to
        assert (rep["compacted"] is not None) == advice[
            "needs_compaction"
        ]
        if rep["compacted"] is not None:
            compactions.append(rnd)
            after = compaction_advice(
                spark, root, max_version_dirs=threshold
            )
            assert after["needs_compaction"] is False
            assert after["version_dirs"] == 1
        # counts stay EXACT through every compact + vacuum
        got = {
            r["doc_id"]: (r["text"], r["day"], r["split"])
            for r in read_published_corpus(spark, root).collect()
        }
        assert got == model, f"round {rnd} diverged"

    # the DML cadence (one version dir per verb, threshold 3) must
    # have fired >= 2 compactions and NOT fired every round
    assert len(compactions) >= 2
    assert len(compactions) < 10
    assert any(advice_log) and not all(advice_log)

    # the maintained table still serves point lookups + stays exact
    keys = read_published_keys(spark, root, [1001])
    assert [r["doc_id"] for r in keys.collect()] == [1001]
    final = maintain_published(
        spark, root, keep_last=1, max_version_dirs=threshold
    )
    assert final["version_dirs"] <= threshold
    got = {
        r["doc_id"]: (r["text"], r["day"], r["split"])
        for r in read_published_corpus(spark, root).collect()
    }
    assert got == model
