"""Randomized merge-clause semantics vs a pure-Python reference
model: seeded rounds of three-clause merges (random NULLs, random
matched/unmatched keys, conditions over both sides) applied to ONE
published table, each verified row-exactly against a dict model that
implements the documented contract directly:

- DELETE first on matched rows whose condition is TRUE (NULL/False
  pass through);
- UPDATE on remaining matched rows whose condition is TRUE —
  partial column mapping keeps unmapped target values;
- INSERT on unmatched rows whose condition is TRUE.
"""
from __future__ import annotations

import random

from v6spark.pipeline import (
    merge_into_published,
    publish_corpus_committed,
    read_published_corpus,
)

SEED = 20260816
ROUNDS = 6
N = 30


def _model_merge(model: dict, src_rows: list[tuple]) -> dict:
    """Reference semantics over {doc_id: (text, day)}; source rows
    are (doc_id, text, day, split)."""
    out = dict(model)
    for doc_id, text, day, _split in src_rows:
        matched = doc_id in out
        if matched:
            # delete condition: s.day < 0 (NULL day -> no delete)
            if day is not None and day < 0:
                del out[doc_id]
                continue
            # update condition: s.day IS NULL OR s.day > t.day
            t_text, t_day = out[doc_id]
            if day is None or (t_day is not None and day > t_day) \
                    or t_day is None:
                # partial update: text takes s.text, day kept
                out[doc_id] = (text, t_day)
        else:
            # insert condition: s.day IS NOT NULL AND s.day >= 0
            if day is not None and day >= 0:
                out[doc_id] = (text, day)
    return out


def test_random_merges_match_reference_model(spark, tmp_path):
    rng = random.Random(SEED)
    df = spark.range(N).selectExpr(
        "id as doc_id", "concat('body ', id) as text",
        "cast(id % 7 as long) as day",
        "'train' as split",
    )
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        df.selectExpr("doc_id", "split"), df.drop("split"), root,
        n_shards=4,
    )
    model = {
        r.doc_id: (r.text, r.day)
        for r in read_published_corpus(spark, root).collect()
    }

    next_key = [1000]
    for rnd in range(ROUNDS):
        src_rows = []
        seen = set()
        # a mix of existing, previously-merged, and brand-new keys
        candidates = list(model) + [next_key[0] + i for i in range(8)]
        rng.shuffle(candidates)
        for doc_id in candidates[:12]:
            if doc_id in seen:
                continue
            seen.add(doc_id)
            day = rng.choice([None, -3, -1, 0, 2, 5, 9])
            src_rows.append(
                (doc_id, f"r{rnd} v{doc_id}", day, "train")
            )
        next_key[0] += 100

        expect = _model_merge(model, src_rows)
        res = merge_into_published(
            spark, root,
            spark.createDataFrame(
                src_rows,
                "doc_id long, text string, day long, split string",
            ),
            key_col="doc_id",
            when_matched_delete="s.day < 0",
            when_matched_update={"text": "s.text"},
            matched_condition=(
                "s.day IS NULL OR s.day > t.day OR t.day IS NULL"
            ),
            when_not_matched_insert="*",
            not_matched_condition="s.day IS NOT NULL AND s.day >= 0",
        )
        got = {
            r.doc_id: (r.text, r.day)
            for r in read_published_corpus(spark, root).collect()
        }
        assert got == expect, (
            f"round {rnd}: divergence from the reference model "
            f"(result {res}); first diff: "
            f"{next(iter(set(got.items()) ^ set(expect.items())))}"
        )
        model = expect
    # the rounds actually exercised all three clauses
    assert any(k >= 1000 for k in model), "no insert ever fired"
    assert len(model) != N, "no delete/insert changed the census"
