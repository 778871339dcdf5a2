#!/usr/bin/env python
"""Concurrent-writer DML stress: N racing writers, exactly-once.

Four writers fire MIXED verbs (2 retracts on disjoint predicates, 2
upserts on disjoint keys) at ONE published corpus simultaneously, in
both commit modes.  Exactly-once means: every writer's commit lands at
a distinct version, no effect is lost, and the final corpus equals the
serial composition (closed-form).  Also measured: how many OCC retries
the race actually cost (from the final version number: 4 writers + 1
publish = 5 versions, always — retries never burn version numbers,
they re-attempt the SAME next version).

Usage: python scripts/dml_race_stress.py
Writes STRESS_DML_OCC.json.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    publish_corpus_committed,
    read_published_corpus,
    retract_from_published,
    upsert_into_published,
)
from v6spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "STRESS_DML_OCC.json",
)

N_DOCS = 100_000


def run_mode(spark, mode: str) -> dict:
    tmp = tempfile.mkdtemp(prefix=f"dml_race_{mode}_")
    root = f"{tmp}/corpus"
    prepared = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"), F.lit("train").alias("split")
    )
    content = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id")).alias("text"),
    )
    publish_corpus_committed(
        prepared, content, root, n_shards=16, commit_mode=mode
    )

    # disjoint effects, so the serial composition is order-independent
    retract_preds = [
        "doc_id >= 100 and doc_id < 150",   # 50 rows
        "doc_id >= 200 and doc_id < 280",   # 80 rows
    ]
    upsert_keys = [[11, 33, 55], [77, 99, 311]]
    deltas = [
        spark.createDataFrame(
            [(k, f"rev{i} {k}", None) for k in ks]
            + [(N_DOCS + 10 + i, f"new{i}", "train")],
            "doc_id long, text string, split string",
        )
        for i, ks in enumerate(upsert_keys)
    ]
    errors: list = []
    results: dict = {}

    def retractor(i):
        try:
            results[f"retract{i}"] = retract_from_published(
                spark, root, retract_preds[i], commit_mode=mode
            )
        except Exception as exc:
            errors.append(f"retract{i}: {exc}")

    def upserter(i):
        try:
            results[f"upsert{i}"] = upsert_into_published(
                spark, root, deltas[i], commit_mode=mode
            )
        except Exception as exc:
            errors.append(f"upsert{i}: {exc}")

    threads = (
        [threading.Thread(target=retractor, args=(i,)) for i in range(2)]
        + [threading.Thread(target=upserter, args=(i,)) for i in range(2)]
    )
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    assert errors == [], errors

    versions = sorted(r["_version"] for r in results.values())
    assert versions == [2, 3, 4, 5], versions  # each landed exactly once
    assert results["retract0"]["rows_removed"] == 50
    assert results["retract1"]["rows_removed"] == 80
    for i in range(2):
        r = results[f"upsert{i}"]
        assert r["rows_updated"] == 3 and r["rows_inserted"] == 1, r

    out = read_published_corpus(spark, root)
    n_final = out.count()
    assert n_final == N_DOCS - 130 + 2, n_final
    got = {
        r["doc_id"]: r["text"]
        for r in out.filter(
            "doc_id in (11, 77, 100010, 100011)"
        ).collect()
    }
    assert got[11] == "rev0 11" and got[77] == "rev1 77", got
    assert got[N_DOCS + 10] == "new0" and got[N_DOCS + 11] == "new1", got
    assert out.filter(
        "(doc_id >= 100 and doc_id < 150) or (doc_id >= 200 and doc_id < 280)"
    ).count() == 0
    v, doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    assert v == 5 and sum(doc["splits"].values()) == n_final
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "writers": 4,
        "verbs": "2 retracts (disjoint preds) + 2 upserts (disjoint keys)",
        "wall_sec": round(wall, 2),
        "versions_landed": versions,
        "final_rows": n_final,
        "serializable_composition_exact": True,
    }


def main() -> None:
    spark = get_spark(
        "dml-race", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {m: run_mode(spark, m) for m in ("rename", "put")}
    out["claim"] = (
        "corpus DML is multi-writer: 4 concurrent mixed-verb writers on "
        "one published corpus land exactly once each (versions 2..5, no "
        "burned versions), every effect survives, and the final state "
        "equals the serial composition — in both commit modes.  The OCC "
        "loop recomputes a loser's rewrite plan against the winner's "
        "committed file list; nonce-named version dirs keep racing "
        "attempts' data private until their manifest commits."
    )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
