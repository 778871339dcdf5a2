"""Regenerate PLAN_LOCK.json: per-declared-query physical-plan
fingerprints (shuffle / join-strategy / Python-eval node counts).

Run after an INTENTIONAL plan change:

    python scripts/gen_plan_lock.py

tests/test_plan_lock.py compares every query's current fingerprint
against this file and fails on ANY drift — a new Exchange, a
broadcast that degraded to sort-merge, a Python eval node sneaking
into a declared plan.  test_plan_quality.py asserts hand-picked
properties on flagship queries; the lock covers all 50 with zero
per-query authoring, so a regression in a query nobody wrote an
assertion for still fails CI.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("V6SPARK_TEST_SF", "/root/testdata/sf0.001")
LOCK_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_LOCK.json")

# Node classes that matter at 100 TB.  The tree section names nodes
# without arguments ("Exchange (7)"); partitioning kinds come from
# the numbered detail section.
TREE_NODES = [
    "Exchange", "BroadcastExchange", "BroadcastHashJoin",
    "SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin",
    "CartesianProduct", "ArrowEvalPython", "BatchEvalPython",
    "TakeOrderedAndProject", "Window", "Generate", "Sort",
    "HashAggregate", "ObjectHashAggregate", "SortAggregate",
    "Scan parquet",
]
DETAIL_TOKENS = {
    "shuffle_hash": "hashpartitioning(",
    "shuffle_range": "rangepartitioning(",
    "shuffle_single": "SinglePartition",
}


def explain_formatted(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def fingerprint(full: str) -> dict:
    import re

    tree, _, detail = full.partition("\n\n")
    fp: dict = {}
    names = []
    for line in tree.splitlines():
        m = re.search(r"([A-Za-z][A-Za-z ]*?)\s*(?:\(\d+\))?$", line.strip())
        if m:
            names.append(m.group(1).strip())
    for node in TREE_NODES:
        n = sum(1 for nm in names if nm == node or nm.startswith(node + " "))
        if node == "Exchange":  # don't double-count BroadcastExchange
            n = sum(1 for nm in names if nm == "Exchange")
        if n:
            fp[node] = n
    # partitioning kinds appear once per Exchange detail block
    for block in detail.split("\n\n"):
        if not block.startswith("(") or ") Exchange" not in block.split("\n", 1)[0]:
            continue
        for k, tok in DETAIL_TOKENS.items():
            if tok in block:
                fp[k] = fp.get(k, 0) + 1
    return fp


def main() -> None:
    from v6spark.plans import REGISTRY
    from v6spark.session import get_spark

    spark = get_spark("plan-lock", cpus=8)
    lock = {"sf_dir": SF_DIR, "queries": {}}
    for name in sorted(REGISTRY):
        spark.catalog.clearCache()  # fingerprint cache-free, matching the test
        df = REGISTRY[name].spark_fn(spark, SF_DIR)
        lock["queries"][name] = fingerprint(explain_formatted(spark, df))
        print(name, lock["queries"][name])
    with open(LOCK_PATH, "w") as f:
        json.dump(lock, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {LOCK_PATH} ({len(lock['queries'])} queries)")


if __name__ == "__main__":
    main()
