"""Plan-fingerprint lock: every declared query's physical plan must
match PLAN_LOCK.json node-for-node (shuffles by kind, join
strategies, Python evals, scans).

test_plan_quality.py asserts hand-picked properties on flagship
queries; this lock covers ALL 50 with zero per-query authoring — a
new Exchange, a broadcast degrading to sort-merge, or a Python eval
node appearing in ANY declared plan fails here.  After an
INTENTIONAL plan change, regenerate with

    python scripts/gen_plan_lock.py

and review the diff like code: each changed count is a claim about
what the engine will do at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)
from gen_plan_lock import LOCK_PATH, explain_formatted, fingerprint  # noqa: E402

from v6spark.plans import REGISTRY  # noqa: E402

with open(LOCK_PATH) as _f:
    _LOCK = json.load(_f)


@pytest.mark.parametrize("name", sorted(_LOCK["queries"]))
def test_plan_fingerprint_locked(name, spark, sf_dir):
    if sf_dir != _LOCK["sf_dir"]:
        pytest.skip(
            f"lock generated at {_LOCK['sf_dir']}; plans may legitimately "
            f"differ at {sf_dir} (broadcast thresholds, split counts)"
        )
    # earlier tests may have left persisted frames whose lineage
    # overlaps this query (a cached side frame swaps the parquet scan
    # for InMemoryTableScan in the plan); fingerprint cache-free, as
    # the generator does in its fresh session
    spark.catalog.clearCache()
    df = REGISTRY[name].spark_fn(spark, sf_dir)
    got = fingerprint(explain_formatted(spark, df))
    assert got == _LOCK["queries"][name], (
        f"{name}: physical plan drifted from PLAN_LOCK.json — if this "
        "change is intentional, regenerate with scripts/gen_plan_lock.py "
        "and review the diff"
    )


def test_lock_covers_registry():
    assert set(_LOCK["queries"]) == set(REGISTRY), (
        "PLAN_LOCK.json out of sync with the query registry — "
        "regenerate with scripts/gen_plan_lock.py"
    )
