"""The primary gate: every declared query matches its DuckDB oracle.

Mirrors the driver's t2 check (SURVEY.md §5.2 item 1) at the fixture
scale factor.
"""

from __future__ import annotations

import pytest

from v6spark.plans import REGISTRY
from tests.oracle_harness import compare

NAMES = sorted(REGISTRY)


def test_all_queries_registered():
    assert len(REGISTRY) >= 45, f"only {len(REGISTRY)} queries registered"
    missing_oracle = [n for n, s in REGISTRY.items() if not s.oracle]
    assert not missing_oracle, f"queries without oracle: {missing_oracle}"


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    if spec.oracle is None:
        pytest.skip("no SQL oracle (rows-only check)")
    problems = compare(spark, duck, spec.spark_fn, spec.oracle, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)
