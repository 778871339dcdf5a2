"""The primary gate: every declared query matches its DuckDB oracle.

Mirrors the driver's t2 check (SURVEY.md §5.2 item 1) at the fixture
scale factor.
"""

from __future__ import annotations

import pytest

from v6spark.plans import REGISTRY
from tests.oracle_harness import compare, compare_pandas

NAMES = sorted(REGISTRY)


# Deliberately oracle-less (driver records a rows-only check): the
# deterministic-but-not-SQL-expressible north-star ops (SURVEY.md §2.2)
ROWS_ONLY = {"q_dedup_minhash", "q_dedup_simhash", "q_similarity_ann", "q_lang_id"}


def test_all_queries_registered():
    assert len(REGISTRY) >= 45, f"only {len(REGISTRY)} queries registered"
    missing_oracle = {n for n, s in REGISTRY.items() if not s.oracle}
    assert missing_oracle == ROWS_ONLY, (
        f"unexpected oracle-less queries: {missing_oracle ^ ROWS_ONLY}"
    )


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_queries_run(name, spark, sf_dir):
    # no oracle -> at least assert they execute and return rows
    df = REGISTRY[name].spark_fn(spark, sf_dir)
    assert len(df.collect()) > 0


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    if spec.oracle is None:
        pytest.skip("no SQL oracle (rows-only check)")
    problems = compare(spark, duck, spec.spark_fn, spec.oracle, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle_driver_path(name, spark, duck, sf_dir):
    """Driver-faithful pandas fetch path: catches DuckDB HUGEINT->float64
    dtype artifacts and unhashable array cells that the fetchall path
    cannot see (both bit CORRECTNESS_r01)."""
    spec = REGISTRY[name]
    if spec.oracle is None:
        pytest.skip("no SQL oracle (rows-only check)")
    problems = compare_pandas(spark, duck, spec.spark_fn, spec.oracle, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)
