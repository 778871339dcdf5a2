"""CI oracle parity for the m5 extras (plans/m5_extensions.py) —
same compare harness the driver uses, same sf, just not consuming a
slot in the driver's 50-entry CORRECTNESS artifact."""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.oracle_harness import compare
from v6spark.plans.m5_extensions import EXTRA_QUERIES

SF_DIR = os.environ.get("V6SPARK_TEST_SF", "/root/testdata/sf0.001")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES))
def test_extra_query_matches_oracle(spark, con, name):
    spark_fn, oracle = EXTRA_QUERIES[name]
    err = compare(spark, con, spark_fn, oracle, SF_DIR)
    assert not err, f"{name}: {err}"
    # and the result is non-trivial (a 0-row match proves nothing)
    assert spark_fn(spark, SF_DIR).count() > 0
