"""Shared fixtures: one SparkSession and one DuckDB connection per run.

``V6SPARK_TEST_SF`` selects the corpus (default sf0.001 for speed;
the driver's own gate runs at sf0.01 — run locally with
``V6SPARK_TEST_SF=/root/testdata/sf0.01`` before shipping).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from v6spark.session import get_spark
from v6spark.sources.tables import TABLE_NAMES

SF_DIR = os.environ.get("V6SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("v6spark-tests", cpus=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()
