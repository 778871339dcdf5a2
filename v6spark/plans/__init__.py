"""Declared-query registry (SURVEY.md §2.3 — the judged contract).

Importing this package registers every declared query; each entry
pairs a Spark plan builder with the equivalent DuckDB oracle SQL.
"""

from v6spark.plans.registry import REGISTRY, QuerySpec, register

# Importing the tier modules populates REGISTRY.
from v6spark.plans import m1_core  # noqa: F401,E402
from v6spark.plans import m2_stats  # noqa: F401,E402
from v6spark.plans import m3_relational  # noqa: F401,E402
from v6spark.plans import m4_northstar  # noqa: F401,E402

# m5_extensions is deliberately NOT imported here: its queries are
# CI-oracle-paired extras (tests/test_extra_oracle_parity.py), kept
# out of the driver registry so the judged set stays at exactly the
# 50 entries the CORRECTNESS artifact can record.

__all__ = ["REGISTRY", "QuerySpec", "register"]
