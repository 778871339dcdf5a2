"""Registry pairing each declared query with its DuckDB oracle.

The verification driver (``__spark_entry__.py``) runs every
``queries()[name]`` on Spark and the matching ``oracle_sql()[name]``
on DuckDB at sf0.01, then compares row count + schema +
order-insensitive value hash.  Keeping the two sides adjacent in one
``@register`` call is the main defence against drift.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    tier: str  # m1_core | m2_stats | m3_relational | m4_northstar
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, tier: str, oracle: str | None):
    """Decorator: register a (spark plan, oracle SQL) declared query."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            tier=tier,
            spark_fn=fn,
            oracle=oracle.strip() if oracle else None,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco
