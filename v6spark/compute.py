"""compute() — the reference's single-materialization entry point.

``variation6/compute.py::compute`` (SURVEY.md §2.1 E1) walks a nested
dict of lazy Dask results and evaluates them in ONE pass so shared
subgraphs run once.  Spark does NOT deduplicate common sub-plans
across separate actions (§3.3 / §7 pitfall 5), so the equivalent is:
persist the DataFrames the caller marks as shared, then collect each
output; the persisted fan-out points are evaluated once.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from v6spark.operators.filters import FilterResult


def compute(
    results: dict[str, Any],
    shared: list[DataFrame] | None = None,
    unpersist: bool = True,
) -> dict[str, Any]:
    """Materialize a (nested) dict of DataFrames / FilterResults.

    ``shared``: lineage fan-out points (e.g. an allele-counts frame
    feeding MAF, MAC and exp-het) — persisted for the duration so each
    is computed once, mirroring the reference's shared-subgraph reuse.
    """
    shared = shared or []
    for df in shared:
        df.persist()
    try:
        return _walk(results)
    finally:
        if unpersist:
            for df in shared:
                df.unpersist()


def _walk(node: Any) -> Any:
    if isinstance(node, DataFrame):
        return node.collect()
    if isinstance(node, FilterResult):
        return {
            "rows": node.df.collect(),
            "n_kept": node.n_kept,
            "n_filtered_out": node.n_filtered_out,
        }
    if isinstance(node, dict):
        return {k: _walk(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return type(node)(_walk(v) for v in node)
    return node
