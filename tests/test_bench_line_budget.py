"""The driver captures only the LAST 2000 characters of bench.py's
stdout (BENCH_r04 lost 33/50 warm medians to an oversized line).
This pins the compact summary line's worst-case size against the
CURRENT registry, so adding queries can never silently overflow the
capture again — bench.py also hard-guards at runtime, but failing
here is actionable before a round's artifact is lost."""

from __future__ import annotations

import json

from v6spark.plans import REGISTRY


def test_compact_bench_line_fits_tail_capture():
    # worst realistic widths: three-digit seconds with 3 decimals
    compact = {
        "metric": "suite_seconds",
        "value": 999.999,
        "unit": "sec",
        "queries": {name: 999.999 for name in sorted(REGISTRY)},
        "sf": 0.1,
        "n_queries": len(REGISTRY),
        "p50_sec": 99.9999,
        "p95_sec": 99.9999,
        "cold_p50": 99.9999,
        "cold_p95": 99.9999,
        "cold_suite_sec": 9999.9999,
        "protocol": "cold1+warm_median",
        "detail": "BENCH_FULL.json",
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= 1900, (
        f"bench summary line would be {len(line)} chars — the driver "
        "tails 2000; shorten query names or move detail to "
        "BENCH_FULL.json"
    )


def test_registry_is_exactly_fifty():
    """The driver records the alphabetically-first 50 CORRECTNESS
    entries; a 51st registration silently evicts a judged query
    (SURVEY.md §2.3).  Fold new coverage into existing queries or
    add it to plans/m5_extensions.py::EXTRA_QUERIES instead."""
    assert len(REGISTRY) == 50, sorted(REGISTRY)
