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
        "protocol": "cold1+settle+warm_median",
        "settle_passes": 99,
        # r13: actual-master observability fields (r12 verdict item 1)
        "cpus": 32,
        "master": "local[32]",
        "parallelism": 32,
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


def test_settle_protocol_guardrail():
    """The r8 settle protocol must not silently regress: bench.py
    keeps the settle loop (warm medians recorded only after two
    consecutive pass totals agree within SETTLE_TOL), and every BENCH
    JSON records settle_passes >= 1 with its totals."""
    import ast
    import os

    import bench

    # the decision function behaves (unit): not settled until two
    # passes agree within tolerance
    assert bench.settled([]) is False
    assert bench.settled([30.0]) is False
    assert bench.settled([30.0, 40.0]) is False          # 33% apart
    assert bench.settled([40.0, 30.0, 30.9]) is True     # 3% apart
    assert bench.settled([30.0, 32.5], tol=0.07) is False
    assert 0 < bench.SETTLE_TOL <= 0.10

    # main() still wires the loop and reports it (source-level pin:
    # the loop runs Spark, so execution is the driver's job)
    src = open(os.path.join(
        os.path.dirname(bench.__file__), "bench.py"
    )).read()
    tree = ast.parse(src)
    main_src = next(
        ast.get_source_segment(src, n) for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "main"
    )
    assert "settled(settle_totals)" in main_src
    assert '"settle_passes": len(settle_totals)' in main_src
    assert '"settle_totals": settle_totals' in main_src
    # r13 (r12 verdict item 1): the COMPACT stdout line must carry the
    # actual master + defaultParallelism so the driver's low-core run
    # is adjudicable; both dicts in main() build them identically, so
    # two occurrences of each accessor pin compact AND full.
    assert main_src.count('"master": spark.sparkContext.master') == 2
    assert (
        main_src.count('"parallelism": spark.sparkContext.defaultParallelism')
        == 2
    )
    # warm timing happens AFTER the settle loop
    assert main_src.index("settled(settle_totals)") < main_src.index(
        "warm: dict"
    )

    # the recorded artifacts carry the protocol fields (r8 onward)
    import glob
    import json

    repo = os.path.dirname(os.path.abspath(bench.__file__))
    recent = [
        p for p in sorted(glob.glob(f"{repo}/BENCH_r*.json"))
        if p >= f"{repo}/BENCH_r08.json"
    ]
    for p in recent:
        with open(p) as fh:
            doc = json.load(fh)
        if isinstance(doc, dict) and "settle_passes" in doc:
            assert doc["settle_passes"] >= 1
