"""Judged-registry canonicalization budget.

The driver compares each judged query to its oracle by collecting both
results to pandas, sorting columns by name, and value-hashing.  That
canonicalization has practical limits: very wide frames, huge row
counts, or monster cell values make the hash step slow/fragile.  With
the registry pinned at 50 and new semantics landing as COLUMN FOLDS
into existing queries, a query could silently grow past comfort.

This test pins the headroom: every judged result at the fixture SF
stays well under conservative caps (the driver runs sf0.01 ≈ 10x the
default fixture rows — the caps below leave >10x slack even there).
"""
from __future__ import annotations

import pytest

from v6spark.plans import REGISTRY

NAMES = sorted(REGISTRY)

# Conservative canonicalization comfort caps, asserted at the test SF
# (default sf0.001; the env can point at sf0.01).  Driver scale is
# sf0.01 — row counts grow roughly linearly with SF, so the MAX_ROWS
# cap is checked against an SF-scaled allowance.
#
# HEADROOM RULE: the asserts below fire at 80% of these caps, so a
# column fold that drifts a judged query toward a limit fails HERE,
# in CI, with slack left — never first in the driver's judged run.
MAX_COLS = 24            # widest judged frame today is well under this
MAX_ROWS_AT_SF001 = 60_000   # scales ~10x at sf0.01: still tiny for pandas
MAX_CELLS = 600_000      # rows * cols guard (both small => product small)
MAX_CELL_CHARS = 4_000   # no megabyte blobs through the hash
HEADROOM = 0.8           # fail at 80% of every cap


@pytest.mark.parametrize("name", NAMES)
def test_judged_result_fits_canonicalization_budget(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.spark_fn(spark, sf_dir)
    ncols = len(df.columns)
    assert ncols <= int(MAX_COLS * HEADROOM), (
        f"{name}: {ncols} columns — a column fold pushed this judged "
        f"query past 80% of the {MAX_COLS}-column comfort cap"
    )
    rows = df.collect()
    sf_scale = 10.0 if "sf0.01" in sf_dir else 1.0
    cap = int(MAX_ROWS_AT_SF001 * sf_scale * HEADROOM)
    assert len(rows) <= cap, (
        f"{name}: {len(rows)} rows at {sf_dir} exceeds the 80% budget "
        f"({cap})"
    )
    assert len(rows) * ncols <= MAX_CELLS * sf_scale * HEADROOM
    # no single cell rendering to a monster string
    for r in rows[:200]:
        for v in r:
            if isinstance(v, str):
                assert len(v) <= int(MAX_CELL_CHARS * HEADROOM), (
                    f"{name}: a string cell of {len(v)} chars"
                )
            elif isinstance(v, (list, tuple)):
                assert len(v) <= int(512 * HEADROOM), (
                    f"{name}: an array cell of {len(v)} elements"
                )
