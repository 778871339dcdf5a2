"""Property parity: the vectorized CDC classifier must agree with
the exact per-row classifier on arbitrary scalar tables — same
change sets under nulls, NaNs, negative keys, string keys, empty
sides, and full-rewrite (all-unchanged) windows.  Pure functions, no
Spark session: the classifiers take arrow tables and yield arrow
batches."""
from __future__ import annotations

import math

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from v6spark.sources.pubcdc import (
    _classify_rows,
    _classify_vector,
    _vectorizable,
)

_FIELDS = [
    pa.field("k", pa.int64()),
    pa.field("txt", pa.string()),
    pa.field("x", pa.float64()),
    pa.field("split", pa.string()),
]
_TARGET = pa.schema(
    list(_FIELDS)
    + [pa.field("_change_type", pa.string()),
       pa.field("_commit_version", pa.int64())]
)

_val = st.one_of(
    st.none(),
    st.text(max_size=6),
)
_num = st.one_of(
    st.none(),
    st.just(float("nan")),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)


@st.composite
def _sides(draw):
    keys = draw(st.lists(
        st.integers(-(1 << 40), 1 << 40), unique=True, max_size=12
    ))
    rows = {
        k: (k, draw(_val), draw(_num),
            draw(st.sampled_from(["train", "valid"])))
        for k in keys
    }
    # new side: drop some, mutate some, add some
    dropped = set(draw(st.lists(st.sampled_from(keys), max_size=4))
                  ) if keys else set()
    new_rows = {}
    for k, r in rows.items():
        if k in dropped:
            continue
        if draw(st.booleans()):
            new_rows[k] = (k, draw(_val), draw(_num), r[3])
        else:
            new_rows[k] = r  # unchanged: must be suppressed
    for _ in range(draw(st.integers(0, 3))):
        nk = draw(st.integers(-(1 << 40), 1 << 40))
        if nk not in rows:
            new_rows[nk] = (nk, draw(_val), draw(_num), "train")
    return list(rows.values()), list(new_rows.values())


def _table(rows):
    cols = list(zip(*rows)) if rows else [[], [], [], []]
    return pa.table(
        {f.name: pa.array(list(c), type=f.type)
         for f, c in zip(_FIELDS, cols)}
    )


def _norm(batches):
    out = []
    for b in batches:
        for row in zip(*(col.to_pylist() for col in b.columns)):
            out.append(tuple(
                "NaN" if isinstance(v, float) and math.isnan(v) else v
                for v in row
            ))
    return sorted(out, key=str)


@settings(max_examples=200, deadline=None)
@given(_sides())
def test_vector_matches_rowwise(sides):
    old_rows, new_rows = sides
    old_tab, new_tab = _table(old_rows), _table(new_rows)
    assert _vectorizable(_FIELDS, pa)
    got = _norm(_classify_vector(
        old_tab, new_tab, _FIELDS, 0, 7, _TARGET,
        pa.string(), pa.int64(),
    ))
    ref = _norm(_classify_rows(
        old_tab, new_tab, _FIELDS, 0, 7, _TARGET,
        pa.string(), pa.int64(),
    ))
    assert got == ref


def test_full_rewrite_nets_zero_even_with_nan():
    rows = [(i, "t", float("nan"), "train") for i in range(50)]
    tab = _table(rows)
    got = list(_classify_vector(
        tab, tab, _FIELDS, 0, 3, _TARGET, pa.string(), pa.int64()
    ))
    assert _norm(got) == []


def test_vectorizable_gate():
    nested = _FIELDS + [pa.field("emb", pa.list_(pa.float64()))]
    assert not _vectorizable(nested, pa)
    assert _vectorizable(_FIELDS, pa)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
