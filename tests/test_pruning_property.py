"""Property tests for the data-skipping matcher (operators/pruning.py).

THE soundness invariant, fuzzed: for ANY file contents and ANY
supported predicate, if some row satisfies every conjunct (SQL
three-valued semantics: NULL never satisfies), then
``file_can_match`` must answer True for stats computed the way
``_collect_col_stats`` computes them (min/max over non-null values,
null counts, all-NULL markers, truncated string bounds).  Pruning a
file that holds a matching row is the one unforgivable failure mode —
extra scans are fine, missing rows are not.

Plus a parser round-trip: rendering a conjunct list back to SQL and
re-parsing yields the same conjuncts (quote escaping included).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from v6spark.operators.pruning import (
    _next_prefix,
    file_can_match,
    file_can_match_any,
    parse_conjuncts,
    parse_disjuncts,
)
from v6spark.pipeline import _STR_STAT_MAX, _trunc_lower, _trunc_upper

# ---------------------------------------------------------------- model

_INT_COLS = ["a", "b"]
_STR_COLS = ["s", "t"]

_ints = st.integers(min_value=-50, max_value=50)
_strs = st.text(
    alphabet=st.characters(codec="utf-8", max_codepoint=0x2FFFF),
    max_size=80,
)


@st.composite
def _table(draw):
    """{col: [values-with-nulls]} over two int and two str columns."""
    n = draw(st.integers(min_value=0, max_value=8))
    cols = {}
    for c in _INT_COLS:
        cols[c] = [
            draw(st.one_of(st.none(), _ints)) for _ in range(n)
        ]
    for c in _STR_COLS:
        cols[c] = [
            draw(st.one_of(st.none(), _strs)) for _ in range(n)
        ]
    return cols


def _stats_of(cols: dict) -> dict:
    """Per-column stats exactly as _collect_col_stats records them:
    [min, max, nulls] over non-null values (strings truncated), or
    the all-NULL marker, or absent for an empty file."""
    out = {}
    for c, vals in cols.items():
        nn = [v for v in vals if v is not None]
        nc = sum(1 for v in vals if v is None)
        if not nn:
            if nc:
                out[c] = [None, None, nc]
            continue
        mn, mx = min(nn), max(nn)
        if isinstance(mn, str):
            mn, mx = _trunc_lower(mn), _trunc_upper(mx)
            if mx is None:
                continue  # unincrementable bound: stat omitted
        out[c] = [mn, mx, nc]
    return out


@st.composite
def _conjunct(draw):
    """(conjunct tuple, row -> bool).  Only same-type comparisons —
    the domain the collector records stats for."""
    int_col = draw(st.sampled_from(_INT_COLS))
    str_col = draw(st.sampled_from(_STR_COLS))
    kind = draw(st.sampled_from(
        ["cmp_i", "cmp_s", "in", "between", "prefix", "isnull", "notnull"]
    ))
    if kind in ("cmp_i", "cmp_s"):
        op = draw(st.sampled_from(["=", "<", "<=", ">", ">="]))
        if kind == "cmp_i":
            col, lit = int_col, draw(_ints)
        else:
            col, lit = str_col, draw(_strs.filter(lambda s: s))
        import operator as _op

        fn = {"=": _op.eq, "<": _op.lt, "<=": _op.le,
              ">": _op.gt, ">=": _op.ge}[op]
        return (col, op, lit), (
            lambda r, c=col, f=fn, v=lit:
            r[c] is not None and f(r[c], v)
        )
    if kind == "in":
        col = int_col
        vals = draw(st.lists(_ints, min_size=1, max_size=4))
        return (col, "in", vals), (
            lambda r, c=col, vs=set(vals): r[c] is not None and r[c] in vs
        )
    if kind == "between":
        col = int_col
        lo, hi = sorted((draw(_ints), draw(_ints)))
        return (col, "between", (lo, hi)), (
            lambda r, c=col, a=lo, b=hi:
            r[c] is not None and a <= r[c] <= b
        )
    if kind == "prefix":
        col = str_col
        pre = draw(_strs.filter(lambda s: 0 < len(s) <= 90))
        return (col, "prefix", pre), (
            lambda r, c=col, p=pre:
            r[c] is not None and r[c].startswith(p)
        )
    col = draw(st.sampled_from(_INT_COLS + _STR_COLS))
    if kind == "isnull":
        return (col, "isnull", None), (lambda r, c=col: r[c] is None)
    return (col, "notnull", None), (lambda r, c=col: r[c] is not None)


@settings(max_examples=400, deadline=None)
@given(_table(), st.lists(_conjunct(), min_size=1, max_size=4))
def test_never_prunes_a_matching_file(cols, conjs):
    stats = _stats_of(cols)
    n = len(next(iter(cols.values()))) if cols else 0
    rows = [{c: cols[c][i] for c in cols} for i in range(n)]
    tuples = [c for c, _fn in conjs]
    fns = [fn for _c, fn in conjs]
    any_match = any(all(fn(r) for fn in fns) for r in rows)
    if any_match:
        assert file_can_match(tuples, stats), (tuples, stats, rows)


def _render(conjs):
    """(SQL fragments, expected tuples) for a conjunct list."""
    parts = []
    expect = []
    for (col, op, val), _fn in conjs:
        if op in ("=", "<", "<=", ">", ">="):
            if isinstance(val, str):
                parts.append(f"{col} {op} '" + val.replace("'", "''") + "'")
            else:
                parts.append(f"{col} {op} {val}")
            expect.append((col, op, val))
        elif op == "in":
            parts.append(f"{col} IN ({', '.join(map(str, val))})")
            expect.append((col, "in", list(val)))
        elif op == "between":
            parts.append(f"{col} BETWEEN {val[0]} AND {val[1]}")
            expect.append((col, "between", val))
        elif op == "prefix":
            esc = val.replace("'", "''")
            if "%" in val or "_" in val or "\\" in val:
                continue  # unprunable LIKE shapes render differently
            parts.append(f"{col} LIKE '{esc}%'")
            expect.append((col, "prefix", val))
        elif op == "isnull":
            parts.append(f"{col} IS NULL")
            expect.append((col, "isnull", None))
        else:
            parts.append(f"{col} IS NOT NULL")
            expect.append((col, "notnull", None))
    return parts, expect


@settings(max_examples=300, deadline=None)
@given(st.lists(_conjunct(), min_size=1, max_size=4))
def test_parser_round_trip(conjs):
    parts, expect = _render(conjs)
    if not parts:
        return
    assert parse_conjuncts(" AND ".join(parts)) == expect


@settings(max_examples=300, deadline=None)
@given(st.lists(
    st.lists(_conjunct(), min_size=1, max_size=3), min_size=1, max_size=3,
))
def test_disjunct_parser_round_trip(groups):
    rendered = []
    expect = []
    for g in groups:
        parts, exp = _render(g)
        if not parts:
            return  # a group that renders empty changes the shape
        rendered.append("(" + " AND ".join(parts) + ")")
        expect.append(exp)
    got = parse_disjuncts(" OR ".join(rendered))
    if len(groups) == 1:
        assert got == [expect[0]]
    else:
        assert got == expect


@settings(max_examples=400, deadline=None)
@given(
    _table(),
    st.lists(
        st.lists(_conjunct(), min_size=1, max_size=3),
        min_size=1, max_size=3,
    ),
)
def test_disjunction_never_prunes_a_matching_file(cols, groups):
    """THE soundness invariant over DNF-lite: if some row satisfies
    EVERY conjunct of ANY disjunct, file_can_match_any must be True."""
    stats = _stats_of(cols)
    n = len(next(iter(cols.values()))) if cols else 0
    rows = [{c: cols[c][i] for c in cols} for i in range(n)]
    tuple_groups = [[c for c, _fn in g] for g in groups]
    any_match = any(
        all(fn(r) for _c, fn in g) for g in groups for r in rows
    )
    if any_match:
        assert file_can_match_any(tuple_groups, stats), (
            tuple_groups, stats, rows
        )


@settings(max_examples=300, deadline=None)
@given(_strs.filter(lambda s: s))
def test_next_prefix_strictly_dominates(p):
    nxt = _next_prefix(p)
    if nxt is None:
        return
    # nxt must exceed EVERY string starting with p (code-point order)
    assert nxt > p
    assert nxt > p + "\U0010ffff" * 3


@settings(max_examples=300, deadline=None)
@given(st.text(
    alphabet=st.characters(codec="utf-8", max_codepoint=0x2FFFF),
    min_size=_STR_STAT_MAX + 1,
    max_size=_STR_STAT_MAX + 40,
))
def test_trunc_bounds_bracket_original(s):
    lo, hi = _trunc_lower(s), _trunc_upper(s)
    assert lo <= s
    if hi is not None:
        assert hi > s
