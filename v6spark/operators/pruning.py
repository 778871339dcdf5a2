"""Manifest-level data skipping: decide from per-file column
statistics alone whether a file can contain rows satisfying a SQL
predicate — the Delta/Iceberg min-max skipping idea applied to the
publish manifest's ``col_stats``, so a selective scan over a 100 TB
published corpus opens only the files whose recorded ranges overlap
the predicate, with ZERO footer reads at query time.

Safety model: pruning is ADVISORY-NEGATIVE only.  A conjunct the
parser cannot understand, a column without recorded stats, or a
type-confused comparison all degrade to "must scan" — extra work,
never a missing row.  The full predicate is re-applied by Spark on
whatever survives pruning, so correctness never depends on this
module; only efficiency does.

Supported conjuncts: ``col <op> literal`` and ``literal <op> col``
for ``= < <= > >=``, ``col IN (l1, l2, ...)``,
``col BETWEEN lo AND hi``, ``col LIKE 'prefix%'`` (one trailing ``%``,
no other wildcards — prunes as the range ``[prefix, next(prefix))``),
and ``col IS NULL`` (prunes files whose recorded null count is zero) /
``col IS NOT NULL`` (prunes files recorded as entirely NULL).
Literals: numbers, single-quoted strings (with '' escapes),
TRUE/FALSE.

Disjunctions (:func:`parse_disjuncts` + :func:`file_can_match_any`):
a TOP-LEVEL OR of conjunct groups — DNF-lite, e.g.
``day >= 13 OR split = 'valid'`` or ``(a = 1 AND b < 2) OR (c = 3)``
— prunes a file only when EVERY disjunct refutes it, which is exactly
as sound as the per-group rule (a row matching the predicate matches
some disjunct; that disjunct did not refute the file).  Nested
parenthesized ORs flatten; an OR *inside* an AND conjunct still makes
that conjunct unprunable (dropped — weaker, still sound).
:func:`parse_conjuncts` keeps its historical contract (top-level OR
=> ``[]``).

Stats entry shapes (both accepted everywhere): ``[min, max]`` and
``[min, max, null_count]``; ``[None, None, n]`` marks a column that is
entirely NULL in the file (no comparison can match it).
"""

from __future__ import annotations

import re

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^']|'')*')
      | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
      | (?P<op><=|>=|!=|<>|=|<|>)
      | (?P<punc>[(),])
    )""",
    re.VERBOSE,
)

_FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "="}


def _tokenize(sql: str):
    out, i = [], 0
    while i < len(sql):
        m = _TOKEN.match(sql, i)
        if m is None:
            if sql[i:].strip():
                return None  # something we don't understand at all
            break
        if m.group("str") is not None:
            out.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num") is not None:
            n = m.group("num")
            out.append(("lit", float(n) if ("." in n or "e" in n.lower())
                        else int(n)))
        elif m.group("ident") is not None:
            kw = m.group("ident").upper()
            if kw in ("AND", "OR", "NOT", "IN", "BETWEEN", "IS", "NULL",
                      "LIKE"):
                out.append((kw, kw))
            elif kw == "TRUE":
                out.append(("lit", True))
            elif kw == "FALSE":
                out.append(("lit", False))
            else:
                out.append(("ident", m.group("ident")))
        elif m.group("op") is not None:
            out.append(("op", m.group("op")))
        else:
            out.append(("punc", m.group("punc")))
        i = m.end()
    return out


def parse_conjuncts(sql: str) -> list[tuple]:
    """Top-level AND conjuncts of ``sql`` as ``(col, op, value)`` /
    ``(col, "in", [values])`` / ``(col, "between", (lo, hi))``
    tuples, keeping only the shapes :func:`file_can_match` can use.
    Returns ``[]`` (prune nothing) when the predicate contains a
    top-level OR / NOT / unbalanced structure — never guesses."""
    toks = _tokenize(sql)
    if toks is None or not _balanced(toks):
        return []
    return _conjuncts_of(toks)


def _conjuncts_of(toks: list[tuple], strict: bool = False):
    """Conjunct tuples of a balanced token list; ``[]`` on a top-level
    OR (per-file AND-pruning over a disjunction is unsound) or when
    nothing parses.  ``strict=True`` returns None instead of silently
    dropping a conjunct that fails to parse."""
    # split on top-level AND (depth tracked through parens; BETWEEN's
    # AND is consumed by the conjunct parser below, so we must split
    # only at ANDs not inside a BETWEEN — handled by scanning each
    # conjunct left-to-right and skipping one AND after BETWEEN)
    groups, cur, depth, between_pending = [], [], 0, 0
    for t in toks:
        if t[0] == "punc" and t[1] == "(":
            depth += 1
        elif t[0] == "punc" and t[1] == ")":
            depth -= 1
            if depth < 0:
                return []
        if t[0] == "BETWEEN" and depth == 0:
            # only a depth-0 BETWEEN swallows a depth-0 AND; a
            # parenthesized BETWEEN's AND never reaches the splitter
            between_pending += 1
        if t[0] == "OR" and depth == 0:
            return []  # disjunction: per-file AND-pruning is unsound
        if t[0] == "AND" and depth == 0:
            if between_pending:
                between_pending -= 1
                cur.append(t)
            else:
                groups.append(cur)
                cur = []
            continue
        cur.append(t)
    if depth != 0:
        return []
    groups.append(cur)

    out = []
    for g in groups:
        c = _parse_one(g)
        if c is not None:
            out.append(c)
        elif strict:
            return None
    return out


def parse_disjuncts_strict(sql: str) -> list[list[tuple]] | None:
    """Like :func:`parse_disjuncts`, but ``None`` unless EVERY
    conjunct of every disjunct parses into the tuple grammar — for
    callers that will APPLY the tuples as a row filter (pubcorpus's
    ``where`` option), where silently dropping an unparsed conjunct
    would return extra rows instead of merely scanning extra files."""
    toks = _tokenize(sql)
    if toks is None or not _balanced(toks):
        return None
    groups = _disjuncts_of(toks, strict=True)
    if not groups or any(g is None for g in groups):
        return None
    return groups


def parse_disjuncts(sql: str) -> list[list[tuple]]:
    """``sql`` as a one-level OR of conjunct groups (DNF-lite):
    ``[[conjunct, ...], ...]`` — one inner list per top-level
    disjunct; a pure conjunction returns a single group.  Consumers
    prune with :func:`file_can_match_any`: a file is skipped only
    when EVERY group refutes it.  A group whose conjuncts all fail to
    parse becomes ``[]``, which :func:`file_can_match` treats as
    must-scan — the whole predicate then prunes nothing, preserving
    the advisory-negative safety model.  Returns ``[]`` (prune
    nothing) on unparseable/unbalanced input."""
    toks = _tokenize(sql)
    if toks is None or not _balanced(toks):
        return []
    return _disjuncts_of(toks)


def _disjuncts_of(toks: list[tuple], strict: bool = False):
    # strip wrapping parens first so `(a AND b)` alone, or a fully
    # parenthesized disjunction, parses the same as its bare form
    while (
        len(toks) >= 2
        and toks[0] == ("punc", "(")
        and toks[-1] == ("punc", ")")
        and _balanced(toks[1:-1])
    ):
        toks = toks[1:-1]
    # split on top-level OR; BETWEEN never swallows an OR so no
    # pending-counter is needed here
    parts, cur, depth = [], [], 0
    for t in toks:
        if t[0] == "punc" and t[1] == "(":
            depth += 1
        elif t[0] == "punc" and t[1] == ")":
            depth -= 1
            if depth < 0:
                return []
        if t[0] == "OR" and depth == 0:
            parts.append(cur)
            cur = []
            continue
        cur.append(t)
    if depth != 0:
        return []
    parts.append(cur)
    if len(parts) == 1:
        return [_conjuncts_of(toks, strict=strict)]
    out: list[list[tuple]] = []
    for p in parts:
        # strip wrapping parens so `(a OR b) OR c` flattens through
        # recursion and `(a AND b) OR c` parses its group
        while (
            len(p) >= 2
            and p[0] == ("punc", "(")
            and p[-1] == ("punc", ")")
            and _balanced(p[1:-1])
        ):
            p = p[1:-1]
        if any(t[0] == "OR" and _depth_at(p, i) == 0
               for i, t in enumerate(p)):
            sub = _disjuncts_of(p, strict=strict)
            if strict and (not sub or any(g is None for g in sub)):
                return [None]
            out.extend(sub)
        else:
            out.append(_conjuncts_of(p, strict=strict))
    return out


def _depth_at(toks: list[tuple], idx: int) -> int:
    d = 0
    for t in toks[:idx]:
        if t == ("punc", "("):
            d += 1
        elif t == ("punc", ")"):
            d -= 1
    return d


def _parse_one(g: list[tuple]):
    # strip one level of wrapping parens
    while (
        len(g) >= 2
        and g[0] == ("punc", "(")
        and g[-1] == ("punc", ")")
        and _balanced(g[1:-1])
    ):
        g = g[1:-1]
    # col IS NULL / col IS NOT NULL (exact shapes only)
    if len(g) == 3 and g[0][0] == "ident" and g[1][0] == "IS" \
            and g[2][0] == "NULL":
        return (g[0][1], "isnull", None)
    if len(g) == 4 and g[0][0] == "ident" and g[1][0] == "IS" \
            and g[2][0] == "NOT" and g[3][0] == "NULL":
        return (g[0][1], "notnull", None)
    # col LIKE 'prefix%' — one trailing %, no other wildcards/escapes
    if len(g) == 3 and g[0][0] == "ident" and g[1][0] == "LIKE" \
            and g[2][0] == "lit" and isinstance(g[2][1], str):
        pat = g[2][1]
        body = pat[:-1]
        if (
            pat.endswith("%")
            and "%" not in body
            and "_" not in body
            and "\\" not in body
            and body
        ):
            return (g[0][1], "prefix", body)
        return None
    if any(t[0] in ("OR", "NOT", "LIKE", "IS") for t in g):
        return None  # not prunable with min/max
    # ident op lit
    if len(g) == 3 and g[0][0] == "ident" and g[1][0] == "op" \
            and g[2][0] == "lit":
        op = g[1][1]
        if op in ("!=", "<>"):
            return None  # a range almost never refutes inequality
        return (g[0][1], op, g[2][1])
    # lit op ident (flip)
    if len(g) == 3 and g[0][0] == "lit" and g[1][0] == "op" \
            and g[2][0] == "ident":
        op = _FLIP.get(g[1][1])
        return (g[2][1], op, g[0][1]) if op else None
    # ident IN ( lit , lit ... )
    if (
        len(g) >= 4
        and g[0][0] == "ident"
        and g[1][0] == "IN"
        and g[2] == ("punc", "(")
        and g[-1] == ("punc", ")")
    ):
        vals = []
        for t in g[3:-1]:
            if t[0] == "lit":
                vals.append(t[1])
            elif t == ("punc", ","):
                continue
            else:
                return None
        return (g[0][1], "in", vals) if vals else None
    # ident BETWEEN lit AND lit
    if (
        len(g) == 5
        and g[0][0] == "ident"
        and g[1][0] == "BETWEEN"
        and g[2][0] == "lit"
        and g[3][0] == "AND"
        and g[4][0] == "lit"
    ):
        return (g[0][1], "between", (g[2][1], g[4][1]))
    return None


def _balanced(toks) -> bool:
    d = 0
    for t in toks:
        if t == ("punc", "("):
            d += 1
        elif t == ("punc", ")"):
            d -= 1
            if d < 0:
                return False
    return d == 0


def _next_prefix(p: str) -> str | None:
    """Smallest string > every string starting with ``p`` (code-point
    order): bump the last incrementable char, skipping the surrogate
    gap.  None when nothing is incrementable (caller: no upper bound)."""
    for i in range(len(p) - 1, -1, -1):
        o = ord(p[i])
        if o >= 0x10FFFF:
            continue
        nxt = 0xE000 if 0xD7FF <= o < 0xE000 else o + 1
        return p[:i] + chr(nxt)
    return None


def file_can_match(conjuncts: list[tuple], stats: dict | None) -> bool:
    """Whether a file whose per-column stats are ``stats``
    (``{col: [min, max]}`` or ``{col: [min, max, null_count]}``;
    ``[None, None, n]`` = entirely-NULL column) can contain a row
    satisfying every conjunct.  Missing stats, unknown columns, or
    cross-type comparisons answer True (must scan)."""
    if not conjuncts or not stats:
        return True
    for col, op, val in conjuncts:
        st = stats.get(col)
        if st is None:
            continue  # no stats for this column: can't refute
        if st[0] is None:
            if len(st) > 2 and st[2]:
                # entirely-NULL column ([None, None, nulls>0]): no
                # comparison / prefix / NOT NULL row can exist; IS
                # NULL trivially can
                if op != "isnull":
                    return False
                continue
            continue  # unknown-bounds entry: must scan
        if op == "isnull":
            nc = st[2] if len(st) > 2 else None
            if nc == 0:
                return False  # recorded zero nulls
            continue
        if op == "notnull":
            continue  # min/max present => non-null values exist
        mn, mx = st[0], st[1]
        if op == "prefix":
            if not isinstance(mn, str):
                continue  # cross-type: must scan
            hi = _next_prefix(val)
            try:
                # inside the same TypeError guard as every other
                # comparison: a mixed-type stats entry (str min,
                # non-str max) must degrade to scan, not crash
                if mx < val or (hi is not None and mn >= hi):
                    return False
            except TypeError:
                continue
            continue
        try:
            if op == "=":
                if not (mn <= val <= mx):
                    return False
            elif op == "<":
                if not (mn < val):
                    return False
            elif op == "<=":
                if not (mn <= val):
                    return False
            elif op == ">":
                if not (mx > val):
                    return False
            elif op == ">=":
                if not (mx >= val):
                    return False
            elif op == "in":
                if not any(mn <= v <= mx for v in val):
                    return False
            elif op == "between":
                lo, hi = val
                if hi < mn or lo > mx:
                    return False
        except TypeError:
            continue  # cross-type comparison: must scan
    return True


def file_can_match_any(
    groups: list[list[tuple]], stats: dict | None
) -> bool:
    """Disjunctive matcher: can the file contain a row satisfying ANY
    of the conjunct ``groups`` (from :func:`parse_disjuncts`)?  Empty
    ``groups`` (unparseable predicate) answers True — must scan."""
    if not groups:
        return True
    return any(file_can_match(g, stats) for g in groups)
