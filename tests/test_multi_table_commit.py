"""Atomic multi-table commits (txlog.commit_pair / intent markers).

One commit point spans two tables: each half's manifest carries a
shared intent pointer and is INVISIBLE until the single
``<intent>.committed`` marker lands.  A crash anywhere before the
marker leaves BOTH tables at their pre-pair versions permanently, in
both commit modes; the abandoned version numbers never deadlock the
logs (collision bump); vacuum sweeps the debris without ever touching
a marker a live manifest still needs.
"""
from __future__ import annotations

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    atomic_published_pair,
    publish_corpus_committed,
    read_published_corpus,
    retract_from_published,
    upsert_into_published,
    vacuum_published_files,
)


def _mk(spark, tmp_path, name, n=20):
    docs = spark.range(n).selectExpr(
        "id as doc_id", f"concat('{name} ', id) as text"
    )
    prepared = spark.range(n).selectExpr("id as doc_id", "'train' as split")
    root = str(tmp_path / name)
    publish_corpus_committed(prepared, docs, root, n_shards=2)
    return root


def _upsert_spec(spark, doc_id, text):
    return {
        "op": "upsert",
        "updates": spark.createDataFrame(
            [(doc_id, text, None)],
            "doc_id long, text string, split string",
        ),
    }


def _state(spark, root):
    v, _doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")
    rows = sorted(
        (r["doc_id"], r["text"])
        for r in read_published_corpus(spark, root).collect()
    )
    return v, rows


def test_pair_commits_atomically(spark, tmp_path):
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    res = atomic_published_pair(spark, [
        (a, _upsert_spec(spark, 3, "rev a3")),
        (b, {"op": "retract", "predicate": "doc_id = 5"}),
    ])
    assert [r["_version"] for r in res] == [2, 2]
    va, rows_a = _state(spark, a)
    vb, rows_b = _state(spark, b)
    assert va == vb == 2
    assert (3, "rev a3") in rows_a
    assert all(d != 5 for d, _t in rows_b)


@pytest.mark.parametrize("commit_mode", ["rename", "put"])
@pytest.mark.parametrize("crash", ["between", "before_marker"])
def test_crash_leaves_both_tables_pre_window(
    spark, tmp_path, commit_mode, crash
):
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    pre_a, pre_b = _state(spark, a), _state(spark, b)
    kw = (
        {"_fail_between": 0} if crash == "between"
        else {"_fail_before_marker": True}
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        atomic_published_pair(spark, [
            (a, _upsert_spec(spark, 3, "rev a3")),
            (b, _upsert_spec(spark, 4, "rev b4")),
        ], commit_mode=commit_mode, **kw)
    # both tables read EXACTLY their pre-pair state — the pending
    # halves are invisible, forever
    assert _state(spark, a) == pre_a
    assert _state(spark, b) == pre_b

    # liveness: the abandoned version numbers never block the logs —
    # independent DML claims past them
    res = upsert_into_published(
        spark, a,
        spark.createDataFrame(
            [(7, "solo a7", None)], "doc_id long, text string, split string"
        ),
        commit_mode=commit_mode,
    )
    assert res["_version"] >= 2
    assert (7, "solo a7") in _state(spark, a)[1]

    # and the RE-RUN pair lands atomically on the fresh state
    res = atomic_published_pair(spark, [
        (a, _upsert_spec(spark, 3, "rev a3")),
        (b, _upsert_spec(spark, 4, "rev b4")),
    ], commit_mode=commit_mode)
    assert (3, "rev a3") in _state(spark, a)[1]
    assert (4, "rev b4") in _state(spark, b)[1]


def test_pending_halves_invisible_to_all_readers(spark, tmp_path):
    """The pending manifest must be invisible through EVERY front
    door: txlog readers, the publog audit source, and pubcorpus."""
    from v6spark.sources.publog import register_publog_source
    from v6spark.sources.pubcorpus import register_pubcorpus_source

    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    with pytest.raises(RuntimeError):
        atomic_published_pair(spark, [
            (a, _upsert_spec(spark, 1, "ghost")),
            (b, _upsert_spec(spark, 2, "ghost")),
        ], _fail_before_marker=True)
    register_publog_source(spark)
    log = spark.read.format("publog").load(a).collect()
    assert [r["version"] for r in log] == [1]  # the pending v2 hidden
    register_pubcorpus_source(spark)
    got = spark.read.format("pubcorpus").load(a)
    assert got.filter("text = 'ghost'").count() == 0
    assert got.count() == 20


def test_vacuum_sweeps_aborted_pairs_and_keeps_live_markers(
    spark, tmp_path
):
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    # aborted pair: pending manifests become vacuumable debris
    with pytest.raises(RuntimeError):
        atomic_published_pair(spark, [
            (a, _upsert_spec(spark, 1, "dead")),
            (b, _upsert_spec(spark, 2, "dead")),
        ], _fail_before_marker=True)
    # completed pair: its marker must survive while a half is retained
    atomic_published_pair(spark, [
        (a, _upsert_spec(spark, 3, "live a")),
        (b, _upsert_spec(spark, 4, "live b")),
    ])
    vacuum_published_files(spark, a, keep_last=1)
    vacuum_published_files(spark, b, keep_last=1)

    fs, jdir, jvm = txlog._jfs(spark, f"{a}/{_COMMITS}")
    names = sorted(
        st.getPath().getName() for st in fs.listStatus(jdir)
    )
    pending = [
        n for n in names
        if n.startswith(txlog.MANIFEST_PREFIX)
        and txlog.read_version(
            spark, f"{a}/{_COMMITS}", int(n[len(txlog.MANIFEST_PREFIX):])
        ) is None
    ]
    assert pending == []  # the aborted half's manifest was swept
    markers = [n for n in names if n.endswith(".committed")]
    assert len(markers) == 1  # the live pair's marker survived
    assert (3, "live a") in _state(spark, a)[1]
    assert (4, "live b") in _state(spark, b)[1]

    # retire the pair's halves on BOTH tables; the marker goes on the
    # NEXT sweep of its host log (a's vacuum runs while b's half still
    # lives, so the first pass correctly keeps it)
    retract_from_published(spark, a, "doc_id = 0")
    retract_from_published(spark, b, "doc_id = 0")
    vacuum_published_files(spark, a, keep_last=1)
    vacuum_published_files(spark, b, keep_last=1)
    txlog._INTENT_OK.clear()  # simulate a fresh process
    vacuum_published_files(spark, a, keep_last=1)
    names2 = sorted(
        st.getPath().getName() for st in fs.listStatus(jdir)
    )
    assert [n for n in names2 if n.endswith(".committed")] == []


def test_overtaken_pair_aborts_and_concurrent_write_survives(
    spark, tmp_path
):
    """A writer landing on a participant table between the pair's
    halves makes the pair ABORT at the overtake re-check: the racing
    write survives, NEITHER pair half ever becomes visible, and the
    pair is cleanly retryable."""
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")

    def racing_writer():
        # lands on table a AFTER the pair's a-half committed pending:
        # reads latest = v1 (the pending half is invisible), collides
        # with the pending version number, bumps past it, commits
        # visibly ABOVE the pair's half
        upsert_into_published(
            spark, a,
            spark.createDataFrame(
                [(9, "racer", None)],
                "doc_id long, text string, split string",
            ),
        )

    with pytest.raises(IOError, match="overtaken"):
        atomic_published_pair(spark, [
            (a, _upsert_spec(spark, 3, "pair a")),
            (b, _upsert_spec(spark, 4, "pair b")),
        ], _between_hook=racing_writer)
    rows_a = _state(spark, a)[1]
    rows_b = _state(spark, b)[1]
    assert all(t != "pair a" for _d, t in rows_a)
    assert all(t != "pair b" for _d, t in rows_b)
    assert (9, "racer") in rows_a  # the racing write is untouched
    # the retry lands atomically on the fresh state
    atomic_published_pair(spark, [
        (a, _upsert_spec(spark, 3, "pair a")),
        (b, _upsert_spec(spark, 4, "pair b")),
    ])
    assert (3, "pair a") in _state(spark, a)[1]
    assert (4, "pair b") in _state(spark, b)[1]
    assert (9, "racer") in _state(spark, a)[1]


def test_pair_half_on_a_branch_records_the_branch_log(spark, tmp_path):
    """A branch-targeted half commits to the BRANCH chain; the intent
    marker must list that chain (recording main instead would either
    spuriously abort at seal time or let a later vacuum delete the
    marker while the branch manifest still references it — losing the
    branch head in any fresh process)."""
    from v6spark.pipeline import create_published_branch

    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    create_published_branch(spark, a, "exp")
    # advance MAIN strictly past the branch's next version (branch
    # will commit at v2) so a main-recorded overtake check would
    # spuriously abort, and a main-recorded marker reference would
    # retire before the branch manifest does
    for i, t in ((15, "main adv"), (16, "main adv2")):
        upsert_into_published(
            spark, a,
            spark.createDataFrame(
                [(i, t, None)],
                "doc_id long, text string, split string",
            ),
        )
    res = atomic_published_pair(spark, [
        (a, {**_upsert_spec(spark, 3, "branch rev"), "branch": "exp"}),
        (b, _upsert_spec(spark, 4, "b rev")),
    ])
    assert len(res) == 2
    br = read_published_corpus(spark, a, branch="exp")
    assert br.filter("text = 'branch rev'").count() == 1
    # main untouched by the branch half
    assert read_published_corpus(spark, a).filter(
        "text = 'branch rev'"
    ).count() == 0
    # vacuum both tables; the marker must survive (the BRANCH manifest
    # references it) and the branch head must stay visible to a fresh
    # process
    vacuum_published_files(spark, a, keep_last=1)
    vacuum_published_files(spark, b, keep_last=1)
    txlog._INTENT_OK.clear()
    br2 = read_published_corpus(spark, a, branch="exp")
    assert br2 is not None
    assert br2.filter("text = 'branch rev'").count() == 1


def test_pair_validates_distinct_roots(spark, tmp_path):
    a = _mk(spark, tmp_path, "a", n=5)
    with pytest.raises(ValueError, match="DISTINCT"):
        atomic_published_pair(spark, [
            (a, _upsert_spec(spark, 1, "x")),
            (a, _upsert_spec(spark, 2, "y")),
        ])


def test_commit_pair_txlog_primitive(spark, tmp_path):
    """The raw txlog primitive over two bare logs."""
    la = str(tmp_path / "la")
    lb = str(tmp_path / "lb")
    out = txlog.commit_pair(spark, [
        (la, lambda v, doc: {"n": (doc or {}).get("n", 0) + 1}),
        (lb, lambda v, doc: {"m": 10}),
    ])
    assert [v for _d, v in out] == [1, 1]
    va, da = txlog.read_latest(spark, la)
    vb, db = txlog.read_latest(spark, lb)
    assert (va, da["n"]) == (1, 1) and (vb, db["m"]) == (1, 10)
    with pytest.raises(RuntimeError):
        txlog.commit_pair(spark, [
            (la, lambda v, doc: {"n": 99}),
            (lb, lambda v, doc: {"m": 99}),
        ], _fail_between=0)
    va2, da2 = txlog.read_latest(spark, la)
    assert (va2, da2["n"]) == (1, 1)  # pending half invisible


@pytest.mark.parametrize("commit_mode", ["rename", "put"])
@pytest.mark.parametrize("fail_after", [0, 1, None])
def test_commit_multi_three_tables(spark, tmp_path, commit_mode, fail_after):
    """N=3 (data + metrics + index logs) in ONE commit point: a crash
    between halves 1/2 or 2/3 leaves all THREE tables pre-commit in
    both commit modes; a clean run lands all three together."""
    logs = [str(tmp_path / n) for n in ("data", "metrics", "ivf")]
    base = txlog.commit_multi(spark, [
        (lg, lambda v, doc, i=i: {"table": i, "gen": 1})
        for i, lg in enumerate(logs)
    ], commit_mode=commit_mode)
    assert [v for _d, v in base] == [1, 1, 1]

    kw = {} if fail_after is None else {"_fail_between": fail_after}
    attempt = lambda: txlog.commit_multi(spark, [  # noqa: E731
        (lg, lambda v, doc, i=i: {"table": i, "gen": 2})
        for i, lg in enumerate(logs)
    ], commit_mode=commit_mode, **kw)
    if fail_after is None:
        attempt()
        want = 2
    else:
        with pytest.raises(RuntimeError, match="injected crash"):
            attempt()
        want = 1
    for lg in logs:
        v, doc = txlog.read_latest(spark, lg)
        assert doc["gen"] == want, (lg, doc)
    # the aborted attempt never deadlocks the logs: a follow-up
    # three-table commit succeeds (collision bump past the debris)
    txlog.commit_multi(spark, [
        (lg, lambda v, doc, i=i: {"table": i, "gen": 9})
        for i, lg in enumerate(logs)
    ], commit_mode=commit_mode)
    for lg in logs:
        _v, doc = txlog.read_latest(spark, lg)
        assert doc["gen"] == 9
