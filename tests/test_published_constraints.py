"""CHECK constraints on published corpora (set/drop/list +
enforcement at every ingress surface).

Delta's ALTER TABLE ADD CONSTRAINT shape: a named SQL boolean in the
manifest; adding validates existing rows; every later write surface
(publish / upsert / promote / SQL writer append) refuses a violating
commit loudly and atomically (nothing lands).  SQL three-valued
semantics: NULL passes, only IS-FALSE violates.
"""
from __future__ import annotations

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    compact_published,
    drop_published_constraint,
    list_published_constraints,
    promote_staged,
    publish_corpus_committed,
    read_published_corpus,
    restore_published,
    retract_from_published,
    set_published_constraint,
    stage_corpus_publish,
    upsert_into_published,
)
from v6spark.sources.pubcorpus import register_pubcorpus_source


def _df(spark, lo, n, day_base=0):
    return spark.range(lo, lo + n).selectExpr(
        "id as doc_id", "concat('body ', id) as text",
        f"cast(id % 7 + {day_base} as long) as day",
        "case when id % 10 = 0 then 'valid' else 'train' end as split",
    )


def _publish(spark, tmp_path, n=40):
    df = _df(spark, 0, n)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        df.selectExpr("doc_id", "split"), df.drop("split"), root,
        n_shards=4,
    )
    return root


def _version(spark, root):
    return txlog.read_latest(spark, f"{root}/{_COMMITS}")[0]


def _up(spark, root, rows):
    return upsert_into_published(
        spark, root,
        spark.createDataFrame(
            rows, "doc_id long, text string, day long, split string"
        ),
    )


def test_set_list_drop_lifecycle(spark, tmp_path):
    root = _publish(spark, tmp_path)
    res = set_published_constraint(
        spark, root, "day_in_week", "day >= 0 AND day < 7"
    )
    assert res["_version"] == 2
    assert list_published_constraints(spark, root) == {
        "day_in_week": "day >= 0 AND day < 7"
    }
    set_published_constraint(
        spark, root, "text_nonempty", "length(text) > 0"
    )
    assert len(list_published_constraints(spark, root)) == 2
    drop_published_constraint(spark, root, "text_nonempty")
    assert list_published_constraints(spark, root) == {
        "day_in_week": "day >= 0 AND day < 7"
    }
    with pytest.raises(ValueError, match="no CHECK constraint"):
        drop_published_constraint(spark, root, "text_nonempty")


def test_set_validates_existing_rows(spark, tmp_path):
    root = _publish(spark, tmp_path)
    with pytest.raises(ValueError, match="day_small.*violated"):
        set_published_constraint(spark, root, "day_small", "day < 3")
    # nothing committed, no constraint recorded
    assert _version(spark, root) == 1
    assert list_published_constraints(spark, root) == {}


def test_set_refuses_unknown_column_and_nonportable_expr(
    spark, tmp_path
):
    root = _publish(spark, tmp_path)
    with pytest.raises(Exception, match="no_such|UNRESOLVED|cannot"):
        set_published_constraint(spark, root, "c", "no_such_col > 0")
    # Spark-only function: fine for Spark but the SQL writer's
    # JVM-free DuckDB enforcement can't evaluate it — refused at set
    # time, not at some future append
    with pytest.raises(ValueError, match="portable"):
        set_published_constraint(
            spark, root, "c", "xxhash64(text) IS NOT NULL"
        )
    assert _version(spark, root) == 1


def test_upsert_enforces_and_is_atomic(spark, tmp_path):
    root = _publish(spark, tmp_path)
    set_published_constraint(
        spark, root, "day_in_week", "day >= 0 AND day < 7"
    )
    before = sorted(
        tuple(r) for r in read_published_corpus(spark, root).collect()
    )
    with pytest.raises(ValueError, match="day_in_week.*violated"):
        _up(spark, root, [(3, "ok", 2, "train"),
                          (901, "bad", 99, "train")])
    assert _version(spark, root) == 2
    assert sorted(
        tuple(r) for r in read_published_corpus(spark, root).collect()
    ) == before
    # compliant delta commits and the constraint rides along
    _up(spark, root, [(3, "ok", 2, "train")])
    assert list_published_constraints(spark, root) == {
        "day_in_week": "day >= 0 AND day < 7"
    }


def test_null_passes_check(spark, tmp_path):
    """SQL CHECK three-valued logic: a NULL-evaluating expression is
    not a violation; banning NULL takes an explicit IS NOT NULL."""
    root = _publish(spark, tmp_path)
    set_published_constraint(spark, root, "day_lt7", "day < 7")
    _up(spark, root, [(902, "null day", None, "train")])  # passes
    with pytest.raises(ValueError, match="day_present.*violated"):
        set_published_constraint(
            spark, root, "day_present", "day IS NOT NULL"
        )


def test_full_republish_enforces_and_carries(spark, tmp_path):
    root = _publish(spark, tmp_path)
    set_published_constraint(spark, root, "day_lt7", "day < 7")
    bad = _df(spark, 0, 40, day_base=5)  # days 5..11
    with pytest.raises(ValueError, match="day_lt7.*violated"):
        publish_corpus_committed(
            bad.selectExpr("doc_id", "split"), bad.drop("split"), root,
            n_shards=4,
        )
    good = _df(spark, 0, 30)
    publish_corpus_committed(
        good.selectExpr("doc_id", "split"), good.drop("split"), root,
        n_shards=4,
    )
    assert list_published_constraints(spark, root) == {
        "day_lt7": "day < 7"
    }


def test_promote_staged_audits_constraints(spark, tmp_path):
    root = _publish(spark, tmp_path)
    set_published_constraint(spark, root, "day_lt7", "day < 7")
    bad = _df(spark, 100, 20, day_base=5)
    stage_corpus_publish(
        bad.selectExpr("doc_id", "split"), bad.drop("split"), root,
        "cand", n_shards=4,
    )
    with pytest.raises(ValueError, match="day_lt7.*violated"):
        promote_staged(spark, root, "cand")
    good = _df(spark, 200, 20)
    stage_corpus_publish(
        good.selectExpr("doc_id", "split"), good.drop("split"), root,
        "cand2", n_shards=4,
    )
    promote_staged(spark, root, "cand2")
    assert list_published_constraints(spark, root) == {
        "day_lt7": "day < 7"
    }


def test_sql_writer_enforces_per_batch(spark, tmp_path):
    root = _publish(spark, tmp_path)
    set_published_constraint(spark, root, "day_lt7", "day < 7")
    v = _version(spark, root)

    register_pubcorpus_source(spark)
    bad = _df(spark, 500, 20, day_base=5)
    with pytest.raises(Exception, match="day_lt7"):
        bad.write.format("pubcorpus").mode("append").save(root)
    # atomic: no version landed, table unchanged
    assert _version(spark, root) == v
    assert read_published_corpus(spark, root).count() == 40

    good = _df(spark, 500, 20)
    good.write.format("pubcorpus").mode("append").save(root)
    assert read_published_corpus(spark, root).count() == 60
    # the append carried the constraint forward
    assert list_published_constraints(spark, root) == {
        "day_lt7": "day < 7"
    }
    # ... and enforcement still works on the NEXT surface
    with pytest.raises(ValueError, match="day_lt7.*violated"):
        _up(spark, root, [(903, "bad", 42, "train")])


def test_drop_reopens_the_gate(spark, tmp_path):
    root = _publish(spark, tmp_path)
    set_published_constraint(spark, root, "day_lt7", "day < 7")
    drop_published_constraint(spark, root, "day_lt7")
    _up(spark, root, [(904, "now fine", 42, "train")])
    assert read_published_corpus(spark, root).filter(
        "doc_id = 904"
    ).count() == 1


def test_dml_carries_constraints(spark, tmp_path):
    root = _publish(spark, tmp_path)
    set_published_constraint(spark, root, "day_lt7", "day < 7")
    retract_from_published(spark, root, "doc_id < 5")
    assert list_published_constraints(spark, root) == {
        "day_lt7": "day < 7"
    }
    compact_published(spark, root)
    assert list_published_constraints(spark, root) == {
        "day_lt7": "day < 7"
    }


def test_restore_reverts_the_constraint_set(spark, tmp_path):
    """RESTORE is a full state rollback: the target version's
    constraint set comes back with its data."""
    root = _publish(spark, tmp_path)                    # v1: none
    set_published_constraint(spark, root, "day_lt7", "day < 7")
    restore_published(spark, root, version=1)
    assert list_published_constraints(spark, root) == {}


def test_writer_refuses_mid_flight_constraint_change(spark, tmp_path):
    """A constraint committed between write planning and commit means
    the staged rows were validated against the OLD set — the commit
    must refuse (same posture as the concurrent-reshard refusal)."""
    from v6spark.sources.pubcorpus_writer import make_writer

    root = _publish(spark, tmp_path)
    df = _df(spark, 0, 1)
    w = make_writer(root, df.schema, {}, overwrite=False)
    set_published_constraint(spark, root, "day_lt7", "day < 7")
    with pytest.raises(ValueError, match="constraints changed"):
        w.commit([])
