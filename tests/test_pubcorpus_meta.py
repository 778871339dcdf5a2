"""Metadata tables through SQL: spark.read.format("pubcorpus")
.option("meta", "history" | "files") — manifest-only, parity-pinned
against the Python-side published_history / published_file_census.
"""
from __future__ import annotations

import json

import pytest

from v6spark.pipeline import (
    create_published_branch,
    publish_corpus_committed,
    published_file_census,
    published_history,
    restore_published,
    retract_from_published,
    upsert_into_published,
)
from v6spark.sources.pubcorpus import register_pubcorpus_source


def _publish(spark, tmp_path, n=40):
    df = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text",
        "cast(id % 7 as long) as day",
        "case when id % 10 = 0 then 'valid' else 'train' end as split",
    )
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        df.selectExpr("doc_id", "split"), df.drop("split"), root,
        n_shards=4,
    )
    return root


def _mutate(spark, root):
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(3, "edit", 1, "train")],
            "doc_id long, text string, day long, split string",
        ),
        txn_id="job-9",
    )
    retract_from_published(spark, root, "doc_id = 5", strategy="dv")
    restore_published(spark, root, version=2)


def _meta(spark, root, mode, **opts):
    register_pubcorpus_source(spark)
    r = spark.read.format("pubcorpus").option("meta", mode)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(root)


def _rows(df):
    cols = df.columns
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def test_meta_history_matches_python_surface(spark, tmp_path):
    root = _publish(spark, tmp_path)
    _mutate(spark, root)
    sql = _meta(spark, root, "history")
    py = published_history(spark, root)
    assert sql.columns == py.columns
    assert _rows(sql) == _rows(py)
    ops = {r.version: r.operation for r in sql.collect()}
    assert ops == {1: "PUBLISH", 2: "UPSERT", 3: "DELETE",
                   4: "RESTORE"}
    # plain SQL over the metadata table
    sql.createOrReplaceTempView("corpus_history")
    got = spark.sql(
        "SELECT version FROM corpus_history "
        "WHERE operation = 'DELETE'"
    ).collect()
    assert [r.version for r in got] == [3]


def test_meta_files_matches_python_surface(spark, tmp_path):
    root = _publish(spark, tmp_path)
    _mutate(spark, root)
    sql = _meta(spark, root, "files")
    py = published_file_census(spark, root)
    assert sql.columns == py.columns
    assert _rows(sql) == _rows(py)
    # dv retract then restore to v2: no dv rows at the head
    assert sql.filter("dv_deleted > 0").count() == 0
    # version pinning composes (the dv'd census at v3)
    v3 = _meta(spark, root, "files", version="3")
    assert v3.filter("dv_deleted > 0").count() > 0
    assert _rows(v3) == _rows(
        published_file_census(spark, root, version=3)
    )


def test_meta_history_on_branch(spark, tmp_path):
    root = _publish(spark, tmp_path)
    create_published_branch(spark, root, "exp")
    retract_from_published(spark, root, "doc_id = 1", branch="exp")
    ops = [
        r.operation
        for r in _meta(spark, root, "history", branch="exp").collect()
    ]
    assert ops == ["DELETE", "BRANCH CUT"]


def test_meta_history_txn_unknowable_after_vacuum(spark, tmp_path):
    """With the previous manifest vacuumed, the txn diff is
    unknowable: report None, never the oldest id of the rolling
    window (both surfaces agree)."""
    from v6spark.pipeline import vacuum_published

    root = _publish(spark, tmp_path)
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(3, "e1", 1, "train")],
            "doc_id long, text string, day long, split string",
        ),
        txn_id="s-0",
    )
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(3, "e2", 2, "train")],
            "doc_id long, text string, day long, split string",
        ),
        txn_id="s-1",
    )
    vacuum_published(spark, root, keep_last=1)
    py = published_history(spark, root).collect()
    sql = _meta(spark, root, "history").collect()
    assert len(py) == 1 and py[0].version == 3
    assert py[0].txn_id is None          # not 's-0'
    assert sorted(map(tuple, sql)) == sorted(map(tuple, py))


def test_meta_history_typo_path_raises(spark, tmp_path):
    root = _publish(spark, tmp_path)
    register_pubcorpus_source(spark)
    with pytest.raises(Exception, match="no committed publish"):
        (spark.read.format("pubcorpus").option("meta", "history")
         .load(root + "_typo").collect())


def test_meta_detail_matches_python_surface(spark, tmp_path):
    from v6spark.pipeline import (
        describe_published,
        set_published_constraint,
        set_published_retention,
    )

    root = _publish(spark, tmp_path)
    set_published_constraint(spark, root, "d", "day >= 0")
    set_published_retention(spark, root, keep_last=5)
    retract_from_published(spark, root, "doc_id = 5", strategy="dv")
    py = describe_published(spark, root)
    assert py["version"] == 4
    assert py["rows_total"] == 39
    assert py["constraints"] == {"d": "day >= 0"}
    assert py["retention"] == {"keep_last": 5}
    assert py["dv_files"] == 1 and py["dv_deleted_rows"] == 1
    assert py["n_files"] > 0

    row = _meta(spark, root, "detail").collect()[0]
    assert row.version == py["version"]
    assert row.rows_total == py["rows_total"]
    assert row.n_files == py["n_files"]
    assert row.dv_deleted_rows == py["dv_deleted_rows"]
    assert json.loads(row.constraints) == py["constraints"]
    assert json.loads(row.retention) == py["retention"]
    assert json.loads(row.splits) == py["splits"]
    assert row.committed_at == py["committed_at"]
    # time travel composes
    v1 = describe_published(spark, root, version=1)
    assert v1["rows_total"] == 40 and v1["constraints"] == {}
    r1 = _meta(spark, root, "detail", version="1").collect()[0]
    assert r1.rows_total == 40


def test_meta_option_validation(spark, tmp_path):
    root = _publish(spark, tmp_path)
    register_pubcorpus_source(spark)
    with pytest.raises(Exception, match="meta must be"):
        _meta(spark, root, "nope").collect()
    with pytest.raises(Exception, match="does not apply"):
        _meta(spark, root, "files", where="day > 1").collect()
    with pytest.raises(Exception, match="whole retained log"):
        _meta(spark, root, "history", version="1").collect()
    with pytest.raises(Exception, match="read option"):
        (spark.range(1).selectExpr(
            "id as doc_id", "'x' as text", "cast(0 as long) as day",
            "'train' as split")
         .write.format("pubcorpus").mode("append")
         .option("meta", "files").save(root))
    # streaming: meta + startingVersion refuses at schema resolution;
    # meta alone refuses when the stream reader is built (start)
    with pytest.raises(Exception, match="does not apply to meta"):
        (spark.readStream.format("pubcorpus")
         .option("meta", "history")
         .option("startingVersion", "0").load(root))
    with pytest.raises(Exception, match="batch read option"):
        q = (spark.readStream.format("pubcorpus")
             .option("meta", "history").load(root)
             .writeStream.format("noop")
             .trigger(availableNow=True).start())
        try:
            q.awaitTermination(30)
            exc = q.exception()
            if exc is not None:
                raise exc
        finally:
            q.stop()
