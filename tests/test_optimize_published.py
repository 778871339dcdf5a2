"""Incremental bin-packing OPTIMIZE (optimize_published): fold only
fragmented (split, shard) groups, reference everything else — write
cost tracks fragmentation, never corpus size.
"""
from __future__ import annotations

import json

import pytest

from v6spark import txlog
from v6spark.pipeline import (
    _COMMITS,
    evolve_published_schema,
    list_published_constraints,
    optimize_published,
    publish_corpus_committed,
    published_history,
    read_published_corpus,
    read_published_keys,
    retract_from_published,
    set_published_constraint,
    vacuum_published_files,
)
from v6spark.sources.pubcorpus import register_pubcorpus_source


def _df(spark, lo, n):
    return spark.range(lo, lo + n).selectExpr(
        "id as doc_id", "concat('body ', id) as text",
        "cast(id % 7 as long) as day",
        "case when id % 10 = 0 then 'valid' else 'train' end as split",
    )


def _publish(spark, tmp_path, n=60, **kw):
    df = _df(spark, 0, n)
    root = str(tmp_path / "corpus")
    publish_corpus_committed(
        df.selectExpr("doc_id", "split"), df.drop("split"), root,
        n_shards=4, **kw,
    )
    return root


def _append(spark, root, lo, n):
    register_pubcorpus_source(spark)
    _df(spark, lo, n).write.format("pubcorpus").mode("append").save(root)


def _rows(spark, root):
    return sorted(
        (r.doc_id, r.text, r.day)
        for r in read_published_corpus(spark, root).collect()
    )


def _group_census(doc):
    """{(split, shard): n_files} from a manifest's file lists."""
    out: dict = {}
    for s, fl in (doc.get("files") or {}).items():
        for rel in fl:
            sh = next(
                (p.split("=", 1)[1] for p in rel.split("/")
                 if p.startswith("shard=")), None,
            )
            out[(s, sh)] = out.get((s, sh), 0) + 1
    return out


def test_optimize_folds_only_fragmented_groups(spark, tmp_path):
    root = _publish(spark, tmp_path)                     # 1 file/shard
    before = _rows(spark, root)
    _append(spark, root, 100, 12)
    _append(spark, root, 200, 12)
    appended = _rows(spark, root)
    log = f"{root}/{_COMMITS}"
    pre_doc = txlog.read_version(spark, log, 3)
    pre = _group_census(pre_doc)
    frag = {g for g, n in pre.items() if n >= 2}
    assert frag, "appends must have fragmented some groups"

    res = optimize_published(spark, root)
    assert res["_version"] == 4
    assert res["groups_rewritten"] == len(frag)
    assert res["files_folded"] == sum(pre[g] for g in frag)
    post_doc = txlog.read_version(spark, log, 4)
    post = _group_census(post_doc)
    # every fragmented group folded to ONE file; others untouched
    assert all(post[g] == 1 for g in frag)
    for g in set(pre) - frag:
        assert post[g] == pre[g]
    # kept files referenced verbatim (same rels)
    pre_files = {
        rel for s, fl in pre_doc["files"].items() for rel in fl
    }
    post_files = {
        rel for s, fl in post_doc["files"].items() for rel in fl
    }
    kept = {
        rel for rel in pre_files
        if (rel.split("/split=")[0],) and rel in post_files
    }
    assert len(kept) == res["files_kept"]
    # contents exact, counts unchanged
    assert _rows(spark, root) == appended
    assert set(appended) > set(before)
    assert post_doc["splits"] == pre_doc["splits"]
    # history classifies it
    h = {r.version: r for r in published_history(spark, root).collect()}
    assert h[4].operation == "OPTIMIZE"
    assert json.loads(h[4].details)["files_folded"] == res["files_folded"]


def test_optimize_noop_on_packed_table(spark, tmp_path):
    root = _publish(spark, tmp_path)
    res = optimize_published(spark, root)
    assert res["groups_rewritten"] == 0
    assert txlog.read_latest(spark, f"{root}/{_COMMITS}")[0] == 1
    with pytest.raises(ValueError, match="min_files_per_group"):
        optimize_published(spark, root, min_files_per_group=1)


def test_optimize_materializes_deletion_vectors(spark, tmp_path):
    root = _publish(spark, tmp_path)
    _append(spark, root, 100, 12)
    retract_from_published(
        spark, root, "doc_id >= 100 AND doc_id < 106", strategy="dv"
    )
    expect = _rows(spark, root)
    res = optimize_published(spark, root)
    doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")[1]
    assert _rows(spark, root) == expect
    assert res["_version"] == 4
    # the fragmented groups' vectors materialized; if every dv'd file
    # was in a fragmented group the manifest sheds the dv key
    dvf = (doc.get("dv") or {}).get("files") or {}
    folded_rels = set()
    pre_doc = txlog.read_version(spark, f"{root}/{_COMMITS}", 3)
    post_files = {
        rel for s, fl in doc["files"].items() for rel in fl
    }
    for s, entries in dvf.items():
        for rel in entries:
            assert rel in post_files  # dv entries only for kept files


def test_optimize_keeps_pruning_and_lookup_surfaces(spark, tmp_path):
    root = _publish(spark, tmp_path, key_bloom=True)
    _append(spark, root, 100, 12)
    _append(spark, root, 200, 12)
    set_published_constraint(spark, root, "d", "day >= 0")
    optimize_published(spark, root)
    doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")[1]
    # fresh files have key stats (manifest-only DML pruning intact)
    for s, fl in doc["files"].items():
        for rel in fl:
            assert rel in doc["file_stats"][s]
            assert rel in doc["col_stats"][s]
    # point lookups still resolve through the bloom + stats
    got = read_published_keys(spark, root, [3, 105, 207])
    assert sorted(r.doc_id for r in got.collect()) == [3, 105, 207]
    # table properties carried
    assert list_published_constraints(spark, root) == {"d": "day >= 0"}
    assert doc.get("key_bloom") is not None


def test_optimize_restores_training_order(spark, tmp_path):
    """A folded group's rows come back in the publish's deterministic
    per-shard order (xxhash64(seed+1, key)), as a full re-publish
    would produce."""
    import os

    root = _publish(spark, tmp_path)
    _append(spark, root, 100, 20)
    optimize_published(spark, root)
    doc = txlog.read_latest(spark, f"{root}/{_COMMITS}")[1]
    sd = doc["seed"]
    opt_v = txlog.read_latest(spark, f"{root}/{_COMMITS}")[0]
    fresh = [
        rel for s, fl in doc["files"].items() for rel in fl
        if rel.split("/")[0].startswith(f"v={opt_v:06d}")
    ]
    assert fresh, "optimize must have written fresh files"
    rel = fresh[0]
    got = [
        r.doc_id
        for r in spark.read.parquet(os.path.join(root, rel)).collect()
    ]
    import pyspark.sql.functions as F

    order = (
        spark.createDataFrame([(k,) for k in got], "doc_id long")
        .withColumn("_o", F.xxhash64(F.lit(sd + 1), F.col("doc_id")))
        .orderBy("_o", "doc_id")
    )
    assert got == [r.doc_id for r in order.collect()]


def test_optimize_after_evolve_unifies_schema(spark, tmp_path):
    root = _publish(spark, tmp_path)
    _append(spark, root, 100, 12)
    evolve_published_schema(spark, root, [("score", "double")])
    optimize_published(spark, root)
    df = read_published_corpus(spark, root)
    assert "score" in df.columns
    assert df.filter("score IS NOT NULL").count() == 0
    assert df.count() == 72


def test_optimize_small_files_only(spark, tmp_path):
    """max_file_rows (the Delta minFileSize dial): packed files are
    never rewritten — only a group's small files fold together."""
    root = _publish(spark, tmp_path)      # publish files: ~15 rows
    _append(spark, root, 100, 8)          # small files: 1-4 rows
    _append(spark, root, 200, 8)
    expect = _rows(spark, root)
    log = f"{root}/{_COMMITS}"
    pre_doc = txlog.read_version(spark, log, 3)
    publish_rels = {
        rel for s, fl in (pre_doc.get("files") or {}).items()
        for rel in fl if rel.split("/")[0].startswith("v=000001")
    }
    res = optimize_published(spark, root, max_file_rows=10)
    assert res["groups_rewritten"] > 0
    doc = txlog.read_latest(spark, log)[1]
    post_rels = {
        rel for s, fl in doc["files"].items() for rel in fl
    }
    # every >=10-row publish file is still referenced verbatim
    big = {
        rel for s, fl in (pre_doc.get("files") or {}).items()
        for rel in fl
        if rel in publish_rels
        and (pre_doc.get("file_stats", {}).get(s, {})
             .get(rel, [None, None, 0])[2] or 0) >= 10
    }
    assert big and big <= post_rels
    assert _rows(spark, root) == expect


def test_maintain_uses_incremental_for_fragmentation(spark, tmp_path):
    """maintain_published matches the action to the diagnosis:
    fragmentation alone folds incrementally (optimize), while
    deletion-vector debt forces the full compact that materializes
    the vectors."""
    from v6spark.pipeline import maintain_published

    root = _publish(spark, tmp_path)
    _append(spark, root, 100, 12)
    _append(spark, root, 200, 12)
    expect = _rows(spark, root)
    res = maintain_published(
        spark, root, max_files_per_shard=2, vacuum=False,
    )
    assert res["reasons"] == ["fragmented_shards"]
    assert res["optimized"] is not None
    assert res["compacted"] is None
    assert _rows(spark, root) == expect

    retract_from_published(
        spark, root, "doc_id < 3", strategy="dv"
    )
    expect2 = _rows(spark, root)
    res2 = maintain_published(
        spark, root, max_files_per_shard=2, max_dv_deleted_rows=0,
        vacuum=False,
    )
    assert "dv_debt" in res2["reasons"]
    assert res2["compacted"] is not None
    assert res2["optimized"] is None
    assert _rows(spark, root) == expect2


def test_optimize_then_file_vacuum_reclaims_folded_bytes(
    spark, tmp_path
):
    root = _publish(spark, tmp_path)
    _append(spark, root, 100, 12)
    expect = _rows(spark, root)
    optimize_published(spark, root)
    removed = vacuum_published_files(spark, root, keep_last=1)
    assert removed > 0  # the folded originals
    assert _rows(spark, root) == expect
