"""The published corpus as a Spark DataSource (format("pubcorpus")).

The SQL front door must be BIT-IDENTICAL to read_published_corpus at
every point of the table lifecycle (publish, copy-on-write retract,
deletion-vector retract, upsert, schema evolution, compact, reshard,
offloaded manifests), honor version/tag/branch pinning, and — via
option("where", ...) — prune files exactly as read_published_where
does on the same predicate while filtering rows exactly.  Pruning is
option-keyed, never pushFilters: Spark 4.1 caches pushdown-planned
partitions on shared relations (test_shared_frame_reuse_is_safe pins
the hazard).
"""
from __future__ import annotations

import json

import pytest

from v6spark.pipeline import (
    compact_published,
    create_published_branch,
    evolve_published_schema,
    publish_corpus_committed,
    read_published_corpus,
    read_published_where,
    reshard_published,
    retract_from_published,
    tag_published,
    upsert_into_published,
)
from v6spark.sources.pubcorpus import register_pubcorpus_source


def _publish(spark, tmp_path, n=60, n_shards=4):
    docs = spark.range(n).selectExpr(
        "id as doc_id", "concat('body ', id) as text",
        "cast(id % 7 as long) as day",
    )
    prepared = spark.range(n).selectExpr(
        "id as doc_id",
        "case when id % 10 = 0 then 'valid' else 'train' end as split",
    )
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, docs, root, n_shards=n_shards)
    return root


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _src(spark, root, **opts):
    register_pubcorpus_source(spark)
    r = spark.read.format("pubcorpus")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(root)


def test_bit_identical_through_lifecycle(spark, tmp_path):
    root = _publish(spark, tmp_path)

    def check():
        ref = read_published_corpus(spark, root)
        got = _src(spark, root)
        assert sorted(got.columns) == sorted(ref.columns)
        assert _rows(got) == _rows(ref)

    check()                                                   # v1
    retract_from_published(spark, root, "doc_id = 7")         # v2 COW
    check()
    retract_from_published(
        spark, root, "doc_id in (11, 21)", strategy="dv"      # v3 DV
    )
    check()
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(3, "rev 3", 99, None), (1003, "new", 100, "train")],
            "doc_id long, text string, day long, split string",
        ),
    )                                                          # v4
    check()
    evolve_published_schema(spark, root, [("license", "string")])  # v5
    check()
    compact_published(spark, root)                             # v6
    check()
    reshard_published(spark, root, n_shards=2)                 # v7
    check()


def test_version_tag_and_branch_pinning(spark, tmp_path):
    root = _publish(spark, tmp_path, n=30)
    tag_published(spark, root, "baseline")
    retract_from_published(spark, root, "doc_id = 5")
    create_published_branch(spark, root, "exp")
    retract_from_published(spark, root, "doc_id = 6", branch="exp")

    assert _rows(_src(spark, root, version=1)) == _rows(
        read_published_corpus(spark, root, version=1)
    )
    assert _rows(_src(spark, root, tag="baseline")) == _rows(
        read_published_corpus(spark, root, tag="baseline")
    )
    assert _rows(_src(spark, root, branch="exp")) == _rows(
        read_published_corpus(spark, root, branch="exp")
    )
    # latest (main) unaffected by the branch delete
    got = _src(spark, root)
    assert got.filter("doc_id = 6").count() == 1
    assert got.filter("doc_id = 5").count() == 0


def test_where_option_prunes_same_files_as_python_reader(spark, tmp_path):
    """Incremental upserts correlate day with files; an
    option("where", ...) read must open exactly the files
    read_published_where opens for the same predicate — and return
    the same rows (the option both prunes files and filters rows)."""
    root = _publish(spark, tmp_path, n=48, n_shards=8)
    for i in range(3):
        upsert_into_published(
            spark, root,
            spark.range(12).selectExpr(
                f"id + {1000 + i * 100} as doc_id",
                "concat('late ', id) as text",
                f"cast({10 + i} as long) as day",
                "'train' as split",
            ),
            key_col="doc_id",
        )
    pred = "day >= 12"
    where_seen: dict = {}
    ref = read_published_where(
        spark, root, pred,
        _scan_observer=lambda s, fl: where_seen.setdefault(s, fl),
    )
    obs = str(tmp_path / "obs.json")
    got = _src(spark, root, where=pred, _scanObserverPath=obs)
    assert _rows(got) == _rows(ref)
    src_seen = json.load(open(obs))
    assert {s: sorted(fl) for s, fl in src_seen.items() if fl} == {
        s: sorted(fl) for s, fl in where_seen.items() if fl
    }
    # the pruning is real: only the day>=12 upsert's files are opened
    n_opened = sum(len(fl) for fl in src_seen.values())
    assert 0 < n_opened <= 12


def test_split_predicate_prunes_whole_splits(spark, tmp_path):
    root = _publish(spark, tmp_path)
    obs = str(tmp_path / "obs.json")
    got = _src(spark, root, where="split = 'valid'",
               _scanObserverPath=obs)
    ref = read_published_corpus(spark, root).filter("split = 'valid'")
    assert _rows(got) == _rows(ref)
    seen = json.load(open(obs))
    assert seen["train"] == []
    assert len(seen["valid"]) > 0


def test_fully_pruned_read_is_typed_empty(spark, tmp_path):
    root = _publish(spark, tmp_path, n=20)
    got = _src(spark, root, where="split = 'nosuch'")
    assert got.count() == 0
    assert "doc_id" in got.columns and "split" in got.columns


def test_shared_frame_reuse_is_safe(spark, tmp_path):
    """THE reason pruning is option-keyed and not pushFilters: a
    filtered query followed by an unfiltered one on the SAME
    DataFrame / temp view must both be correct (Spark 4.1 caches
    pushdown-planned partitions on shared relations, which poisons a
    pushFilters-based source)."""
    root = _publish(spark, tmp_path, n=30)
    df = _src(spark, root)
    assert df.filter("text = 'no such body'").count() == 0
    assert df.count() == 30  # NOT poisoned by the filtered planning
    df.createOrReplaceTempView("corpus_reuse_v")
    assert spark.sql(
        "SELECT count(*) AS c FROM corpus_reuse_v WHERE doc_id = 3"
    ).collect()[0]["c"] == 1
    assert spark.sql(
        "SELECT count(*) AS c FROM corpus_reuse_v"
    ).collect()[0]["c"] == 30


def test_keys_option_matches_point_lookups(spark, tmp_path):
    """option("keys", json) = read_published_keys through spark.read:
    same rows AND same files opened (shard pruning via the pure-Python
    Spark-exact xxhash64 + key-range stats)."""
    from v6spark.pipeline import read_published_keys

    root = _publish(spark, tmp_path, n=80, n_shards=8)
    want = [7, 33, 61]
    ref_seen: dict = {}
    ref = read_published_keys(
        spark, root, want,
        _scan_observer=lambda s, fl: ref_seen.setdefault(s, list(fl)),
    )
    obs = str(tmp_path / "obs_keys.json")
    got = _src(spark, root, keys=json.dumps(want), _scanObserverPath=obs)
    assert sorted(r["doc_id"] for r in got.collect()) == want
    # same content as the python point-lookup reader
    ref_rows = sorted(
        (r["doc_id"], r["text"], r["split"]) for r in ref.collect()
    )
    got_rows = sorted(
        (r["doc_id"], r["text"], r["split"]) for r in got.collect()
    )
    assert got_rows == ref_rows
    src_seen = json.load(open(obs))
    assert {s: sorted(f) for s, f in src_seen.items() if f} == {
        s: sorted(f) for s, f in ref_seen.items() if f
    }


def test_keys_option_with_bloom_and_absent_keys(spark, tmp_path):
    """A bloom-indexed publish: an absent key opens (near) zero files
    through the SQL front door too."""
    docs = spark.range(200).selectExpr(
        "id as doc_id", "concat('b ', id) as text"
    )
    prepared = spark.range(200).selectExpr(
        "id as doc_id", "'train' as split"
    )
    root = str(tmp_path / "bloomed")
    publish_corpus_committed(
        prepared, docs, root, n_shards=8, key_bloom=True
    )
    obs = str(tmp_path / "obs_absent.json")
    got = _src(
        spark, root, keys="[999999]", _scanObserverPath=obs
    )
    assert got.count() == 0
    opened = sum(len(f) for f in json.load(open(obs)).values())
    assert opened <= 1  # bloom: definitely-absent keys open ~nothing
    # present key still found
    got2 = _src(spark, root, keys="[42]")
    assert [r["doc_id"] for r in got2.collect()] == [42]


def test_keys_option_int_typed_column_and_where_compose(spark, tmp_path):
    """int (not bigint) key column: the pure-Python hash must use the
    int lane; keys AND where compose conjunctively."""
    docs = spark.range(100).selectExpr(
        "cast(id as int) as doc_id", "concat('z ', id) as text",
        "cast(id % 4 as long) as day",
    )
    prepared = spark.range(100).selectExpr(
        "cast(id as int) as doc_id", "'train' as split"
    )
    root = str(tmp_path / "intkeys")
    publish_corpus_committed(prepared, docs, root, n_shards=8)
    got = _src(spark, root, keys="[5, 50, 77]")
    assert sorted(r["doc_id"] for r in got.collect()) == [5, 50, 77]
    both = _src(spark, root, keys="[5, 50, 77]", where="day = 1")
    assert sorted(r["doc_id"] for r in both.collect()) == [5, 77]


def test_where_option_coerces_literals_like_spark(spark, tmp_path):
    """A quoted number on a bigint column evaluates through implicit
    casts in Spark; the pyarrow row filter must coerce the same way
    instead of crashing the scan."""
    root = _publish(spark, tmp_path, n=40)
    got = _src(spark, root, where="day = '3'")
    ref = read_published_where(spark, root, "day = '3'")
    assert _rows(got) == _rows(ref)
    assert got.count() > 0
    with pytest.raises(Exception, match="not castable"):
        _src(spark, root, where="day = 'abc'").collect()


def test_where_option_rejects_unparsable(spark, tmp_path):
    root = _publish(spark, tmp_path, n=10)
    with pytest.raises(Exception, match="prunable predicate grammar"):
        _src(spark, root, where="text RLIKE 'x.*'").collect()


def test_where_option_or_and_null_semantics(spark, tmp_path):
    root = _publish(spark, tmp_path, n=40)
    upsert_into_published(
        spark, root,
        spark.createDataFrame(
            [(2000, None, 99, "train")],
            "doc_id long, text string, day long, split string",
        ),
    )
    pred = "day >= 90 OR split = 'valid'"
    got = _src(spark, root, where=pred)
    ref = read_published_where(spark, root, pred)
    assert _rows(got) == _rows(ref)
    # NULL text never satisfies a comparison
    got2 = _src(spark, root, where="text >= ''")
    assert got2.filter("doc_id = 2000").count() == 0
    assert got2.count() == 40


def test_split_option_restricts(spark, tmp_path):
    root = _publish(spark, tmp_path)
    got = _src(spark, root, split="valid")
    assert got.count() == 6
    assert set(r["split"] for r in got.collect()) == {"valid"}


def test_sql_surface(spark, tmp_path):
    """A plain-SQL user: temp view over the source, aggregate away."""
    root = _publish(spark, tmp_path)
    _src(spark, root).createOrReplaceTempView("corpus_v")
    out = spark.sql(
        "SELECT split, count(*) AS n FROM corpus_v GROUP BY split "
        "ORDER BY split"
    ).collect()
    assert [(r["split"], r["n"]) for r in out] == [
        ("train", 54), ("valid", 6),
    ]


def test_offloaded_manifest_reads_identically(spark, tmp_path, monkeypatch):
    from v6spark import pipeline

    monkeypatch.setattr(pipeline, "_MANIFEST_INLINE_MAX", 0)
    root = _publish(spark, tmp_path, n=30)
    retract_from_published(spark, root, "doc_id = 3")
    ref = read_published_corpus(spark, root)
    got = _src(spark, root)
    assert _rows(got) == _rows(ref)


def test_errors(spark, tmp_path):
    register_pubcorpus_source(spark)
    with pytest.raises(Exception, match="no committed publish"):
        spark.read.format("pubcorpus").load(
            str(tmp_path / "nothing")
        ).collect()
    root = _publish(spark, tmp_path, n=10)
    with pytest.raises(Exception, match="no tag"):
        _src(spark, root, tag="missing").collect()


# ------------------------------------------------------------------ #
# Round 8: option("columns") projection + row-group skipping         #
# ------------------------------------------------------------------ #


def _rewrite_data_files(root, rows_per_group=8, sort_by=None):
    """Rewrite every live data file into small row groups (same rows;
    order preserved unless sort_by) so row-group skipping has
    something to skip — publishes at test scale land one group."""
    from pathlib import Path

    import pyarrow.parquet as pq

    n = 0
    for p in Path(root).rglob("*"):
        rel = str(p.relative_to(root))
        if not p.is_file() or "split=" not in rel:
            continue
        if p.name.startswith(("_", ".")):
            continue
        t = pq.read_table(str(p))
        if sort_by:
            t = t.sort_by(sort_by)
        pq.write_table(t, str(p), row_group_size=rows_per_group)
        # the Hadoop local FS wrote a .crc sidecar for the original
        # bytes; drop it or the JVM reader fails the checksum
        crc = p.with_name(f".{p.name}.crc")
        if crc.exists():
            crc.unlink()
        n += 1
    assert n > 0
    return n


def _decode_recs(dec_dir):
    return [json.load(open(p)) for p in dec_dir.iterdir()]


def test_columns_option_projects_and_narrows_decode(spark, tmp_path):
    """option("columns") narrows BOTH the frame and the parquet
    decode — the round-7 weak (full-width reads through the SQL
    front door)."""
    root = _publish(spark, tmp_path, n=48)
    dec = tmp_path / "dec"
    dec.mkdir()
    got = _src(spark, root, columns="doc_id,text",
               _decodeObserverDir=str(dec))
    ref = read_published_corpus(spark, root).select("doc_id", "text")
    assert got.columns == ["doc_id", "text"]
    assert _rows(got) == _rows(ref)
    recs = _decode_recs(dec)
    assert recs
    assert all(r["columns_read"] == ["doc_id", "text"] for r in recs)
    assert sum(r["bytes_selected"] for r in recs) < sum(
        r["bytes_total"] for r in recs
    )


def test_columns_with_filter_column_outside_projection(spark, tmp_path):
    """where may reference columns the projection drops: they decode
    for the mask, then vanish before yield."""
    root = _publish(spark, tmp_path, n=48)
    dec = tmp_path / "dec"
    dec.mkdir()
    got = _src(spark, root, columns="doc_id", where="day = 3",
               _decodeObserverDir=str(dec))
    ref = read_published_where(spark, root, "day = 3").select("doc_id")
    assert got.columns == ["doc_id"]
    assert _rows(got) == _rows(ref)
    for r in _decode_recs(dec):
        assert r["columns_read"] == ["day", "doc_id"]


def test_columns_projection_of_evolved_column(spark, tmp_path):
    """Pre-evolution files read the added column as typed NULLs even
    when it's the projection — or only the filter."""
    root = _publish(spark, tmp_path, n=20)
    evolve_published_schema(spark, root, [("license", "string")])
    got = _src(spark, root, columns="doc_id,license")
    assert got.columns == ["doc_id", "license"]
    assert got.count() == 20
    assert got.filter("license IS NULL").count() == 20
    assert _src(spark, root, columns="doc_id",
                where="license IS NULL").count() == 20
    assert _src(spark, root, columns="doc_id",
                where="license = 'x'").count() == 0


def test_columns_virtual_only_and_validation(spark, tmp_path):
    root = _publish(spark, tmp_path, n=20)
    got = _src(spark, root, columns="split")
    assert got.columns == ["split"]
    assert got.count() == 20
    with pytest.raises(Exception, match="unknown column"):
        _src(spark, root, columns="doc_id,nope").collect()
    with pytest.raises(Exception, match="twice"):
        _src(spark, root, columns="doc_id,doc_id").collect()
    with pytest.raises(Exception, match="at least one"):
        _src(spark, root, columns=" , ").collect()
    with pytest.raises(Exception, match="unknown column"):
        _src(spark, root, where="nope = 1").collect()


def test_row_group_skipping_matches_and_skips(spark, tmp_path):
    """Files surviving manifest pruning skip ROW GROUPS the predicate
    refutes (footer stats through the same matcher), with identical
    results."""
    root = _publish(spark, tmp_path, n=64, n_shards=2)
    _rewrite_data_files(root, rows_per_group=8, sort_by="day")
    dec = tmp_path / "dec"
    dec.mkdir()
    got = _src(spark, root, where="day = 3", _decodeObserverDir=str(dec))
    ref = read_published_where(spark, root, "day = 3")
    assert _rows(got) == _rows(ref)
    assert got.count() > 0
    recs = _decode_recs(dec)
    assert any(r["row_groups_total"] > 1 for r in recs)
    assert sum(r["row_groups_read"] for r in recs) < sum(
        r["row_groups_total"] for r in recs
    )


def test_row_group_spans_respect_deletion_vectors(spark, tmp_path):
    """DV positions are file row ordinals; skipped row groups must
    not shift the mask (each kept group carries its own offset)."""
    root = _publish(spark, tmp_path, n=64, n_shards=2)
    _rewrite_data_files(root, rows_per_group=8, sort_by="doc_id")
    retract_from_published(
        spark, root, "doc_id % 5 = 0", strategy="dv"
    )
    got = _src(spark, root)
    ref = read_published_corpus(spark, root)
    assert _rows(got) == _rows(ref)
    dec = tmp_path / "dec"
    dec.mkdir()
    got2 = _src(spark, root, where="doc_id >= 32", columns="doc_id",
                _decodeObserverDir=str(dec))
    ref2 = read_published_where(
        spark, root, "doc_id >= 32"
    ).select("doc_id")
    assert _rows(got2) == _rows(ref2)
    recs = _decode_recs(dec)
    assert sum(r["row_groups_read"] for r in recs) < sum(
        r["row_groups_total"] for r in recs
    )


def test_keys_option_composes_with_columns(spark, tmp_path):
    """Point lookups whose key column is outside the projection."""
    root = _publish(spark, tmp_path, n=60)
    got = _src(spark, root, keys="[5, 17]", columns="text")
    assert got.columns == ["text"]
    assert sorted(r["text"] for r in got.collect()) == [
        "body 17", "body 5",
    ]


def test_read_pubcorpus_helper_matches_manual_options(spark, tmp_path):
    """The helper is sugar only: identical frames to hand-set
    options, list-typed columns/keys accepted."""
    from v6spark.sources.pubcorpus import read_pubcorpus

    root = _publish(spark, tmp_path, n=48)
    tag_published(spark, root, "t0")
    got = read_pubcorpus(
        spark, root, where="day = 3", columns=["doc_id", "day"]
    )
    ref = _src(spark, root, where="day = 3", columns="doc_id,day")
    assert got.columns == ref.columns
    assert _rows(got) == _rows(ref)
    got2 = read_pubcorpus(spark, root, keys=[5, 17], columns=["text"])
    ref2 = _src(spark, root, keys="[5, 17]", columns="text")
    assert _rows(got2) == _rows(ref2)
    assert read_pubcorpus(spark, root, tag="t0").count() == 48
    assert read_pubcorpus(spark, root, split="valid").count() > 0


def test_timestamp_as_of_time_travel(spark, tmp_path):
    """option('asOf', ts) resolves the newest committed version at or
    before the timestamp (manifest mtimes, monotonically adjusted) —
    Delta's TIMESTAMP AS OF through plain spark.read, composing with
    the reader options and the catalog."""
    import time as _time

    import pytest as _pytest

    from v6spark.catalog import (
        create_pubcorpus_table,
        drop_pubcorpus_table,
    )
    from v6spark.sources.pubcorpus import read_pubcorpus

    root = _publish(spark, tmp_path, n=30)
    t_v1 = _time.time()
    _time.sleep(0.6)
    retract_from_published(spark, root, "doc_id < 10")       # v2
    _time.sleep(0.6)
    retract_from_published(spark, root, "doc_id >= 25")      # v3
    t_latest = _time.time()

    assert read_pubcorpus(spark, root, as_of=t_v1).count() == 30
    mid = t_v1 + 0.3  # between v1 and v2
    assert read_pubcorpus(spark, root, as_of=mid).count() == 30
    assert read_pubcorpus(spark, root, as_of=t_latest).count() == 15
    # ISO form through the raw option
    from datetime import datetime, timezone

    iso = datetime.fromtimestamp(t_latest, tz=timezone.utc).isoformat()
    got = (spark.read.format("pubcorpus").option("asOf", iso)
           .load(root))
    assert got.count() == 15
    # before the first commit -> clear error
    with _pytest.raises(Exception, match="asOf"):
        read_pubcorpus(spark, root, as_of=t_v1 - 3600).count()
    # exclusive with version
    with _pytest.raises(Exception, match="one time-travel|asOf"):
        (spark.read.format("pubcorpus").option("asOf", str(t_v1))
         .option("version", "2").load(root).count())
    # catalog: as_of pins a concrete version at create time
    v = create_pubcorpus_table(spark, "asof_t", root, as_of=t_v1)
    assert v == 1
    retract_from_published(spark, root, "doc_id = 12")       # v4
    assert spark.table("asof_t").count() == 30  # pinned, not following
    drop_pubcorpus_table(spark, "asof_t")


def test_as_of_parity_python_reader(spark, tmp_path):
    """read_published_corpus(as_of=...) resolves exactly the version
    the SQL reader's option('asOf') picks."""
    import time as _time

    from v6spark.sources.pubcorpus import read_pubcorpus

    root = _publish(spark, tmp_path, n=20)
    t1 = _time.time()
    _time.sleep(0.6)
    retract_from_published(spark, root, "doc_id < 5")
    py = read_published_corpus(spark, root, as_of=t1)
    sql = read_pubcorpus(spark, root, as_of=t1)
    assert py.count() == sql.count() == 20
    assert read_published_corpus(
        spark, root, as_of=_time.time()
    ).count() == 15
