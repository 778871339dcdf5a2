"""Manifest-level data skipping (operators/pruning.py +
pipeline.read_published_where): per-column min/max file stats recorded
at publish/DML time prune a selective read down to the files whose
ranges can match — the Delta/Iceberg skipping pattern — with results
identical to a full scan + filter no matter what the pruner decides
(advisory-negative: the full predicate is always re-applied).

The scale story exercised here: incremental ingestion correlates a
time-like column with files (each upsert's files span only its own
range), so a recent-window read over a 100 TB publish opens only the
recent files — while the hash-sharded first publish is honestly
unprunable on that column (every file spans the full range).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from v6spark.operators.pruning import file_can_match, parse_conjuncts
from v6spark.pipeline import (
    _trunc_upper,
    compact_published,
    publish_corpus_committed,
    read_published_corpus,
    read_published_where,
    retract_from_published,
    upsert_into_published,
)

# ---------------------------------------------------------------- parser


def test_parse_simple_conjuncts():
    assert parse_conjuncts("a = 5") == [("a", "=", 5)]
    assert parse_conjuncts("a >= 1 AND b < 'x'") == [
        ("a", ">=", 1),
        ("b", "<", "x"),
    ]
    # flipped literal-first comparisons normalize
    assert parse_conjuncts("5 < a") == [("a", ">", 5)]
    assert parse_conjuncts("a BETWEEN 2 AND 7") == [("a", "between", (2, 7))]
    assert parse_conjuncts("a IN (1, 2, 3)") == [("a", "in", [1, 2, 3])]
    assert parse_conjuncts("s = 'it''s'") == [("s", "=", "it's")]


def test_parse_rejects_disjunction_entirely():
    # a top-level OR makes per-file AND-pruning unsound: prune nothing
    assert parse_conjuncts("a = 1 OR b = 2") == []
    assert parse_conjuncts("NOT a = 1 OR b = 2") == []


def test_parse_disjuncts_dnf_lite():
    from v6spark.operators.pruning import parse_disjuncts

    assert parse_disjuncts("a = 1 OR b = 2") == [
        [("a", "=", 1)], [("b", "=", 2)],
    ]
    assert parse_disjuncts("(a = 1 AND b < 2) OR c = 3") == [
        [("a", "=", 1), ("b", "<", 2)], [("c", "=", 3)],
    ]
    # pure conjunction: one group
    assert parse_disjuncts("a = 1 AND b = 2") == [
        [("a", "=", 1), ("b", "=", 2)],
    ]
    # nested/parenthesized ORs flatten
    assert parse_disjuncts("(a = 1 OR b = 2) OR c = 3") == [
        [("a", "=", 1)], [("b", "=", 2)], [("c", "=", 3)],
    ]
    # fully parenthesized forms parse like their bare forms
    assert parse_disjuncts("(a = 1 AND b = 2)") == [
        [("a", "=", 1), ("b", "=", 2)],
    ]
    # BETWEEN's AND does not confuse the OR split
    assert parse_disjuncts("a BETWEEN 1 AND 5 OR b = 2") == [
        [("a", "between", (1, 5))], [("b", "=", 2)],
    ]
    # an unparseable disjunct yields an empty (must-scan) group
    assert parse_disjuncts("a = 1 OR t LIKE '%x%'") == [
        [("a", "=", 1)], [],
    ]
    # an OR inside an AND conjunct: that conjunct drops, rest prunes
    assert parse_disjuncts("a = 1 AND (b = 2 OR c = 3)") == [
        [("a", "=", 1)],
    ]
    # garbage degrades to no pruning
    assert parse_disjuncts("a = 1 OR (b = 2") == []


def test_parse_skips_unprunable_conjuncts_keeps_rest():
    # LIKE / IS NULL / != can't be refuted by a range: skipped, while
    # the prunable conjunct still prunes
    assert parse_conjuncts("t LIKE '%x%' AND day >= 7") == [("day", ">=", 7)]
    assert parse_conjuncts("t IS NULL AND day = 3") == [
        ("t", "isnull", None),
        ("day", "=", 3),
    ]
    assert parse_conjuncts("a != 4 AND day < 2") == [("day", "<", 2)]


def test_parse_prefix_like_and_null_tests():
    assert parse_conjuncts("t LIKE 'abc%'") == [("t", "prefix", "abc")]
    # only a single trailing %: anything else is unprunable (skipped)
    assert parse_conjuncts("t LIKE '%abc'") == []
    assert parse_conjuncts("t LIKE 'a%c'") == []
    assert parse_conjuncts("t LIKE 'a_c%'") == []
    assert parse_conjuncts("t LIKE '%'") == []
    assert parse_conjuncts("day IS NULL") == [("day", "isnull", None)]
    assert parse_conjuncts("day IS NOT NULL") == [("day", "notnull", None)]
    assert parse_conjuncts("day IS NULL AND t LIKE 'ab%'") == [
        ("day", "isnull", None),
        ("t", "prefix", "ab"),
    ]


def test_file_can_match_prefix_and_nulls():
    stats = {"t": ["alpha", "mike", 0], "d": [3, 8, 5], "z": [None, None, 7]}
    assert file_can_match([("t", "prefix", "bra")], stats)
    assert not file_can_match([("t", "prefix", "zu")], stats)  # mx < prefix
    assert not file_can_match([("t", "prefix", "aa")], stats)  # mn >= next
    assert file_can_match([("t", "prefix", "al")], stats)
    # IS NULL: refuted by a recorded zero null count, allowed by nc>0
    assert not file_can_match([("t", "isnull", None)], stats)
    assert file_can_match([("d", "isnull", None)], stats)
    # 2-entry legacy stats have no null info: must scan
    assert file_can_match([("t", "isnull", None)], {"t": ["a", "b"]})
    # entirely-NULL column refutes everything except IS NULL
    assert file_can_match([("z", "isnull", None)], stats)
    assert not file_can_match([("z", "notnull", None)], stats)
    assert not file_can_match([("z", "=", 1)], stats)
    assert not file_can_match([("z", "prefix", "a")], stats)
    # min/max present => non-null rows exist: NOT NULL can match
    assert file_can_match([("d", "notnull", None)], stats)


def test_parse_between_and_not_split():
    # BETWEEN's own AND must not split the conjunct
    assert parse_conjuncts("a BETWEEN 1 AND 3 AND b = 9") == [
        ("a", "between", (1, 3)),
        ("b", "=", 9),
    ]
    # a PARENTHESIZED BETWEEN must not swallow the real top-level AND
    assert parse_conjuncts("(a BETWEEN 1 AND 3) AND day >= 7") == [
        ("a", "between", (1, 3)),
        ("day", ">=", 7),
    ]
    assert parse_conjuncts("day >= 7 AND (a BETWEEN 1 AND 3)") == [
        ("day", ">=", 7),
        ("a", "between", (1, 3)),
    ]


def test_parse_garbage_degrades_to_no_pruning():
    assert parse_conjuncts("json_extract(a, '$.x') = 1 AND b ~ 2") == []
    assert parse_conjuncts("a = ") == []
    assert parse_conjuncts("((a = 1)") == []


# ---------------------------------------------------------------- matcher


def test_file_can_match_ranges():
    stats = {"day": [3, 8], "name": ["alpha", "mike"]}
    assert file_can_match([("day", "=", 5)], stats)
    assert not file_can_match([("day", "=", 9)], stats)
    assert file_can_match([("day", ">=", 8)], stats)
    assert not file_can_match([("day", ">", 8)], stats)
    assert not file_can_match([("day", "<", 3)], stats)
    assert file_can_match([("name", "<=", "bravo")], stats)
    assert not file_can_match([("name", ">=", "zulu")], stats)
    assert file_can_match([("day", "in", [1, 2, 7])], stats)
    assert not file_can_match([("day", "in", [1, 2])], stats)
    assert file_can_match([("day", "between", (8, 20))], stats)
    assert not file_can_match([("day", "between", (9, 20))], stats)


def test_file_can_match_degrades_safe():
    # no stats / unknown column / cross-type comparison: must scan
    assert file_can_match([("day", "=", 99)], None)
    assert file_can_match([("day", "=", 99)], {})
    assert file_can_match([("other", "=", 99)], {"day": [1, 2]})
    assert file_can_match([("day", "=", "str")], {"day": [1, 2]})
    # null-bound entry (stats recorded as unknown) must scan
    assert file_can_match([("day", "=", 99)], {"day": [None, None]})


def test_trunc_upper_is_strict_upper_bound():
    long = "m" * 100 + "zzz"
    t = _trunc_upper(long)
    assert len(t) <= 65 and t > long
    # increment skips the surrogate gap
    s = "a" * 63 + "퟿" + "tail-beyond-the-cap"
    t2 = _trunc_upper(s)
    assert t2 is not None and t2 > s and "\ud800" not in t2
    # nothing incrementable -> None (caller omits the stat)
    assert _trunc_upper(chr(0x10FFFF) * 80) is None


# ------------------------------------------------------------ integration


def _publish_batch1(spark, root, n=48, n_shards=8):
    """First publish: days 0..5, hash-sharded (day spans every file)."""
    prepared = spark.createDataFrame(
        [(i, "train" if i % 4 else "valid") for i in range(n)],
        "doc_id long, split string",
    )
    content = spark.createDataFrame(
        [(i, i % 6, f"body {i:04d}") for i in range(n)],
        "doc_id long, day long, text string",
    )
    return publish_corpus_committed(
        prepared, content, root, n_shards=n_shards
    )


def _upsert_batch2(spark, root, n=12, base=1000):
    """Incremental batch: days 10..11 only — its files carry tight
    day ranges, the ingestion-time correlation skipping exploits."""
    updates = spark.createDataFrame(
        [(base + i, 10 + (i % 2), f"late {i:04d}", "train")
         for i in range(n)],
        "doc_id long, day long, text string, split string",
    )
    return upsert_into_published(spark, root, updates, key_col="doc_id")


def _full(spark, root, predicate):
    return (
        read_published_corpus(spark, root)
        .filter(predicate)
        .orderBy("doc_id")
        .collect()
    )


def _where(spark, root, predicate, observer=None, **kw):
    return (
        read_published_where(
            spark, root, predicate, _scan_observer=observer, **kw
        )
        .orderBy("doc_id")
        .collect()
    )


def test_where_matches_full_scan_and_prunes_incremental_files(
    spark, tmp_path
):
    root = str(tmp_path / "corpus")
    _publish_batch1(spark, root)
    files_v1 = sum(len(f) for f in _observe_all(spark, root).values())
    res = _upsert_batch2(spark, root)
    assert res["rows_inserted"] == 12
    total_files = sum(len(f) for f in _observe_all(spark, root).values())
    assert total_files > files_v1  # the upsert added files

    scanned: dict[str, list] = {}
    rows = _where(
        spark, root, "day >= 10",
        observer=lambda s, fl: scanned.setdefault(s, fl),
    )
    assert [r["doc_id"] for r in rows] == [
        r["doc_id"] for r in _full(spark, root, "day >= 10")
    ]
    assert len(rows) == 12
    n_scanned = sum(len(fl) for fl in scanned.values())
    # every batch-1 file spans days 0..5 -> all pruned; exactly the
    # upsert's freshly written files (day range [10, 11]) are opened
    assert n_scanned == total_files - files_v1

    # a batch-1-only predicate returns identical rows too (pruning the
    # upsert files this time)
    rows_lo = _where(spark, root, "day = 3 AND doc_id < 24")
    assert [r["doc_id"] for r in rows_lo] == [
        r["doc_id"] for r in _full(spark, root, "day = 3 AND doc_id < 24")
    ]


def _observe_all(spark, root, version=None):
    """File lists per split via an unprunable predicate (baseline)."""
    seen: dict[str, list] = {}
    read_published_where(
        spark, root, "day IS NOT NULL", version=version,
        _scan_observer=lambda s, fl: seen.setdefault(s, fl),
    )
    return seen


def test_where_or_predicate_prunes_per_disjunct(spark, tmp_path):
    """DNF-lite skipping: a file is opened iff SOME disjunct can
    match it.  `day >= 13 OR split = 'valid'` — batch-1 train files
    (day 0..5, split train) refute both disjuncts and are skipped;
    valid-split files survive via disjunct 2; the upsert's files
    (day 10..11, train) refute both."""
    root = str(tmp_path / "corpus")
    _publish_batch1(spark, root)
    _upsert_batch2(spark, root)
    baseline = _observe_all(spark, root)
    seen: dict[str, list] = {}
    pred = "day >= 13 OR split = 'valid'"
    rows = _where(
        spark, root, pred, observer=lambda s, fl: seen.setdefault(s, fl),
    )
    assert [r["doc_id"] for r in rows] == [
        r["doc_id"] for r in _full(spark, root, pred)
    ]
    assert len(rows) == 12  # the valid docs (i % 4 == 0 of 48)
    # exactly the valid split's files are opened; both train
    # populations are pruned whole
    assert sum(len(fl) for fl in seen.values()) == len(
        baseline.get("valid") or []
    )
    assert not seen.get("train")


def test_where_or_with_unprunable_disjunct_scans_all(spark, tmp_path):
    """An OR whose disjunct can't be range-refuted (LIKE '%x%')
    degrades to scanning everything — correctness never at risk."""
    root = str(tmp_path / "corpus")
    _publish_batch1(spark, root)
    _upsert_batch2(spark, root)
    total = sum(len(f) for f in _observe_all(spark, root).values())
    seen: dict[str, list] = {}
    pred = "day >= 10 OR text LIKE '%0001%'"
    rows = _where(
        spark, root, pred, observer=lambda s, fl: seen.setdefault(s, fl),
    )
    assert sum(len(fl) for fl in seen.values()) == total  # no pruning
    assert [r["doc_id"] for r in rows] == [
        r["doc_id"] for r in _full(spark, root, pred)
    ]


def test_where_honors_deletion_vectors_and_versions(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _publish_batch1(spark, root)
    _upsert_batch2(spark, root)
    res = retract_from_published(
        spark, root, "day = 10", strategy="dv"
    )
    assert res["rows_removed"] == 6
    rows = _where(spark, root, "day >= 10")
    assert len(rows) == 6 and all(r["day"] == 11 for r in rows)
    # version-pinned read still sees the retracted rows
    rows_v2 = _where(spark, root, "day >= 10", version=2)
    assert len(rows_v2) == 12


def test_where_null_semantics(spark, tmp_path):
    # rows with NULL day must not match comparisons; files whose
    # non-null range excludes the literal still prune soundly
    root = str(tmp_path / "corpus")
    prepared = spark.createDataFrame(
        [(i, "train") for i in range(16)], "doc_id long, split string"
    )
    content = spark.createDataFrame(
        [(i, None if i % 3 == 0 else i % 4, f"b{i}") for i in range(16)],
        "doc_id long, day long, text string",
    )
    publish_corpus_committed(prepared, content, root, n_shards=4)
    rows = _where(spark, root, "day = 2")
    assert [r["doc_id"] for r in rows] == [
        r["doc_id"] for r in _full(spark, root, "day = 2")
    ]
    assert all(r["day"] == 2 for r in rows)
    # pruned-to-nothing read returns an EMPTY frame with the schema
    empty = read_published_where(spark, root, "day = 99")
    assert empty.count() == 0
    assert "doc_id" in empty.columns and "split" in empty.columns


def test_where_long_string_stats_truncate_soundly(spark, tmp_path):
    root = str(tmp_path / "corpus")
    prepared = spark.createDataFrame(
        [(i, "train") for i in range(8)], "doc_id long, split string"
    )
    # text far beyond the 64-char stat cap; bounds truncate yet stay
    # conservative, so equality on a long literal still answers right
    content = spark.createDataFrame(
        [(i, ("m" * 100) + f"tail{i:02d}") for i in range(8)],
        "doc_id long, text string",
    )
    publish_corpus_committed(prepared, content, root, n_shards=2)
    lit = ("m" * 100) + "tail03"
    rows = _where(spark, root, f"text = '{lit}'")
    assert [r["doc_id"] for r in rows] == [3]
    assert _where(spark, root, "text < 'a'") == []
    assert len(_where(spark, root, "text >= 'm'")) == 8


def test_col_stats_survive_compact_and_single_split(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _publish_batch1(spark, root)
    _upsert_batch2(spark, root)
    assert compact_published(spark, root) is not None
    rows = _where(spark, root, "day >= 10")
    assert len(rows) == 12
    # single-split read: no split column, same rows
    train = read_published_where(
        spark, root, "day >= 10", split="train"
    )
    assert "split" not in train.columns
    assert train.count() == 12  # batch-2 docs all landed in train


def test_where_prefix_like_and_null_pruning_end_to_end(spark, tmp_path):
    root = str(tmp_path / "corpus")
    prepared = spark.createDataFrame(
        [(i, "train") for i in range(24)], "doc_id long, split string"
    )
    # lang: entirely NULL for one third of docs; text: prefix-grouped
    content = spark.createDataFrame(
        [
            (
                i,
                None if i < 8 else ("en" if i % 2 else "fr"),
                ("alpha" if i < 8 else "omega") + f" body {i:02d}",
            )
            for i in range(24)
        ],
        "doc_id long, lang string, text string",
    )
    publish_corpus_committed(prepared, content, root, n_shards=4)
    # upsert writes files holding only high doc_ids -> alpha/omega and
    # the NULL langs separate by file for the incremental batch
    upd = spark.createDataFrame(
        [(100 + i, None, f"alpha late {i:02d}", "train") for i in range(6)],
        "doc_id long, lang string, text string, split string",
    )
    upsert_into_published(spark, root, upd, key_col="doc_id")

    for predicate in (
        "text LIKE 'alpha%'",
        "text LIKE 'omega%'",
        "lang IS NULL",
        "lang IS NOT NULL",
        "lang IS NULL AND text LIKE 'alpha l%'",
    ):
        got = _where(spark, root, predicate)
        want = _full(spark, root, predicate)
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], (
            predicate
        )
    # the upsert's files are all-alpha: 'omega%' prunes every one
    base: dict[str, list] = {}
    read_published_where(
        spark, root, "doc_id IS NOT NULL",
        _scan_observer=lambda s, fl: base.setdefault(s, fl),
    )
    total = sum(len(f) for f in base.values())
    seen: dict[str, list] = {}
    _where(
        spark, root, "text LIKE 'omega%'",
        observer=lambda s, fl: seen.setdefault(s, fl),
    )
    assert sum(len(f) for f in seen.values()) < total


def test_optimize_zorder_restores_skipping(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _publish_batch1(spark, root)
    _upsert_batch2(spark, root)
    expect = [r["doc_id"] for r in _full(spark, root, "day >= 10")]

    # plain compact re-packs by shard hash: day smears across files,
    # most of the train split must scan
    assert compact_published(spark, root) is not None
    plain_seen: dict[str, list] = {}
    rows = _where(
        spark, root, "day >= 10",
        observer=lambda s, fl: plain_seen.setdefault(s, fl),
    )
    assert [r["doc_id"] for r in rows] == expect
    plain_total = sum(len(f) for f in _observe_all(spark, root).values())
    plain_hit = sum(len(f) for f in plain_seen.values())

    # OPTIMIZE ZORDER BY (day): curve-segment files carry tight day
    # ranges again — arbitrary day predicates prune, rows identical
    v = compact_published(spark, root, cluster_by=["day"])
    assert v is not None  # clustering is never a no-op
    seen: dict[str, list] = {}
    rows = _where(
        spark, root, "day >= 10",
        observer=lambda s, fl: seen.setdefault(s, fl),
    )
    assert [r["doc_id"] for r in rows] == expect
    total = sum(len(f) for f in _observe_all(spark, root).values())
    hit = sum(len(f) for f in seen.values())
    assert hit / total < plain_hit / plain_total
    assert hit < total

    # DML keeps working on the clustered layout (shard dirs survive)
    upd = spark.createDataFrame(
        [(1000, 10, "edited", "train")],
        "doc_id long, day long, text string, split string",
    )
    res = upsert_into_published(spark, root, upd, key_col="doc_id")
    assert res["rows_updated"] == 1
    got = _where(spark, root, "doc_id = 1000")
    assert len(got) == 1 and got[0]["text"] == "edited"

    # a later PLAIN compact over a clustered publish is not a no-op:
    # it restores the deterministic training order
    assert compact_published(spark, root) is not None
    assert [
        r["doc_id"] for r in _full(spark, root, "day >= 10")
    ] == expect


def test_where_split_predicates_prune_whole_splits(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _publish_batch1(spark, root)
    seen: dict[str, list] = {}
    rows = _where(
        spark, root, "split = 'valid' AND day <= 2",
        observer=lambda s, fl: seen.setdefault(s, fl),
    )
    assert rows == [
        r for r in _full(spark, root, "split = 'valid' AND day <= 2")
    ]
    assert all(r["split"] == "valid" for r in rows) and rows
    # the train split never opens a file: the split pseudo-stat
    # refutes it at the manifest
    assert seen.get("train", []) == [] or "train" not in seen
    assert len(seen.get("valid", [])) > 0


def test_cluster_by_validates_columns(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _publish_batch1(spark, root)
    with pytest.raises(ValueError, match="not in the published schema"):
        compact_published(spark, root, cluster_by=["nosuch"])
    # unsupported type (boolean) raises honestly
    prepared = spark.range(10).selectExpr(
        "id as doc_id", "'train' as split"
    )
    content = spark.range(10).selectExpr(
        "id as doc_id", "id % 2 = 0 as flag"
    )
    root2 = str(tmp_path / "corpus_bool")
    publish_corpus_committed(prepared, content, root2, n_shards=2)
    with pytest.raises(ValueError, match="supports numeric, string"):
        compact_published(spark, root2, cluster_by=["flag"])


def test_optimize_zorder_string_and_date_columns(spark, tmp_path):
    """OPTIMIZE ZORDER BY (lang, day): the string column normalizes
    via dictionary rank, so after clustering a lang-equality (and a
    lang-range) predicate prunes files from col_stats — the likeliest
    100 TB layout keys after time are categorical strings."""
    langs = ["ar", "de", "en", "es", "fr", "hi", "ja", "zh"]
    n = 400
    prepared = spark.range(n).selectExpr(
        "id as doc_id", "'train' as split"
    )
    content = spark.range(n).selectExpr(
        "id as doc_id",
        f"element_at(array({', '.join(repr(x) for x in langs)}), "
        "cast(id % 8 + 1 as int)) as lang",
        "cast(id % 5 as long) as day",
        "concat('body ', id) as text",
    )
    root = str(tmp_path / "corpus")
    publish_corpus_committed(prepared, content, root, n_shards=8)

    v = compact_published(
        spark, root, cluster_by=["lang", "day"], n_cluster_files=16
    )
    assert v is not None

    total = sum(len(f) for f in _observe_all(spark, root).values())
    for pred in ("lang = 'fr'", "lang >= 'ja'", "lang LIKE 'e%'"):
        seen: dict[str, list] = {}
        rows = _where(
            spark, root, pred,
            observer=lambda s, fl: seen.setdefault(s, fl),
        )
        assert [r["doc_id"] for r in rows] == [
            r["doc_id"] for r in _full(spark, root, pred)
        ], pred
        assert rows  # non-trivial result
        hit = sum(len(f) for f in seen.values())
        assert hit < total, (pred, hit, total)
    # the numeric co-cluster still prunes too
    seen2: dict[str, list] = {}
    rows = _where(
        spark, root, "day = 4 AND lang = 'en'",
        observer=lambda s, fl: seen2.setdefault(s, fl),
    )
    assert [r["doc_id"] for r in rows] == [
        r["doc_id"] for r in _full(spark, root, "day = 4 AND lang = 'en'")
    ]
    assert sum(len(f) for f in seen2.values()) < total

    # DML keeps working on the string-clustered layout
    upd = spark.createDataFrame(
        [(3, "fr", 2, "edited", "train")],
        "doc_id long, lang string, day long, text string, split string",
    )
    res = upsert_into_published(spark, root, upd, key_col="doc_id")
    assert res["rows_updated"] == 1


def test_cluster_surrogates_unsupported_and_cap(spark):
    from v6spark.sources.layout import cluster_surrogates

    df = spark.range(8).selectExpr(
        "cast(null as binary) as b", "concat('v', id) as s"
    )
    with pytest.raises(ValueError, match="supports numeric, string"):
        cluster_surrogates(df, ["b"], {"b": "binary"})
    with pytest.raises(ValueError, match="distinct values"):
        cluster_surrogates(df, ["s"], {"s": "string"}, max_dict=4)


def test_maintain_published_recluster_cycle(spark, tmp_path):
    from v6spark.pipeline import compaction_advice, maintain_published

    root = str(tmp_path / "corpus")
    _publish_batch1(spark, root)
    compact_published(spark, root, cluster_by=["day"])
    _upsert_batch2(spark, root)

    rep = maintain_published(spark, root, keep_last=1)
    assert rep["recluster"] and rep["compacted"] is not None
    assert rep["vacuumed_files"] >= 0
    # the maintenance re-ran OPTIMIZE ZORDER with the recorded
    # columns: clustering survives, fragmentation is gone
    after = compaction_advice(spark, root)
    assert after["clustered_by"] == ["day"] and not after["recluster"]
    assert not after["needs_compaction"]
    assert read_published_corpus(spark, root).count() == 60
    # healthy table: maintenance is a no-op
    rep2 = maintain_published(spark, root)
    assert rep2["compacted"] is None


def test_advice_recommends_reclustering_after_dml(spark, tmp_path):
    from v6spark.pipeline import compaction_advice

    root = str(tmp_path / "corpus")
    _publish_batch1(spark, root)
    compact_published(spark, root, cluster_by=["day"])
    adv = compaction_advice(spark, root)
    assert adv["clustered_by"] == ["day"] and not adv["recluster"]
    assert adv["files_with_col_stats"] == adv["files_total"]

    _upsert_batch2(spark, root)  # file-level DML on the clustered table
    adv = compaction_advice(spark, root)
    assert adv["clustered_by"] == ["day"]
    assert adv["recluster"] and adv["needs_compaction"]

    compact_published(spark, root, cluster_by=["day"])  # re-OPTIMIZE
    adv = compaction_advice(spark, root)
    assert not adv["recluster"]
    # rows intact through the whole cycle
    assert read_published_corpus(spark, root).count() == 48 + 12


def test_where_predicate_pushes_into_parquet_scan(spark, tmp_path):
    # manifest skipping decides WHICH files open; Catalyst pushdown
    # must still carry the predicate into the surviving scans so
    # parquet row-group stats prune WITHIN them — both layers active
    root = str(tmp_path / "corpus")
    _publish_batch1(spark, root)
    df = read_published_where(spark, root, "day >= 3")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(day,3)" in plan.replace(" ", "")


def test_where_unknown_column_predicate_errors_cleanly(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _publish_batch1(spark, root)
    with pytest.raises(Exception):
        read_published_where(spark, root, "nosuch = 1").count()
