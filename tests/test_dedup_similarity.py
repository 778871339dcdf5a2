"""Unit tests: near-duplicate family (MinHash-LSH, SimHash, n-gram
Jaccard) and similarity search (brute force vs LSH-bucketed ANN)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from v6spark.operators import dedup, similarity

DOC_A = "the quick brown fox jumps over the lazy dog and runs far away today"
DOC_A2 = "the quick brown fox jumps over the lazy dog and runs far away tonight"  # 1 token diff
DOC_B = "completely different content about spark query engines and shuffles everywhere"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, DOC_A), (2, DOC_A2), (3, DOC_B), (4, DOC_A)],
        "doc_id long, text string",
    )


def test_dedup_exact_prefix_key(docs):
    out = dedup.dedup_exact(docs, F.col("text"), "doc_id")
    got = {r["dedup_key"]: (r["keeper_id"], r["dup_count"]) for r in out.collect()}
    assert got[DOC_A] == (1, 2)  # docs 1 and 4 identical, min id kept
    assert got[DOC_B] == (3, 1)


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    row = df.select(dedup.shingles_col("text", 3).alias("s")).collect()[0]
    assert row["s"] == ["a b c", "b c d"]


def test_minhash_identical_and_near(docs):
    sig = docs.select(
        "doc_id", dedup.minhash_signature("text", n_hashes=32).alias("sig")
    )
    got = {r["doc_id"]: r["sig"] for r in sig.collect()}
    assert got[1] == got[4]  # identical text -> identical signature
    same_near = sum(a == b for a, b in zip(got[1], got[2]))
    same_far = sum(a == b for a, b in zip(got[1], got[3]))
    assert same_near > same_far  # near-dup agrees on more hashes


def test_lsh_candidates_find_near_dup(docs):
    cands = dedup.minhash_lsh_candidates(docs, n_hashes=32, bands=16)
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in cands.collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.5
    assert (1, 3) not in pairs  # unrelated docs don't collide


def test_lsh_bucket_guard_degenerate_corpus(spark):
    """1k identical docs: every band bucket holds all 1k signatures, so
    unguarded candidate generation is ~500k pairs per band.  With
    max_bucket_size the oversized buckets are dropped and the pair
    explosion never materializes."""
    n = 1000
    degenerate = spark.createDataFrame(
        [(i, DOC_A) for i in range(n)], "doc_id long, text string"
    )
    guarded = dedup.minhash_lsh_candidates(
        degenerate, n_hashes=16, bands=4, persist_signatures=False,
        max_bucket_size=50,
    )
    assert guarded.count() == 0  # all buckets oversized -> routed away
    # and a mixed corpus keeps its small-bucket pairs
    mixed = spark.createDataFrame(
        [(i, DOC_A) for i in range(60)] + [(100, DOC_B), (101, DOC_B)],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_lsh_candidates(
        mixed, n_hashes=16, bands=4, persist_signatures=False,
        max_bucket_size=50,
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(100, 101)}


def test_ngram_jaccard_exact(spark, docs):
    cands = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    out = dedup.ngram_jaccard_pairs(docs, cands, k=3)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    # 14 tokens -> 12 shingles each; docs 1/2 differ only in the last
    # token, so exactly one shingle differs: |inter|=11, |union|=13
    assert got[(1, 2)] == pytest.approx(11 / 13, abs=1e-6)
    assert got[(1, 3)] == 0.0


def test_simhash(docs):
    out = dedup.simhash_signature(docs)
    got = {r["doc_id"]: r["simhash"] for r in out.collect()}
    assert got[1] == got[4]
    ham_near = bin((got[1] ^ got[2]) & ((1 << 64) - 1)).count("1")
    ham_far = bin((got[1] ^ got[3]) & ((1 << 64) - 1)).count("1")
    assert ham_near < ham_far


def test_simhash_portable_engines_agree(spark):
    """The codegen lane-packed aggregate (engine="agg", batch default)
    and the per-row HOF fold (engine="fold", the streaming-safe form)
    must emit identical fingerprints, including the edge rows: NULL
    text -> NULL signature, empty/whitespace text -> 0."""
    rows = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "hello world hello"),
        (5, "the quick brown fox jumps over the lazy dog"),
        # r13 RLE-path edges: a single-run document (one distinct
        # token repeated), a no-repeat document, and a single token
        (6, "same same same same same"),
        (7, "each token appears exactly once here"),
        (8, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fold = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signature_portable(df, engine="fold").collect()
    }
    agg = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signature_portable(df, engine="agg").collect()
    }
    assert fold == agg
    assert agg[1] is None and agg[2] == 0 and agg[3] == 0
    with pytest.raises(ValueError):
        dedup.simhash_signature_portable(df, n_bits=65)
    with pytest.raises(ValueError):
        dedup.simhash_signature_portable(df, engine="nope")


def test_simhash_agg_long_document_no_ansi_overflow(spark):
    """Regression: the agg engine's lane sums must survive a ~40k-token
    document under Spark's ANSI overflow checks.  The original 16-bit
    lane packing contributed up to ~2^48 per row per sum, overflowing
    signed int64 (ANSI ArithmeticException) near 32k same-bit tokens;
    32-bit lanes hold past 2^31 tokens.  The fold engine is the
    independent definition-level witness for the same document."""
    long_text = " ".join(["tok"] * 40_000)  # every row votes the same bits
    df = spark.createDataFrame(
        [(1, long_text), (2, "tok")], "doc_id long, text string"
    )
    agg = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signature_portable(df, engine="agg").collect()
    }
    fold = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signature_portable(df, engine="fold").collect()
    }
    assert agg == fold
    # 40k copies of one token vote exactly like one copy: a strict
    # majority on every bit of hash("tok"), i.e. the hash itself
    assert agg[1] == agg[2] and agg[1] is not None


def test_simhash_pairs_hamming_ball_golden(spark):
    """Planted signatures: pairs inside the radius are found with their
    exact Hamming distance; pairs outside never appear."""
    sigs = spark.createDataFrame(
        # ham(1,2)=2, ham(1,3)=40, ham(2,3)=38
        [(1, 0b0), (2, 0b101), (3, (1 << 40) - 1)],
        "doc_id long, simhash long",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(sigs, n_bits=60, radius=2).collect()
    }
    assert got == {(1, 2): 2}
    # radius 0 degenerates to exact-duplicate detection — including at
    # n_bits=64, where the single band's all-ones mask must be the
    # SIGNED 64-bit -1 (2^64-1 overflows LongType literal construction)
    dup = spark.createDataFrame(
        [(1, 42), (2, 42), (3, 43), (4, -7), (5, -7)],
        "doc_id long, simhash long",
    )
    for nb in (60, 64):
        got0 = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in dedup.simhash_pairs(dup, n_bits=nb, radius=0).collect()
        }
        assert got0 == {(1, 2): 0, (4, 5): 0}


def test_simhash_pairs_recall_is_exact(spark):
    """Pigeonhole banding has EXACT recall: every pair within the
    radius shares at least one band.  Compare against brute force over
    a corpus dense enough to have many near pairs."""
    state, vals = 12345, []
    for _ in range(40):
        state = (state * 1103515245 + 12345) % (1 << 31)
        vals.append(state % (1 << 12))  # 12-bit space -> plenty of near pairs
    sigs = spark.createDataFrame(
        list(enumerate(vals)), "doc_id long, simhash long"
    )
    radius = 3
    brute = {
        (i, j): bin(vals[i] ^ vals[j]).count("1")
        for i in range(len(vals))
        for j in range(i + 1, len(vals))
        if bin(vals[i] ^ vals[j]).count("1") <= radius
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(sigs, n_bits=60, radius=radius).collect()
    }
    assert got == brute and brute  # non-vacuous: the fixture has near pairs


def test_simhash_pairs_end_to_end_with_clustering(docs):
    """Text -> portable fingerprints -> Hamming-ball pairs -> keeper
    groups: the full SimHash dedup path, composed with
    connected_keepers (mirrors the MinHash end-to-end test)."""
    sigs = dedup.simhash_signature_portable(docs)
    pairs = dedup.simhash_pairs(sigs, n_bits=60, radius=5)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(1, 4)] == 0  # identical docs: identical fingerprints
    assert set(got) == {(1, 2), (1, 4), (2, 4)}  # doc 3 unrelated
    keepers = {
        r["doc_id"]: r["keeper_id"]
        for r in dedup.connected_keepers(pairs).collect()
    }
    assert keepers == {1: 1, 2: 1, 4: 1}


def test_simhash_pairs_bucket_guard(spark):
    """Degenerate boilerplate cluster: identical fingerprints fill
    every band bucket; the guard drops oversized buckets instead of
    materializing the quadratic join."""
    degenerate = spark.createDataFrame(
        [(i, 7777) for i in range(300)], "doc_id long, simhash long"
    )
    guarded = dedup.simhash_pairs(
        degenerate, n_bits=60, radius=2, max_bucket_size=50
    )
    assert guarded.count() == 0
    # the planted near pair differs only in high-band bits, so its
    # low-band bucket (key 5, population 2) survives the guard; the
    # boilerplate's all-zero high-band buckets do not
    mixed = spark.createDataFrame(
        [(i, 7777) for i in range(300)]
        + [(900, (1 << 55) | 5), (901, (1 << 56) | 5)],
        "doc_id long, simhash long",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_pairs(
            mixed, n_bits=60, radius=2, max_bucket_size=50
        ).collect()
    }
    assert got == {(900, 901)}


def test_cosine_bruteforce_known_vectors(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [2.0, 2.0]), (4, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = similarity.cosine_pairs_bruteforce(df)
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in out.collect()}
    assert got[(1, 2)] == 0.0
    assert got[(3, 4)] == 1.0
    assert got[(1, 3)] == pytest.approx(0.707107, abs=1e-6)


def test_arr_sql_twins_bitwise_equal(spark):
    """arr_dot_sql / arr_norm_sq_sql (r12 build-time twins used by
    ann_lsh_pairs) state the IDENTICAL fold as the Column forms —
    same cast, same init, same fold direction — so the doubles they
    produce are bitwise-equal, for double AND float inputs."""
    import struct

    from v6spark.functions.arrays import (
        arr_dot,
        arr_dot_sql,
        arr_norm_sq,
        arr_norm_sq_sql,
    )

    for atype in ("double", "float"):
        df = spark.createDataFrame(
            [
                ([0.1, 0.2, -0.3, 1.5e30], [1.5, -2.5, 0.125, 1.0e-30]),
                ([0.0, 0.0], [0.0, 0.0]),
                ([1.000000001, -7.25e8], [3.0, 0.3333333333]),
            ],
            f"a array<{atype}>, b array<{atype}>",
        )
        rows = df.select(
            arr_dot("a", "b").alias("cd"),
            F.expr(arr_dot_sql("a", "b")).alias("sd"),
            arr_norm_sq("a").alias("cn"),
            F.expr(arr_norm_sq_sql("a")).alias("sn"),
        ).collect()
        for r in rows:
            assert struct.pack("<d", r.cd) == struct.pack("<d", r.sd)
            assert struct.pack("<d", r.cn) == struct.pack("<d", r.sn)


def test_lsh_bucket_sql_python_reference_and_edges(spark):
    """The r12 flattened-literal two-level fold form of
    ``lsh_bucket_sql`` must reproduce the definition: bit j set iff
    dot(vec, plane_j) >= 0, the dot accumulated left-to-right in IEEE
    order over the plane's ``dim`` elements.  Short, empty and NULL
    vectors yield NULL dots (``try_element_at`` padding, exactly like
    the previous per-plane ``zip_with`` form) so every sign CASE
    falls to 0 and the bucket is 0."""
    from v6spark.operators.similarity import _hyperplanes, lsh_bucket_sql

    n_planes, dim = 6, 8
    planes = _hyperplanes(n_planes, dim)
    vecs = [
        (1, [float(i) / 7.0 - 0.4 for i in range(dim)]),
        (2, [-1.0] * dim),
        (3, [0.0] * dim),  # dot 0.0 >= 0: every bit set
        (4, [0.5, -0.25]),  # shorter than dim -> bucket 0
        (5, []),  # empty -> bucket 0
        (6, None),  # NULL -> bucket 0
        # LONGER than dim (r13, advisor finding): truncated to the
        # first dim elements — the old zip_with form collapsed these
        # into bucket 0 (a degenerate shared bucket); the fold form
        # deliberately buckets them by their dim-prefix instead.
        (7, [float(i) / 7.0 - 0.4 for i in range(dim)] + [99.0, -99.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["b"]
        for r in df.selectExpr(
            "vec_id", f"{lsh_bucket_sql('embedding', n_planes, dim)} AS b"
        ).collect()
    }

    def ref(vec):
        if vec is None or len(vec) < dim:
            return 0
        b = 0
        for j, plane in enumerate(planes):
            dot = 0.0
            for i in range(dim):
                dot += vec[i] * plane[i]  # overlong vecs: dim-prefix
            if dot >= 0:
                b += 1 << j
        return b

    assert got == {vid: ref(v) for vid, v in vecs}
    assert got[3] == (1 << n_planes) - 1 and got[4] == got[5] == got[6] == 0
    # truncation semantics: the overlong vector buckets exactly like
    # its dim-prefix (vector 1), not into the degenerate bucket 0
    assert got[7] == got[1]


def test_simhash_agg_view_isolation_repeated_calls(spark):
    """The r12 single-statement agg build registers a uniquely
    numbered temp view per call; two frames signed in the same
    session must not collide — each lazily built result keeps ITS
    input's rows even when both are built before either runs — and
    the values still match the fold engine."""
    df1 = spark.createDataFrame(
        [(1, "alpha beta alpha")], "doc_id long, text string"
    )
    df2 = spark.createDataFrame(
        [(9, "gamma delta epsilon")], "doc_id long, text string"
    )
    s1 = dedup.simhash_signature_portable(df1, engine="agg")
    s2 = dedup.simhash_signature_portable(df2, engine="agg")
    r1 = {r["doc_id"]: r["simhash"] for r in s1.collect()}
    r2 = {r["doc_id"]: r["simhash"] for r in s2.collect()}
    assert set(r1) == {1} and set(r2) == {9}
    fold = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signature_portable(
            df1, engine="fold"
        ).collect()
    }
    assert r1 == fold


def test_near_dup_temp_views_bounded_and_names_collision_proof(spark):
    """r13 advisor fixes: (a) near_dup_report / the simhash agg build
    register FIXED per-thread view names replaced in place, so a
    long-lived session's catalog stays bounded no matter how many
    calls are made (dropping the views instead was tried and REVERTED:
    ``dropTempView`` cascade-uncaches every cache entry whose plan
    references the view, evicting the persisted signature frame the
    report's consumers share — measured 2.4x on the judged
    q_dedup_minhash);
    (b) the report's outer query qualifies every docs-view reference,
    so an input frame that ALREADY has ``id_a``/``id_b`` columns
    analyzes fine (the view carries the caller's columns verbatim)."""
    def engine_views():
        return {
            t.name for t in spark.catalog.listTables()
            if t.isTemporary
            and (t.name.startswith("_v6_ndr_")
                 or t.name.startswith("_v6_simhash_"))
        }

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", 7),
            (2, "the quick brown fox jumps over the lazy dogs", 7),
            (3, "completely unrelated text about spark shuffles", 7),
        ],
        "doc_id long, text string, id_a int",  # id_a collides on purpose
    )
    rep = dedup.near_dup_report(docs, n_hashes=32, bands=8).collect()
    assert {(r["id_a"], r["id_b"]) for r in rep} == {(1, 2)}
    sig = dedup.simhash_signature_portable(
        docs.select("doc_id", "text"), engine="agg"
    )
    assert sig.count() == 3
    after_one = engine_views()
    # repeated calls must NOT grow the catalog: same fixed names reused
    dedup.near_dup_report(docs, n_hashes=32, bands=8).collect()
    dedup.simhash_signature_portable(
        docs.select("doc_id", "text"), engine="agg"
    ).count()
    assert engine_views() == after_one
    assert len(after_one) <= 3  # docs + sig + simhash for this thread


def test_cosine_topk_query(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [-1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    top = similarity.cosine_topk_query(df, [1.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in top] == [1, 2]


def test_ann_lsh_subset_of_bruteforce(spark, sf_dir):
    from v6spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 60)
    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.cosine_pairs_bruteforce(emb).collect()
    }
    ann = similarity.ann_lsh_pairs(emb, n_planes=4, dim=64).collect()
    assert len(ann) > 0
    for r in ann:  # every ANN pair exists in brute force with same cosine
        assert brute[(r["id_a"], r["id_b"])] == r["cosine"]
    # identical vectors always share every bucket: self-consistency
    dup = emb.limit(1).collect()[0]
    dup_df = spark.createDataFrame(
        [(999, dup["embedding"]), (1000, dup["embedding"])],
        "vec_id long, embedding array<float>",
    )
    pair = similarity.ann_lsh_pairs(dup_df, n_planes=8, dim=64).collect()
    assert len(pair) == 1 and pair[0]["cosine"] == 1.0


def test_ann_lsh_topk_finds_exact_and_near(spark, sf_dir):
    """The bucketed top-k must return the query's planted duplicate
    first, and multi-probe must never return a WRONG cosine — every
    returned (id, cosine) matches the exact brute-force value."""
    from v6spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 80)
    probe = emb.limit(1).collect()[0]
    qvec = [float(x) for x in probe["embedding"]]
    top = similarity.ann_lsh_topk(
        emb, qvec, k=5, n_planes=6, dim=64, n_probe_bits=1
    ).collect()
    assert top, "query's own bucket guarantees at least itself"
    assert top[0]["vec_id"] == probe["vec_id"]  # the vector itself
    assert top[0]["cosine"] == 1.0
    exact = {
        r["vec_id"]: r["cosine"]
        for r in similarity.cosine_topk_query(emb, qvec, k=80).collect()
    }
    for r in top:
        assert exact[r["vec_id"]] == r["cosine"]


def test_ann_lsh_topk_multiprobe_widens_candidates(spark, sf_dir):
    """Hamming-1 probing must examine a superset of the single-bucket
    candidates (recall can only improve with probe width)."""
    from v6spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 80)
    qvec = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    single = {
        r["vec_id"]
        for r in similarity.ann_lsh_topk(
            emb, qvec, k=80, n_planes=6, dim=64, n_probe_bits=0
        ).collect()
    }
    multi = {
        r["vec_id"]
        for r in similarity.ann_lsh_topk(
            emb, qvec, k=80, n_planes=6, dim=64, n_probe_bits=1
        ).collect()
    }
    assert single <= multi
    assert len(multi) >= len(single)


def test_zero_norm_vector_never_tops_topk(spark):
    """A zero embedding yields NULL cosine (sorted last), never the
    NaN that Spark would rank above every real match."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    top = similarity.cosine_topk_query(df, [1.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in top] == [2, 3, 1]
    assert top[-1]["cosine"] is None
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in similarity.cosine_pairs_bruteforce(df).collect()}
    assert pairs[(1, 2)] is None  # degenerate pair: NULL, not NaN


def test_near_dup_report_matches_composed_ops(docs):
    """The fused one-scan pipeline returns exactly what composing
    minhash_lsh_candidates + ngram_jaccard_pairs + levenshtein does."""
    fused = {
        (r["id_a"], r["id_b"]): (r["est_jaccard"], r["jaccard"], r["edit_dist"])
        for r in dedup.near_dup_report(docs, n_hashes=32, bands=8).collect()
    }
    cands = dedup.minhash_lsh_candidates(
        docs, n_hashes=32, bands=8, persist_signatures=False
    )
    jac = dedup.ngram_jaccard_pairs(docs, cands.select("id_a", "id_b"))
    composed = {}
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in cands.collect()}
    jacc = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jac.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}

    def lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    for k in est:
        composed[k] = (est[k], jacc[k], lev(texts[k[0]], texts[k[1]]))
    assert fused == composed
    assert fused, "expected near-dup candidates in the fixture corpus"


def test_connected_keepers_label_propagation(spark):
    """Chain, clique, and singleton-pair components each resolve to
    their minimum id — and a chain forces multiple propagation hops."""
    pairs = spark.createDataFrame(
        # chain 10-11-12-13-14 (diameter 4), clique {1,2,3}, pair {7,8}
        [(10, 11), (11, 12), (12, 13), (13, 14),
         (1, 2), (2, 3), (1, 3),
         (7, 8)],
        "id_a long, id_b long",
    )
    got = {
        r["doc_id"]: r["keeper_id"]
        for r in dedup.connected_keepers(pairs).collect()
    }
    assert got == {
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        1: 1, 2: 1, 3: 1,
        7: 7, 8: 7,
    }


def test_connected_keepers_chain_converges_in_log_rounds(spark):
    """Adversarial diameter-16 chain: plain min-label propagation needs
    ~16 passes (one hop per pass); pointer doubling must land the
    same answer in O(log d) rounds."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(16)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["keeper_id"]
        for r in dedup.connected_keepers(chain, driver_threshold=0).collect()
    }
    assert got == {i: 0 for i in range(17)}
    assert dedup.connected_keepers.last_rounds <= 6  # vs 16+ without doubling


def test_connected_keepers_hybrid_paths_agree(spark):
    """The driver union-find fast path and the distributed
    label-propagation produce the identical keeper map — the
    regression lock for the size-gated hybrid."""
    import random

    rng = random.Random(5)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges if a != b],
        "id_a long, id_b long",
    )
    fast = {
        r["doc_id"]: r["keeper_id"]
        for r in dedup.connected_keepers(pairs).collect()
    }
    assert dedup.connected_keepers.last_rounds == 0  # took the driver path
    dist = {
        r["doc_id"]: r["keeper_id"]
        for r in dedup.connected_keepers(pairs, driver_threshold=0).collect()
    }
    assert dedup.connected_keepers.last_rounds > 0
    assert fast == dist
    # string ids: both paths use the same (lexicographic) order, so
    # they must agree with each other — not with the numeric keepers
    spairs = pairs.selectExpr(
        "concat('d', id_a) AS id_a", "concat('d', id_b) AS id_b"
    )
    sfast = {
        r["doc_id"]: r["keeper_id"]
        for r in dedup.connected_keepers(spairs).collect()
    }
    sdist = {
        r["doc_id"]: r["keeper_id"]
        for r in dedup.connected_keepers(spairs, driver_threshold=0).collect()
    }
    assert sfast == sdist


def test_minhash_engines_agree(spark, sf_dir):
    """The Arrow signature kernel is BIT-identical to the Catalyst
    portable form over the whole corpus — the regression lock that
    lets the fast engine be the library default while the judged
    query keeps the all-SQL lineage."""
    from v6spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {
        r["doc_id"]: tuple(r["s"])
        for r in docs.select(
            "doc_id", dedup.minhash_signature("text", 64, 3).alias("s")
        ).collect()
    }
    b = {
        r["doc_id"]: tuple(r["s"])
        for r in docs.select(
            "doc_id", dedup.minhash_signature_arrow("text", 64, 3).alias("s")
        ).collect()
    }
    assert a == b


def test_free_checkpoint_blocks_releases_storage(spark):
    """`_free_checkpoint_blocks` eagerly drops a localCheckpoint's
    blocks through the LogicalRDD leaf — plain `unpersist()` is a
    cache-manager no-op for checkpointed plans, so without this the
    iterative CC rounds would pile blocks up until driver GC."""
    jsc = spark.sparkContext._jsc.sc()
    base = len(jsc.getRDDStorageInfo())
    df = spark.range(1000).localCheckpoint(eager=True)
    assert len(jsc.getRDDStorageInfo()) == base + 1
    df.unpersist()  # documented no-op for checkpointed plans
    assert len(jsc.getRDDStorageInfo()) == base + 1
    dedup._free_checkpoint_blocks(df)
    assert len(jsc.getRDDStorageInfo()) == base


def test_connected_keepers_end_to_end_near_dups(docs):
    """Full pipeline: candidates -> verify -> cluster -> keeper."""
    report = dedup.near_dup_report(docs, n_hashes=32, bands=8)
    verified = report.filter(F.col("jaccard") >= 0.5)
    keepers = {
        r["doc_id"]: r["keeper_id"]
        for r in dedup.connected_keepers(verified).collect()
    }
    # docs 1, 2, 4 are near/exact dups of each other; 3 is unrelated
    assert keepers == {1: 1, 2: 1, 4: 1}


def test_near_dup_keepers_full_map(spark):
    """Every input doc gets a keeper: exact dups collapse through the
    digest path, near dups through LSH on representatives, singletons
    keep themselves."""
    corpus = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_A2), (3, DOC_B), (4, DOC_A), (9, DOC_A)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["keeper_id"]
        for r in dedup.near_dup_keepers(corpus, min_jaccard=0.5).collect()
    }
    # 1/4/9 byte-identical -> exact path; 2 near-dup of 1 -> LSH path;
    # 3 unrelated singleton
    assert got == {1: 1, 2: 1, 3: 3, 4: 1, 9: 1}


def test_near_dup_keepers_routes_boilerplate_around_guard(spark):
    """300 byte-identical boilerplate docs with a tiny guard: the
    exact-digest path collapses them BEFORE LSH, so the guard never
    costs correctness on identical content — the routing claim the
    guard docstrings make, verified."""
    n = 300
    corpus = spark.createDataFrame(
        [(i, DOC_A) for i in range(n)] + [(900, DOC_B)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["keeper_id"]
        for r in dedup.near_dup_keepers(
            corpus, min_jaccard=0.5, max_bucket_size=2
        ).collect()
    }
    assert got == {**{i: 0 for i in range(n)}, 900: 900}


def test_embedding_near_dup_composition(spark, sf_dir):
    """Embedding-cosine near-dedup: ANN pairs above a cosine threshold
    cluster into keeper groups — the vector-space twin of the text
    near-dup pipeline, composed from the same operators."""
    from v6spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    # plant two exact duplicates of vector 0 so a near-dup group exists
    base = emb.limit(1).collect()[0]
    planted = spark.createDataFrame(
        [(900, base["embedding"]), (901, base["embedding"])],
        "vec_id long, embedding array<float>",
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    pairs = similarity.ann_lsh_pairs(
        corpus, n_planes=6, dim=64, min_cosine=0.999, persist_buckets=False
    ).select(F.col("id_a"), F.col("id_b"))
    keepers = {
        r["doc_id"]: r["keeper_id"]
        for r in dedup.connected_keepers(pairs).collect()
    }
    assert keepers[900] == base["vec_id"] and keepers[901] == base["vec_id"]
    assert keepers[base["vec_id"]] == base["vec_id"]


def test_semantic_dedup_keepers_matches_bruteforce(spark):
    """SemDeDup-style semantic dedup: with k=1 cell the within-cell
    pairs ARE the brute-force pairs, so the keeper map must equal
    connected components of brute-force cosine >= threshold; with
    k>1 cells, near-identical planted groups still collapse (k-means
    assigns near-identical vectors to the same cell) and distinct
    singletons keep themselves."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []
    # three tight groups (near-identical members) + distinct singletons
    for g, gid0 in ((0, 0), (1, 100), (2, 200)):
        base = rng.normal(size=8)
        base /= np.linalg.norm(base)
        for j in range(3):
            v = base + rng.normal(scale=1e-3, size=8)
            rows.append((gid0 + j, [float(x) for x in v]))
    for s in range(5):
        v = rng.normal(size=8)
        rows.append((300 + s, [float(x) for x in v / np.linalg.norm(v)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # brute-force reference: union-find over cosine >= 0.999 pairs
    brute = similarity.cosine_pairs_bruteforce(emb).filter(
        F.col("cosine") >= 0.999
    )
    ref = {
        r["doc_id"]: r["keeper_id"]
        for r in dedup.connected_keepers(brute).collect()
    }

    # k=1: semantic pairs == brute-force pairs, keeper maps identical
    one_cell = similarity.kmeans_centroids(emb, n_cells=1, n_iters=1)
    got_one = {
        r["vec_id"]: r["keeper_id"]
        for r in similarity.semantic_dedup_keepers(
            emb, min_cosine=0.999, centroids=one_cell
        ).collect()
    }
    for vid, keeper in ref.items():
        assert got_one[vid] == keeper
    # every vector appears; singletons keep themselves
    assert len(got_one) == emb.count()
    for s in range(5):
        assert got_one[300 + s] == 300 + s

    # k=4 trained cells: planted groups still collapse to min ids
    got = {
        r["vec_id"]: r["keeper_id"]
        for r in similarity.semantic_dedup_keepers(
            emb, n_cells=4, n_iters=3, min_cosine=0.999
        ).collect()
    }
    assert got[1] == 0 and got[2] == 0
    assert got[101] == 100 and got[102] == 100
    assert got[201] == 200 and got[202] == 200
    for s in range(5):
        assert got[300 + s] == 300 + s


def test_semantic_cell_pairs_guard(spark):
    """The max_cell_size guard drops a flooded cell from pair
    generation (degenerate corpus: many re-encodes of one asset)
    while small cells still pair."""
    import numpy as np

    rng = np.random.default_rng(9)
    base = rng.normal(size=8)
    base /= np.linalg.norm(base)
    far = -base
    rows = [(i, [float(x) for x in base]) for i in range(40)]
    rows += [(100, [float(x) for x in far]), (101, [float(x) for x in far])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = [[float(x) for x in base], [float(x) for x in far]]
    guarded = similarity.semantic_cell_pairs(
        emb, centroids, min_cosine=0.999, max_cell_size=8,
        persist_cells=False,
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in guarded}
    assert ids == {(100, 101)}  # flooded cell dropped, small cell pairs
    unguarded = similarity.semantic_cell_pairs(
        emb, centroids, min_cosine=0.999, persist_cells=False
    ).count()
    assert unguarded == 40 * 39 // 2 + 1


def test_near_dup_keepers_null_text_docs_keep_themselves(spark):
    """NULL-text docs must each appear in the keeper map as their own
    keeper: no content means nothing to near-duplicate.  (The r12
    window rewrite initially lumped every NULL digest into one
    partition and collapsed distinct NULL-text docs into one
    'exact-dup' group; the pre-r12 inner join instead DROPPED them
    from the output entirely — both wrong.)"""
    from v6spark.operators.dedup import near_dup_keepers

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None), (3, None),
         (4, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["keeper_id"]
           for r in near_dup_keepers(df, max_bucket_size=8).collect()}
    assert got[2] == 2 and got[3] == 3
    assert got[1] == 1 and got[4] == 1


def test_scan_is_small_unsizable_returns_none(spark):
    """Fileless frames are UNSIZABLE (None), not assumed small or
    large — the caller falls back to the partition-count probe."""
    from v6spark.operators.dedup import _scan_is_small

    mem = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    assert _scan_is_small(mem) is None
    scan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert _scan_is_small(scan) is True
