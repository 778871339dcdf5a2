"""Property-based tests (hypothesis) — SURVEY.md §5.2 item 3.

Algebraic laws that hold for ANY input: filter partitioning,
accounting conservation, dedup reconstruction, salted == direct
aggregation, minhash similarity bounds.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from v6spark.operators.dedup import dedup_exact
from v6spark.operators.filters import accounting_df
from v6spark.operators.skew import salted_agg, salted_broadcast_left

SETTINGS = dict(
    max_examples=8,  # each example spins Spark jobs — keep the corpus small
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.floats(
            min_value=-1000, max_value=1000, allow_nan=False, width=32
        ),  # value
    ),
    min_size=1,
    max_size=50,
)


@given(rows=rows_strategy, threshold=st.floats(min_value=-500, max_value=500))
@settings(**SETTINGS)
def test_filter_partition_law(spark, rows, threshold):
    """filter(p) and filter(not p) partition the input exactly."""
    df = spark.createDataFrame(rows, "k int, v float")
    pred = F.col("v") >= threshold
    n_kept = df.filter(pred).count()
    n_dropped = df.filter(~pred).count()
    assert n_kept + n_dropped == len(rows)
    acc = accounting_df(df, pred).collect()[0]
    assert (acc["n_kept"], acc["n_filtered_out"]) == (n_kept, n_dropped)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_salted_agg_equals_direct(spark, rows):
    """Salting must not change aggregate results (any data)."""
    df = spark.createDataFrame(rows, "k int, v double")
    direct = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("v").cast("decimal(18,6)")).cast("double"), 6).alias("s"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["sum_value"])
        for r in salted_agg(df, ["k"], "v", n_salts=4).collect()
    }
    assert salted == direct


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=20
    )
)
@settings(**SETTINGS)
def test_dedup_reconstruction(spark, texts):
    """Sum of dup_counts == row count; keepers are minimal ids; every
    distinct key appears exactly once."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_exact(df, F.col("text"), "doc_id").collect()
    assert sum(r["dup_count"] for r in out) == len(rows)
    assert len(out) == len(set(texts))
    for r in out:
        expect_keeper = min(i for i, t in rows if t == r["dedup_key"])
        assert r["keeper_id"] == expect_keeper


def test_salted_agg_random_mode_spreads_identical_rows(spark):
    """Byte-identical hot rows defeat the content salt (documented
    limitation); random mode spreads them AND still aggregates to the
    exact same result."""
    from v6spark.operators.skew import _salt

    hot = spark.createDataFrame([(1, 2.5)] * 400 + [(2, 1.0)], "k int, v double")
    spread = {
        r["s"]
        for r in hot.withColumn("s", _salt(hot, 8, "random", seed=3))
        .select("s")
        .distinct()
        .collect()
    }
    assert len(spread) > 1  # identical rows land on multiple salts
    direct = {
        (r["k"]): (r["n"], r["s"])
        for r in hot.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("v").cast("decimal(18,6)")).cast("double"), 6).alias("s"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["sum_value"])
        for r in salted_agg(hot, ["k"], "v", n_salts=8, salt_mode="random").collect()
    }
    assert salted == direct


def test_content_salt_is_partition_layout_invariant(spark):
    """The salt must depend on row CONTENT only: re-running with a
    different input partitioning (as a task retry or stage
    recomputation effectively does) must reproduce the exact same
    row->salt assignment — the failure mode of MIID/rand-based salts."""
    from v6spark.operators.skew import _content_salt

    rows = [(k, i) for i in range(200) for k in (1, 2)]
    df1 = spark.createDataFrame(rows, "k int, i int").repartition(7)
    df2 = spark.createDataFrame(rows, "k int, i int").coalesce(1)
    s1 = sorted(tuple(r) for r in df1.withColumn("s", _content_salt(df1, 8)).collect())
    s2 = sorted(tuple(r) for r in df2.withColumn("s", _content_salt(df2, 8)).collect())
    assert s1 == s2
    # and the salt actually spreads a hot key over multiple values
    assert len({s for k, _, s in s1 if k == 1}) > 1


def test_salted_broadcast_left_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(k, i) for i in range(50) for k in ([1] * 3 + [2])], "k int, i int"
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, tag string")
    plain = left.join(right, "k").groupBy("k", "tag").count().collect()
    salted = (
        salted_broadcast_left(left, right, "k", n_salts=4)
        .groupBy("k", "tag")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


# ---- genomics facade laws over RANDOM VCFs (SURVEY.md §5.2 item 3) ----

GT_CHOICES = ["0/0", "0/1", "1/1", "1|0", "./."]


@st.composite
def vcf_strategy(draw):
    n_vars = draw(st.integers(min_value=1, max_value=6))
    n_samples = draw(st.integers(min_value=1, max_value=4))
    lines = [
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(f"s{i}" for i in range(n_samples)),
    ]
    for vi in range(n_vars):
        gts = [
            draw(st.sampled_from(GT_CHOICES)) for _ in range(n_samples)
        ]
        dps = [draw(st.integers(min_value=0, max_value=99)) for _ in range(n_samples)]
        cells = "\t".join(f"{g}:{d}" for g, d in zip(gts, dps))
        qual = draw(st.sampled_from([".", "10", "50.5", "99"]))
        lines.append(
            f"chr{1 + vi % 2}\t{100 + vi * 10}\trs{vi}\tA\tT\t{qual}\tPASS\t.\tGT:DP\t{cells}"
        )
    return "\n".join(lines) + "\n"


@given(vcf_text=vcf_strategy())
@settings(**SETTINGS)
def test_genomics_invariants_random_vcf(spark, vcf_text, tmp_path_factory):
    import uuid

    from v6spark import genomics as g
    from v6spark.genomics import FLT_VARS, N_FILTERED_OUT, N_KEPT

    p = tmp_path_factory.mktemp("hypvcf") / f"{uuid.uuid4().hex}.vcf"
    p.write_text(vcf_text)
    vs = g.Variations.from_vcf(spark, str(p))
    n_vars = vs.num_variations

    # missing + called rates partition every variant's calls
    miss = {r["variant_id"]: r["missing_rate"] for r in g.calc_missing_gt(vs).collect()}
    called = {r["variant_id"]: r["call_rate"] for r in g.calc_called_gt(vs).collect()}
    for vid in miss:
        assert abs(miss[vid] + called[vid] - 1.0) < 1e-9

    # maf in [1/k, 1]; exp_het in [0, 1] or NULL (n<=1 / no calls)
    for r in g.calc_maf_by_gt(vs).collect():
        if r["maf"] is not None:
            assert 0.0 < r["maf"] <= 1.0 + 1e-9
    for r in g.calc_unbiased_exp_het(vs).collect():
        if r["exp_het"] is not None:
            assert -1e-9 <= r["exp_het"] <= 1.0 + 1e-9

    # filter law: kept + filtered_out == total, for any threshold
    res = g.remove_low_call_rate_vars(vs, min_call_rate=0.5)
    assert res[N_KEPT] + res[N_FILTERED_OUT] == n_vars
    assert res[FLT_VARS].num_variations == res[N_KEPT]


@given(rows=rows_strategy, q=st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]))
@settings(**SETTINGS)
def test_exact_percentiles_match_builtin(spark, rows, q):
    """Rank-based percentile == Spark's percentile() aggregate (which
    buffers whole groups — the library replaces it, so the values must
    be indistinguishable) and sits inside [min, max]."""
    from v6spark.operators.stats import exact_percentiles

    df = spark.createDataFrame(rows, "k int, v double")
    mine = {
        r["k"]: r["p"]
        for r in exact_percentiles(df, ["k"], "v", [("p", q)], scale=9).collect()
    }
    builtin = {
        r["k"]: r["p"]
        for r in df.groupBy("k")
        .agg(F.round(F.expr(f"percentile(v, {q})"), 9).alias("p"))
        .collect()
    }
    assert set(mine) == set(builtin)
    for k in mine:
        assert mine[k] == pytest.approx(builtin[k], abs=1e-6)


ids_tokens_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # doc id
        st.integers(min_value=1, max_value=300),  # token count
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@given(rows=ids_tokens_strategy, max_tokens=st.integers(min_value=8, max_value=128))
@settings(**SETTINGS)
def test_packing_laws(spark, rows, max_tokens):
    """For ANY corpus and budget: every doc packed exactly once, no
    regular bin over budget, oversize flag iff the doc alone overflows."""
    from v6spark.operators.packing import pack_sequences

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(df, max_tokens, n_groups=3).collect()
    assert sorted(r["doc_id"] for r in packed) == sorted(i for i, _ in rows)
    toks = dict(rows)
    bins: dict[int, int] = {}
    for r in packed:
        assert r["oversize"] == (toks[r["doc_id"]] > max_tokens)
        if not r["oversize"]:
            bins[r["bin_id"]] = bins.get(r["bin_id"], 0) + r["n_tokens"]
    assert all(t <= max_tokens for t in bins.values())


@given(
    rows=ids_tokens_strategy,
    w=st.tuples(
        st.floats(min_value=0.05, max_value=1.0),
        st.floats(min_value=0.05, max_value=1.0),
        st.floats(min_value=0.05, max_value=1.0),
    ),
    seed=st.integers(min_value=0, max_value=99),
)
@settings(**SETTINGS)
def test_hash_split_partition_law(spark, rows, w, seed):
    """For ANY weights/seed: splits partition the input, and equal keys
    always land in the same split (the leakage-safety law)."""
    from v6spark.operators.sampling import hash_split

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    weights = dict(zip("abc", w))
    out = hash_split(df, "doc_id", weights, seed=seed).collect()
    assert len(out) == len(rows)
    assert {r["split"] for r in out} <= set(weights)
    # Same key -> same split, even via an independent evaluation.
    again = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", weights, seed=seed).collect()
    }
    for r in out:
        assert again[r["doc_id"]] == r["split"]


@given(
    rows=ids_tokens_strategy,
    p=st.floats(min_value=0.0, max_value=1.0),
    q=st.floats(min_value=0.0, max_value=1.0),
    seed=st.integers(min_value=0, max_value=99),
)
@settings(**SETTINGS)
def test_hash_sample_nested_law(spark, rows, p, q, seed):
    """For ANY p <= q and seed: sample(p) is a subset of sample(q)."""
    from v6spark.operators.sampling import hash_sample

    lo, hi = sorted((p, q))
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    small = {r["doc_id"] for r in hash_sample(df, "doc_id", lo, seed=seed).collect()}
    big = {r["doc_id"] for r in hash_sample(df, "doc_id", hi, seed=seed).collect()}
    assert small <= big


# ------------------------- driver-side property tests (no Spark jobs)

@given(data=st.binary(max_size=2048))
@settings(max_examples=200, deadline=None)
def test_crc32c_matches_bytewise_reference(data):
    """The slicing-by-8 CRC32C equals the classic per-byte recurrence
    on arbitrary buffers (tails of every length mod 8 included)."""
    from v6spark.sources.trainshards import _CRC32C_TABLE, crc32c

    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    assert crc32c(data) == crc ^ 0xFFFFFFFF


@given(text=st.text(max_size=400), vocab=st.integers(min_value=256, max_value=320))
@settings(max_examples=60, deadline=None)
def test_bpe_encode_lossless_on_arbitrary_unicode(text, vocab):
    """Greedy BPE over any merge table is LOSSLESS: tokens
    concatenate back to the exact utf-8 bytes for arbitrary unicode
    (byte-level alphabet guarantees no OOV)."""
    from v6spark.operators.bpe import _encode_word, _pretokenize

    # a small arbitrary merge table derived from the text itself
    words = _pretokenize(text)
    ranks = {}
    for w in words[:20]:
        for a, b in zip(w[:-1], w[1:]):
            pair = (bytes([a]), bytes([b]))
            if pair not in ranks and len(ranks) < vocab - 256:
                ranks[pair] = len(ranks)
    out = b""
    for w in words:
        out += b"".join(_encode_word(w, ranks))
    assert out == text.encode("utf-8")


@given(
    seed=st.integers(min_value=0, max_value=2**16),
    w=st.integers(min_value=8, max_value=40),
    h=st.integers(min_value=8, max_value=40),
)
@settings(max_examples=30, deadline=None)
def test_phash_stable_across_png_roundtrip(seed, w, h):
    """pHash of an image equals pHash of its PNG round-trip exactly
    (lossless re-encode => identical 64 bits), for arbitrary sizes."""
    import numpy as np

    from v6spark.operators.media_fingerprint import phash_bytes
    from v6spark.operators.multimodal import _png_decode, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    payload = encode_png(img)
    _w, _h, _c, back = _png_decode(payload)
    assert np.array_equal(back, img)
    assert phash_bytes(payload) == phash_bytes(encode_png(back))


@given(data=st.binary(min_size=0, max_size=500))
@settings(max_examples=100, deadline=None)
def test_example_codec_roundtrip_bytes(data):
    from v6spark.sources.trainshards import decode_example, encode_example

    back = decode_example(encode_example({"payload": data or b"\x00"}))
    assert back["payload"] == [data or b"\x00"]
