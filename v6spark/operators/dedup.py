"""Deduplication operators for large-scale training-data pipelines.

North-star extension surface (SURVEY.md §2.2): exact dedup plus the
near-duplicate family — MinHash+LSH, SimHash, n-gram Jaccard.  All the
per-document signature work happens JVM-side: the batch defaults are
whole-stage-codegen HashAggregates over exploded tokens/shingles
(``simhash_signature_portable(engine="agg")``,
``minhash_signature_frame``); single-pass Catalyst HOF folds remain
for streaming micro-batches (measured faster there), and Arrow pandas
UDF twins exist as library fast paths — every engine pair is
bit-identical and regression-locked.  No judged path runs Python.

Scale shape: every operator is signature -> explode(bands/buckets) ->
hash-shuffle on the bucket key -> within-bucket pairing (a capped
``collect_list`` combination expansion when a bucket guard bounds
membership, a self-join when unguarded).  Candidate generation never
compares all pairs; the shuffle key (band hash) is uniform by
construction, so there is no skew hot-spot at 100 TB.
"""

from __future__ import annotations

import os
import threading

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Deterministic affine-permutation parameters for the MinHash family:
# h_i(x) = (A_i * x + B_i) mod 2^31-1, seeded constants (no RNG at plan
# time so plans are reproducible run-to-run).  The modulus is 31-bit so
# a*x stays inside int64 — Spark 4 runs ANSI mode by default and a
# 61-bit modulus would overflow LongType multiplication.
MERSENNE31 = (1 << 31) - 1

# per-call temp-view suffix for near_dup_report's single-SQL build
# (views are session-scoped and tiny; a fresh pair per call keeps
# concurrent pipelines in one session from clobbering each other)


def _perm_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via a splitmix-style generator."""
    params = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(n):
        out = []
        for _ in range(2):
            state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = state
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            out.append((z ^ (z >> 31)) % MERSENNE31)
        params.append((out[0] | 1, out[1]))
    return params


def tokens_col(text: Column | str, lowercase: bool = True) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    if lowercase:
        t = F.lower(t)
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def shingles_col(text: Column | str, k: int = 3) -> Column:
    """Word k-shingles of a text column as array<string> (JVM-side).

    ``transform(sequence(...))`` generates the sliding windows without
    exploding rows; short documents yield their single full-token
    shingle.

    The token array is LET-BOUND via a single-element ``transform`` so
    it is computed once per row: referencing the tokenizer expression
    directly inside the window lambda would re-split the text for
    every shingle — O(tokens^2) per document, a ~10x slowdown measured
    at sf0.1.
    """
    toks = tokens_col(text)
    return F.element_at(
        F.transform(
            F.array(toks),
            lambda t: F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size(t) - F.lit(k - 1), F.lit(1))
                ),
                lambda i: F.concat_ws(" ", F.slice(t, i, k)),
            ),
        ),
        1,
    )


def _shingles_sql(col_sql: str, k: int = 3) -> str:
    """Spark-SQL string twin of :func:`shingles_col` — for SQL-string
    expression building (per-Column construction costs ~6 py4j round
    trips per node; a judged-query build was measured spending more
    time in driver chatter than the executors spent running it).
    Kept textually in lockstep with shingles_col, including the
    single-element-transform let-binding of the token array."""
    toks = _tokens_sql(col_sql)
    return (
        f"element_at(transform(array({toks}), t -> "
        f"transform(sequence(1, greatest(size(t) - {k - 1}, 1)), "
        f"i -> concat_ws(' ', slice(t, i, {k})))), 1)"
    )


def _tokens_sql(col_sql: str, lowercase: bool = True) -> str:
    """Spark-SQL string twin of :func:`tokens_col`."""
    t = f"lower({col_sql})" if lowercase else col_sql
    return f"filter(split({t}, '\\\\s+'), x -> x != '')"


def portable_hash60(col: Column) -> Column:
    """60-bit portable string hash: the first 15 hex digits of md5.

    MD5 is MD5 in every engine, so this hash has an exact DuckDB twin
    (``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``) — unlike
    xxhash64, which only Spark implements.  15 hex digits keep the
    value under 2^60, so downstream affine arithmetic stays inside
    int64 even under ANSI overflow checking.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def o_portable_hash60(expr: str) -> str:
    """The DuckDB twin of :func:`portable_hash60` for oracle SQL."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def _portable_hash60_sql(expr: str) -> str:
    """Spark-SQL string twin of :func:`portable_hash60` (build-time
    py4j economy; see :func:`_shingles_sql`)."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def minhash_signature(text: Column | str, n_hashes: int = 64, k: int = 3) -> Column:
    """MinHash signature (array<bigint>) of a text column.

    Single-pass formulation: one portable-hash pass over the shingles
    (md5-based so a SQL oracle can reproduce the exact values), then
    ONE ``aggregate`` fold whose accumulator is the length-n_hashes
    vector of running minima — each shingle applies all affine
    permutations via an indexed ``transform``.  (The naive form — one
    ``array_min(transform(base, ...))`` per permutation — re-evaluates
    the shingle+hash subtree per permutation in the interpreted HOF
    path: ~60x slower at 64 hashes, measured at sf0.1.)
    """
    params = _perm_params(n_hashes)
    arr_a = F.array(*[F.lit(a) for a, _ in params])
    arr_b = F.array(*[F.lit(b) for _, b in params])
    base = F.transform(
        shingles_col(text, k),
        lambda s: F.pmod(portable_hash60(s), F.lit(MERSENNE31)),
    )
    init = F.array_repeat(F.lit(MERSENNE31).cast("long"), n_hashes)
    return F.aggregate(
        base,
        init,
        lambda acc, h: F.transform(
            acc,
            lambda v, i: F.least(
                v,
                F.pmod(
                    h * F.element_at(arr_a, i + 1) + F.element_at(arr_b, i + 1),
                    F.lit(MERSENNE31),
                ),
            ),
        ),
    )


def minhash_signature_frame(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """``(_id, _sig)`` MinHash signatures as a whole-stage-codegen
    aggregate: shingles explode to rows, the md5 shingle hash and all
    ``n_hashes`` affine permutations evaluate compiled, and the
    running minima are plain ``min`` aggregate buffers (map-side
    combined; the shuffle carries one 64-long row per document).

    This is the relational twin of :func:`minhash_signature` (same
    portable arithmetic, bit-identical output) for batch pipelines:
    the column-expression form folds with ``aggregate``/``transform``
    HOFs, which Spark evaluates INTERPRETED — measured ~2x slower at
    sf0.1 and the gap widens with data (same finding as the SimHash
    ``engine="agg"`` rewrite).  Keep the column form where a per-row
    expression is required (streaming stages, single-pass select
    composition).

    Documents with NULL ``text_col`` disappear (explode drops them) —
    they produce NULL signatures in the column form and can never
    collide into a band bucket either way, so candidate-pair output
    is identical.

    PRECONDITION: ``id_col`` values must be unique and non-NULL.  The
    groupBy merges rows sharing an id into ONE blended min-signature
    (and Catalyst groups all NULL ids together), whereas the per-row
    column/arrow engines emit one signature per ROW — engine parity
    breaks silently on duplicate ids.  Callers that cannot guarantee
    uniqueness should ``dropDuplicates([id_col])`` first (that is what
    :func:`near_dup_report` relies on: corpus ids are primary keys).
    """
    params = _perm_params(n_hashes)
    # `%`, not `pmod`: every operand here is provably non-negative
    # (the md5 hash is 60-bit unsigned; _h < 2^31 and a,b < 2^31 keep
    # _h*a+b < 2^62), so the two agree bit-for-bit — and `%` is one
    # IREM in codegen while pmod emits a branch + double remainder,
    # which matters x65 inside the aggregate's update path (measured
    # ~0.2 s off the cold first run, ~0.1 s warm at sf0.1).  The
    # DuckDB oracle uses `%` on the same non-negative values.
    ex = df.selectExpr(
        f"{id_col} AS _id",
        f"explode({_shingles_sql(text_col, shingle_k)}) AS _sh",
    ).selectExpr(
        "_id",
        f"({_portable_hash60_sql('_sh')}) % {MERSENNE31}L AS _h",
    )
    # ONE SQL-string expression for all permutations: per-Column
    # construction costs ~6 py4j round trips per permutation
    # (measured ~0.5 s of pure build time at 64 hashes); Catalyst
    # still plans the 64 independent min buffers (map-side combined),
    # the array is assembled in the aggregate's result projection
    arr = "array(" + ", ".join(
        f"min((_h * {a}L + {b}L) % {MERSENNE31}L)" for a, b in params
    ) + ")"
    return ex.groupBy("_id").agg(F.expr(arr).alias("_sig"))


def minhash_signature_arrow(
    text: Column | str, n_hashes: int = 64, k: int = 3
) -> Column:
    """Arrow twin of :func:`minhash_signature` — BIT-IDENTICAL values
    (same md5-based portable shingle hash, same splitmix affine
    permutations), regression-locked by
    ``test_minhash_engines_agree``.  The Catalyst form's aggregate
    fold is a higher-order function, which Spark evaluates
    INTERPRETED (HOF lambdas never enter whole-stage codegen) —
    measured 9.3 s for 100k docs vs 4.9 s for this kernel's numpy
    broadcast per document (~2x; the signature is the only thing
    crossing the Arrow boundary — 64 longs per doc).  Use the
    Catalyst form where an all-SQL lineage matters (the judged
    oracle query); this is the library fast path, exactly like
    ``simhash_signature`` vs ``simhash_signature_portable``.
    """
    import hashlib
    import re

    from pyspark.sql.functions import pandas_udf

    params = _perm_params(n_hashes)
    t = F.col(text) if isinstance(text, str) else text

    @pandas_udf("array<bigint>")
    def _mh(texts: pd.Series) -> pd.Series:
        import numpy as np

        a = np.array([p[0] for p in params], dtype=np.uint64)
        b = np.array([p[1] for p in params], dtype=np.uint64)
        m = np.uint64(MERSENNE31)
        # Java's default \s is ASCII-only — match it
        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        out = []
        for txt in texts:
            if txt is None:
                # engine parity: the Catalyst column form yields a
                # NULL signature for NULL text (NULL never enters a
                # band bucket); mapping NULL to "" here instead gave
                # every NULL-text doc the SAME empty-shingle
                # signature — they all near-dup-paired each other
                # (caught by the r12 NULL-keeper regression test)
                out.append(None)
                continue
            toks = [x for x in ws.split(txt.lower()) if x]
            # short docs yield their single full-token shingle, like
            # the Catalyst sequence(1, greatest(size-k+1, 1)) form
            nw = max(len(toks) - k + 1, 1)
            # dedupe: duplicates cannot change a running MINIMUM
            sh = {" ".join(toks[i : i + k]) for i in range(nw)}
            hs = np.fromiter(
                (
                    # NB: Python-int modulus — `big_int % np.uint64`
                    # silently promotes to float64 and corrupts the
                    # 60-bit hash
                    int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                    % MERSENNE31
                    for s in sh
                ),
                dtype=np.uint64,
                count=len(sh),
            )
            # h < 2^31 and a < 2^31, so h*a + b < 2^62: exact in uint64
            vals = (hs[:, None] * a + b) % m
            out.append(vals.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return _mh(t)


def _band_bucket_col(sig_col: str, bands: int, rows_per_band: int) -> Column:
    """Band-bucket hashes (array<long>) for a MinHash signature column:
    bucket i = xxhash64("band", i, signature rows of band i).

    A NULL signature yields a NULL ARRAY — no bands at all
    (``explode`` emits nothing for NULL).  Without the guard,
    ``concat_ws`` SKIPS the NULL slice, so every NULL-signature doc
    hashed to the same per-band bucket values and spuriously
    near-dup-paired every other contentless doc (r12 regression
    test)."""
    return F.when(
        F.col(sig_col).isNotNull(),
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(
                F.concat_ws(
                    ",",
                    F.lit("band"),
                    b.cast("string"),
                    F.concat_ws(
                        ",",
                        F.slice(
                            sig_col, b * rows_per_band + 1, rows_per_band
                        ),
                    ),
                )
            ),
        ),
    )


def _band_bucket_sql(sig_col: str, bands: int, rows_per_band: int) -> str:
    """Spark-SQL string twin of :func:`_band_bucket_col` (build-time
    py4j economy; see :func:`_shingles_sql`), incl. its NULL-signature
    -> NULL-array guard."""
    return (
        f"CASE WHEN {sig_col} IS NULL THEN NULL ELSE "
        f"transform(sequence(0, {bands - 1}), b -> "
        f"xxhash64(concat_ws(',', 'band', cast(b as string), "
        f"concat_ws(',', slice({sig_col}, b * {rows_per_band} + 1, "
        f"{rows_per_band}))))) END"
    )


def _guard_buckets(
    banded: DataFrame, keys: list[str], max_bucket_size: int | None
) -> DataFrame:
    """Drop rows in buckets larger than the guard (see
    minhash_lsh_candidates docstring for why oversized buckets are
    routed away rather than joined).

    The count is a WINDOW over the bucket keys, not an
    aggregate+self-join: both sides of that join are data-sized, so
    Spark broadcasts it at toy scale and silently degrades to a
    sort-merge join once the corpus grows (caught by the 100x plan-
    identity stress) — the window form is one shuffle at every scale,
    and the downstream candidate self-join needs the same bucket
    partitioning anyway.

    NULL bucket keys (a NULL signature, e.g. from NULL text) are
    dropped first: a NULL key means "no bucket", and the candidate
    self-join downstream would never match it anyway (NULL never
    equi-joins) — the pre-filter keeps the window form's semantics
    identical to the old inner-join form, which dropped them
    implicitly, instead of lumping every NULL-keyed row into one
    window partition."""
    if max_bucket_size is None:
        return banded
    for k in keys:
        banded = banded.filter(F.col(k).isNotNull())
    w = Window.partitionBy(*[F.col(k) for k in keys])
    return (
        banded.withColumn("_bn", F.count(F.lit(1)).over(w))
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
    )


def bucket_size_histogram(
    bucketed: DataFrame,
    keys: list[str],
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Bucket-population histogram — the LSH scale diagnostic.

    For any bucketed relation (MinHash bands, SimHash bands, ANN
    sign-bit buckets), returns one row per observed bucket size:
    ``(bucket_size, n_buckets, candidate_pairs, over_guard)`` where
    ``candidate_pairs = n_buckets * size*(size-1)/2`` is the exact
    within-bucket join output that size class would generate and
    ``over_guard`` marks classes the ``max_bucket_size`` guard would
    drop.  Two aggregations over (bucket) keys — never materializes
    pairs, so it is safe to run on a corpus whose UNGUARDED pair count
    would be quadratic.
    """
    sizes = bucketed.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    out = (
        sizes.groupBy("bucket_size")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .select(
            "bucket_size",
            "n_buckets",
            # integer DIV, not '/': long '/' is double division in
            # Spark SQL, which loses exactness above 2^53 pairs —
            # plausible for the pathological corpora this diagnostic
            # exists to census
            F.expr(
                "n_buckets * (bucket_size * (bucket_size - 1) DIV 2)"
            ).alias("candidate_pairs"),
            (
                F.lit(False)
                if max_bucket_size is None
                else F.col("bucket_size") > max_bucket_size
            ).alias("over_guard"),
        )
    )
    return out.orderBy("bucket_size")


def minhash_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """(_id, bucket) banding relation used by the MinHash candidate
    join — exposed for diagnostics (``bucket_size_histogram``)."""
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(text_col, n_hashes, shingle_k).alias("_sig"),
    )
    return sig.select(
        "_id",
        F.explode(
            _band_bucket_col("_sig", bands, n_hashes // bands)
        ).alias("bucket"),
    )


def dedup_exact(df: DataFrame, key: Column | str, id_col: str) -> DataFrame:
    """Exact dedup: per content key keep min(id), report duplicate count.

    The canonical hash-groupBy dedup — one shuffle on the content key.
    For full-document identity use ``sha2(text, 256)`` as the key so
    the shuffle moves 32-byte digests, not documents.
    """
    k = F.col(key) if isinstance(key, str) else key
    return df.groupBy(k.alias("dedup_key")).agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    persist_signatures: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash banding.

    rows = bands x rows_per_band; two docs collide if any band of
    their signatures matches exactly.  Returns (id_a, id_b,
    est_jaccard) with id_a < id_b, est_jaccard = matching signature
    fraction.

    ``max_bucket_size`` is the 100 TB robustness guard: the
    within-bucket self-join is quadratic in bucket size, and a real
    corpus has pathological near-identical clusters (boilerplate,
    templates) whose band buckets would otherwise explode — 1k
    identical docs is 500k pairs from EVERY band.  Buckets larger
    than the cap are dropped from candidate generation (their members
    still pair through any smaller bucket they share); production
    callers route oversized buckets to a sampled/exact-key path
    instead of pairing them.

    Scale shape: the band bucket (band index folded into the hash) is
    the self-join shuffle key — uniformly distributed, skew-free — and
    the join carries ONLY (id, bucket) rows; signatures re-attach to
    the (much smaller) surviving candidate pairs afterwards.  The
    signature frame is consumed by three lineages (banding + both
    re-attach sides), so ``persist_signatures`` caches it
    (MEMORY_AND_DISK — signatures are n_docs x n_hashes int64, tiny
    relative to the corpus); measured ~30% faster end-to-end at sf0.1
    than recomputing, on top of ~2x from not shuffling signatures.
    """
    from pyspark import StorageLevel

    rows_per_band = n_hashes // bands
    sig = minhash_signature_frame(df, id_col, text_col, n_hashes, shingle_k)
    if persist_signatures:
        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    banded = sig.select(
        "_id",
        F.explode(
            _band_bucket_col("_sig", bands, rows_per_band)
        ).alias("bucket"),
    )
    banded = _guard_buckets(banded, ["bucket"], max_bucket_size)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates()
    )
    sig_a = sig.select(F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"))
    sig_b = sig.select(F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"))
    est = F.aggregate(
        F.zip_with(
            "sig_a", "sig_b", lambda x, y: F.when(x == y, 1.0).otherwise(0.0)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) / F.lit(float(n_hashes))
    return (
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .select("id_a", "id_b", F.round(est, 6).alias("est_jaccard"))
    )


def near_dup_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket_size: int | None = None,
    engine: str = "arrow",
    include_est: bool = True,
    include_edit: bool = True,
) -> DataFrame:
    """Complete two-stage near-dup pipeline over the corpus.

    Returns LSH candidate pairs with estimated (signature-agreement)
    and exact (n-gram Jaccard) similarity plus Levenshtein distance.
    The corpus is shingled+hashed exactly once (the signature
    aggregate), and the verify stage (set intersection + edit
    distance, the quadratic work) runs only on LSH survivors.

    ``engine`` picks the signature kernel — ``"arrow"`` (default,
    numpy batch, see :func:`minhash_signature_arrow`) or
    ``"catalyst"`` (all-SQL lineage, the judged oracle path — since
    r11 the whole-stage-codegen :func:`minhash_signature_frame`
    aggregate rather than the interpreted HOF fold, ~2x end-to-end
    at sf0.1).  The kernels produce BIT-IDENTICAL signatures, so
    everything downstream (buckets, pairs, jaccard) is invariant to
    the choice.

    Enrichment shape (r11): only ``(_id, _sig)`` is persisted — 64
    longs per doc, ~50x smaller than the old (id, text, sig, set)
    side frame — and the exact-verify inputs (shingle set, text) are
    fetched/recomputed PER PAIR PARTICIPANT: candidate pairs are a
    tiny fraction of the corpus at every scale (the bucket guard
    bounds the degenerate case), so re-shingling two texts per pair
    is strictly less work than shingle-setting the whole corpus, and
    both signature-side joins share ONE broadcast (identical
    projections of the persisted frame -> ReusedExchange).

    ``include_est`` / ``include_edit`` (r12): drop the est_jaccard
    and edit_dist report columns AND the work that computes them —
    est needs both signature re-joins (skipped entirely when off),
    edit_dist is a full Levenshtein per pair, quadratic in text
    length.  :func:`near_dup_keepers` consumes only ``jaccard``; the
    thrown-away enrichment was the single largest slice of its 50x
    stress wall (13.45 -> 11.74 s at 368k verified pairs).
    ``id_a``/``id_b``/``jaccard`` values are identical either way.

    Build shape (r12 optimization round): everything downstream of the
    persisted signature frame is stated as ONE ``spark.sql`` over temp
    views registered on the (spread) input and the signatures.  The
    old DataFrame-op chain re-ANALYZED its whole growing subtree at
    every transformation (Dataset creation is eager analysis), so the
    4-join enrichment tail alone cost ~150 ms of driver time per
    build and the full pipeline ~350 ms; the single statement is one
    parse + one analysis (~0.14 s total, same logical plan — join
    order, guard window, collect-explode pair generation all stated
    identically).  The views resolve to the persisted frame's plan,
    so the CacheManager still substitutes the one cached signature
    relation into all three consuming subtrees exactly as before.
    """
    from pyspark import StorageLevel

    from v6spark.operators.transforms import spread_small_input

    # the signature aggregate below is the CPU-heavy per-token stage;
    # a small scan (one row group) would otherwise run it on one core
    df = spread_small_input(df)
    rows_per_band = n_hashes // bands
    spark = df.sparkSession
    # FIXED per-thread view names, replaced in place on every call
    # (r13, advisor finding: the uniquely-numbered names accumulated
    # catalog entries without bound).  Replacement is the only safe
    # dispose mechanism here: ``dropTempView`` cascade-UNCACHES every
    # cache entry whose plan references the view — including the
    # persisted signature frame the returned plan's three consumers
    # share — which was measured to 2.4x the judged q_dedup_minhash
    # when tried.  ``createOrReplaceTempView`` replaces the catalog
    # entry without touching the cache, and earlier calls' returned
    # DataFrames keep their already-analyzed plans (eager analysis at
    # ``spark.sql`` time; pinned by the view-isolation tests).
    tid = threading.get_ident()
    docs_view = f"_v6_ndr_docs_t{tid}"
    sig_view = f"_v6_ndr_sig_t{tid}"
    df.createOrReplaceTempView(docs_view)
    if engine == "arrow":
        sig = df.select(
            F.col(id_col).alias("_id"),
            minhash_signature_arrow(text_col, n_hashes, shingle_k).alias(
                "_sig"
            ),
        )
    else:
        # textual twin of minhash_signature_frame (same plan, one
        # analysis pass instead of three)
        params = _perm_params(n_hashes)
        arr = "array(" + ", ".join(
            f"min((_h * {a}L + {b}L) % {MERSENNE31}L)" for a, b in params
        ) + ")"
        sig = spark.sql(f"""
            SELECT _id, {arr} AS _sig
            FROM (SELECT _id,
                         ({_portable_hash60_sql('_sh')}) % {MERSENNE31}L
                           AS _h
                  FROM (SELECT `{id_col}` AS _id,
                               explode({_shingles_sql(f'`{text_col}`', shingle_k)})
                                 AS _sh
                        FROM {docs_view}))
            GROUP BY _id
            """)
    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    sig.createOrReplaceTempView(sig_view)

    banded_cte = (
        f"SELECT _id, explode({_band_bucket_sql('_sig', bands, rows_per_band)})"
        f" AS bucket FROM {sig_view}"
    )
    if max_bucket_size is not None:
        # guarded pair generation (r12): pairs expand from a
        # groupBy(bucket) collect_list combination explode instead of
        # the bucket self-join (50x dedup stress: ~2 s off the keeper
        # wall).  The spillable window guard stays IN FRONT of the
        # collect: WindowExec buffers its partition in a spillable
        # row buffer, so a degenerate million-member bucket degrades
        # to disk there and is dropped BEFORE any collect_list buffer
        # exists — collecting first and size-filtering after would
        # materialize the whole pathological bucket in one in-memory
        # aggregation buffer, exactly the OOM the guard exists to
        # prevent.  The collect's buffers are therefore provably
        # <= max_bucket_size elements, and the groupBy reuses the
        # window's hash(bucket) partitioning (no extra shuffle).
        # sort_array + (i, j>i) combinations reproduce the join's
        # id_a < id_b exactly (ids unique per the signature-frame
        # precondition); NULL buckets (NULL signature) are dropped
        # before the window exactly as _guard_buckets does.  The
        # strict id_a < id_b filter keeps the no-self-pair guarantee
        # structural rather than assumed.
        pairs_cte = f"""
        guarded AS (
          SELECT _id, bucket FROM (
            SELECT _id, bucket,
                   count(1) OVER (PARTITION BY bucket) AS _bn
            FROM banded WHERE bucket IS NOT NULL)
          WHERE _bn <= {max_bucket_size}),
        idlists AS (
          SELECT _ids FROM (
            SELECT sort_array(collect_list(_id)) AS _ids
            FROM guarded GROUP BY bucket)
          WHERE size(_ids) >= 2),
        pairs AS (
          SELECT DISTINCT _p.a AS id_a, _p.b AS id_b FROM (
            SELECT explode(flatten(transform(_ids, (x, i) ->
                   transform(slice(_ids, i + 2, size(_ids)),
                   y -> struct(x AS a, y AS b))))) AS _p
            FROM idlists)
          WHERE _p.a < _p.b)"""
    else:
        pairs_cte = """
        pairs AS (
          SELECT DISTINCT a._id AS id_a, b._id AS id_b
          FROM banded a JOIN banded b
            ON a.bucket = b.bucket AND a._id < b._id)"""

    set_a = f"array_distinct({_shingles_sql(f'da.`{text_col}`', shingle_k)})"
    set_b = f"array_distinct({_shingles_sql(f'db.`{text_col}`', shingle_k)})"
    inter = f"size(array_intersect({set_a}, {set_b}))"
    jacc = (
        f"round(cast({inter} as double) / cast(size({set_a}) + "
        f"size({set_b}) - {inter} as double), 6) AS jaccard"
    )
    # every outer-query reference is qualified with its CTE/view alias
    # (r13, advisor finding): the docs view carries the CALLER's
    # columns, so an input frame that already has an ``id_a``/``id_b``
    # column would otherwise make the bare names ambiguous and fail
    # analysis.
    cols = ["pairs.id_a AS id_a", "pairs.id_b AS id_b"]
    sig_joins = ""
    if include_est:
        sig_joins = (
            f"\n        JOIN {sig_view} sa ON pairs.id_a = sa._id"
            f"\n        JOIN {sig_view} sb ON pairs.id_b = sb._id"
        )
        cols.append(
            "round(aggregate(zip_with(sa._sig, sb._sig, (x, y) -> "
            "IF(x = y, 1.0D, 0.0D)), 0.0D, (acc, v) -> acc + v) / "
            f"{float(n_hashes)}D, 6) AS est_jaccard"
        )
    cols.append(jacc)
    if include_edit:
        cols.append(
            f"cast(levenshtein(da.`{text_col}`, db.`{text_col}`) as int)"
            " AS edit_dist"
        )
    out = spark.sql(f"""
        WITH banded AS ({banded_cte}),{pairs_cte}
        SELECT {", ".join(cols)}
        FROM pairs{sig_joins}
        JOIN {docs_view} da ON pairs.id_a = da.`{id_col}`
        JOIN {docs_view} db ON pairs.id_b = db.`{id_col}`
        """)
    return out


def _simhash_banded(
    sigs: DataFrame, id_col: str, sig_col: str, n_bits: int, radius: int
) -> DataFrame:
    """(_id, _sig, band, key) banding relation for Hamming-ball joins."""
    bands = radius + 1
    if bands > n_bits:
        raise ValueError("radius + 1 must be <= n_bits")
    base, extra = divmod(n_bits, bands)
    layout = []
    off = 0
    for i in range(bands):
        w = base + (1 if i < extra else 0)
        layout.append((off, w))
        off += w
    sig = F.col(sig_col)

    def _mask(w: int) -> int:
        # LongType is signed 64-bit: a 64-wide band's all-ones mask
        # must be the signed representation -1, not 2^64-1 (which
        # overflows literal construction — radius=0 at n_bits=64)
        m = (1 << w) - 1
        return m - (1 << 64) if m > 0x7FFFFFFFFFFFFFFF else m

    band_keys = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(sig, off)
                .bitwiseAND(F.lit(_mask(w)))
                .alias("key"),
            )
            for i, (off, w) in enumerate(layout)
        ]
    )
    return sigs.select(
        F.col(id_col).alias("_id"),
        sig.alias("_sig"),
        F.explode(band_keys).alias("_bk"),
    ).select(
        "_id",
        "_sig",
        F.col("_bk.band").alias("band"),
        F.col("_bk.key").alias("key"),
    )


def simhash_pairs_between(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    n_bits: int = 64,
    radius: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Hamming-ball pairs BETWEEN two signature sets (not within).

    The two-sided twin of :func:`simhash_pairs`: every (left, right)
    pair within Hamming ``radius`` — same pigeonhole band bucketing
    (exact recall), same popcount verify, but the join is
    left-banding ⋈ right-banding, so within-side pairs never
    generate.  This is the incremental-dedup primitive: "which of
    these NEW documents near-duplicate anything in the existing
    index?" — and the near-match analog of the contamination check.
    Returns (left_id, right_id, hamming), deduplicated.

    ``max_bucket_size`` guards the RIGHT (index) side's bucket
    population, the one that grows without bound in incremental use.
    """
    lb = _simhash_banded(left, id_col, sig_col, n_bits, radius)
    rb = _simhash_banded(right, id_col, sig_col, n_bits, radius)
    rb = _guard_buckets(rb, ["band", "key"], max_bucket_size)
    ham = F.bit_count(F.col("l._sig").bitwiseXOR(F.col("r._sig")))
    return (
        lb.alias("l")
        .join(
            rb.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key")),
        )
        .filter(ham <= radius)
        .select(
            F.col("l._id").alias("left_id"),
            F.col("r._id").alias("right_id"),
            ham.cast("int").alias("hamming"),
        )
        .dropDuplicates(["left_id", "right_id"])
    )


def _scan_is_small(df: DataFrame, max_bytes: int = 32 << 20) -> bool | None:
    """Whether ``df``'s backing scan is small enough that explicit
    repartitions (not shuffle-stage parallelism) are the cheaper way
    to spread CPU-heavy per-row work.  Sizes the scan by file bytes
    (``inputFiles`` + stat — driver-side, milliseconds).  Returns
    ``None`` when the probe cannot size the frame (no backing files
    — a createDataFrame frame; non-local URIs such as s3:// whose
    stat fails; >1024 files): the CALLER then falls back to the
    partition-count heuristic, so an unsizable-but-small remote
    corpus keeps the explicit-spread fix instead of silently running
    its signature kernel single-task."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    if len(files) > 1024:
        return False
    from urllib.parse import urlparse

    total = 0
    for f in files:
        try:
            p = urlparse(f).path if "://" in f or f.startswith("file:") else f
            total += os.path.getsize(p)
        except OSError:
            return None
        if total >= max_bytes:
            return False
    return True


def near_dup_keepers(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    min_jaccard: float = 0.8,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """End-to-end guarded near-dedup: every document's keeper id.

    This is the composition that makes the ``max_bucket_size`` guard
    SAFE rather than lossy — the "route oversized buckets to an
    exact-key path" the guard docstrings call for:

    1. EXACT dedup on the content digest collapses byte-identical
       documents to one representative (min id) per digest.  The
       dominant cause of oversized LSH buckets — thousands of copies
       of the same boilerplate — resolves here at hash-groupBy cost
       and never reaches the quadratic join at all.
    2. Guarded MinHash-LSH + exact n-gram Jaccard verification runs
       on REPRESENTATIVES ONLY (one signature per distinct text —
       also the standard signature-cost saver on duplicate-heavy
       corpora); pairs keep ``jaccard >= min_jaccard``.
    3. :func:`connected_keepers` clusters the verified pairs, and the
       representative-level keeper map composes with the exact-dup
       map via one join.

    After step 1, the guard can only drop candidate pairs between
    near-identical-but-DISTINCT templates that share no small bucket
    — the documented residual trade-off.

    Returns (doc_id, keeper_id) for EVERY input document (singletons
    keep themselves) — left-joinable onto the corpus directly.
    """
    from pyspark import StorageLevel

    from v6spark.operators.transforms import spread_small_input

    # Small-corpus parallelism: the representatives frame below is
    # SHUFFLE-derived (digest window), so at toy scale AQE coalesces
    # it to one partition and the signature kernel inside
    # near_dup_report would run single-task (measured 13.5 s -> ~4 s
    # at 5k docs).  Smallness is decided by SCAN BYTES (r12), not
    # split count: a 100-MB corpus can arrive as two splits, and the
    # partition-count heuristic then re-shuffled the full text
    # twice (input spread + reps repartition) for nothing — ~3 s of
    # the 50x dedup stress wall.  An unsizable scan (fileless or
    # remote-URI frames) falls back to the partition-count probe —
    # the pre-r12 behavior — rather than guessing either way.
    small = _scan_is_small(df)
    if small is None:
        spread_df = spread_small_input(df)
        small = spread_df is not df
        df = spread_df
    elif small:
        df = spread_small_input(df)

    digests = df.select(
        F.col(id_col).alias("_doc"),
        F.col(text_col).alias("_text"),
        F.sha2(F.col(text_col), 256).alias("_digest"),
    )
    # representative = min id over the digest partition: ONE shuffle
    # (window over _digest) instead of the old groupBy + join-back,
    # same digest-hash shuffle key, one pass (r12).  NULL text (NULL
    # digest) docs are their OWN representative: no content means
    # nothing to near-duplicate, and the window would otherwise lump
    # every NULL digest into one partition and silently collapse
    # distinct NULL-text docs into one "exact-dup" group (the old
    # inner-join form instead DROPPED them from the output entirely,
    # violating the every-input-doc contract — both wrong, both
    # regression-tested now).
    with_rep = (
        digests.withColumn(
            "_rep",
            F.when(F.col("_digest").isNull(), F.col("_doc")).otherwise(
                F.min("_doc").over(Window.partitionBy("_digest"))
            ),
        )
        .select("_doc", "_rep", "_text")
        # persisted: feeds the reps selection, the LSH report (via
        # reps) and the final keeper-map join — without the cache the
        # caller's upstream subtree (quality scoring etc.) would
        # re-execute once per consumer.  Same lifecycle convention as
        # near_dup_report's side frame (session.clear_engine_caches).
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    reps = with_rep.filter(F.col("_doc") == F.col("_rep")).select(
        F.col("_rep").alias(id_col), F.col("_text").alias(text_col)
    )
    if small:
        reps = reps.repartition(
            df.sparkSession.sparkContext.defaultParallelism
        )
    # only `jaccard` gates keeper membership: skip the est_jaccard
    # signature re-joins and the per-pair Levenshtein entirely (r12 —
    # the thrown-away enrichment owned most of the 50x stress wall)
    pairs = near_dup_report(
        reps,
        id_col=id_col,
        text_col=text_col,
        n_hashes=n_hashes,
        bands=bands,
        shingle_k=shingle_k,
        max_bucket_size=max_bucket_size,
        include_est=False,
        include_edit=False,
    ).filter(F.col("jaccard") >= min_jaccard)
    rep_keepers = connected_keepers(pairs).select(
        F.col("doc_id").alias("_rep"), F.col("keeper_id").alias("_keeper")
    )
    return with_rep.join(rep_keepers, "_rep", "left").select(
        F.col("_doc").alias(id_col),
        F.coalesce("_keeper", "_rep").alias("keeper_id"),
    )


def _free_checkpoint_blocks(df: DataFrame) -> None:
    """Best-effort eager release of a ``localCheckpoint``'s blocks.

    ``DataFrame.unpersist()`` is a NO-OP for checkpointed plans —
    they are not registered with the cache manager; without this the
    blocks are reclaimed only when the ContextCleaner garbage-collects
    the RDD reference.  The checkpointed RDD is the ``LogicalRDD``
    leaf's ``rdd`` field, reachable through py4j; if the plan shape
    ever differs (non-checkpointed input), fall back silently to
    ContextCleaner-on-GC, which is correct just not prompt.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _driver_union_find(edges: list[tuple], spark, dtype: str) -> DataFrame:
    """Union-find on the driver for a SMALL edge list; same contract
    as :func:`connected_keepers` (doc_id -> min id of component).
    ``dtype`` is the id column's Spark type so string/long corpora
    round-trip unchanged (Python ``<`` and Spark ordering agree for
    both)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN so the root IS the keeper id
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    rows = [(x, find(x)) for x in parent]
    if not rows:
        return spark.createDataFrame(
            [], f"doc_id {dtype}, keeper_id {dtype}"
        )
    # Arrow path: createDataFrame from a pandas frame serializes the
    # few-hundred-k keeper map in one Arrow batch instead of
    # row-by-row py4j pickling (~1 s saved at the 50x stress's 250k
    # vertices); the tuple fallback keeps exotic id types working.
    try:
        pdf = pd.DataFrame(rows, columns=["doc_id", "keeper_id"])
        out = spark.createDataFrame(pdf).selectExpr(
            f"cast(doc_id as {dtype}) AS doc_id",
            f"cast(keeper_id as {dtype}) AS keeper_id",
        )
    except Exception:
        out = spark.createDataFrame(
            rows, f"doc_id {dtype}, keeper_id {dtype}"
        )
    # broadcast hint, SIZE-GATED: the driver already holds the rows,
    # so the estimate is exact-enough — a forced hint must not depend
    # on the caller-tunable driver_threshold (a raised threshold or
    # long string ids could otherwise force a multi-hundred-MB
    # broadcast past AQE's sizing).  Under the cap, downstream
    # corpus map-backs broadcast instead of shuffling the corpus.
    approx = sum(
        2 * (len(a) + len(b)) if isinstance(a, str) else 16
        for a, b in rows[:50_000]
    )
    approx = approx * (len(rows) / max(len(rows[:50_000]), 1))
    if approx <= 64 << 20:
        out = F.broadcast(out)
    return out


def connected_keepers(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    check_every: int = 2,
    driver_threshold: int = 500_000,
) -> DataFrame:
    """Cluster near-dup pairs into groups; keeper = min id per group.

    The last stage of the dedup pipeline: verified pairs form a graph
    whose connected components are the duplicate groups, and the
    canonical survivor is each component's minimum id.

    HYBRID solve: the distributed label-propagation below costs ~8
    driver-synchronous rounds (each an eager checkpoint) regardless of
    graph size, so a small verified-pair graph — the common case
    after the exact pre-collapse and Jaccard verification — pays tens
    of seconds of round-trip latency for milliseconds of work.  The
    probe is ``limit(driver_threshold + 1).collect()`` on the (id_a,
    id_b) projection of the persisted pairs frame: at most
    threshold+1 Rows reach the driver (~120 bytes/Row plus the
    union-find's parent dict ⇒ roughly 100-150 MB transient at the
    default 500k — sized to stay comfortably inside even a default
    1 GB driver), and the persist means an over-threshold probe costs
    one extra cached read, not a re-execution of the expensive
    verified-pair plan.  Under the threshold, union-find with union-by-min +
    path compression solves exactly; results are identical by
    construction (both compute min-id per component,
    regression-tested against each other).  Larger graphs take the
    distributed path; ``driver_threshold=0`` skips the probe
    entirely.

    Min-id label propagation with POINTER DOUBLING: every vertex
    starts labelled with itself; each round (1) lowers a vertex's
    label to the minimum among itself and its neighbours' labels (one
    join + hash-agg), then (2) short-circuits label chains by
    re-pointing each vertex at its label's label (one self-join on the
    tiny (id, label) relation).  The doubling step roughly triples the
    label-reach per round, so a diameter-d chain converges in O(log d)
    rounds instead of the O(d) of plain propagation — the same
    contraction idea as the alternating-star / pointer-jumping CC
    algorithms, expressed as two DataFrame joins.

    Each round ends in an EAGER ``localCheckpoint``: iterative
    self-joins defeat cache-plan matching (the alias dedup rewrites
    attribute ids, so ``persist`` alone leaves the logical plan
    growing 4x per round — measured as a cliff at round 4), and the
    checkpoint physically truncates lineage to the materialized
    blocks.  State per round is only the (vertex, label) relation.
    Labels are monotonically non-increasing, so convergence is
    testable against the last CHECKED snapshot: the driver-blocking
    ``count()`` runs only every ``check_every`` rounds, not per pass.

    Returns (doc_id, keeper_id); singletons are their own keepers only
    if they appear in a pair — callers left-join this onto the corpus
    and coalesce to doc_id.  ``connected_keepers.last_rounds`` records
    the round count of the most recent call (regression-tested).
    """
    probe_cache = None
    if driver_threshold:
        # limit(k+1).collect() on the PERSISTED pairs: one execution
        # of the (possibly expensive) verified-pair plan decides the
        # path AND delivers the edges when small; when the probe
        # overflows, the distributed path below reads the same cache
        # instead of re-running the plan
        probe_cache = pairs.select(id_a, id_b).persist()
        # toPandas, not collect(): the bounded edge list arrives as
        # Arrow column batches instead of ~threshold Row objects
        # (~1 s less driver time at the 50x stress's 368k edges)
        head = probe_cache.limit(driver_threshold + 1).toPandas()
        if len(head) <= driver_threshold:
            dtype = dict(pairs.dtypes)[id_a]
            out = _driver_union_find(
                list(zip(head.iloc[:, 0], head.iloc[:, 1])),
                pairs.sparkSession,
                dtype,
            )
            probe_cache.unpersist()
            connected_keepers.last_rounds = 0
            return out
        pairs = probe_cache

    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=False)
    )
    snapshot = labels
    rounds = 0
    while rounds < max_iters:
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        prop = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.least(
                F.col("label"), F.coalesce("nlabel", F.col("label"))
            ).alias("label"),
        ).persist()
        lmap = prop.select(
            F.col("id").alias("_lid"), F.col("label").alias("_llabel")
        )
        new_labels = (
            prop.join(lmap, F.col("label") == F.col("_lid"), "left")
            .select(
                "id",
                F.coalesce("_llabel", F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        prop.unpersist()
        # the eager checkpoint above materialized new_labels, so the
        # PREVIOUS round's checkpoint blocks are dead weight — drop
        # them through the checkpointed RDD (plain unpersist() would
        # be a cache-manager no-op), unless they are the convergence
        # snapshot the next check still compares against
        if labels is not snapshot:
            _free_checkpoint_blocks(labels)
        labels = new_labels
        rounds += 1
        if rounds % check_every == 0 or rounds == max_iters:
            # labels only ever decrease, so "unchanged since the last
            # checked snapshot" == "unchanged in every round between"
            changed = (
                labels.withColumnRenamed("label", "_new")
                .join(snapshot, "id")
                .filter(F.col("_new") != F.col("label"))
                .count()
            )
            if snapshot is not labels:
                _free_checkpoint_blocks(snapshot)
            snapshot = labels
            if changed == 0:
                break
    edges.unpersist()
    if probe_cache is not None:
        probe_cache.unpersist()
    connected_keepers.last_rounds = rounds
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("keeper_id")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs.

    Joins shingle sets back to the (small) candidate list — the
    expensive set intersection runs only on LSH survivors, the standard
    two-stage near-dup design.
    """
    sets_df = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles_col(text_col, k)).alias("_set"),
    )
    out = (
        candidates.join(
            sets_df.select(
                F.col("_id").alias("id_a"), F.col("_set").alias("set_a")
            ),
            "id_a",
        )
        .join(
            sets_df.select(
                F.col("_id").alias("id_b"), F.col("_set").alias("set_b")
            ),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("set_a", "set_b")).cast("double")
    union = (
        F.size("set_a") + F.size("set_b")
        - F.size(F.array_intersect("set_a", "set_b"))
    ).cast("double")
    return out.select(
        "id_a",
        "id_b",
        F.round(inter / union, 6).alias("jaccard"),
    )


def simhash_signature_portable(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 60,
    engine: str = "agg",
) -> DataFrame:
    """60-bit SimHash per document, pure Catalyst + portable hashing.

    Token hashes are :func:`portable_hash60` (md5-based) so a DuckDB
    oracle reproduces the exact fingerprints.  Bit j is set iff
    strictly more tokens have bit j set than clear (ties clear).

    ``engine="agg"`` (default): the per-bit majority vote runs as a
    whole-stage-codegen HashAggregate over exploded DISTINCT-token
    runs (r13: tokens are sorted and run-length encoded per row, so
    each distinct token is md5-hashed ONCE and its run count weights
    the vote — the corpus repeats tokens ~2.3x per doc) — bit counts
    are packed 2-per-long into 32-bit lanes by
    ``sum(c * ((h >> j) & 0x0000000100000001))`` for j in 0..31 (bit
    j of lane field f counts hash bit j + 32f: two integer ops per
    sum), so the vote costs ~nothing on top of the tokenize+md5 floor
    (measured at 20x sf0.1: explode+count 0.77 s, +lane sums
    0.78 s; the whole agg form is ~3x the old nested
    ``aggregate``/``zip_with`` HOF fold, which evaluated interpreted
    — HigherOrderFunction has no codegen — and made this the worst
    plan-identical ratio of the 100x stress, 25.2x).  The added
    shuffle carries ONE 33-long row per document (partial
    aggregation combines map-side), which is exactly the shuffle you
    want at 100 TB.  Each row adds at most 2^32+1 to a lane sum, so
    the int64 accumulator holds past 2^31 tokens per document —
    unreachable — and never trips Spark's ANSI sum-overflow check
    (16-bit lanes would: per-row contributions up to ~2^48 overflow
    signed int64, i.e. throw under ANSI, near 32k same-bit tokens).

    ``engine="fold"``: the original single-pass per-row ``aggregate``
    fold (accumulator = length-n_bits vote vector).  No explode, no
    groupBy — required under Structured Streaming, where the agg form
    would become a stateful aggregation.
    """
    if engine == "fold":
        pows = F.array(*[F.lit(1 << j).cast("long") for j in range(n_bits)])
        hs = F.transform(tokens_col(text_col), portable_hash60)
        votes = F.aggregate(
            hs,
            F.array_repeat(F.lit(0).cast("long"), n_bits),
            lambda acc, x: F.zip_with(
                acc,
                pows,
                lambda v, p: v
                + F.when(x.bitwiseAND(p) != 0, F.lit(1)).otherwise(F.lit(-1)),
            ),
        )
        sig = F.aggregate(
            F.zip_with(
                votes,
                pows,
                lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        return df.select(F.col(id_col), sig.alias("simhash"))
    if engine != "agg":
        raise ValueError(f"unknown simhash engine {engine!r}")
    if n_bits > 64:
        raise ValueError("agg engine packs lanes into int64: n_bits <= 64")
    toks_sql = _tokens_sql(f"`{text_col}`")
    # expressions are BUILT as SQL strings: hundreds of Column-method
    # calls here cost ~0.7 s of py4j round trips PER QUERY BUILD
    # (measured; same driver-chatter bottleneck the corpus plan cache
    # exists for) — and the whole pipeline is ONE spark.sql statement
    # (r12 session 2: the 3-step selectExpr/groupBy/select chain
    # re-analyzed the wide lane expressions three times, ~85 ms of
    # driver time per build; one statement analyzes once, ~30 ms).
    lane_mask = 0x0000000100000001  # one 32-bit field per 32 hash bits
    n_lanes = min(32, n_bits)
    # r13 (optimization round 2): per-doc DISTINCT-token run-length
    # encoding before hashing.  The corpus repeats each token ~2.3x
    # per document, and the md5 hash + 32 lane-sum updates were paid
    # per OCCURRENCE; now the token array is sorted per row, run-
    # length encoded with pure HOFs (no extra shuffle, no extra scan),
    # and each DISTINCT token is hashed once with its run count
    # weighting the vote: sum(c * ((h >> j) & mask)) — the identical
    # exact integer sums, so signatures are BIT-IDENTICAL (pinned by
    # the engine-parity tests and the oracle; measured 3.92 -> 3.71 s
    # on the 100x corpus, flat at sf0.1).  Each row adds c to two
    # 32-bit lane fields (c * lane_mask = c + c<<32), so the overflow
    # bound is unchanged: per-doc occurrences < 2^31, unreachable.
    lanes = "array(" + ", ".join(
        f"sum(_c * (shiftright(_h, {j}) & {lane_mask}L))"
        for j in range(n_lanes)
    ) + ")"
    terms = " + ".join(
        # lane = j % 32, field = j // 32
        f"CASE WHEN (shiftright(_ps[{j % 32}], {32 * (j // 32)}) "
        f"& 4294967295) * 2 > _n THEN {1 << j}L ELSE 0L END"
        for j in range(n_bits)
    )
    # fixed per-thread name, replaced in place (see near_dup_report's
    # naming note: dropTempView cascade-uncaches plans referencing the
    # view — a caller's persisted input would be silently evicted)
    view = f"_v6_simhash_t{threading.get_ident()}"
    df.createOrReplaceTempView(view)
    # Run-length encoding over the sorted token array: _starts is the
    # 0-based index list of run heads (guarded IF for the empty array:
    # sequence(0, -1) would be a DESCENDING two-element sequence);
    # each run is (token, next_start - start) via try_element_at
    # lookahead with size(_ts) closing the last run.
    runs = (
        "transform(_starts, (s, k) -> struct("
        "element_at(_ts, s + 1) AS t, "
        "coalesce(try_element_at(_starts, k + 2), size(_ts)) - s AS c))"
    )
    starts = (
        "IF(size(_ts) = 0, array(), "
        "filter(sequence(0, size(_ts) - 1), "
        "i -> i = 0 OR element_at(_ts, i) <> element_at(_ts, i + 1)))"
    )
    # NULL text must yield a NULL signature (the fold form's
    # behavior); explode_outer collapses NULL and empty arrays to the
    # same single NULL-run row, so nullness travels as a group key
    # (same cardinality: one group per document either way; for the
    # empty array _c is NULL, the lane sums and _n are NULL, and every
    # vote CASE falls to 0 exactly as the occurrence form's NULL hash
    # did).  Tokens are NULL iff the text is NULL (split/filter/sort
    # preserve non-nullness) — probing the text directly avoids a
    # second tokenizer evaluation per row.
    out = df.sparkSession.sql(f"""
        SELECT `{id_col}`,
               CASE WHEN _tnull THEN CAST(NULL AS BIGINT)
                    ELSE {terms} END AS simhash
        FROM (SELECT `{id_col}`, _tnull, SUM(_c) AS _n, {lanes} AS _ps
              FROM (SELECT `{id_col}`, _tnull,
                           {_portable_hash60_sql('_r.t')} AS _h,
                           _r.c AS _c
                    FROM (SELECT `{id_col}`, _tnull,
                                 explode_outer({runs}) AS _r
                          FROM (SELECT `{id_col}`, _tnull, _ts,
                                       {starts} AS _starts
                                FROM (SELECT `{id_col}`,
                                             (`{text_col}`) IS NULL AS _tnull,
                                             sort_array({toks_sql}) AS _ts
                                      FROM {view}))))
              GROUP BY `{id_col}`, _tnull)
        """)
    return out


def simhash_signature(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document.

    Token hashing runs JVM-side (xxhash64); the per-bit majority vote
    runs as an Arrow-vectorized pandas UDF over the hash arrays —
    the documented pattern for logic Catalyst can't express cheaply.
    Near-dups are then pairs within small Hamming distance; bucketing
    on bit bands makes that a join, not a scan — :func:`simhash_pairs`.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _simhash(hashes: pd.Series) -> pd.Series:
        import numpy as np

        n = len(hashes)
        out = np.zeros(n, dtype=np.int64)
        lens = np.fromiter(
            (0 if h is None else len(h) for h in hashes), dtype=np.int64, count=n
        )
        pows = np.uint64(1) << np.arange(64, dtype=np.uint64)
        # vectorized ACROSS the batch in row blocks: all tokens of a
        # block flatten into one (tokens, 64) bit matrix and the
        # per-document vote sums come from ONE segmented reduceat —
        # no per-row Python loop.  The block bounds the bit-matrix
        # working set (1024 docs × avg-tokens × 64 int64) instead of
        # materializing the whole Arrow batch's tokens at once.
        block = 1024
        for s in range(0, n, block):
            e = min(s + block, n)
            blens = lens[s:e]
            if int(blens.sum()) == 0:
                continue
            # xxhash64 emits signed int64; reinterpret the bits as
            # uint64 (a direct uint64 cast of negatives raises in numpy)
            flat = np.concatenate(
                [
                    np.asarray(hashes.iloc[i], dtype=np.int64)
                    for i in range(s, e)
                    if lens[i]
                ]
            ).view(np.uint64)
            bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                np.int64
            )
            # rows are contiguous in flat, and empty rows occupy zero
            # width, so the offsets of NON-empty rows are exactly the
            # reduceat segment starts
            nz = blens > 0
            offs = np.zeros(e - s, dtype=np.int64)
            offs[1:] = np.cumsum(blens)[:-1]
            bitsum = np.zeros((e - s, 64), dtype=np.int64)
            bitsum[nz] = np.add.reduceat(bits, offs[nz], axis=0)
            votes = 2 * bitsum - blens[:, None]
            sigs = np.where(votes > 0, pows, np.uint64(0)).sum(
                axis=1, dtype=np.uint64
            )
            out[s:e] = sigs.view(np.int64)
        return pd.Series(out)

    hashed = df.select(
        F.col(id_col),
        F.transform(tokens_col(text_col), lambda t: F.xxhash64(t)).alias("_th"),
    )
    return hashed.select(id_col, _simhash("_th").alias("simhash"))


def simhash_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    n_bits: int = 64,
    radius: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Hamming-ball candidate pairs from SimHash fingerprints.

    The missing half of the SimHash path: turn per-document
    fingerprints (from :func:`simhash_signature` /
    :func:`simhash_signature_portable`) into duplicate PAIRS —
    ``(id_a, id_b, hamming)`` with ``id_a < id_b`` and
    ``hamming <= radius`` — without ever comparing all pairs.

    Pigeonhole banding: the ``n_bits`` signature is split into
    ``radius + 1`` contiguous bit bands, so two signatures within
    Hamming distance ``radius`` MUST agree exactly on at least one
    band (radius flipped bits cannot touch all radius+1 bands).  Each
    document explodes into one ``(band_index, band_bits)`` bucket row
    per band; candidates are a hash self-join on the bucket key, then
    the exact ``bit_count(xor)`` check keeps true neighbours.  Recall
    is exact (every pair within ``radius`` shares a band), precision
    is enforced by the popcount verify — the standard
    Gurmeet-Manku-style sharded Hamming search, as a join.

    Scale shape (same census as MinHash banding): only
    ``(id, sig, band, key)`` rows shuffle — one int64 signature per
    row, never text; the bucket key ``(band, band_bits)`` is
    near-uniform for real corpora; ``max_bucket_size`` guards the
    quadratic within-bucket join against degenerate boilerplate
    clusters exactly as in :func:`minhash_lsh_candidates`.
    """
    # (sig >> off) & mask banding via _simhash_banded: the mask bounds
    # each band below 64-off bits, so arithmetic shift's sign extension
    # never reaches the kept bits
    banded = _simhash_banded(sigs, id_col, sig_col, n_bits, radius)
    banded = _guard_buckets(banded, ["band", "key"], max_bucket_size)
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .filter(ham <= radius)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
