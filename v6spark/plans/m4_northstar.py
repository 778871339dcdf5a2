"""M4 tier — north-star LLM-data-pipeline queries (SURVEY.md §2.2/§2.3).

Exact dedup, token statistics, cosine similarity search, and the
batch analogs of the streaming event windows.  The judged queries are
the deterministic, SQL-oracle-expressible members of the wider
operator family in ``v6spark.operators.{dedup,similarity,text,
sessionize}`` (MinHash-LSH, SimHash, ANN etc. are covered by unit
tests instead — no deterministic SQL oracle exists for them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from v6spark.functions.determinism import dsum, o_dsum
from v6spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_candidates,
    simhash_signature,
)
from v6spark.operators.sessionize import session_counts
from v6spark.operators.similarity import ann_lsh_pairs, cosine_pairs_bruteforce
from v6spark.operators.text import lang_id, quality_features
from v6spark.plans.registry import register
from v6spark.sources.tables import load_table

TIER = "m4_northstar"


@register(
    "q_dedup_exact",
    TIER,
    """
    SELECT array_to_string(string_split(text, ' ')[1:5], ' ') AS dedup_key,
           min(doc_id) AS keeper_id,
           count(*) AS dup_count
    FROM documents
    GROUP BY 1
    ORDER BY dedup_key
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content key (north star).

    Key = first 5 space-tokens (full texts are all unique in the
    corpus, so whole-text dedup would be degenerate — SURVEY.md §2.3).
    One hash-shuffle on the key; at scale the key would be sha2 of the
    normalized prefix so the shuffle carries digests.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.concat_ws(" ", F.slice(F.split("text", " "), 1, 5))
    return dedup_exact(docs, key, "doc_id").orderBy("dedup_key")


@register(
    "q_text_tokens",
    TIER,
    """
    SELECT token, count(*) AS n FROM (
      SELECT unnest(string_split(text, ' ')) AS token
      FROM documents WHERE lang = 'en')
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 25
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequency top-25 over English docs (north star).

    split -> explode -> hash-agg; partial aggregation combines counts
    map-side so the shuffle moves (token, partial n), not raw tokens.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(25)
    )


@register(
    "q_similarity_cosine",
    TIER,
    """
    WITH base AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 40
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             a.embedding AS ea, b.embedding AS eb
      FROM base a JOIN base b ON a.vec_id < b.vec_id
    ), sums AS (
      SELECT id_a, id_b,
             sum(CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)) AS dot,
             sum(CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE)) AS na,
             sum(CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)) AS nb
      FROM pairs, range(1, 65) t(i)
      GROUP BY id_a, id_b
    )
    SELECT id_a, id_b, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cosine
    FROM sums
    ORDER BY cosine DESC, id_a, id_b
    LIMIT 15
    """,
)
def q_similarity_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force pairwise cosine top-15 (north star baseline).

    Exact-cosine correctness baseline on a bounded subset; the scale
    path is ``operators.similarity.ann_lsh_pairs`` (LSH-bucketed).
    Ranking uses the ROUNDED similarity with id tie-breaks so the
    top-k selection is stable across engines.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40)
    return cosine_pairs_bruteforce(emb, top_k=15)


@register(
    "q_event_tumbling",
    TIER,
    f"""
    SELECT epoch_us(ts) // 3600000000 AS hour_bucket,
           count(*) AS n,
           {o_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1
    ORDER BY hour_bucket
    """,
)
def q_event_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (batch analog).

    The bucket is exact integer arithmetic on epoch microseconds
    (oracle-aligned: DuckDB truncates ns parquet timestamps to µs at
    scan) — timezone- and float-free.  The Structured Streaming twin
    (window(ts, '1 hour') + watermark) is v6spark.streaming.events.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.expr("ts_us DIV 3600000000").alias("hour_bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .orderBy("hour_bucket")
    )


@register(
    "q_event_session",
    TIER,
    """
    WITH flags AS (
      SELECT user_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS s
      FROM events)
    SELECT user_id, CAST(sum(s) AS BIGINT) AS n_sessions
    FROM flags GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_event_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute gap rule (batch gaps-and-islands).

    Gap arithmetic runs on exact int64 microseconds (oracle-aligned —
    DuckDB's scanned timestamps are µs); the oracle states the
    identical rule with INTERVAL arithmetic.
    """
    ev = load_table(spark, sf_dir, "events")
    return session_counts(
        ev, ts_ns_col="ts_us", gap_minutes=30, gap_units_per_min=60_000_000
    ).orderBy("user_id")


@register(
    "q_text_quality",
    TIER,
    """
    WITH toks AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '')) AS n_tokens,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x IN ('the','and','of','to','in','is','that','for')))
               AS stop_hits,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
             greatest(length(text), 1) AS n_chars
      FROM documents)
    SELECT doc_id,
           CAST(n_tokens AS INT) AS n_tokens,
           round(n_punct / CAST(n_chars AS DOUBLE), 6) AS punct_ratio,
           round(stop_hits / CAST(greatest(n_tokens, 1) AS DOUBLE), 6) AS stopword_ratio,
           round(least(n_tokens / 100.0, 1.0) * 0.5
                 + (stop_hits / CAST(greatest(n_tokens, 1) AS DOUBLE)) * 0.5, 6)
             AS quality_score
    FROM toks
    ORDER BY doc_id
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (north star: quality scoring).

    Length / punctuation-ratio / stopword-ratio heuristics — the cheap
    pre-model quality pass of a pretraining pipeline, all Catalyst
    expressions (operators/text.py::quality_features).
    """
    docs = load_table(spark, sf_dir, "documents")
    return quality_features(docs).select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "quality_score"
    ).orderBy("doc_id")


@register("q_dedup_minhash", TIER, None)  # rows-only: xxhash64 has no DuckDB twin
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate candidates (north star: near-dedup).

    Deterministic (seeded affine permutations) but not SQL-oracle-
    expressible — DuckDB lacks xxhash64 — so the driver records the
    rows-only check (SURVEY.md §2.2).  Scale shape: signature ->
    band-explode -> hash-shuffle on uniform band buckets; the all-pairs
    join never materializes.
    """
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_candidates(docs, n_hashes=64, bands=16).orderBy(
        "id_a", "id_b"
    )


@register("q_dedup_simhash", TIER, None)  # rows-only: Arrow-UDF bit votes
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (north star: near-dedup family).

    JVM-side token hashing + Arrow-batched majority vote — the
    documented Pandas-UDF slow path, used because 64 per-bit votes is
    the one kernel Catalyst can't express cheaply.
    """
    docs = load_table(spark, sf_dir, "documents")
    return simhash_signature(docs).orderBy("doc_id")


@register("q_similarity_ann", TIER, None)  # rows-only: LSH bucket assignment
def q_similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate near-neighbor pairs (north star: the
    scale path for similarity search).

    Exact cosine is computed only within sign-bit buckets; tested for
    consistency against brute force in tests/test_dedup_similarity.py.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_pairs(emb, n_planes=6, dim=64, min_cosine=0.2).orderBy(
        "id_a", "id_b"
    )


@register("q_lang_id", TIER, None)  # rows-only: profile argmax, no SQL twin kept
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification by stopword-profile argmax (north star:
    language-ID heuristic) — per (lang, pred_lang) confusion counts."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", lang_id("text"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred_lang")
    )


@register(
    "q_event_sliding",
    TIER,
    f"""
    SELECT (epoch_us(ts) // 900000000 - i) * 900000000 AS win_start_us,
           count(*) AS n,
           {o_dsum('value')} AS sum_value
    FROM events, range(0, 4) t(i)
    GROUP BY 1
    ORDER BY win_start_us
    """,
)
def q_event_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour, 15-minute slide) — batch analog.

    Each event lands in window/slide = 4 overlapping buckets,
    generated by an inline sequence explode (no join); the bucket key
    is exact µs arithmetic (oracle-aligned).  The Structured Streaming
    twin is streaming/events.py::sliding.
    """
    ev = load_table(spark, sf_dir, "events")
    slide_us = 900_000_000
    win = (
        ev.select(
            "value",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
            F.expr(f"ts_us DIV {slide_us}").alias("slot"),
        )
        .select(
            ((F.col("slot") - F.col("i")) * slide_us).alias("win_start_us"),
            "value",
        )
    )
    return (
        win.groupBy("win_start_us")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .orderBy("win_start_us")
    )
