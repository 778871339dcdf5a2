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
from v6spark.operators.dedup import dedup_exact
from v6spark.operators.sessionize import session_counts
from v6spark.operators.similarity import cosine_pairs_bruteforce
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
    SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket,
           count(*) AS n,
           {o_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1
    ORDER BY hour_bucket
    """,
)
def q_event_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (batch analog).

    The bucket is exact integer arithmetic on epoch nanoseconds —
    timezone- and precision-free.  The Structured Streaming twin
    (window(ts, '1 hour') + watermark) is v6spark.streaming.events.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.expr("ts_ns DIV 3600000000000").alias("hour_bucket")
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

    Gap arithmetic runs on exact int64 nanoseconds; the oracle states
    the identical rule with INTERVAL arithmetic on ns timestamps.
    """
    ev = load_table(spark, sf_dir, "events")
    return session_counts(ev, gap_minutes=30).orderBy("user_id")
