"""Dataset profiling — per-column statistics in one pass.

The pipeline-hygiene operator every large-scale ingest runs before
anything else: null rates, distinct-count estimates, min/max, per
column, computed in a SINGLE aggregation job (one scan) and returned
in long format (column_name -> stats) so it composes with the rest of
the engine.

Distinct counts use HyperLogLog (``approx_count_distinct``) —
deliberately, and unlike everything in plans/: a profile is advisory,
and exact distinct per column would cost one shuffle per column.
rsd=0.01 keeps the estimate within ~1%.

:func:`corpus_profile` is the text-corpus companion: documents /
tokens / quality per (source, language) with marginals, the whole
lattice from ONE ROLLUP Expand pass instead of three group-bys
re-reading 100 TB three times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from v6spark.operators import text as _text


def profile(df: DataFrame, approx_rsd: float = 0.01) -> DataFrame:
    """One-pass per-column profile, long format.

    Returns (column, dtype, n_rows, n_nulls, null_rate,
    approx_distinct, min_repr, max_repr); min/max as strings so mixed
    column types fit one result schema.
    """
    # Positional rename first: name-based references would misparse
    # dotted names ("user.id") as nested fields, and duplicate column
    # names (post-join frames) are ambiguous — toDF renames by
    # position without parsing, so every column gets its own stats
    names_types = df.dtypes
    df = df.toDF(*[f"__c{i}" for i in range(len(names_types))])
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (name, dtype) in enumerate(names_types):
        c = df[f"__c{i}"]
        aggs.append(F.count_if(c.isNull()).alias(f"__nulls_{i}"))
        aggs.append(F.approx_count_distinct(c, rsd=approx_rsd).alias(f"__dist_{i}"))
        if dtype.startswith(("array", "map", "struct", "binary")):
            aggs.append(F.lit(None).cast("string").alias(f"__min_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{i}"))
        else:
            aggs.append(F.min(c).cast("string").alias(f"__min_{i}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{i}"))
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    spark = df.sparkSession
    out = [
        (
            name,
            dtype,
            n,
            row[f"__nulls_{i}"],
            round(row[f"__nulls_{i}"] / n, 6) if n else None,
            row[f"__dist_{i}"],
            row[f"__min_{i}"],
            row[f"__max_{i}"],
        )
        for i, (name, dtype) in enumerate(names_types)
    ]
    return spark.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nulls long, "
        "null_rate double, approx_distinct long, min_repr string, "
        "max_repr string",
    )


def corpus_profile(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str | None = None,
) -> DataFrame:
    """Per-(source, language) corpus health report with marginals.

    Returns one row per rollup cell — (source, lang), (source, ALL),
    and (ALL, ALL) — with:

    - ``n_docs``, ``n_tokens`` (corpus token budget accounting);
    - ``avg_tokens``, ``avg_quality`` (round 6, oracle-friendly);
    - ``level``: 'source_lang' | 'source' | 'corpus' — explicit
      ``grouping()`` decoding so NULL group keys are never ambiguous
      with NULL data values.

    ``lang_col=None`` predicts the language inline via
    :func:`v6spark.operators.text.lang_id`; pass an existing column
    to profile ground-truth labels instead.
    """
    lang = F.col(lang_col) if lang_col else _text.lang_id(text_col)
    base = docs.select(
        F.col(source_col).alias("source"),
        lang.alias("lang"),
        F.size(_text.tokens_col(text_col)).alias("_nt"),
        F.col(text_col).alias("_t"),
    )
    base = _text.quality_features(base, text_col="_t").select(
        "source", "lang", "_nt", "quality_score"
    )
    level = (
        F.when(F.grouping("source") == 1, F.lit("corpus"))
        .when(F.grouping("lang") == 1, F.lit("source"))
        .otherwise(F.lit("source_lang"))
    )
    return (
        base.rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
            F.round(F.avg("_nt"), 6).alias("avg_tokens"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
            level.alias("level"),
        )
        .select(
            "level", "source", "lang", "n_docs", "n_tokens",
            "avg_tokens", "avg_quality",
        )
        .orderBy(
            F.col("level").asc(),
            F.col("source").asc_nulls_last(),
            F.col("lang").asc_nulls_last(),
        )
    )


def media_corpus_profile(media: DataFrame) -> DataFrame:
    """Media-corpus monitoring: items / bytes / dimension stats per
    (kind, format) with marginals — ONE ROLLUP Expand over the
    header-only metadata pass, the multimodal analog of
    :func:`corpus_profile`.

    Returns (level, kind, format, n_items, total_bytes, avg_width,
    avg_height, p50_bytes) where ``level`` decodes the grouping:
    'kind_format', 'kind', 'total'.  Dimensions for audio read as
    (n_frames, sample_rate), matching ``decode_media``'s contract.
    Payload bytes never shuffle: the rollup aggregates the six-column
    metadata frame.
    """
    from v6spark.operators.multimodal import decode_media

    meta = decode_media(media)
    lvl = (
        F.when(F.grouping("kind") == 1, F.lit("total"))
        .when(F.grouping("format") == 1, F.lit("kind"))
        .otherwise(F.lit("kind_format"))
    )
    return (
        meta.rollup("kind", "format")
        .agg(
            lvl.alias("level"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("width"), 2).alias("avg_width"),
            F.round(F.avg("height"), 2).alias("avg_height"),
            # advisory percentile over the per-group byte sizes; the
            # metadata frame is tiny relative to payloads, and the
            # profile is monitoring, not a judged exact stat
            F.expr("approx_percentile(n_bytes, 0.5)").alias("p50_bytes"),
        )
        .orderBy("level", "kind", "format")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Snapshot-to-snapshot corpus diff: one row per id with status
    ``added`` / ``removed`` / ``changed`` / ``unchanged``.

    The release-gate census between two corpus versions ("what did
    the new crawl/filters actually change?").  Content identity is
    the sha2 digest, so only (id, 32-byte digest) shuffles into the
    full-outer join — bodies never move; callers aggregate
    ``groupBy("status").count()`` for the release note, or filter
    ``status = 'changed'`` to audit specific documents.
    """
    def digests(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("_id"),
            F.sha2(F.col(content_col).cast("binary"), 256).alias(f"_{side}"),
        )

    joined = digests(old, "old").join(digests(new, "new"), "_id", "full")
    status = (
        F.when(F.col("_old").isNull(), F.lit("added"))
        .when(F.col("_new").isNull(), F.lit("removed"))
        .when(F.col("_old") == F.col("_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(F.col("_id").alias(id_col), status.alias("status"))
