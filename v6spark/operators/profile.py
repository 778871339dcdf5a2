"""Corpus profiling: the monitoring face of the pipeline (§2.2).

Before and after every preparation run, a data team wants one table
answering "what is in this corpus": documents / tokens / quality per
source, per language, and overall.  ``corpus_profile`` produces the
whole report in ONE scan and ONE shuffle — the (source, language)
lattice comes from ``ROLLUP``, a single Expand pass, instead of three
separate group-bys re-reading 100 TB three times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from v6spark.operators import text as _text


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
