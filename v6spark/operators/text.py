"""Text analysis operators (north star, SURVEY.md §2.2).

Language-ID, quality scoring, token counting and document
fingerprinting over the ``documents`` table — every one a pure
Catalyst expression pipeline (split / array_intersect / regexp /
aggregate HOF), so they run JVM-side inside whole-stage codegen and
scale as narrow map-only stages (zero shuffles until the caller
aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from v6spark.operators.dedup import tokens_col

# Tiny stopword profiles for the n-gram/stopword language heuristic.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans"],
}
CJK_PATTERN = "[\\u4e00-\\u9fff]"


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts + a CJK character signal."""
    toks = tokens_col(text)
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_PROFILES.items()
    }
    scores["zh"] = F.when(
        F.regexp_like(
            F.col(text) if isinstance(text, str) else text, F.lit(CJK_PATTERN)
        ),
        F.lit(10),
    ).otherwise(F.lit(0))
    return scores


def lang_id(text: Column | str, out: str = "pred_lang") -> Column:
    """Argmax language by stopword-profile score.

    Deterministic tie-break: smallest language code among equal scores
    (via an array_sort comparator — a bare struct-max would fall
    through to the lang field and pick the LARGEST code).  Documents
    with zero evidence for every profile return ``'und'`` rather than
    an arbitrary language.
    """
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(v.cast("int").alias("score"), F.lit(k).alias("lang"))
            for k, v in sorted(scores.items())
        ]
    )
    ranked = F.array_sort(
        pairs,
        lambda l, r: (
            F.when(l["score"] > r["score"], -1)
            .when(l["score"] < r["score"], 1)
            .when(l["lang"] < r["lang"], -1)
            .when(l["lang"] > r["lang"], 1)
            .otherwise(0)
        ),
    )
    best = F.element_at(ranked, 1)
    return (
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias(out)
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality features.

    The standard cheap quality heuristics a pretraining pipeline runs
    before expensive model scoring.
    """
    t = F.col(text_col)
    toks = tokens_col(text_col)
    n_chars = F.length(t).cast("double")
    n_punct = F.length(F.regexp_replace(t, "[^.,;:!?]", "")).cast("double")
    stop_hits = F.size(
        F.filter(
            toks,
            lambda x: x.isin(*LANG_PROFILES["en"]),
        )
    ).cast("double")
    n_tokens = F.size(toks).cast("double")
    return df.withColumns(
        {
            "n_tokens": n_tokens.cast("int"),
            "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1.0)), 6),
            "stopword_ratio": F.round(
                stop_hits / F.greatest(n_tokens, F.lit(1.0)), 6
            ),
            "quality_score": F.round(
                F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
                + (stop_hits / F.greatest(n_tokens, F.lit(1.0))) * 0.5,
                6,
            ),
        }
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy count.

    The subword proxy counts alphanumeric runs and punctuation marks
    separately (``regexp_count``) — a cheap stand-in for a real BPE
    tokenizer's piece count, useful for budget accounting.
    """
    t = F.col(text_col)
    return df.withColumns(
        {
            "ws_tokens": F.size(tokens_col(text_col)).cast("int"),
            "bpe_ish_tokens": (
                F.regexp_count(t, F.lit("[A-Za-z0-9]{1,4}"))
                + F.regexp_count(t, F.lit("[^A-Za-z0-9\\s]"))
            ).cast("int"),
        }
    )


def doc_fingerprint(text: Column | str, out: str = "fingerprint") -> Column:
    """Order-sensitive 61-bit rolling hash over tokens.

    Polynomial rolling hash: acc = acc*131 + xxhash64(token) (mod
    2^31-1) — a content fingerprint that, unlike a set hash, changes
    when token order changes.  Pure Catalyst ``aggregate`` fold.  The
    31-bit modulus keeps acc*131 + h inside int64 under ANSI mode.
    """
    m = (1 << 31) - 1
    return F.aggregate(
        tokens_col(text),
        F.lit(0).cast("long"),
        lambda acc, tok: F.pmod(
            acc * F.lit(131) + F.pmod(F.xxhash64(tok), F.lit(m)), F.lit(m)
        ),
    ).alias(out)
