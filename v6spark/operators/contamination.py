"""Benchmark decontamination (SURVEY.md §2.2, training-pipeline tier).

Before pretraining, every corpus must be checked for n-gram overlap
with the evaluation benchmarks it will be scored on — a document that
contains an eval question verbatim inflates the benchmark.  The
standard check (GPT-3 appendix C / PaLM / Llama style) flags a
document when enough of its word n-grams appear in the benchmark set.

Scale design: the benchmark side is tiny (eval suites are MBs) and
the corpus side is the 100 TB one, so the asymmetry drives the plan:

- the benchmark's distinct n-gram HASHES form a one-column frame that
  is **broadcast** — the corpus never shuffles to meet it;
- the corpus side explodes each document's distinct n-gram hashes
  (``xxhash64``, 8-byte keys — gram text never leaves the map stage),
  inner-joins the broadcast set, and partial+final counts hits per
  document — the only shuffle carries (doc_id, partial count) rows;
- per-document gram totals are computed narrowly (``size`` of the
  distinct gram array), so the report join is doc-count sized.

Nothing is quadratic and no document body moves more than once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from v6spark.operators.dedup import tokens_col
from v6spark.operators.text import _word_ngrams


def _gram_hashes(text: Column | str, n: int) -> Column:
    """Distinct xxhash64 hashes of the word n-grams of ``text``."""
    return F.array_distinct(
        F.transform(_word_ngrams(tokens_col(text), n), lambda g: F.xxhash64(g))
    )


def benchmark_ngrams(
    bench: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct n-gram hash set of a benchmark frame: one ``gram_hash``
    column, deduplicated — the broadcastable side of the check."""
    return (
        bench.select(F.explode(_gram_hashes(text_col, n)).alias("gram_hash"))
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    max_contaminated_frac: float = 0.0,
) -> DataFrame:
    """Per-document benchmark-overlap report.

    Adds to ``docs``:

    - ``n_grams`` — distinct word n-grams in the document;
    - ``n_contaminated`` — how many of them occur in ``bench``;
    - ``contaminated_frac`` — their ratio (0 for < n-token docs);
    - ``is_contaminated`` — frac > ``max_contaminated_frac`` (the
      default 0.0 flags ANY overlap, the conservative eval-hygiene
      posture; raise it to tolerate incidental collisions).

    The benchmark side broadcasts; see the module docstring for the
    full shuffle census.

    Single-evaluation shape: the document gram array is an expensive
    interpreted HOF expression, so it is evaluated ONCE — the
    exploded grams broadcast-LEFT-join the benchmark set (a hit
    marker, corpus still unshuffled) and one aggregation produces
    BOTH ``n_grams`` (count) and ``n_contaminated`` (marker sum).
    The earlier two-consumer form (size() on the array + a separate
    inner-join branch) evaluated the gram expression twice and cost
    ~2x (measured at 5k docs).
    """
    bench_set = benchmark_ngrams(bench, text_col=bench_text_col, n=n)

    doc_grams = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(_gram_hashes(text_col, n)).alias("gram_hash"),
    )
    marked = doc_grams.join(
        F.broadcast(bench_set.withColumn("__hit", F.lit(1))),
        "gram_hash",
        "left",
    )
    per_doc = marked.groupBy("__id").agg(
        # int/long to match the previous size()/count() output types
        F.count(F.lit(1)).cast("int").alias("n_grams"),
        F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias(
            "n_contaminated"
        ),
    )

    out = (
        docs.join(per_doc, F.col(id_col) == F.col("__id"), "left")
        .drop("__id")
        # < n-token documents explode to zero gram rows: no per_doc row
        .withColumn("n_grams", F.coalesce("n_grams", F.lit(0)))
        .withColumn(
            "n_contaminated",
            F.coalesce("n_contaminated", F.lit(0).cast("long")),
        )
    )
    frac = F.when(
        F.col("n_grams") > 0,
        F.col("n_contaminated").cast("double") / F.col("n_grams"),
    ).otherwise(F.lit(0.0))
    return out.withColumn("contaminated_frac", F.round(frac, 6)).withColumn(
        "is_contaminated",
        F.col("contaminated_frac") > F.lit(float(max_contaminated_frac)),
    )


def near_contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    radius: int = 4,
    n_bits: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Document-level NEAR contamination via SimHash Hamming balls.

    The exact n-gram check above misses a lightly-edited benchmark
    copy whose every n-gram was perturbed (word substitutions every
    few tokens); document-level fingerprints catch exactly that case.
    Each corpus document within Hamming ``radius`` of any benchmark
    document's 60-bit SimHash is reported as (doc_id, bench_id,
    hamming) — feed the ids to an anti-join to drop them.

    Same asymmetry as the exact check: the benchmark side is tiny, so
    its banded signatures are the small side of the bucket join
    (``dedup.simhash_pairs_between`` — corpus bodies never shuffle,
    only 8-byte signatures).  ``max_bucket_size`` defaults to OFF: a
    guard here would silently exclude benchmark fingerprints from
    oversized buckets, and a decontamination SAFETY check must not
    trade recall for speed by default (benchmarks are small — set a
    guard only if a pathological benchmark measurably needs it, and
    audit with ``dedup.bucket_size_histogram`` first).  If the
    benchmark frame has no id column (``bench_id_col=None``), a
    deterministic content id (``xxhash64(text)``) is derived.
    """
    from v6spark.operators.dedup import (
        simhash_pairs_between,
        simhash_signature_portable,
    )

    corpus_sigs = simhash_signature_portable(
        docs, id_col=id_col, text_col=text_col, n_bits=n_bits
    ).select(F.col(id_col).alias("__sid"), "simhash")
    if bench_id_col is None:
        bench = bench.select(
            F.xxhash64(F.col(bench_text_col)).alias("__bench_id"),
            F.col(bench_text_col),
        )
        bench_id_col = "__bench_id"
    bench_sigs = simhash_signature_portable(
        bench, id_col=bench_id_col, text_col=bench_text_col, n_bits=n_bits
    ).select(F.col(bench_id_col).alias("__sid"), "simhash")
    return simhash_pairs_between(
        corpus_sigs,
        bench_sigs,
        id_col="__sid",
        sig_col="simhash",
        n_bits=n_bits,
        radius=radius,
        max_bucket_size=max_bucket_size,
    ).select(
        F.col("left_id").alias(id_col),
        F.col("right_id").alias("bench_id"),
        "hamming",
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    max_contaminated_frac: float = 0.0,
) -> DataFrame:
    """Drop contaminated documents; the filter form of
    :func:`contamination_report` (same plan + one predicate, so
    Catalyst prunes the report columns the caller doesn't keep)."""
    report = contamination_report(
        docs,
        bench,
        n=n,
        text_col=text_col,
        id_col=id_col,
        bench_text_col=bench_text_col,
        max_contaminated_frac=max_contaminated_frac,
    )
    return report.filter(~F.col("is_contaminated")).drop(
        "n_grams", "n_contaminated", "contaminated_frac", "is_contaminated"
    )


def media_contamination_report(
    corpus: DataFrame,
    bench: DataFrame,
    radius: int = 6,
    max_bucket_size: int | None = 10_000,
    on_error: str = "raise",
) -> DataFrame:
    """Benchmark-IMAGE contamination: corpus images perceptually
    matching an eval set's images -> (media_id, bench_id, hamming).

    The multimodal twin of :func:`near_contamination_report`: both
    sides hash to 64-bit pHashes executor-side, the benchmark side
    is the SMALL side of the Hamming-ball band join
    (`simhash_pairs_between` generates no within-side pairs), so
    the corpus never shuffles pixels — or anything wider than an
    int64 — to be screened.  Catches re-encoded / resized / lightly
    edited benchmark images, which exact digests miss.
    """
    from v6spark.operators.dedup import simhash_pairs_between
    from v6spark.operators.media_fingerprint import image_phash

    corpus_sigs = image_phash(corpus, on_error=on_error).withColumnRenamed(
        "phash", "simhash"
    )
    bench_sigs = image_phash(bench, on_error=on_error).withColumnRenamed(
        "phash", "simhash"
    )
    return simhash_pairs_between(
        corpus_sigs,
        bench_sigs,
        id_col="media_id",
        sig_col="simhash",
        n_bits=64,
        radius=radius,
        max_bucket_size=max_bucket_size,
    ).select(
        F.col("left_id").alias("media_id"),
        F.col("right_id").alias("bench_id"),
        "hamming",
    )


def semantic_contamination_report(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-space contamination: corpus vectors semantically
    matching benchmark vectors -> (corpus_id, bench_id, cosine).

    The third contamination tier: exact n-grams catch verbatim
    copies, SimHash/pHash catch lightly-edited copies, and this one
    catches PARAPHRASED copies — same meaning, different tokens —
    via embedding cosine.  The benchmark side broadcasts with
    Hamming-1 multi-probe buckets (`similarity.ann_lsh_pairs_
    between`), so screening 100 TB of embeddings is a corpus scan
    plus one broadcast join, no shuffle.
    """
    from v6spark.operators.similarity import ann_lsh_pairs_between

    return ann_lsh_pairs_between(
        corpus_emb,
        bench_emb,
        id_col=id_col,
        vec_col=vec_col,
        n_planes=n_planes,
        dim=dim,
        min_cosine=min_cosine,
    )
