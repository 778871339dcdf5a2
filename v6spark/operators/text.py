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


def gopher_quality_rules(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style repetition/shape quality gates, one boolean per rule.

    The classic pretraining heuristics (token-count window, mean word
    length window, symbol-to-token ratio, minimum stopword evidence)
    as pure Catalyst expressions over ONE tokenization — a narrow map
    adding ``rule_*`` booleans and the composite ``passes_gopher``.
    Thresholds are arguments so corpora can tune them; defaults suit
    short-document corpora like the test tables.
    """
    t = F.col(text_col)
    toks = tokens_col(text_col)
    n_tokens = F.size(toks).cast("double")
    total_chars = F.aggregate(
        toks, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")
    )
    mean_word_len = total_chars / F.greatest(n_tokens, F.lit(1.0))
    n_symbols = F.length(F.regexp_replace(t, "[^#…{}<>|\\\\]", "")).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*LANG_PROFILES["en"]))
    ).cast("double")

    rules = {
        "rule_token_count": (n_tokens >= min_tokens) & (n_tokens <= max_tokens),
        "rule_mean_word_len": (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len),
        "rule_symbol_ratio": n_symbols / F.greatest(n_tokens, F.lit(1.0))
        <= max_symbol_ratio,
        "rule_stopword_evidence": stop_hits >= min_stopword_hits,
    }
    out = df.withColumns(rules)
    passes = F.lit(True)
    for name in rules:
        passes = passes & F.col(name)
    return out.withColumn("passes_gopher", passes)


#: Gopher-style repetition gate defaults (Rae et al. 2021, table A1
#: shape): a document fails when too much of it is one repeated line
#: or n-gram.  Keys match the columns :func:`repetition_signals` adds.
DEFAULT_REPETITION_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_10gram_char_frac": 0.10,
}


def _word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams of a pre-tokenized array column (empty when the
    document has fewer than ``n`` tokens — short docs contribute no
    repetition evidence rather than a spurious 100% top-gram)."""
    if n == 1:
        return toks
    windows = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, windows).otherwise(
        F.array().cast("array<string>")
    )


def _repetition_signals_arrow(
    df: DataFrame,
    text_col: str,
    top_ns: tuple[int, ...],
    dup_ns: tuple[int, ...],
    thresholds: dict[str, float],
) -> DataFrame:
    """Arrow engine for :func:`repetition_signals`: per-document gram
    counting in ONE ``mapInPandas`` pass — ZERO shuffle (the posting
    path moves every gram through a groupBy; this stays narrow inside
    the scan stage, the strictly better 100 TB shape) and no
    interpreted higher-order-function evaluation (HOF lambdas never
    enter whole-stage codegen; measured 77 s -> 4.7 s on the 100k-doc
    stress corpus).  Semantics are byte-identical to the Catalyst
    path and regression-locked by ``test_repetition_engines_agree``:
    same ASCII-``\\s`` tokenizer, same count-then-widest tie-break,
    same once-seen-is-no-evidence rule, same clamps and rounding.
    """
    import re
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import types as T

    from v6spark.operators.transforms import spread_small_input

    df = spread_small_input(df)  # parallelize a one-row-group scan
    all_ns = sorted(set(top_ns) | set(dup_ns))

    def r6(x: float) -> float:
        # Spark's round() is BigDecimal.valueOf(double) + HALF_UP;
        # Python's round() is half-EVEN and disagrees on exact .5
        # cases (e.g. 18/256) — replicate Spark exactly
        return float(
            Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
    signal_names = [f"top_{n}gram_char_frac" for n in top_ns] + [
        f"dup_{n}gram_char_frac" for n in dup_ns
    ]
    fields = list(df.schema.fields) + [
        T.StructField(name, T.DoubleType()) for name in signal_names
    ] + [
        T.StructField("dup_line_frac", T.DoubleType()),
        T.StructField("dup_line_char_frac", T.DoubleType()),
        T.StructField("passes_repetition", T.BooleanType()),
    ]
    out_schema = T.StructType(fields)
    # Java's default \s is ASCII-only — match it, not Python's
    # Unicode-aware \s
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def kernel(it):
        import pandas as pd

        for pdf in it:
            rows = {name: [] for name in signal_names}
            rows["dup_line_frac"] = []
            rows["dup_line_char_frac"] = []
            rows["passes_repetition"] = []
            for text in pdf[text_col]:
                text = text or ""
                tc = float(len(text))
                toks = [t for t in ws.split(text.lower()) if t]
                sig: dict[str, float] = {}
                for n in all_ns:
                    if n == 1:
                        grams = toks
                    elif len(toks) >= n:
                        grams = [
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - n + 1)
                        ]
                    else:
                        grams = []
                    cnt = Counter(grams)
                    top_cov = 0.0
                    best = None
                    dup_cov = 0.0
                    for g, c in cnt.items():
                        if c > 1:
                            cov = float(c * len(g))
                            dup_cov += cov
                            if best is None or (c, cov) > best:
                                best = (c, cov)
                    if best is not None:
                        top_cov = best[1]
                    if n in top_ns:
                        sig[f"top_{n}gram_char_frac"] = r6(
                            min(top_cov / tc, 1.0) if tc else 0.0
                        )
                    if n in dup_ns:
                        sig[f"dup_{n}gram_char_frac"] = r6(
                            min(dup_cov / tc, 1.0) if tc else 0.0
                        )
                lines = [l for l in text.split("\n") if l.strip() != ""]
                nl = len(lines)
                nd = len(set(lines))
                dup_chars = sum(
                    c * len(l) for l, c in Counter(lines).items() if c > 1
                )
                sig["dup_line_frac"] = r6(1.0 - nd / nl) if nl else 0.0
                sig["dup_line_char_frac"] = (
                    r6(dup_chars / tc) if tc else 0.0
                )
                sig["passes_repetition"] = all(
                    sig[name] <= float(limit)
                    for name, limit in thresholds.items()
                )
                for name in rows:
                    rows[name].append(sig[name])
            yield pd.concat(
                [pdf.reset_index(drop=True), pd.DataFrame(rows)], axis=1
            )

    return df.mapInPandas(kernel, schema=out_schema)


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    thresholds: dict[str, float] | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Gopher repetition signals: the other half of the quality gate.

    Adds, per document:

    - ``dup_line_frac`` / ``dup_line_char_frac`` — fraction of lines
      (and of characters in lines) occurring more than once;
    - ``top_{n}gram_char_frac`` for n in ``top_ns`` — characters
      covered by the single most frequent word n-gram / total chars
      (0 when no n-gram repeats — a once-seen gram is not evidence);
    - ``dup_{n}gram_char_frac`` for n in ``dup_ns`` — characters in
      n-grams that occur more than once / total chars;
    - ``passes_repetition`` — AND of every signal against
      ``thresholds`` (default :data:`DEFAULT_REPETITION_THRESHOLDS`).

    Scale design — two engines, identical outputs
    (``test_repetition_engines_agree``):

    - ``engine="arrow"`` (default): per-document gram counting inside
      ONE Arrow-batched ``mapInPandas`` — a NARROW map, zero shuffle,
      zero interpreted-HOF evaluation.  Per-doc frequency tables are
      local dicts, so nothing quadratic and nothing leaves the scan
      stage; at 100 TB this costs exactly one scan (measured 16x over
      the posting path on the 100k-doc stress corpus).
    - ``engine="catalyst"``: the all-JVM posting path — ONE tagged
      explode over all n simultaneously (each gram row carries
      ``(n, xxhash64(gram), length)``, never the gram text), partial+
      final count per (doc, n, gram-hash), a doc×n-sized top/dup
      aggregate, one pivot, and a single co-keyed join back.  Kept for
      Python-free deployments; slower because higher-order-function
      lambdas evaluate interpreted, outside whole-stage codegen.

    The line signals are a narrow map in both engines.  Coverage
    counts use ``count × length(gram)`` with inner spaces — the
    standard approximation for overlapping occurrences.
    """
    thresholds = dict(
        DEFAULT_REPETITION_THRESHOLDS if thresholds is None else thresholds
    )
    if engine == "arrow":
        return _repetition_signals_arrow(
            df, text_col, tuple(top_ns), tuple(dup_ns), thresholds
        )
    if engine != "catalyst":
        raise ValueError(f"unknown engine: {engine!r} (arrow, catalyst)")
    all_ns = sorted(set(top_ns) | set(dup_ns))
    toks = tokens_col(text_col)

    def _tag(n: int):
        # MUST be a unary lambda: a second parameter would make
        # F.transform pass the ARRAY INDEX as that argument,
        # silently shadowing a `n=n` default-capture.
        # The struct carries (n, 64-bit gram hash, gram length) — the
        # gram STRING itself dies inside this map expression, so the
        # explode and both aggregations move 13 bytes per gram instead
        # of the up-to-80-byte 10-gram text (measured 22.7 s -> 8.7 s
        # at 5k docs / 3.4x at 100k).  Within-document 64-bit
        # collisions are birthday-bounded by tokens²/2^64 — never at
        # document sizes.
        return lambda g: F.struct(
            F.lit(n).alias("n"),
            F.xxhash64(g).alias("gh"),
            F.length(g).alias("glen"),
        )

    tagged = F.flatten(
        F.array(*[F.transform(_word_ngrams(toks, n), _tag(n)) for n in all_ns])
    )
    total_chars = F.length(F.col(text_col)).cast("double")
    from v6spark.operators.transforms import spread_small_input

    # the n-gram explode + hash is the CPU-heavy stage and pipelines
    # into the SCAN — a one-row-group corpus would run it on one core
    # (measured 17.5 s single-task vs <1 s spread at 5k docs)
    src = spread_small_input(
        df.select(F.col(id_col).alias("__id"), F.col(text_col))
    )
    ex = src.select(
        "__id",
        total_chars.alias("__tc"),
        F.explode(tagged).alias("g"),
    )
    counts = ex.groupBy("__id", "g").agg(
        F.count(F.lit(1)).alias("cnt"), F.first("__tc").alias("tc")
    )
    cov = F.col("cnt") * F.col("g.glen").cast("double")
    per_n = counts.groupBy("__id", F.col("g.n").alias("n")).agg(
        # most frequent REPEATED gram's coverage (ties -> widest
        # coverage; struct max is lexicographic, so cnt dominates).
        # Grams occurring once carry no repetition evidence — without
        # the cnt>1 guard every short unique document scores
        # len(longest gram)/len(doc) and trips the gate.
        F.max(
            F.when(
                F.col("cnt") > 1,
                F.struct(F.col("cnt").alias("c"), cov.alias("cov")),
            )
        )["cov"].alias("top_cov"),
        F.sum(F.when(F.col("cnt") > 1, cov).otherwise(F.lit(0.0))).alias(
            "dup_cov"
        ),
        F.first("tc").alias("tc"),
    )
    pivoted = (
        per_n.groupBy("__id")
        .pivot("n", [str(n) for n in all_ns])
        .agg(F.first("top_cov").alias("top"), F.first("dup_cov").alias("dup"))
    )
    # Overlapping occurrences can cover more characters than the
    # document holds (count × gram-length double-counts shared spans);
    # clamp so the signal stays a fraction.  Coalesce BEFORE the
    # clamp: least() skips NULLs, so least(NULL, 1.0) would turn a
    # too-short-for-n document into a spurious 1.0.
    tc = F.col("tc")

    def _frac(col: str) -> Column:
        return F.least(F.coalesce(F.col(col), F.lit(0.0)) / tc, F.lit(1.0))

    signal_cols = {
        f"top_{n}gram_char_frac": _frac(f"{n}_top") for n in top_ns
    } | {f"dup_{n}gram_char_frac": _frac(f"{n}_dup") for n in dup_ns}
    signals = pivoted.join(
        per_n.groupBy("__id").agg(F.first("tc").alias("tc")), "__id"
    ).select(
        "__id",
        *[
            F.round(F.coalesce(expr, F.lit(0.0)), 6).alias(name)
            for name, expr in signal_cols.items()
        ],
    )

    out = df.join(signals, df[id_col] == signals["__id"], "left").drop("__id")
    for name in signal_cols:
        out = out.withColumn(name, F.coalesce(F.col(name), F.lit(0.0)))

    # Line signals: narrow, let-bound so the \n split runs once/row.
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda x: F.trim(x) != "")
    line_stats = F.element_at(
        F.transform(
            F.array(lines),
            lambda ls: F.struct(
                F.size(ls).alias("n"),
                F.size(F.array_distinct(ls)).alias("nd"),
                F.aggregate(
                    F.array_distinct(ls),
                    F.lit(0.0),
                    lambda acc, d: acc
                    + F.when(
                        F.size(F.filter(ls, lambda x: x == d)) > 1,
                        F.size(F.filter(ls, lambda x: x == d)).cast("double")
                        * F.length(d).cast("double"),
                    ).otherwise(F.lit(0.0)),
                ).alias("dup_chars"),
            ),
        ),
        1,
    )
    out = out.withColumn("__ls", line_stats).withColumns(
        {
            "dup_line_frac": F.round(
                F.when(
                    F.col("__ls.n") > 0,
                    1.0
                    - F.col("__ls.nd").cast("double")
                    / F.col("__ls.n").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ),
            "dup_line_char_frac": F.round(
                F.when(
                    total_chars > 0, F.col("__ls.dup_chars") / total_chars
                ).otherwise(F.lit(0.0)),
                6,
            ),
        }
    ).drop("__ls")

    passes = F.lit(True)
    for name, limit in thresholds.items():
        passes = passes & (F.col(name) <= F.lit(float(limit)))
    return out.withColumn("passes_repetition", passes)


#: PII patterns for :func:`redact_pii`, applied in order.  Keys become
#: the replacement tokens (``<EMAIL>`` …) and the per-kind count
#: columns (``n_email`` …).  Deliberately precision-leaning: corpus
#: scrubbing wants few false redactions; swap in stricter/looser
#: patterns per corpus via the ``patterns`` argument.
DEFAULT_PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # international-ish phone: optional +CC, 7+ digits with separators;
    # the leading lookahead rejects dotted quads (IP-shaped, valid or
    # not), which otherwise parse as 3-3-3-3 "phone numbers"
    "phone": r"(?<![\d.])(?!\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}(?!\d))"
             r"\+?\d{1,3}[-. (]{0,2}\d{2,4}[-. )]{0,2}\d{3,4}[-. ]?\d{3,4}(?![\d.])",
    "ipv4": r"(?<!\d)(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
            r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?!\d)",
    "ssn": r"(?<!\d)\d{3}-\d{2}-\d{4}(?!\d)",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    count_redactions: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Replace PII spans with ``<KIND>`` tokens, counting each kind.

    The standard pre-release scrub over a text corpus: emails, phone
    numbers, IPv4 addresses and SSN-shaped ids (see
    :data:`DEFAULT_PII_PATTERNS`) become ``<EMAIL>`` / ``<PHONE>`` /
    ``<IPV4>`` / ``<SSN>``.  With ``count_redactions`` a per-kind
    ``n_{kind}`` int column records how many spans were rewritten.

    Everything is a chain of ``regexp_count`` + ``regexp_replace`` —
    a narrow JVM-side map inside whole-stage codegen, zero shuffles,
    zero Python; at 100 TB it costs exactly one scan.  Counts are
    taken BEFORE rewriting so overlapping patterns (an email whose
    domain looks like a phone) report what each rule actually saw.
    """
    pats = DEFAULT_PII_PATTERNS if patterns is None else patterns
    dst = out_col or text_col
    t: Column = F.col(text_col)
    cols: dict[str, Column] = {}
    if count_redactions:
        for kind, pat in pats.items():
            cols[f"n_{kind}"] = F.regexp_count(t, F.lit(pat)).cast("int")
    for kind, pat in pats.items():
        t = F.regexp_replace(t, pat, f"<{kind.upper()}>")
    cols[dst] = t
    return df.withColumns(cols)


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


def term_doc_freq(
    df: DataFrame, text_col: str = "text", doc_col: str = "doc_id"
) -> DataFrame:
    """Document frequency per token: (token, df) with one shuffle.

    ``array_distinct`` BEFORE explode keeps repeated in-document terms
    out of the shuffle — per-token rows leaving the map stage equal
    the posting-list length, not the corpus token count.
    """
    return (
        df.select(F.explode(F.array_distinct(tokens_col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    top_terms_per_doc: int | None = None,
    persist_postings: bool = True,
) -> DataFrame:
    """Per-(doc, token) TF-IDF: tf * (ln((N+1)/(df+1)) + 1), round 6.

    One corpus scan: the (doc, token) term-frequency relation feeds
    BOTH sides — document frequency is just ``count(*)`` per token of
    that relation (one row per (doc, token)), so no separate
    ``term_doc_freq`` scan is needed.  The tf relation persists by
    default (it is the aggregated posting list, far smaller than the
    raw token stream; MEMORY_AND_DISK spills at corpus scale —
    ``session.clear_engine_caches`` or ``persist_postings=False``).
    The vocabulary-sized idf side broadcasts.  The corpus size N is a
    single-row scalar aggregate — the one legitimate driver-side
    value in the pipeline.
    """
    n_docs = df.select(doc_col).distinct().count()
    tf = (
        df.select(F.col(doc_col).alias("doc"), F.explode(tokens_col(text_col)).alias("token"))
        .groupBy("doc", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if persist_postings:
        from pyspark import StorageLevel

        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    idf_rel = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn(
            "idf", F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1
        )
    )
    scored = tf.join(F.broadcast(idf_rel), "token").select(
        F.col("doc").alias(doc_col),
        "token",
        "tf",
        F.col("df").alias("doc_freq"),
        F.round(F.col("tf") * F.col("idf"), 6).alias("tf_idf"),
    )
    if top_terms_per_doc is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(doc_col).orderBy(
            F.col("tf_idf").desc(), F.col("token").asc()
        )
        scored = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= top_terms_per_doc)
            .drop("__rn")
        )
    return scored


def bm25_score(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    doc_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    persist_postings: bool = True,
) -> DataFrame:
    """Okapi BM25 of every document against a bag of query terms.

    Scale shape: tokens are filtered to the query terms BEFORE the
    explode and the (doc, token) aggregate, so only the query terms'
    posting lists shuffle — corpus-size-independent per query term.
    The document length rides along the explode projection, so the
    scoring path reads the corpus ONCE (plus one scalar aggregate for
    N and avgdl): the aggregated posting relation feeds both the idf
    side and the score side, and is persisted by default so the idf
    branch does not re-scan the corpus (same lifecycle as the ANN
    bucket frame — ``session.clear_engine_caches`` or
    ``persist_postings=False``).  idf uses the standard
    ln(1 + (N - df + 0.5)/(df + 0.5)).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    scalars = df.select(
        F.count_distinct(F.col(doc_col)).alias("n"),
        F.avg(F.size(tokens_col(text_col))).alias("avgdl"),
    ).collect()[0]
    n_docs, avgdl = scalars["n"], float(scalars["avgdl"] or 1.0)

    toks = df.select(
        F.col(doc_col).alias("doc"),
        F.size(tokens_col(text_col)).alias("dl"),
        F.explode(
            F.filter(tokens_col(text_col), lambda x: x.isin(*terms))
        ).alias("token"),
    )
    tf = toks.groupBy("doc", "token").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    if persist_postings:
        from pyspark import StorageLevel

        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    idf_rel = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
    )
    tf_c = F.col("tf").cast("double")
    denom = tf_c + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
    per_term = tf.join(F.broadcast(idf_rel), "token").select(
        "doc", (F.col("idf") * tf_c * (k1 + 1) / denom).alias("s")
    )
    return (
        per_term.groupBy("doc")
        .agg(F.round(F.sum("s"), 6).alias("bm25"))
        .select(F.col("doc").alias(doc_col), "bm25")
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
