"""Byte-level BPE tokenizer: sample-trained, corpus-encoded.

Token counts drive packing budgets, quality gates, and corpus
accounting; the whitespace/regex counter in ``text.py`` is the cheap
estimate, this module is the real thing — a byte-pair-encoding
tokenizer in the GPT-2 family (byte-level alphabet, greedy merge by
train-time rank, word-boundary pre-split).

Scale split, and why it is the honest one at 100 TB:

- TRAINING is a few thousand sequential merge rounds, each needing
  global pair counts.  Doing that distributed means one shuffle per
  merge — thousands of barriers over 100 TB for a vocabulary that
  converges on a few hundred MB of text.  Every production tokenizer
  trains on a SAMPLE; here that is explicit: a deterministic
  `hash_sample` (rerun/partition-invariant) feeds a driver-side
  trainer with a word-frequency map — the classic Sennrich
  formulation, exact on the sample.
- ENCODING is where the 100 TB is, and it is embarrassingly
  parallel: the merge table broadcasts (a few MB) and every document
  encodes independently in an Arrow-batched ``mapInPandas`` —
  no shuffle at all; the plan is scan -> project.

Determinism: byte alphabet is fixed; pair ties break
lexicographically; sample is keyed-hash; so (corpus, seed,
vocab_size) -> identical merge table on any cluster layout.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2-style word pre-split: leading space folds into the word so
# merges learn " the"-style units; contractions split off.
_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def _pretokenize(text: str) -> list[bytes]:
    import re

    return [m.group().encode("utf-8") for m in re.finditer(_PRETOKEN_RE, text)]


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 512,
    sample_fraction: float = 1.0,
    seed: int = 0,
) -> list[tuple[bytes, bytes]]:
    """Learn the merge list on a deterministic sample of the corpus.

    Returns merges in rank order; vocabulary = 256 byte tokens +
    len(merges).  The distributed part is ONE aggregation: the
    sampled documents pre-tokenize and count words executor-side
    (`mapInPandas` -> groupBy word), and only the word-frequency
    table (bounded by vocabulary-of-the-sample, not corpus size)
    reaches the driver for the sequential merge loop.
    """
    from v6spark.operators.sampling import hash_sample

    if vocab_size < 256:
        raise ValueError("vocab_size includes the 256 byte tokens")
    sampled = df
    if sample_fraction < 1.0:
        sampled = hash_sample(df, id_col, sample_fraction, seed=seed)

    def word_counts(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            c: Counter = Counter()
            for text in pdf[text_col]:
                c.update(_pretokenize(text or ""))
            yield pd.DataFrame(
                {"word": list(c.keys()), "n": list(c.values())}
            )

    freq_rows = (
        sampled.mapInPandas(word_counts, schema="word binary, n long")
        .groupBy("word")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    # driver-side Sennrich loop over the word-frequency map
    words: dict[tuple[bytes, ...], int] = {
        tuple(bytes([b]) for b in bytes(r["word"])): r["n"] for r in freq_rows
    }
    merges: list[tuple[bytes, bytes]] = []
    while 256 + len(merges) < vocab_size:
        pairs: Counter = Counter()
        for sym, n in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best_n = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == best_n)  # tie: lexicographic
        if best_n < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[bytes, ...], int] = {}
        for sym, n in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + n
        words = new_words
    return merges


def _encode_word(word: bytes, ranks: dict) -> list[bytes]:
    sym = [bytes([b]) for b in word]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[bytes, bytes]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<binary>, n_tokens): greedy rank-order BPE
    over the broadcast merge table — zero shuffles, scan->project."""
    spark = df.sparkSession
    b_merges = spark.sparkContext.broadcast(merges)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = {pair: i for i, pair in enumerate(b_merges.value)}
        cache: dict[bytes, list[bytes]] = {}
        for pdf in it:
            toks_col, counts = [], []
            for text in pdf[text_col]:
                toks: list[bytes] = []
                for w in _pretokenize(text or ""):
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        if len(cache) < 100_000:  # bound executor memory
                            cache[w] = enc
                    toks.extend(enc)
                toks_col.append(toks)
                counts.append(len(toks))
            yield pd.DataFrame({
                "doc_id": pdf[id_col], "tokens": toks_col, "n_tokens": counts,
            })

    return df.mapInPandas(
        batches, schema="doc_id long, tokens array<binary>, n_tokens int"
    )


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[bytes, bytes]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens) only — the packing-budget input.  A dedicated
    count kernel: per-word token LENGTHS accumulate as ints and only
    (doc_id, n_tokens) crosses the Arrow boundary — delegating to
    :func:`bpe_encode` would build and serialize every document's
    full token array just for a downstream select to drop it."""
    spark = df.sparkSession
    b_merges = spark.sparkContext.broadcast(merges)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = {pair: i for i, pair in enumerate(b_merges.value)}
        cache: dict[bytes, int] = {}
        for pdf in it:
            counts = []
            for text in pdf[text_col]:
                n = 0
                for w in _pretokenize(text or ""):
                    ln = cache.get(w)
                    if ln is None:
                        ln = len(_encode_word(w, ranks))
                        if len(cache) < 200_000:
                            cache[w] = ln
                    n += ln
                counts.append(n)
            yield pd.DataFrame({"doc_id": pdf[id_col], "n_tokens": counts})

    return df.mapInPandas(batches, schema="doc_id long, n_tokens int")
