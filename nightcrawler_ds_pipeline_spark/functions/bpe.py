"""Real byte-pair-encoding tokenization (merges-table BPE).

The cheap estimators in ``operators/textstats.py`` (len/4, pre-tokenizer
run counts) drift by language and vocabulary; a training-data pipeline
bills and schedules by REAL tokenizer counts. This module implements the
standard public BPE algorithm end to end:

- ``train_bpe``: Sennrich-style merge learning (Sennrich, Haddow & Birch,
  "Neural Machine Translation of Rare Words with Subword Units", ACL'16):
  split text with the pre-tokenizer, count word frequencies, repeatedly
  merge the most frequent adjacent symbol pair. Deterministic: ties break
  lexicographically.
- ``bpe_encode``: the GPT-2-style greedy application loop (public
  algorithm): repeatedly merge the pair with the LOWEST merge rank until
  no learned pair remains.
- ``bpe_token_count_udf``: Arrow-batched pandas UDF counting real BPE
  tokens per document. The merges table is broadcast once per job (ranks
  dict, a few KB for the vocab sizes used here); per-word results are
  memoized within a batch — natural-language batches repeat most words,
  so the merge loop runs once per distinct word, not once per occurrence.

Scale: training is inherently a bounded-sample operation (every real
tokenizer is trained on a corpus sample, then frozen); application is
embarrassingly parallel over documents with only the broadcast ranks
shared. Counting never materializes the token stream.

Reference tie-in: the reference's count_tokens (helpers/utils.py:175-179)
is whitespace word-splitting only; this operator is brief-driven (token
accounting for LLM training-data pipelines), not parity-driven.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The lookahead-free pre-tokenizer core shared with the estimator in
# operators/textstats.py (_BPE_RE): optional-space-prefixed letter runs,
# digit runs, punctuation runs.
PRETOKEN_RE = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+")

# end-of-word marker so merges cannot cross word boundaries and word-final
# subwords are distinct from word-internal ones (Sennrich'16 convention)
EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,)


def pretokenize(text: str) -> list[str]:
    return PRETOKEN_RE.findall(text)


def train_bpe(texts: list[str], num_merges: int = 256) -> list[tuple[str, str]]:
    """Learn an ordered merges table from a corpus sample.

    Deterministic: the most frequent pair wins each round, ties broken by
    the pair's lexicographic order, so the same sample always yields the
    same table regardless of dict iteration order.
    """
    word_freq: Counter[tuple[str, ...]] = Counter()
    for t in texts:
        for w in pretokenize(t):
            word_freq[_word_symbols(w)] += 1

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_freq: Counter[tuple[str, str]] = Counter()
        for syms, freq in word_freq.items():
            for a, b in zip(syms, syms[1:]):
                pair_freq[(a, b)] += freq
        if not pair_freq:
            break
        # most frequent pair wins; lexicographically SMALLEST pair wins ties
        top = max(pair_freq.values())
        best_pair = min(p for p, f in pair_freq.items() if f == top)
        if top < 2:
            break  # nothing left worth merging
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        new_freq: Counter[tuple[str, ...]] = Counter()
        for syms, freq in word_freq.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best_pair[0]
                    and syms[i + 1] == best_pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_freq[tuple(out)] += freq
        word_freq = new_freq
    return merges


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merge application (the GPT-2 bpe() loop)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        pairs = list(zip(syms, syms[1:]))
        ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
        if not ranked:
            break
        best_rank = min(r for r, _ in ranked)
        # merge ALL occurrences of the best-ranked pair left to right
        # (ranks are unique per pair, so matching by rank identifies it)
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and ranks.get((syms[i], syms[i + 1])) == best_rank
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_token_count(text: str, ranks: dict[tuple[str, str], int],
                    cache: dict[str, int] | None = None) -> int:
    n = 0
    cache = cache if cache is not None else {}
    for w in pretokenize(text):
        c = cache.get(w)
        if c is None:
            c = len(bpe_encode(w, ranks))
            cache[w] = c
        n += c
    return n


def bpe_token_count_udf(spark, merges: list[tuple[str, str]]):
    """Arrow-batched pandas UDF: text → real BPE token count."""
    ranks_bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )

    @F.pandas_udf(T.LongType())
    def count(texts: pd.Series) -> pd.Series:
        ranks = ranks_bc.value
        cache: dict[str, int] = {}  # per-batch word memo
        return texts.fillna("").map(
            lambda t: bpe_token_count(t, ranks, cache)
        ).astype("int64")

    return count
