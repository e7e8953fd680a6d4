"""Word-bigram language-model perplexity (CCNet-style quality signal).

CCNet (Wenzek et al., LREC 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data") ranks crawled documents by the
perplexity of a language model trained on a high-quality reference corpus
and splits the corpus into head/middle/tail tertiles — the quality signal
used by the LLaMA-family data pipelines. This module is that signal with
an add-k-smoothed word-bigram LM standing in for KenLM (not in this
environment; the training/scoring CONTRACT — train on a bounded reference
sample, broadcast the frozen model, score each doc one-pass — is the real
one, and the model is swappable behind ``perplexity_udf``).

Scale shape: the model is a frozen dict (bounded vocab from the bounded
reference sample) broadcast once inside the UDF closure; scoring is an
Arrow-batched pandas UDF, one output row per document, no explode, no
shuffle. Tertile thresholds downstream are one approx-percentile scalar
aggregate.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN_RE = re.compile(r"[a-z']+")
_UNK = "<unk>"
_BOS = "<s>"


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall((text or "").lower())


def train_bigram_lm(
    texts: list[str], max_vocab: int = 4096, add_k: float = 0.5
) -> dict:
    """Train an add-k-smoothed word-bigram LM on the reference texts.
    Tokens outside the top-``max_vocab`` unigrams map to <unk> (so unseen
    test words score as <unk>, never zero). Deterministic for a given
    input list (ties broken lexicographically)."""
    uni: Counter = Counter()
    for t in texts:
        uni.update(_tokens(t))
    vocab = {
        w for w, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
    }

    def norm(w: str) -> str:
        return w if w in vocab else _UNK

    bi: Counter = Counter()
    ctx: Counter = Counter()
    for t in texts:
        prev = _BOS
        for w in map(norm, _tokens(t)):
            bi[(prev, w)] += 1
            ctx[prev] += 1
            prev = w
    v_size = len(vocab) + 2  # + <unk> + <s>
    return {
        "bigram": dict(bi),
        "context": dict(ctx),
        "vocab": vocab,
        "add_k": add_k,
        "v_size": v_size,
    }


def perplexity(text: str, model: dict) -> float:
    """Per-token perplexity of ``text`` under the model: exp of the mean
    negative log add-k bigram probability. Empty/tokenless text scores the
    worst-case single-<unk> perplexity (it carries no evidence of
    fluency)."""
    vocab = model["vocab"]
    bi = model["bigram"]
    ctx = model["context"]
    k = model["add_k"]
    v = model["v_size"]
    toks = [w if w in vocab else _UNK for w in _tokens(text)]
    if not toks:
        toks = [_UNK]
    nll = 0.0
    prev = _BOS
    for w in toks:
        p = (bi.get((prev, w), 0) + k) / (ctx.get(prev, 0) + k * v)
        nll -= math.log(p)
        prev = w
    return math.exp(nll / len(toks))


def perplexity_udf(spark, model: dict):
    """Arrow-batched scorer; the frozen model rides the UDF closure (a few
    hundred KB — broadcast once per executor)."""

    @F.pandas_udf(T.DoubleType())
    def ppl(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: perplexity(t, model))

    return ppl
