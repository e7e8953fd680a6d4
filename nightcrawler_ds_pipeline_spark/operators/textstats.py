"""Text-analysis operators for a training-data pipeline over ``documents``.

Language-ID (stopword-hit heuristic), quality scoring (length / token
stats), token counting (whitespace + BPE-ish regex), and document
fingerprinting. All JVM-side builtin expressions (whole-stage codegen);
each has a DuckDB oracle computing the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.registry import register
from nightcrawler_ds_pipeline_spark.operators.sqlfrags import read_table

_WORDS_SPARK = "split(lower(trim(text)), '\\\\s+')"
_WORDS_DUCK = "regexp_split_to_array(lower(trim(text)), '\\s+')"


# token counting: whitespace tokens + a BPE-ish subword estimate
# (reference analogue: count_tokens at helpers/utils.py:175-179)
def text_token_count(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    n_tokens = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.lower(F.trim("text")), r"\s+"))
    )
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("n_bpe_est"),
    ).orderBy("doc_id")


# BPE-ish pre-tokenizer count: the GPT-2 pre-tokenizer splits on
# optional-space-prefixed letter runs / digit runs / punctuation runs
# (public pattern). The published regex uses a lookahead, which RE2
# (DuckDB) lacks, so both engines run this lookahead-free core — letter
# runs, digit runs, non-alnum runs, each with an optional leading space.
_BPE_RE = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def text_bpe_tokens(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_BPE_RE)).cast("long").alias(
            "n_bpe_tokens"
        ),
    ).orderBy("doc_id")


# language-ID: n-gram/stopword-hit heuristic with a fixed precedence order.
_LANG_MARKERS = {
    "en": ["the", "a", "fast", "slow"],
    "qd": ["data", "query", "table", "scan"],
    "qs": ["spark", "stream", "batch", "window"],
}


def _score_sql(words: list[str], arr: str) -> str:
    return " + ".join(
        f"(CASE WHEN list_contains({arr}, '{w}') THEN 1 ELSE 0 END)" for w in words
    )


def _words_col():
    return F.split(F.lower(F.trim("text")), r"\s+")


def _marker_score_col(markers: list[str]):
    words = _words_col()
    s = F.lit(0)
    for w in markers:
        s = s + F.when(F.array_contains(words, w), 1).otherwise(0)
    return s


def lang_pred_col():
    """The lang-id heuristic as a reusable Column (same arithmetic as
    text_lang_id)."""
    s_en = _marker_score_col(_LANG_MARKERS["en"])
    s_qd = _marker_score_col(_LANG_MARKERS["qd"])
    s_qs = _marker_score_col(_LANG_MARKERS["qs"])
    return (
        F.when((s_en >= s_qd) & (s_en >= s_qs), "en")
        .when(s_qd >= s_qs, "qd")
        .otherwise("qs")
    )


def quality_col():
    """The quality composite as a reusable Column (same arithmetic as
    text_quality_score)."""
    stop_hits = _marker_score_col(_LANG_MARKERS["en"])
    return (
        F.least(F.length("text") / 500.0, F.lit(1.0)) * 0.5
        + F.least(stop_hits / 4.0, F.lit(1.0)) * 0.5
    )


def text_lang_id(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", lang_pred_col().alias("lang_pred")
    ).orderBy("doc_id")


# quality scoring: length / mean-word-length / stopword-ratio composite
def text_quality_score(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").filter(F.trim("text") != "")
    return docs.select(
        "doc_id",
        F.size(_words_col()).cast("long").alias("n_words"),
        quality_col().alias("quality"),
    ).orderBy("doc_id")


# document fingerprint: md5 of the normalized text (the SQL-checkable
# fingerprint; a rolling-hash variant is exercised in pytest).
def text_fingerprint(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.md5(F.encode(F.lower(F.trim("text")), "utf-8")).alias("fp")
    ).orderBy("doc_id")


# clean_short_text normalization (reference utils.py:162-172) — exercised on
# document text in both engines.
def text_clean_short(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.functions.text import clean_short_text_col

    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", clean_short_text_col("text").alias("clean")).orderBy(
        "doc_id"
    )


# --- composite driver queries ------------------------------------------------
# The six per-document text stats fold into three wide-row entries (same
# source, same doc_id order) so the driver's bounded sample always
# hash-checks them; every sub-operator above stays callable.
@register(
    "text_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len({_WORDS_DUCK}) END AS BIGINT) AS n_tokens,
           CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS n_bpe_est,
           CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT)
             AS n_bpe_tokens
    FROM documents ORDER BY doc_id
    """,
)
def text_token_counts(spark, sf_dir):
    a = text_token_count(spark, sf_dir)
    b = text_bpe_tokens(spark, sf_dir)
    return a.join(b, "doc_id").orderBy("doc_id")


def _text_normalize_oracle() -> str:
    from nightcrawler_ds_pipeline_spark.functions.pii import mask_pii_sql
    from nightcrawler_ds_pipeline_spark.operators.dedup import boilerplate_sql

    return f"""
    WITH {boilerplate_sql("documents")}
    SELECT d.doc_id,
           trim(regexp_replace(
             replace(regexp_replace(
               replace(replace(lower(d.text), chr(10), ' '), chr(9), ' '),
               '["'']', '', 'g'), '-', ' '),
             ' +', ' ', 'g')) AS clean,
           md5(lower(trim(d.text))) AS fp,
           {mask_pii_sql("d.text")} AS pii_masked,
           bp.text_clean AS boilerplate_removed
    FROM documents d JOIN bp_clean bp ON d.doc_id = bp.doc_id
    ORDER BY d.doc_id
    """


@register("text_normalize", oracle=_text_normalize_oracle())
def text_normalize(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.functions.pii import mask_pii_col
    from nightcrawler_ds_pipeline_spark.operators.dedup import (
        remove_boilerplate_lines_df,
    )

    a = text_clean_short(spark, sf_dir)
    b = text_fingerprint(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")
    c = docs.select("doc_id", mask_pii_col("text").alias("pii_masked"))
    d = remove_boilerplate_lines_df(docs).withColumnRenamed(
        "text_clean", "boilerplate_removed"
    )
    return a.join(b, "doc_id").join(c, "doc_id").join(d, "doc_id").orderBy(
        "doc_id"
    )


@register(
    "text_lang_quality",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, text,
             {_score_sql(_LANG_MARKERS["en"], _WORDS_DUCK)} AS s_en,
             {_score_sql(_LANG_MARKERS["qd"], _WORDS_DUCK)} AS s_qd,
             {_score_sql(_LANG_MARKERS["qs"], _WORDS_DUCK)} AS s_qs
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN s_en >= s_qd AND s_en >= s_qs THEN 'en'
                WHEN s_qd >= s_qs THEN 'qd' ELSE 'qs' END AS lang_pred,
           CAST(CASE WHEN trim(text) <> '' THEN len({_WORDS_DUCK}) END
                AS BIGINT) AS n_words,
           CASE WHEN trim(text) <> ''
                THEN LEAST(LENGTH(text) / 500.0, 1.0) * 0.5
                     + LEAST(s_en / 4.0, 1.0) * 0.5 END AS quality
    FROM scored ORDER BY doc_id
    """,
)
def text_lang_quality(spark, sf_dir):
    # n_words/quality are NULL for whitespace-only docs (they are data
    # columns, not sort keys — doc_id is the total order, so NULL is safe)
    docs = read_table(spark, sf_dir, "documents")
    nonempty = F.trim("text") != ""
    return docs.select(
        "doc_id",
        "lang",
        lang_pred_col().alias("lang_pred"),
        F.when(nonempty, F.size(_words_col())).cast("long").alias("n_words"),
        F.when(nonempty, quality_col()).alias("quality"),
    ).orderBy("doc_id")


# --- real tokenizer / real language-ID (rows-only; pure-python twins are the
# pytest oracle — a merges-table BPE and a trigram scorer have no SQL twin) --
def text_bpe_real(spark, sf_dir):
    """Real merges-table BPE token counts (functions/bpe.py), vs the cheap
    pre-tokenizer estimate. Merges are trained once on a bounded,
    deterministic corpus sample (doc_id < 100, ordered) — training is
    inherently a sample-then-freeze operation; application is an
    Arrow-batched pandas UDF with the ranks table broadcast."""
    from nightcrawler_ds_pipeline_spark.functions.bpe import (
        bpe_token_count_udf,
        train_bpe,
    )

    docs = read_table(spark, sf_dir, "documents")
    sample = [
        r["text"]
        for r in docs.filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    ]
    merges = train_bpe(sample, num_merges=256)
    count = bpe_token_count_udf(spark, merges)
    return docs.select(
        "doc_id",
        count(F.col("text")).alias("n_bpe_real"),
        F.regexp_count(F.col("text"), F.lit(_BPE_RE)).cast("long").alias(
            "n_bpe_pretok"
        ),
    ).orderBy("doc_id")


def text_lang_id_ngram(spark, sf_dir):
    """Character-trigram language ID (functions/langid.py) over documents —
    the real-model counterpart of the oracle-parity marker heuristic
    (text_lang_id above keeps the DuckDB-twinnable arithmetic)."""
    from nightcrawler_ds_pipeline_spark.functions.langid import langid_udf

    docs = read_table(spark, sf_dir, "documents")
    lang = langid_udf(spark)
    return docs.select(
        "doc_id", "lang", lang(F.col("text")).alias("lang_pred_ngram")
    ).orderBy("doc_id")


@register("text_real_models")
def text_real_models(spark, sf_dir):
    """Rows-only composite (50-entry driver-sample cap; fold map in
    COVERAGE.md): the two round-3 real-model signals — merges-table BPE
    token counts + trigram language-ID — joined per document (both emit
    exactly one row per doc_id). Sub-operators stay independently callable
    and pytest-pinned (test_textstats_real)."""
    return (
        text_bpe_real(spark, sf_dir)
        .join(text_lang_id_ngram(spark, sf_dir), "doc_id")
        .orderBy("doc_id")
    )


@register("text_perplexity_buckets")
def text_perplexity_buckets(spark, sf_dir):
    """CCNet-style perplexity tertiles (Wenzek et al. 2020): score every
    document with a word-bigram LM trained on a bounded deterministic
    reference sample (doc_id < 100 — the stand-in for CCNet's curated
    reference corpus) and bucket head/middle/tail at the corpus tertiles.
    Rows-only: smoothed-LM arithmetic has no tractable DuckDB twin; the
    fluent-vs-gibberish ordering is pinned in tests/test_perplexity.py.

    Scale: model broadcast in the UDF closure; scoring one-pass Arrow-
    batched; thresholds ONE approx-percentile scalar aggregate (at real
    scale persist the scored frame so the two consumers don't recompute
    the UDF — at driver scale the recompute is cheaper than the cache)."""
    from nightcrawler_ds_pipeline_spark.functions.ngram_lm import (
        perplexity_udf,
        train_bigram_lm,
    )

    docs = read_table(spark, sf_dir, "documents")
    sample = [
        r["text"]
        for r in docs.filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    ]
    model = train_bigram_lm(sample)
    ppl = perplexity_udf(spark, model)
    scored = docs.select("doc_id", ppl(F.col("text")).alias("ppl"))
    # tertile thresholds: one scalar aggregate (bounded driver action,
    # same sanctioned class as the other scalar collects)
    t1, t2 = scored.select(
        F.expr("approx_percentile(ppl, array(0.3333, 0.6667))")
    ).collect()[0][0]
    return scored.select(
        "doc_id",
        F.round("ppl", 4).alias("ppl"),
        F.when(F.col("ppl") <= t1, "head")
        .when(F.col("ppl") <= t2, "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    ).orderBy("doc_id")


# --- Gopher-style quality rules (public filter set: Rae et al. 2021,
# "Scaling Language Models: ... Gopher", App. A1.1) — the canonical
# document-quality gate of LLM corpus curation. All JVM-side higher-order
# functions over one pass of the documents table (no shuffle, no UDF);
# the DuckDB twin computes the identical arithmetic.
_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
_G_MIN_WORDS, _G_MAX_WORDS = 50, 100_000
_G_MIN_MWL, _G_MAX_MWL = 3.0, 10.0
_G_MIN_ALPHA = 0.80
_G_MAX_BULLET = 0.90
_G_MAX_ELLIPSIS = 0.30
_G_MIN_STOP_HITS = 2


def gopher_sql_metrics(w: str = "w", lines: str = "lines") -> dict[str, str]:
    """DuckDB expression strings for each Gopher metric over a word-array
    column ``w`` and a line-array column ``lines`` — the ONE definition both
    the standalone ``text_gopher_rules`` oracle and the curation-chain
    oracle embed, so the two can never drift."""
    stop = " + ".join(
        f"(CASE WHEN list_contains({w}, '{sw}') THEN 1 ELSE 0 END)"
        for sw in _GOPHER_STOPWORDS
    )
    return {
        "n_words": f"len({w})",
        "mean_word_len": (
            f"CASE WHEN len({w}) > 0 THEN "
            f"list_sum(list_transform({w}, x -> len(x))) * 1.0 / len({w}) END"
        ),
        "frac_alpha_words": (
            f"CASE WHEN len({w}) > 0 THEN "
            f"len(list_filter({w}, x -> regexp_matches(x, '[a-z]')))"
            f" * 1.0 / len({w}) END"
        ),
        "frac_bullet_lines": (
            f"len(list_filter({lines}, x -> regexp_matches(trim(x), '^([-*•])')))"
            f" * 1.0 / len({lines})"
        ),
        "frac_ellipsis_lines": (
            f"len(list_filter({lines}, x -> trim(x) LIKE '%...'))"
            f" * 1.0 / len({lines})"
        ),
        "stop_hits": f"({stop})",
    }


def gopher_keep_sql(
    min_stop_hits: int = _G_MIN_STOP_HITS,
    n="n_words",
    mwl="mean_word_len",
    fa="frac_alpha_words",
    fb="frac_bullet_lines",
    fe="frac_ellipsis_lines",
    sh="stop_hits",
) -> str:
    """The Gopher keep predicate over (named) UNROUNDED metric columns."""
    return (
        f"({n} BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS}"
        f" AND {mwl} BETWEEN {_G_MIN_MWL} AND {_G_MAX_MWL}"
        f" AND {fa} >= {_G_MIN_ALPHA}"
        f" AND {fb} <= {_G_MAX_BULLET}"
        f" AND {fe} <= {_G_MAX_ELLIPSIS}"
        f" AND {sh} >= {min_stop_hits})"
    )


def gopher_metric_cols(w, lines) -> dict:
    """Spark Columns for each Gopher metric (UNROUNDED), given a word-array
    Column ``w`` and a line-array Column ``lines`` — mirror of
    ``gopher_sql_metrics``."""
    nw = F.size(w)
    nl = F.size(lines)
    stop_hits = F.lit(0)
    for sw in _GOPHER_STOPWORDS:
        stop_hits = stop_hits + F.when(F.array_contains(w, sw), 1).otherwise(0)
    return {
        "n_words": nw,
        "mean_word_len": F.when(
            nw > 0,
            F.aggregate(
                F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
            )
            * 1.0
            / nw,
        ),
        "frac_alpha_words": F.when(
            nw > 0, F.size(F.filter(w, lambda x: x.rlike("[a-z]"))) * 1.0 / nw
        ),
        "frac_bullet_lines": (
            F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"^([-*•])")))
            * 1.0
            / nl
        ),
        "frac_ellipsis_lines": (
            F.size(F.filter(lines, lambda x: F.trim(x).endswith("...")))
            * 1.0
            / nl
        ),
        "stop_hits": stop_hits,
    }


def gopher_keep_col(m: dict, min_stop_hits: int = _G_MIN_STOP_HITS):
    """The keep predicate as a Column over ``gopher_metric_cols`` output."""
    return (
        m["n_words"].between(_G_MIN_WORDS, _G_MAX_WORDS)
        & m["mean_word_len"].between(_G_MIN_MWL, _G_MAX_MWL)
        & (m["frac_alpha_words"] >= _G_MIN_ALPHA)
        & (m["frac_bullet_lines"] <= _G_MAX_BULLET)
        & (m["frac_ellipsis_lines"] <= _G_MAX_ELLIPSIS)
        & (m["stop_hits"] >= min_stop_hits)
    )


_GOPHER_SQL_M = gopher_sql_metrics()

@register(
    "text_gopher_rules",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE {_WORDS_DUCK} END AS w,
             string_split(text, chr(10)) AS lines
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             {_GOPHER_SQL_M["n_words"]} AS n_words,
             {_GOPHER_SQL_M["mean_word_len"]} AS mean_word_len,
             {_GOPHER_SQL_M["frac_alpha_words"]} AS frac_alpha_words,
             {_GOPHER_SQL_M["frac_bullet_lines"]} AS frac_bullet_lines,
             {_GOPHER_SQL_M["frac_ellipsis_lines"]} AS frac_ellipsis_lines,
             {_GOPHER_SQL_M["stop_hits"]} AS stop_hits
      FROM base
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           ROUND(mean_word_len, 4) AS mean_word_len,
           ROUND(frac_alpha_words, 4) AS frac_alpha_words,
           ROUND(frac_bullet_lines, 4) AS frac_bullet_lines,
           ROUND(frac_ellipsis_lines, 4) AS frac_ellipsis_lines,
           CAST(stop_hits AS BIGINT) AS stop_hits,
           {gopher_keep_sql()} AS keep
    FROM m ORDER BY doc_id
    """,
)
def text_gopher_rules(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    w = F.when(F.trim("text") == "", F.array().cast("array<string>")).otherwise(
        _words_col()
    )
    lines = F.split("text", "\n")
    base = docs.select("doc_id", w.alias("w"), lines.alias("lines"))
    m = gopher_metric_cols(F.col("w"), F.col("lines"))
    out = base.select(
        "doc_id",
        m["n_words"].cast("long").alias("n_words"),
        F.round(m["mean_word_len"], 4).alias("mean_word_len"),
        F.round(m["frac_alpha_words"], 4).alias("frac_alpha_words"),
        F.round(m["frac_bullet_lines"], 4).alias("frac_bullet_lines"),
        F.round(m["frac_ellipsis_lines"], 4).alias("frac_ellipsis_lines"),
        m["stop_hits"].cast("long").alias("stop_hits"),
        gopher_keep_col(m).alias("keep"),
    )
    return out.orderBy("doc_id")
