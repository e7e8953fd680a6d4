"""End-to-end corpus curation: the canonical LLM-training-data flow, chained
from the individual operators this repo already ships —

    documents
      → boilerplate pass (opt-in: CCNet stage-1 line-level removal;
                          dedup.remove_boilerplate_lines_df)
      → language gate    (lang_pred = 'en'; marker heuristic or real
                          trigram langid via CurationConfig)
      → quality gate     (composite quality ≥ 0.5, non-empty)
      → Gopher rules     (Rae et al. 2021 App. A1.1 document-quality pass)
      → perplexity gate  (opt-in: CCNet tertile filter by bigram-LM
                          perplexity; functions/ngram_lm.py)
      → exact dedup      (keep MIN doc_id per normalized-content md5)
      → span-dup gate    (Lee et al. ACL'22 cross-doc n-gram signal:
                          drop docs whose shingles are mostly duplicated)
      → decontamination  (opt-in: drop docs sharing an 8-gram with a
                          caller-supplied benchmark corpus — GPT-3/PaLM
                          style eval-set scrub; dedup.decontaminate_df)
      → near-dup groups  (MinHash-LSH pairs → connected components)
      → labeled corpus   (every kept doc with its dup group + canonical flag)

Everything stays JVM-side DataFrame algebra except the CC rounds (joins)
and the opt-in real models (Arrow-batched pandas UDFs); the full-corpus
shuffle chain is: filter → hash-agg (exact dedup) → groupBy(shingle) with
map-side combine (span-dup) → explode/agg (signatures) → band equi-join
(candidates) → O(log n) CC rounds. No crossJoin, no row-at-a-time UDF — at
100 TB every stage is a key-partitioned shuffle AQE can size. The only
driver-side data is bounded by construction: convergence scalars per CC
round, plus the size-gated small-graph CC fast path (components.py —
post-LSH edge sets under 4M rows, exactly pre-counted, are Arrow-collected
and labeled by a driver union-find instead of paying the fixpoint's
~5 s/round scheduling floor; above the gate the distributed rounds run
unchanged).

The DuckDB oracle mirrors the whole DEFAULT chain (recursive CTE for the
CC step), so the driver hash-checks the END-TO-END result, not just the
stages. The real-model switches (lang_model="ngram", min_real_tokens) have
no SQL twin by nature — they are exercised end-to-end in pytest
(tests/test_plans_curation.py) against the same invariants.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.registry import register
from nightcrawler_ds_pipeline_spark.operators.sqlfrags import read_table
from nightcrawler_ds_pipeline_spark.operators.components import (
    connected_components,
)
from nightcrawler_ds_pipeline_spark.operators.dedup import (
    BAND_SIZE as DEDUP_BAND_SIZE,
    NUM_MINHASHES as DEDUP_NUM_MINHASHES,
    decontaminate_df,
    minhash_band_star_edges_df,
    minhash_pairs_sql,
    ngram_dup_sql,
    ngram_dup_stats_df,
)
from nightcrawler_ds_pipeline_spark.operators.textstats import (
    _LANG_MARKERS,
    _score_sql,
    _WORDS_DUCK,
    _words_col,
    gopher_keep_col,
    gopher_keep_sql,
    gopher_metric_cols,
    gopher_sql_metrics,
    lang_pred_col,
    quality_col,
)


@dataclass(frozen=True)
class CurationConfig:
    """Knobs for the curation chain. The defaults are the oracle-parity
    configuration the registered ``corpus_curation`` query runs; the
    real-model switches trade the DuckDB twin for the trained models.

    gopher_min_stop_hits is 1 (the paper uses 2): synthetic corpora carry
    almost no English function words, so the published threshold keeps
    zero documents — the paper value is one config flip away, and the
    handcrafted-doc tests pin both settings' behavior.
    """

    quality_min: float = 0.5
    gopher: bool = True
    gopher_min_stop_hits: int = 1
    # drop docs whose cross-document duplicated-shingle fraction exceeds
    # this (None disables the gate)
    max_dup_fraction: float | None = 0.8
    # "marker" = oracle-parity stopword heuristic; "ngram" = the real
    # Cavnar-Trenkle trigram model (functions/langid.py, rows-only path)
    lang_model: str = "marker"
    # when set, train real merges-table BPE (functions/bpe.py) on a
    # bounded deterministic sample and require ≥ this many tokens
    min_real_tokens: int | None = None
    # CCNet stage-1 line-level boilerplate removal BEFORE any gate: all
    # downstream signals (lang, quality, Gopher, LM, shingles, MinHash)
    # then see article text, not nav menus/cookie banners. Rewrites the
    # text column, so it has no SQL twin in the registered oracle (like
    # the other real-model switches, a pytest path).
    remove_boilerplate: bool = False
    # CCNet-style perplexity gate (functions/ngram_lm.py): train the
    # bounded-sample bigram LM on the post-quality-gate survivors and drop
    # the named tertile(s) — "tail" keeps head+middle (the CCNet default),
    # "middle_tail" keeps only head. None disables (the oracle-parity
    # default; like the other real-model switches this is a pytest path).
    ppl_drop: str | None = None
    # LSH banding strength (dedup.py module comment): the defaults (8
    # hashes, 4 bands × 2 rows) are the oracle-parity knee ≈ 0.5; the
    # per-pair false-positive rate j^band_size × C(n,2) pairs is a
    # birthday effect that merges unrelated docs into giant components at
    # 10^6+ docs (measured: 20k planted clusters → 3.2k components at 1M
    # synthetic docs). Corpus-scale runs should raise both (e.g. 16 × 4 —
    # same ~0.7 knee as Lee et al.'s production tables, FP rate j^4).
    lsh_num_hashes: int = DEDUP_NUM_MINHASHES
    lsh_band_size: int = DEDUP_BAND_SIZE

    def __post_init__(self):
        if self.lang_model not in ("marker", "ngram"):
            raise ValueError(f"CurationConfig: unknown lang_model {self.lang_model!r}")
        if self.ppl_drop not in (None, "tail", "middle_tail"):
            raise ValueError(f"CurationConfig: unknown ppl_drop {self.ppl_drop!r}")
        if (
            self.lsh_num_hashes <= 0
            or self.lsh_band_size <= 0
            or self.lsh_num_hashes % self.lsh_band_size
        ):
            raise ValueError(
                "CurationConfig: lsh_num_hashes must be a positive multiple "
                f"of lsh_band_size (got {self.lsh_num_hashes}/{self.lsh_band_size})"
            )


DEFAULT_CURATION = CurationConfig()
_C = DEFAULT_CURATION  # oracle mirrors exactly this configuration
_G_SQL = gopher_sql_metrics()


def curate(
    docs: DataFrame,
    cfg: CurationConfig = DEFAULT_CURATION,
    bench_docs: DataFrame | None = None,
    timings: dict | None = None,
) -> DataFrame:
    """(doc_id, text) → (doc_id, quality, dup_fraction, group_id,
    is_canonical), one row per kept document.

    ``bench_docs`` (doc_id, text), when given, inserts the benchmark-
    decontamination gate after the span-dup gate: any surviving doc that
    shares ≥1 word-8-gram shingle with the benchmark corpus is dropped
    (dedup.decontaminate_df — broadcast-sized flagging join). Like the
    real-model switches this has no SQL twin in the registered oracle
    (the driver corpus has no external eval set); the gate is pinned
    end-to-end in tests/test_decontam.py.

    ``timings``, when given, receives wall-clock seconds for the chain's
    synchronous segments (the eager checkpoints + the CC fixpoint), keyed
    gates_exact_dedup / span_dup_gate / minhash_cc — the scaling bench
    uses it for 8→32 per-stage attribution."""
    import time as _time

    _t0 = _time.time()

    def _mark(key):
        nonlocal _t0
        if timings is not None:
            timings[key] = round(_time.time() - _t0, 2)
            _t0 = _time.time()

    docs = docs.filter(F.trim(F.coalesce("text", F.lit(""))) != "")
    if cfg.remove_boilerplate:
        from nightcrawler_ds_pipeline_spark.operators.dedup import (
            remove_boilerplate_lines_df,
        )

        keep_cols = [c for c in docs.columns if c != "text"]
        docs = (
            docs.select(*keep_cols)
            .join(remove_boilerplate_lines_df(docs), "doc_id")
            .withColumnRenamed("text_clean", "text")
            .filter(F.trim("text") != "")
        )
    if cfg.lang_model == "ngram":
        from nightcrawler_ds_pipeline_spark.functions.langid import langid_udf

        lang = langid_udf(docs.sparkSession)(F.col("text"))
    else:
        lang = lang_pred_col()
    gated = (
        docs.withColumn("lang_pred", lang)
        .withColumn("quality", quality_col())
        .filter(
            (F.col("lang_pred") == "en") & (F.col("quality") >= cfg.quality_min)
        )
        .select("doc_id", "text", "quality")
    )
    if cfg.gopher:
        g = gated.withColumn("__w", _words_col()).withColumn(
            "__lines", F.split("text", "\n")
        )
        m = gopher_metric_cols(F.col("__w"), F.col("__lines"))
        gated = (
            g.filter(gopher_keep_col(m, min_stop_hits=cfg.gopher_min_stop_hits))
            .drop("__w", "__lines")
        )
    if cfg.ppl_drop is not None:
        from nightcrawler_ds_pipeline_spark.functions.ngram_lm import (
            perplexity_udf,
            train_bigram_lm,
        )

        sample = [
            r["text"]
            for r in gated.select("doc_id", "text")
            .orderBy("doc_id")
            .limit(100)
            .collect()
        ]
        ppl = perplexity_udf(gated.sparkSession, train_bigram_lm(sample))
        scored = gated.withColumn("__ppl", ppl(F.col("text")))
        # one approx-percentile scalar aggregate for the tertile cut; the
        # scored lineage re-executes once more for the filter (bounded —
        # at real scale persist scored before the threshold action)
        cuts = scored.select(
            F.expr("approx_percentile(__ppl, array(0.3333, 0.6667))")
        ).collect()[0][0]
        if cuts is not None:
            cut = cuts[1] if cfg.ppl_drop == "tail" else cuts[0]
            gated = scored.filter(F.col("__ppl") <= cut).drop("__ppl")
    if cfg.min_real_tokens is not None:
        from nightcrawler_ds_pipeline_spark.functions.bpe import (
            bpe_token_count_udf,
            train_bpe,
        )

        sample = [
            r["text"]
            for r in gated.select("doc_id", "text")
            .orderBy("doc_id")
            .limit(100)
            .collect()
        ]
        count = bpe_token_count_udf(gated.sparkSession, train_bpe(sample))
        gated = gated.filter(count(F.col("text")) >= cfg.min_real_tokens)
    # exact dedup: keep the minimum doc_id per normalized-content hash —
    # a hash-agg + semi-join, no window (min-per-key map-side combines)
    content = F.md5(F.encode(F.lower(F.trim("text")), "utf-8"))
    hashed = gated.withColumn("content_hash", content)
    keepers = hashed.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
    kept1 = hashed.join(keepers, ["content_hash", "doc_id"]).select(
        "doc_id", "text", "quality"
    )
    # kept1 feeds the shingle stats AND the gate below — materialize once
    # so the gate+exact-dedup lineage doesn't re-execute per consumer
    kept1 = kept1.localCheckpoint(eager=True)
    _mark("gates_exact_dedup")
    # span-dup gate: duplicated-shingle fraction computed over the exact-
    # deduped survivors (exact copies would otherwise mark every shingle
    # shared); docs with < N words carry no shingles → fraction 0 → kept
    dup_frac = F.coalesce(
        F.col("n_dup") / F.col("n_shingles"), F.lit(0.0)
    )
    with_dup = kept1.join(ngram_dup_stats_df(kept1), "doc_id", "left").withColumn(
        "__dup_frac", dup_frac
    )
    if cfg.max_dup_fraction is not None:
        with_dup = with_dup.filter(F.col("__dup_frac") <= cfg.max_dup_fraction)
    kept = with_dup.select(
        "doc_id", "text", "quality", F.col("__dup_frac").alias("dup_fraction")
    )
    if bench_docs is not None:
        # docs with < N words have no shingles → absent from the flag set
        # → vacuously clean, which the left-anti keeps by construction
        contaminated = (
            decontaminate_df(kept.select("doc_id", "text"), bench_docs)
            .filter(F.col("contaminated") == 1)
            .select("doc_id")
        )
        kept = kept.join(contaminated, "doc_id", "left_anti")
    # kept feeds three consumers (signature chain, CC node set, final
    # join) — same materialize-once pattern
    kept = kept.localCheckpoint(eager=True)
    _mark("span_dup_gate")
    # MinHash-LSH edges over the kept docs — banding/salt shared with the
    # oracle via dedup.py's single definition. The chain needs GROUPS, not
    # pairs, so it uses the star-edge formulation: k-1 edges per bucket
    # instead of the oracle's k(k-1)/2 clique pairs — connected components
    # are provably identical (per-bucket connectivity is all CC sees;
    # pinned in tests/test_plans_curation.py), and the hottest bucket stays
    # linear at 10^10 docs instead of quadratic.
    # verify=False: the star-forest collision guard costs one extra full
    # Spark action per call; the chain's output is already end-to-end
    # hash-checked against the DuckDB oracle, so the 2^-64 fingerprint-
    # collision risk is accepted on this hot path (the guard stays on by
    # default everywhere else, incl. the standalone CC query)
    edges = minhash_band_star_edges_df(
        kept.select("doc_id", "text"), cfg.lsh_num_hashes, cfg.lsh_band_size
    )
    cc_stats: dict = {}
    cc = connected_components(
        edges, nodes=kept.select("doc_id"), verify=False, stats=cc_stats
    )
    _mark("minhash_cc")
    if timings is not None:
        timings["cc_detail"] = cc_stats
    return (
        kept.join(
            cc.select(F.col("node").alias("doc_id"), F.col("component")),
            "doc_id",
        )
        .select(
            "doc_id",
            F.round("quality", 6).alias("quality"),
            F.round("dup_fraction", 4).alias("dup_fraction"),
            F.col("component").alias("group_id"),
            (F.col("doc_id") == F.col("component")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_curation",
    oracle=f"""
    WITH RECURSIVE base AS (
      SELECT doc_id, text,
             {_score_sql(_LANG_MARKERS["en"], _WORDS_DUCK)} AS s_en,
             {_score_sql(_LANG_MARKERS["qd"], _WORDS_DUCK)} AS s_qd,
             {_score_sql(_LANG_MARKERS["qs"], _WORDS_DUCK)} AS s_qs,
             LEAST(LENGTH(text) / 500.0, 1.0) * 0.5
               + LEAST(({_score_sql(_LANG_MARKERS["en"], _WORDS_DUCK)}) / 4.0,
                       1.0) * 0.5 AS quality
      FROM documents WHERE trim(COALESCE(text, '')) <> ''
    ),
    gated AS (
      SELECT doc_id, text, quality FROM base
      WHERE s_en >= s_qd AND s_en >= s_qs AND quality >= {_C.quality_min}
    ),
    garr AS (
      SELECT doc_id, text, quality, {_WORDS_DUCK} AS w,
             string_split(text, chr(10)) AS lines
      FROM gated
    ),
    gm AS (
      SELECT doc_id, text, quality,
             {_G_SQL["n_words"]} AS n_words,
             {_G_SQL["mean_word_len"]} AS mean_word_len,
             {_G_SQL["frac_alpha_words"]} AS frac_alpha_words,
             {_G_SQL["frac_bullet_lines"]} AS frac_bullet_lines,
             {_G_SQL["frac_ellipsis_lines"]} AS frac_ellipsis_lines,
             {_G_SQL["stop_hits"]} AS stop_hits
      FROM garr
    ),
    gkeep AS (
      SELECT doc_id, text, quality FROM gm
      WHERE {gopher_keep_sql(min_stop_hits=_C.gopher_min_stop_hits)}
    ),
    exact AS (
      SELECT doc_id, text, quality,
             ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                                ORDER BY doc_id) AS rn
      FROM gkeep
    ),
    kept1 AS (SELECT doc_id, text, quality FROM exact WHERE rn = 1),
    {ngram_dup_sql("kept1")},
    kept AS (
      SELECT k.doc_id, k.text, k.quality,
             COALESCE(d.n_dup * 1.0 / d.n_shingles, 0) AS dup_fraction
      FROM kept1 k LEFT JOIN nd_per_doc d ON k.doc_id = d.doc_id
      WHERE COALESCE(d.n_dup * 1.0 / d.n_shingles, 0) <= {_C.max_dup_fraction}
    ),
    {minhash_pairs_sql("kept")},
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(n, lbl) AS (
      SELECT doc_id, doc_id FROM kept
      UNION
      SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.n
    ),
    comp AS (SELECT n AS doc_id, MIN(lbl) AS group_id FROM reach GROUP BY n)
    SELECT k.doc_id,
           ROUND(k.quality, 6) AS quality,
           ROUND(k.dup_fraction, 4) AS dup_fraction,
           CAST(c.group_id AS BIGINT) AS group_id,
           (k.doc_id = c.group_id) AS is_canonical
    FROM kept k JOIN comp c ON k.doc_id = c.doc_id
    ORDER BY k.doc_id
    """,
)
def corpus_curation(spark, sf_dir):
    return curate(read_table(spark, sf_dir, "documents"), DEFAULT_CURATION)
