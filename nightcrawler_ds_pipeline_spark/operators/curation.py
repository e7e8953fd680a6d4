"""End-to-end corpus curation: the canonical LLM-training-data flow, chained
from the individual operators this repo already ships —

    documents
      → language gate   (lang_pred = 'en', textstats heuristic)
      → quality gate    (composite quality ≥ 0.5, non-empty)
      → exact dedup     (keep MIN doc_id per normalized-content md5)
      → near-dup groups (MinHash-LSH pairs → connected components)
      → labeled corpus  (every kept doc with its dup group + canonical flag)

Everything stays JVM-side DataFrame algebra except the CC rounds (joins);
the one full-corpus shuffle chain is: filter → hash-agg (exact dedup) →
explode/agg (signatures) → band equi-join (candidates) → O(log n) CC
rounds. No crossJoin, no driver-side data, no Python UDF — at 100 TB every
stage is a key-partitioned shuffle AQE can size.

The DuckDB oracle mirrors the whole chain (recursive CTE for the CC step),
so the driver hash-checks the END-TO-END result, not just the stages.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.registry import register
from nightcrawler_ds_pipeline_spark.operators.sqlfrags import read_table
from nightcrawler_ds_pipeline_spark.operators.components import (
    connected_components,
)
from nightcrawler_ds_pipeline_spark.operators.dedup import (
    minhash_band_pairs_df,
    minhash_pairs_sql,
)
from nightcrawler_ds_pipeline_spark.operators.textstats import (
    _LANG_MARKERS,
    _score_sql,
    _WORDS_DUCK,
    lang_pred_col,
    quality_col,
)

_QUALITY_MIN = 0.5


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
      WHERE s_en >= s_qd AND s_en >= s_qs AND quality >= {_QUALITY_MIN}
    ),
    exact AS (
      SELECT doc_id, text, quality,
             ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                                ORDER BY doc_id) AS rn
      FROM gated
    ),
    kept AS (SELECT doc_id, text, quality FROM exact WHERE rn = 1),
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
           CAST(c.group_id AS BIGINT) AS group_id,
           (k.doc_id = c.group_id) AS is_canonical
    FROM kept k JOIN comp c ON k.doc_id = c.doc_id
    ORDER BY k.doc_id
    """,
)
def corpus_curation(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").filter(
        F.trim(F.coalesce("text", F.lit(""))) != ""
    )
    gated = (
        docs.withColumn("lang_pred", lang_pred_col())
        .withColumn("quality", quality_col())
        .filter(
            (F.col("lang_pred") == "en") & (F.col("quality") >= _QUALITY_MIN)
        )
    )
    # exact dedup: keep the minimum doc_id per normalized-content hash —
    # a hash-agg + semi-join, no window (min-per-key map-side combines)
    content = F.md5(F.encode(F.lower(F.trim("text")), "utf-8"))
    hashed = gated.withColumn("content_hash", content)
    keepers = hashed.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
    kept = hashed.join(keepers, ["content_hash", "doc_id"]).select(
        "doc_id", "text", "quality"
    )
    # kept feeds three consumers (signature chain, CC node set, final
    # join) — materialize once so the gate+exact-dedup lineage doesn't
    # re-execute per action (same pattern as connected_components' edges)
    kept = kept.localCheckpoint(eager=True)
    # MinHash-LSH candidate pairs over the kept docs — the ONE shared
    # definition in dedup.py (same salt scheme + banding as its oracle)
    pairs = minhash_band_pairs_df(kept.select("doc_id", "text"))
    cc = connected_components(pairs, nodes=kept.select("doc_id"))
    return (
        kept.join(
            cc.select(F.col("node").alias("doc_id"), F.col("component")),
            "doc_id",
        )
        .select(
            "doc_id",
            F.round("quality", 6).alias("quality"),
            F.col("component").alias("group_id"),
            (F.col("doc_id") == F.col("component")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )
