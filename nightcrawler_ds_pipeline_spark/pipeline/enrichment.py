"""Keyword-enrichment flow — the reference's only genuinely analytical path.

Mirrors helpers/analytics/keywords_selection.py end-to-end:

1. ``aggregate_keywords`` (68-97): groupby(keywordEnriched) sum volume,
   keep first location/language/offerRoot, sort desc.
2. ``estimate_volume_per_url`` (100-147): per enriched keyword, the top-20
   result URLs get ``round(share_i × keyword_volume, 0)`` estimated traffic
   using the published CTR click-share table (advancedwebranking CTR study,
   cited by the reference at line 104).
3. ``aggregate_urls`` (150-172): groupby(url) sum estimated volume, first
   keyword/language/offerRoot, sort desc — the final enrichment ranking.

Spark form: two hash aggregates + one ranked window + a broadcast join on
the 20-row share table; ``first`` is replaced by ``min`` for determinism
(SURVEY §7 hard-point a — pandas groupby('first') depends on input order,
which Spark does not guarantee).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# keywords_selection.py:113-134 (single shared definition)
from nightcrawler_ds_pipeline_spark.constants import RANK_CLICK_SHARES  # noqa: E402


def aggregate_keywords(enriched: DataFrame) -> DataFrame:
    """Step 1 — keyword volume aggregate (keywords_selection.py:68-97)."""
    return (
        enriched.groupBy("keyword_enriched")
        .agg(
            F.sum("keyword_volume").alias("keyword_volume"),
            F.min("keyword_location").alias("keyword_location"),
            F.min("keyword_language").alias("keyword_language"),
            F.min("offer_root").alias("offer_root"),
        )
        .orderBy(F.col("keyword_volume").desc(), F.col("keyword_enriched"))
    )


def estimate_volume_per_url(
    spark, keyword_urls: DataFrame, keyword_volumes: DataFrame
) -> DataFrame:
    """Step 2 — CTR-share traffic model (keywords_selection.py:100-147).

    ``keyword_urls``: (keyword_enriched, url, position); top-20 per keyword
    by position get share_i × volume, rounded to 0 decimals like the
    reference's ``round(x, 0)``.
    """
    shares = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(RANK_CLICK_SHARES)], ["pos", "share"]
    )
    w = Window.partitionBy("keyword_enriched").orderBy("position", "url")
    ranked = (
        keyword_urls.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 20)
        .join(F.broadcast(shares), "pos")
    )
    vols = keyword_volumes.select(
        "keyword_enriched",
        F.col("keyword_volume").alias("kw_volume"),
        "keyword_location",
        "keyword_language",
        "offer_root",
    )
    return ranked.join(vols, "keyword_enriched").select(
        "url",
        F.round(F.col("share") * F.col("kw_volume"), 0).alias("keyword_volume"),
        "keyword_enriched",
        "keyword_language",
        "keyword_location",
        "offer_root",
    )


def aggregate_urls(url_volumes: DataFrame) -> DataFrame:
    """Step 3 — per-url traffic aggregate (keywords_selection.py:150-172)."""
    return (
        url_volumes.groupBy("url")
        .agg(
            F.sum("keyword_volume").alias("keyword_volume"),
            F.min("keyword_enriched").alias("keyword_enriched"),
            F.min("keyword_language").alias("keyword_language"),
            F.min("offer_root").alias("offer_root"),
        )
        .orderBy(F.col("keyword_volume").desc(), F.col("url"))
    )


def run_enrichment(spark, serp: DataFrame) -> DataFrame:
    """Full enrichment flow over serp fixture rows that carry enrichment
    fields (keyword_enriched / keyword_volume / position / url)."""
    enriched = serp.filter(F.col("keyword_enriched").isNotNull())
    kw_vols = aggregate_keywords(enriched)
    kw_urls = enriched.select("keyword_enriched", "url", "position")
    url_vols = estimate_volume_per_url(spark, kw_urls, kw_vols)
    return aggregate_urls(url_vols)
