"""Enrichment flow vs a pure-pandas oracle mirroring keywords_selection.py
(aggregate_keywords 68-97, estimate_volume_per_url 100-147 incl. round(x,0)
and the urls[0:20] zip, aggregate_urls 150-172)."""

import pandas as pd

from nightcrawler_ds_pipeline_spark.pipeline.enrichment import (
    RANK_CLICK_SHARES,
    run_enrichment,
)


def _pandas_oracle(serp_pdf: pd.DataFrame) -> dict[str, float]:
    df = serp_pdf[serp_pdf["keyword_enriched"].notna()].copy()
    # step 1 (deterministic 'first' = min, matching the engine's choice)
    agg = (
        df.groupby("keyword_enriched")
        .agg(keyword_volume=("keyword_volume", "sum"))
        .reset_index()
    )
    vol = dict(zip(agg["keyword_enriched"], agg["keyword_volume"]))
    # step 2: per keyword, top-20 urls by (position, url), share×volume
    out: dict[str, float] = {}
    for kw, grp in df.groupby("keyword_enriched"):
        urls = grp.sort_values(["position", "url"])["url"].tolist()[:20]
        for (u, share) in zip(urls, RANK_CLICK_SHARES):
            out[u] = out.get(u, 0.0) + round(share * vol[kw], 0)
    return out


def test_enrichment_matches_pandas_oracle(spark, t1_dir):
    serp = spark.read.parquet(f"{t1_dir}/serp_results.parquet")
    result = {r["url"]: r["keyword_volume"] for r in run_enrichment(spark, serp).collect()}
    golden = _pandas_oracle(serp.toPandas())
    assert result == golden
    assert len(result) > 0


def test_enrichment_ranking_descending(spark, t1_dir):
    serp = spark.read.parquet(f"{t1_dir}/serp_results.parquet")
    vols = [r["keyword_volume"] for r in run_enrichment(spark, serp).collect()]
    assert vols == sorted(vols, reverse=True)
