"""Pipeline flows registered as driver queries.

These consume the engine's own deterministic fixture tables (written as
single parquet FILES by ``fixtures.write_fixture_parquet`` — pure
pandas/pyarrow, no Spark, idempotent via a _COMPLETE marker), so the DuckDB
oracle can read the exact same bytes via ``read_parquet('<abs path>')``.
The 11-stage chain (cli/full_pipeline.py:84-215) is filters + withColumns +
window caps + one aggregate — fully SQL-expressible, so all three flows are
hash-checked, not rows-only.

Fixture generation is triggered at module import (cached after the first
call) so the oracle SQL is valid no matter whether the driver runs the
Spark side or the DuckDB side first.
"""

from __future__ import annotations

from nightcrawler_ds_pipeline_spark.constants import RANK_CLICK_SHARES
from nightcrawler_ds_pipeline_spark.fixtures import (
    fixture_dir,
    write_fixture_parquet,
)
from nightcrawler_ds_pipeline_spark.operators.filters import (
    SWISS_FRANCS,
    SWISS_SHOPS,
    SWISS_WEB_EXTENSIONS,
    _contains_any_sql,
)
from nightcrawler_ds_pipeline_spark.registry import register

_FX = write_fixture_parquet("t1")  # == fixture_dir("t1"); cached, pandas-only
assert _FX == fixture_dir("t1")

_SERP = f"read_parquet('{_FX}/serp_results.parquet')"
_SERP_RIS = f"read_parquet('{_FX}/serp_ris.parquet')"
_RESP = f"read_parquet('{_FX}/fetch_responses.parquet')"

_SHARES_ROWS = ", ".join(f"({i + 1}, {s})" for i, s in enumerate(RANK_CLICK_SHARES))

# s04 price concat (F9, s04_zyte.py:122-125): keep the inner space; a result
# that strips to length ≤1 collapses to ''.
_PRICE = (
    "concat(COALESCE(product_price, ''), ' ', COALESCE(currency_raw, ''))"
)
_PRICE_SQL = f"CASE WHEN LENGTH(TRIM({_PRICE})) <= 1 THEN '' ELSE {_PRICE} END"

# the s04→s11+sink tail shared by the text and image oracles; `{seeds}` is a
# CTE name holding (url, offer_root) seed rows after the entry stage.
_TAIL_SQL = f"""
    , fetched AS (
      SELECT s.url, s.offer_root,
             COALESCE(r.product_name, '') AS title,
             {_PRICE_SQL} AS price,
             r.probability
      FROM seeds s JOIN {_RESP} r ON s.url = r.url
      WHERE NOT r.error
    ),
    flagged AS (
      SELECT *,
             ({_contains_any_sql("url", SWISS_SHOPS)}
              OR {_contains_any_sql("url", SWISS_WEB_EXTENSIONS)}
              OR {_contains_any_sql("price", SWISS_FRANCS)}) AS result_sold_CH
      FROM fetched
    )
    SELECT url, title, offer_root AS root,
           sha256(concat(split_part(url, '?', 1), '_', title)) AS uid,
           CAST(0.0 AS DOUBLE) AS score,
           CASE WHEN COALESCE(probability, 0) > 0.4 THEN 'ecommerce_product'
                ELSE 'other' END AS page_type,
           result_sold_CH
    FROM flagged
"""


@register(
    "pipeline_fullrun_text",
    oracle=f"""
    WITH s01 AS (
      SELECT keyword, offer_root, position, url,
             ROW_NUMBER() OVER (PARTITION BY keyword, offer_root
                                ORDER BY position) AS rn
      FROM {_SERP}
      WHERE offer_root <> 'REVERSE_IMAGE_SEARCH'
    ),
    seeds AS (SELECT url, offer_root FROM s01 WHERE rn <= 200)
    {_TAIL_SQL}
    WHERE result_sold_CH
    ORDER BY uid
    """,
)
def pipeline_fullrun_text(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.pipeline.stages import (
        PipelineConfig,
        run_text_pipeline,
    )

    serp, responses = _fixtures(spark)
    return run_text_pipeline(serp, responses, PipelineConfig()).orderBy("uid")


# reverse-image flow over the base serp + the dense RIS tier (serp_ris):
# per-keyword pagination with the reference's 4-page hard cap (page_size
# 10 x max_pages 4 = rank <= 40 — the dense tier has 60 rows/keyword so
# the boundary BITES; test_pipeline_parity pins it), then url dedup.
@register(
    "pipeline_fullrun_image",
    oracle=f"""
    WITH ris AS (
      SELECT keyword, position, url, offer_root FROM {_SERP}
      WHERE offer_root = 'REVERSE_IMAGE_SEARCH' AND image_url IS NOT NULL
      UNION ALL
      SELECT keyword, position, url, offer_root FROM {_SERP_RIS}
      WHERE offer_root = 'REVERSE_IMAGE_SEARCH' AND image_url IS NOT NULL
    ),
    ranked AS (
      SELECT url, offer_root,
             ROW_NUMBER() OVER (PARTITION BY keyword
                                ORDER BY position, url) AS rk
      FROM ris
    ),
    seeds AS (SELECT DISTINCT url, offer_root FROM ranked WHERE rk <= 40)
    {_TAIL_SQL}
    ORDER BY uid
    """,
)
def pipeline_fullrun_image(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.pipeline.stages import (
        PipelineConfig,
        run_image_pipeline,
    )

    serp, responses = _fixtures(spark)
    ris_extra = serp.sparkSession.read.parquet(f"{_FX}/serp_ris.parquet")
    return run_image_pipeline(
        serp.unionByName(ris_extra), responses, PipelineConfig(country="XX")
    ).orderBy("uid")


@register(
    "pipeline_enrichment",
    oracle=f"""
    WITH shares(pos, share) AS (VALUES {_SHARES_ROWS}),
    enriched AS (
      SELECT * FROM {_SERP} WHERE keyword_enriched IS NOT NULL
    ),
    kw AS (
      SELECT keyword_enriched,
             SUM(keyword_volume) AS kw_volume,
             MIN(keyword_language) AS keyword_language,
             MIN(offer_root) AS offer_root
      FROM enriched GROUP BY keyword_enriched
    ),
    ranked AS (
      SELECT keyword_enriched, url,
             ROW_NUMBER() OVER (PARTITION BY keyword_enriched
                                ORDER BY position, url) AS pos
      FROM enriched
    ),
    per_url AS (
      SELECT r.url,
             ROUND(s.share * k.kw_volume, 0) AS keyword_volume,
             r.keyword_enriched, k.keyword_language, k.offer_root
      FROM ranked r
      JOIN shares s ON r.pos = s.pos
      JOIN kw k ON r.keyword_enriched = k.keyword_enriched
      WHERE r.pos <= 20
    )
    SELECT url,
           SUM(keyword_volume) AS keyword_volume,
           MIN(keyword_enriched) AS keyword_enriched,
           MIN(keyword_language) AS keyword_language,
           MIN(offer_root) AS offer_root
    FROM per_url GROUP BY url
    ORDER BY keyword_volume DESC, url
    """,
)
def pipeline_enrichment(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.pipeline.enrichment import run_enrichment

    serp, _ = _fixtures(spark)
    return run_enrichment(spark, serp)


def _fixtures(spark):
    fx = write_fixture_parquet("t1")
    return (
        spark.read.parquet(f"{fx}/serp_results.parquet"),
        spark.read.parquet(f"{fx}/fetch_responses.parquet"),
    )
