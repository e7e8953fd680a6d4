"""Projection / filter / predicate operators (SURVEY.md §2.2, P-family).

Swiss-market semantics replicate the reference EXACTLY, including its
``ch-de_in_url`` key-mismatch bug: the flag list at s05_dataprocessor.py:
128-133 names ``"ch-de_in_url"`` but the column created at s05:111 is
``ch_de_in_url``, so ``.get(..., False)`` silently drops it — the effective
predicate is swisscompany ∨ web_extension ∨ francs (never language). We emit
the ``ch_de_in_url`` column but exclude it from ``result_sold_CH``, exactly
like the reference (strict_reference_parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.registry import register
from nightcrawler_ds_pipeline_spark.operators.sqlfrags import (
    SYNTH_URLS_CTE,
    read_table,
    synth_urls,
)

# reference s05_dataprocessor.py:82-106 (verbatim lists)
SWISS_LANGUAGES = ["ch-de", "/ch/", "swiss", "/CH/", "/fr"]
SWISS_SHOPS = [
    "anastore", "ayurveda101", "biovea", "bodysport", "brack", "brain-effect",
    "ebay", "gesund-gekauft", "kanela", "myfairtrade", "nurnatur", "nu3",
    "plantavis", "shop-apotheke", "herbano", "onebioshop", "puravita",
    "sembrador", "vitaminexpress", "wish",
]
SWISS_WEB_EXTENSIONS = [".ch", "ch."]
SWISS_FRANCS = ["CHF", "SFr"]


def contains_any(col: Column | str, needles: list[str]) -> Column:
    """P8 helper: any-of substring containment, null-safe like the
    reference's evaluate_not_na guard (s05:162-176)."""
    c = F.col(col) if isinstance(col, str) else col
    cond = F.lit(False)
    for n in needles:
        cond = cond | c.contains(n)
    return F.when(c.isNull(), F.lit(False)).otherwise(cond)


def add_swiss_features(df: DataFrame, url_col: str = "url", price_col: str = "price") -> DataFrame:
    """P8 + P9: the four feature flags and the (bug-parity) OR-reduce."""
    out = (
        df.withColumn("ch_de_in_url", contains_any(url_col, SWISS_LANGUAGES))
        .withColumn("swisscompany_in_url", contains_any(url_col, SWISS_SHOPS))
        .withColumn("web_extension_in_url", contains_any(url_col, SWISS_WEB_EXTENSIONS))
        .withColumn("francs_in_url", contains_any(price_col, SWISS_FRANCS))
    )
    # ch_de_in_url intentionally absent (reference key-mismatch, s05:128-133)
    return out.withColumn(
        "result_sold_CH",
        F.col("swisscompany_in_url")
        | F.col("web_extension_in_url")
        | F.col("francs_in_url"),
    )


def _contains_any_sql(col: str, needles: list[str]) -> str:
    return "(" + " OR ".join(f"contains({col}, '{n}')" for n in needles) + ")"


_PRICE_SQL = (
    "concat(CAST(CAST(FLOOR(priority) AS BIGINT) AS VARCHAR), ' ', "
    "CASE WHEN o_orderkey % 7 = 0 THEN 'CHF' WHEN o_orderkey % 7 = 1 THEN 'SFr' "
    "ELSE 'EUR' END)"
)


def _price_col() -> Column:
    return F.concat(
        F.floor(F.col("priority")).cast("long").cast("string"),
        F.lit(" "),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("CHF"))
        .when(F.col("o_orderkey") % 7 == 1, F.lit("SFr"))
        .otherwise(F.lit("EUR")),
    )


# P8/P9 — swiss feature flags + (bug-parity) result_sold_CH
@register(
    "filter_swiss_flags",
    oracle=SYNTH_URLS_CTE
    + f"""
    , priced AS (SELECT url, o_orderkey, {_PRICE_SQL} AS price FROM urls)
    SELECT url,
           {_contains_any_sql("url", SWISS_LANGUAGES)} AS ch_de_in_url,
           {_contains_any_sql("url", SWISS_SHOPS)} AS swisscompany_in_url,
           {_contains_any_sql("url", SWISS_WEB_EXTENSIONS)} AS web_extension_in_url,
           {_contains_any_sql("price", SWISS_FRANCS)} AS francs_in_url,
           ({_contains_any_sql("url", SWISS_SHOPS)}
            OR {_contains_any_sql("url", SWISS_WEB_EXTENSIONS)}
            OR {_contains_any_sql("price", SWISS_FRANCS)}) AS result_sold_CH
    FROM priced ORDER BY url
    """,
)
def filter_swiss_flags(spark, sf_dir):
    urls = synth_urls(spark, sf_dir).withColumn("price", _price_col())
    # sort FIRST, flags after: the ~27 Contains per row then run distributed
    # on the post-exchange partitions instead of inside the single-task scan
    # (one-row-group parquet — the map side cannot split), and the query
    # needs the range exchange for ORDER BY anyway, so this adds none.
    return add_swiss_features(
        urls.select("url", "price").orderBy("url"), "url", "price"
    ).select(
        "url",
        "ch_de_in_url",
        "swisscompany_in_url",
        "web_extension_in_url",
        "francs_in_url",
        "result_sold_CH",
    )


# P10 — country filter (s05:58-67): CH keeps result_sold_CH rows
def filter_country_ch(spark, sf_dir):
    urls = synth_urls(spark, sf_dir).withColumn("price", _price_col())
    flagged = add_swiss_features(urls, "url", "price")
    return flagged.filter(F.col("result_sold_CH")).agg(
        F.count("*").alias("n_sold_ch")
    )


# P11 — page-type threshold (s07:17,31-54): null/0 proba → OTHER; strictly
# greater than 0.4 → ECOMMERCE_PRODUCT.
def filter_page_type(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.when(F.coalesce(F.col("value"), F.lit(0)) > 0.4, F.lit("ecommerce_product"))
        .otherwise(F.lit("other"))
        .alias("page_type"),
    ).orderBy("event_id")


# P4 — marketplace product-page regex filter (s01:225-241): keep URLs
# matching ANY pattern, anchored like re.match.
MARKETPLACE_PATTERNS = [
    r"^https://shop1\d\.example\.com/p/.*",
    r"^https://shop2\d\.example\.com/p/.*",
]


@register(
    "filter_marketplace_patterns",
    oracle=SYNTH_URLS_CTE
    + """
    SELECT url FROM urls
    WHERE regexp_matches(url, '^https://shop1\\d\\.example\\.com/p/.*')
       OR regexp_matches(url, '^https://shop2\\d\\.example\\.com/p/.*')
    ORDER BY url
    """,
)
def filter_marketplace_patterns(spark, sf_dir):
    urls = synth_urls(spark, sf_dir)
    cond = F.lit(False)
    for p in MARKETPLACE_PATTERNS:
        cond = cond | F.col("url").rlike(p)
    return urls.filter(cond).select("url").orderBy("url")


# P13 — keyword blacklist (keywords_selection.py:4-65). NB in the reference
# the call site DISCARDS the filter result (s02:69-74) so it is a no-op;
# the pipeline replicates the no-op, and this is the *intended* filter
# behind the strict_reference_parity=False flag.
KEYWORD_BLACKLIST = [
    "nebenwirkung", "erfahrung", "gefährlich", "gefahr", "risiko", "bewertung",
    "bericht", "warnung", "symptome", "kritik",
    "side effect", "dangerous", "danger", "risk", "report", "warning",
    "symptom", "criticism",
    "expérience", "dangereux", "risque", "rapport", "avertissement",
    "symptômes", "secondaire", "critique",
    "collateral", "pericolo", "rischio", "recensione", "rapporto",
    "avvertimento", "sintomi", "critica",
]


@register(
    "filter_keyword_blacklist",
    oracle="""
    SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS text_len
    FROM documents
    WHERE NOT ("""
    + " OR ".join(f"contains(lower(text), '{w}')" for w in KEYWORD_BLACKLIST)
    + """)
    ORDER BY doc_id
    """,
)
def filter_keyword_blacklist(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.filter(~contains_any(F.lower(F.col("text")), KEYWORD_BLACKLIST))
        .select("doc_id", F.length("text").cast("long").alias("text_len"))
        .orderBy("doc_id")
    )


# P2 — URL canonicalization parity: the engine's urllib-exact pandas UDF vs
# a closed-form oracle for the three synthesized query-string families.
def project_canonical_urls(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.functions.urls import canonicalize_udf

    urls = synth_urls(spark, sf_dir)
    return urls.select(
        "url", canonicalize_udf(F.col("url")).alias("canonical_url")
    ).orderBy("url")


# F8 — double URL-encode (s03_reverse_image_search.py:47-48): the
# reverse-image query-URL construction quirk, quote_plus twice. The oracle
# is the closed form for the synth corpus charset (letters/digits/._- are
# quote_plus-safe; ':' '/' '?' '=' '&' encode to %XX on pass 1 and the '%'
# re-encodes to %25 on pass 2).
def project_double_urlencode(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.functions.urls import double_urlencode_udf

    urls = synth_urls(spark, sf_dir)
    return urls.select(
        "url", double_urlencode_udf(F.col("url")).alias("encoded")
    ).orderBy("url")


# P3 — language-path cleaning (utils.py:280-298): /xx-yy/ segments stripped,
# query dropped.
def project_clean_urls(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.functions.urls import clean_url_udf

    orders = read_table(spark, sf_dir, "orders")
    urls = orders.select(
        F.concat(
            F.lit("https://x.com/ch-de/p/"),
            F.col("o_orderkey").cast("string"),
            F.lit("?q=1"),
        ).alias("url")
    )
    return urls.select("url", clean_url_udf(F.col("url")).alias("cleaned")).orderBy("url")


# --- composite driver queries ------------------------------------------------
# Single registered entries so the driver's bounded sample always hash-checks
# P10/P11 and P2/P3/F8 (the sub-operators above stay callable). Sentinel ''
# fills keep every union sort key non-null (Spark NULLS FIRST vs DuckDB
# NULLS LAST would silently diverge row order under the driver's hash).
@register(
    "filter_threshold_suite",
    oracle=SYNTH_URLS_CTE
    + f"""
    , priced AS (SELECT url, o_orderkey, {_PRICE_SQL} AS price FROM urls)
    SELECT part, k, v FROM (
      SELECT 'page_type' AS part, CAST(event_id AS VARCHAR) AS k,
             CASE WHEN COALESCE(value, 0) > 0.4 THEN 'ecommerce_product'
                  ELSE 'other' END AS v
      FROM events
      UNION ALL
      SELECT 'country_ch', '', CAST(COUNT(*) AS VARCHAR)
      FROM priced
      WHERE ({_contains_any_sql("url", SWISS_SHOPS)}
             OR {_contains_any_sql("url", SWISS_WEB_EXTENSIONS)}
             OR {_contains_any_sql("price", SWISS_FRANCS)})
    )
    ORDER BY part, k
    """,
)
def filter_threshold_suite(spark, sf_dir):
    page = filter_page_type(spark, sf_dir).select(
        F.lit("page_type").alias("part"),
        F.col("event_id").cast("string").alias("k"),
        F.col("page_type").alias("v"),
    )
    country = filter_country_ch(spark, sf_dir).select(
        F.lit("country_ch").alias("part"),
        F.lit("").alias("k"),
        F.col("n_sold_ch").cast("string").alias("v"),
    )
    return page.unionByName(country).orderBy("part", "k")


@register(
    "project_url_suite",
    oracle=SYNTH_URLS_CTE
    + """
    SELECT part, url, out FROM (
      SELECT 'canon' AS part, url,
             concat(
               'https://shop', CAST(o_custkey % 50 AS VARCHAR), '.example.com/p/',
               CAST(o_orderkey AS VARCHAR),
               CASE WHEN o_orderkey % 4 = 0 THEN '?aa=bb' ELSE '' END
             ) AS out
      FROM urls
      UNION ALL
      SELECT 'dblenc', url,
             replace(replace(replace(replace(replace(
               url, ':', '%253A'), '/', '%252F'), '?', '%253F'),
               '=', '%253D'), '&', '%2526')
      FROM urls
      UNION ALL
      SELECT 'clean',
             concat('https://x.com/ch-de/p/', CAST(o_orderkey AS VARCHAR), '?q=1'),
             concat('https://x.com/p/', CAST(o_orderkey AS VARCHAR))
      FROM orders
    )
    ORDER BY part, url
    """,
)
def project_url_suite(spark, sf_dir):
    def tag(df, part, out_col):
        return df.select(
            F.lit(part).alias("part"), "url", F.col(out_col).alias("out")
        )

    return (
        tag(project_canonical_urls(spark, sf_dir), "canon", "canonical_url")
        .unionByName(tag(project_double_urlencode(spark, sf_dir), "dblenc", "encoded"))
        .unionByName(tag(project_clean_urls(spark, sf_dir), "clean", "cleaned"))
        .orderBy("part", "url")
    )
