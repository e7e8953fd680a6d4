"""Aggregation operators (SURVEY.md §2.4, A1-A7) — builtin hash aggregates.

Each reference aggregation is re-expressed as a ``groupBy().agg()`` (partial
+ final aggregation and map-side combine come free from Catalyst). The
reference's pandas ``first`` is replaced with ``min`` — deterministic under
any partitioning, which ``first`` is not (SURVEY.md §7 hard-point a).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.registry import register
from nightcrawler_ds_pipeline_spark.operators.sqlfrags import (
    SYNTH_URLS_CTE,
    read_table,
    synth_urls,
)


# A1 — keyword aggregate (reference keywords_selection.py:68-97):
# groupby(keyword).agg(volume=sum, location=first) → here over documents.
def agg_keyword_volume(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.col("lang").alias("grp"))
        .agg(
            F.sum("n_chars").alias("sum_volume"),
            F.min("source").alias("first_source"),
            F.count("*").alias("n"),
        )
        .orderBy("grp")
    )


# A2 — URL traffic aggregate (keywords_selection.py:150-172): groupby(url)
# sum(volume), sort desc.
@register(
    "agg_url_traffic",
    oracle=SYNTH_URLS_CTE
    + """
    SELECT url, ROUND(SUM(priority), 2) AS sum_volume
    FROM urls GROUP BY url
    ORDER BY sum_volume DESC, url
    LIMIT 100
    """,
)
def agg_url_traffic(spark, sf_dir):
    urls = synth_urls(spark, sf_dir)
    return (
        urls.groupBy("url")
        .agg(F.round(F.sum("priority"), 2).alias("sum_volume"))
        .orderBy(F.col("sum_volume").desc(), F.col("url"))
        .limit(100)
    )


# A3 — offerRoot counts (s01_serp_api.py:216-222): Counter → groupBy().count()
def agg_offer_root_counts(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("offer_root"))
        .agg(F.count("*").alias("n"))
        .orderBy("offer_root")
    )


# A4 — stage row count (base.py:323-327): numberOfResultsAfterStage
def agg_stage_count(spark, sf_dir):
    return read_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


# A6 — value counts + proportions (helpers/utils.py:182-205). Proportion is
# an exact IEEE double division (identical bits both engines); no rounding.
@register(
    "agg_value_counts_prop",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           COUNT(*) / (SELECT COUNT(*) FROM events) AS prop
    FROM events GROUP BY event_type ORDER BY n DESC, event_type
    """,
)
def agg_value_counts_prop(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    total = events.count()
    return (
        events.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .withColumn("prop", F.col("n") / F.lit(total))
        .orderBy(F.col("n").desc(), F.col("event_type"))
    )


# A7 — distinct domains (helpers/utils.py:215-231): dedup url → host → dedup
def agg_distinct_domains(spark, sf_dir):
    urls = synth_urls(spark, sf_dir).dropDuplicates(["url"])
    hosts = urls.withColumn(
        "host", F.regexp_extract(F.col("url"), r"https?://([^/]+)", 1)
    )
    return hosts.agg(F.countDistinct("host").alias("n_domains"))


# A7 at 100 TB: exact count_distinct shuffles every distinct key; the HLL
# sketch merges map-side partials (bytes per partition, not keys), which is
# the only affordable form on a 10^10-URL frontier. No DuckDB oracle — HLL
# implementations differ across engines by design; the ≤5%-relative-error
# contract vs the exact count is pinned in tests/test_oracle_parity.py
# (rsd=0.02 ⇒ expected error well inside the gate).
@register("agg_approx_distinct_domains")
def agg_approx_distinct_domains(spark, sf_dir):
    # no url-dedup pre-pass: approx_count_distinct is insensitive to
    # duplicates, and a dropDuplicates here would pay exactly the
    # every-distinct-key shuffle this sketch exists to avoid
    hosts = synth_urls(spark, sf_dir).withColumn(
        "host", F.regexp_extract(F.col("url"), r"https?://([^/]+)", 1)
    )
    return hosts.agg(
        F.approx_count_distinct("host", rsd=0.02).alias("n_domains_approx")
    )


# TPC-H Q1-shaped pricing summary — the engine's general agg sanity check
# (multiple aggregates, two grouping keys, one pass).
@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# A5 — usage-counter merge (base.py:329-339): additive map merge across
# stages, here as explode + sum (the distributed form of Counter-merge).
@register(
    "agg_usage_merge",
    oracle="""
    SELECT event_type AS api,
           CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS calls
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def agg_usage_merge(spark, sf_dir):
    # NB: floor before the integer cast — DuckDB CAST(double AS BIGINT)
    # rounds while Spark truncates; floor() agrees in both engines.
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.col("event_type").alias("api"))
        .agg(F.sum(F.floor(F.col("value")).cast("long")).alias("calls"))
        .orderBy("api")
    )


# --- composite driver queries ------------------------------------------------
# A1+A3 and A4+A7 folded into two registered entries so the driver's bounded
# sample always hash-checks them (sub-aggregates stay callable). Sentinels
# ('' / -1) instead of NULL in union cells — see setop_suite for why.
@register(
    "agg_group_counts",
    oracle="""
    SELECT part, grp, CAST(sum_volume AS BIGINT) AS sum_volume,
           first_source, CAST(n AS BIGINT) AS n
    FROM (
      SELECT 'keyword' AS part, lang AS grp, SUM(n_chars) AS sum_volume,
             MIN(source) AS first_source, COUNT(*) AS n
      FROM documents GROUP BY lang
      UNION ALL
      SELECT 'offer_root', o_orderpriority, -1, '', COUNT(*)
      FROM orders GROUP BY o_orderpriority
    )
    ORDER BY part, grp
    """,
)
def agg_group_counts(spark, sf_dir):
    kw = agg_keyword_volume(spark, sf_dir).select(
        F.lit("keyword").alias("part"),
        "grp",
        F.col("sum_volume").cast("long").alias("sum_volume"),
        "first_source",
        F.col("n").cast("long").alias("n"),
    )
    roots = agg_offer_root_counts(spark, sf_dir).select(
        F.lit("offer_root").alias("part"),
        F.col("offer_root").alias("grp"),
        F.lit(-1).cast("long").alias("sum_volume"),
        F.lit("").alias("first_source"),
        F.col("n").cast("long").alias("n"),
    )
    return kw.unionByName(roots).orderBy("part", "grp")


@register(
    "agg_count_suite",
    oracle=SYNTH_URLS_CTE
    + """
    SELECT 'lineitem_count' AS part, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
    UNION ALL
    SELECT 'distinct_domains',
           CAST(COUNT(DISTINCT regexp_extract(url, 'https?://([^/]+)', 1)) AS BIGINT)
    FROM (SELECT DISTINCT url FROM urls)
    ORDER BY part
    """,
)
def agg_count_suite(spark, sf_dir):
    stage = agg_stage_count(spark, sf_dir).select(
        F.lit("lineitem_count").alias("part"), F.col("n").cast("long").alias("n")
    )
    domains = agg_distinct_domains(spark, sf_dir).select(
        F.lit("distinct_domains").alias("part"),
        F.col("n_domains").cast("long").alias("n"),
    )
    return stage.unionByName(domains).orderBy("part")
