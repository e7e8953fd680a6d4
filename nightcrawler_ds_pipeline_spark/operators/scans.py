"""Scan/source-shaped operators (SURVEY.md §2.1 S2/S3 + §2.7 F10/F12/F15).

The reference's scans are HTTP calls returning nested JSON; the engine's
equivalents are declarative projections over those payloads. Here each is
exercised over driver testdata with a DuckDB oracle; the JSON-payload form
(`from_json` + struct access) is exercised in pytest over fixture payloads.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.registry import register
from nightcrawler_ds_pipeline_spark.operators.sqlfrags import read_table


# S2 — 4-source search union: per-source DataFrames tagged lit(offer_root),
# per-source limit, unionByName (s01_serp_api.py:157-223).
@register(
    "scan_union_sources",
    oracle="""
    WITH g AS (SELECT 'GOOGLE' AS offer_root, o_orderkey AS k FROM orders
               ORDER BY o_orderkey LIMIT 50),
         gs AS (SELECT 'GOOGLE_SHOPPING', o_orderkey FROM orders
                WHERE o_orderkey % 2 = 0 ORDER BY o_orderkey LIMIT 100),
         si AS (SELECT 'GOOGLE_SITE', o_orderkey FROM orders
                WHERE o_orderkey % 3 = 0 ORDER BY o_orderkey LIMIT 100),
         eb AS (SELECT 'EBAY', o_orderkey FROM orders
                WHERE o_orderkey % 5 = 0 ORDER BY o_orderkey LIMIT 200)
    SELECT * FROM g UNION ALL SELECT * FROM gs
    UNION ALL SELECT * FROM si UNION ALL SELECT * FROM eb
    ORDER BY offer_root, k
    """,
)
def scan_union_sources(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")

    def src(root, cond, limit):
        df = orders
        if cond is not None:
            df = df.filter(cond)
        return (
            df.orderBy("o_orderkey")
            .limit(limit)
            .select(F.lit(root).alias("offer_root"), F.col("o_orderkey").alias("k"))
        )

    out = (
        src("GOOGLE", None, 50)
        .unionByName(src("GOOGLE_SHOPPING", F.col("o_orderkey") % 2 == 0, 100))
        .unionByName(src("GOOGLE_SITE", F.col("o_orderkey") % 3 == 0, 100))
        .unionByName(src("EBAY", F.col("o_orderkey") % 5 == 0, 200))
    )
    return out.orderBy("offer_root", "k")


# S3 — organic/shopping projection: explode(concat(coalesce(arr, []), ...))
# (helpers/api/serp_api.py:116-142 picks organic_results or the concat of
# two shopping arrays, null-safe).
@register(
    "scan_explode_coalesce",
    oracle="""
    WITH payload AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 <> 0
                  THEN ['organic-' || CAST(o_orderkey AS VARCHAR)] END AS organic,
             CASE WHEN o_orderkey % 5 = 0
                  THEN ['shop-a-' || CAST(o_orderkey AS VARCHAR),
                        'shop-b-' || CAST(o_orderkey AS VARCHAR)] END AS shopping
      FROM orders
    )
    SELECT o_orderkey, unnest(list_concat(coalesce(organic, []),
                                          coalesce(shopping, []))) AS link
    FROM payload ORDER BY o_orderkey, link
    """,
)
def scan_explode_coalesce(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    payload = orders.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 != 0,
            F.array(F.concat(F.lit("organic-"), F.col("o_orderkey").cast("string"))),
        ).alias("organic"),
        F.when(
            F.col("o_orderkey") % 5 == 0,
            F.array(
                F.concat(F.lit("shop-a-"), F.col("o_orderkey").cast("string")),
                F.concat(F.lit("shop-b-"), F.col("o_orderkey").cast("string")),
            ),
        ).alias("shopping"),
    )
    return payload.select(
        "o_orderkey",
        F.explode(
            F.concat(
                F.coalesce(F.col("organic"), F.array()),
                F.coalesce(F.col("shopping"), F.array()),
            )
        ).alias("link"),
    ).orderBy("o_orderkey", "link")


# F10 — base64 round-trip (s04:152, llm_apis.py:176-181)
def scan_base64(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select(F.col("o_orderpriority").alias("s"))
        .distinct()
        .withColumn("b64", F.base64(F.encode(F.col("s"), "utf-8")))
        .orderBy("s")
    )


# F12 — the reference's %Y-%m-%d_%H-%M-%S run-timestamp format
# (base.py:131-133), applied to a data column (run_ts itself is injected).
def scan_ts_format(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    return events.select(
        "event_id", F.date_format("ts", "yyyy-MM-dd_HH-mm-ss").alias("ts_str")
    ).orderBy("event_id")


# Streaming analogue (SURVEY §2.10): tumbling 5-minute windowed aggregation
# over the events stream table — batch form here (oracle-checked); the
# Structured Streaming form with watermark runs in pytest and must agree.
def stream_tumbling_window_agg(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.floor(F.unix_timestamp("ts") / 300).cast("long").alias(
                "window_start_epoch"
            ),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("window_start_epoch", "event_type")
    )


# Sessionization (guide pattern; crawl analogue: visit sessions per host):
# lag + gap>threshold cumulative session ids.
def stream_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id",
        F.when(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > 1800)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    # session count per user = number of gap-starts (order-insensitive sum)
    return (
        marked.groupBy("user_id")
        .agg(F.sum("new_session").cast("long").alias("n_sessions"))
        .orderBy("user_id")
    )


# robots.txt text parsing (north_rule "robots.txt cache"): the DataFrame-
# native parser over a deterministic per-host body corpus. The oracle is
# the CLOSED FORM of each body archetype (like project_canonical_urls):
# the parser's expected output for the 3 synthesized robots.txt texts.
_ROBOTS_BODIES = [
    # archetype 0: wildcard group + inapplicable group
    "# site robots\nUser-agent: *\nDisallow: /admin # note\nDisallow: /cart\n"
    "Crawl-delay: 2.5\n\nUser-agent: otherbot\nDisallow: /\n",
    # archetype 1: shared UA header (named + wildcard groups both apply)
    "User-agent: googlebot\nUser-agent: nightcrawler\nDisallow: /private\n"
    "Crawl-delay: 1\n\nUser-agent: *\nDisallow: /tmp\n",
    # archetype 2: nothing applicable -> permissive defaults
    "User-agent: otherbot\nDisallow: /\n",
]


@register(
    "robots_parse",
    oracle="""
    SELECT concat('host', CAST(o_orderkey AS VARCHAR)) AS host,
           CASE CAST(o_orderkey % 3 AS INTEGER)
             WHEN 0 THEN 2500 WHEN 1 THEN 1000 ELSE 1000 END AS crawl_delay_ms,
           CASE CAST(o_orderkey % 3 AS INTEGER)
             WHEN 0 THEN '/admin|/cart'
             WHEN 1 THEN '/private|/tmp'
             ELSE '' END AS disallow_prefixes
    FROM orders ORDER BY host
    """,
)
def robots_parse(spark, sf_dir):
    # parse_robots keeps its array<string> output for the dequeue path; the
    # driver-facing projection flattens it (the driver's pandas value-hash
    # sorts the full result and dies on list cells — see CLAUDE.md invariant).
    from nightcrawler_ds_pipeline_spark.functions.robots import parse_robots

    orders = read_table(spark, sf_dir, "orders")
    body = (
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(_ROBOTS_BODIES[0]))
        .when(F.col("o_orderkey") % 3 == 1, F.lit(_ROBOTS_BODIES[1]))
        .otherwise(F.lit(_ROBOTS_BODIES[2]))
    )
    raw = orders.select(
        F.concat(F.lit("host"), F.col("o_orderkey").cast("string")).alias("host"),
        body.alias("body"),
    )
    return (
        parse_robots(raw)
        .select(
            "host",
            "crawl_delay_ms",
            F.array_join("disallow_prefixes", "|").alias("disallow_prefixes"),
        )
        .orderBy("host")
    )


# --- composite driver queries ------------------------------------------------
# F10+F12 and the two stream-shaped queries folded so the driver's bounded
# sample always hash-checks them. Sentinel '' fills — see setop_suite.
@register(
    "scan_codec_suite",
    oracle="""
    SELECT part, k, v FROM (
      SELECT 'b64' AS part, o_orderpriority AS k,
             to_base64(CAST(o_orderpriority AS BLOB)) AS v
      FROM (SELECT DISTINCT o_orderpriority FROM orders)
      UNION ALL
      SELECT 'ts', CAST(event_id AS VARCHAR), strftime(ts, '%Y-%m-%d_%H-%M-%S')
      FROM events
    )
    ORDER BY part, k
    """,
)
def scan_codec_suite(spark, sf_dir):
    b64 = scan_base64(spark, sf_dir).select(
        F.lit("b64").alias("part"), F.col("s").alias("k"), F.col("b64").alias("v")
    )
    ts = scan_ts_format(spark, sf_dir).select(
        F.lit("ts").alias("part"),
        F.col("event_id").cast("string").alias("k"),
        F.col("ts_str").alias("v"),
    )
    return b64.unionByName(ts).orderBy("part", "k")


@register(
    "stream_suite",
    oracle="""
    SELECT part, k1, k2, CAST(n AS BIGINT) AS n, CAST(v AS DOUBLE) AS v
    FROM (
      SELECT 'tumbling' AS part,
             CAST(CAST(FLOOR(epoch(ts) / 300) AS BIGINT) AS VARCHAR) AS k1,
             event_type AS k2, COUNT(*) AS n, ROUND(SUM(value), 4) AS v
      FROM events GROUP BY 1, 2, event_type
      UNION ALL
      SELECT 'sessionize', CAST(user_id AS VARCHAR), '', n_sessions, -1.0
      FROM (
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                      OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, SUM(new_session) AS n_sessions
        FROM marked GROUP BY user_id
      )
    )
    ORDER BY part, k1, k2
    """,
)
def stream_suite(spark, sf_dir):
    tumb = stream_tumbling_window_agg(spark, sf_dir).select(
        F.lit("tumbling").alias("part"),
        F.col("window_start_epoch").cast("string").alias("k1"),
        F.col("event_type").alias("k2"),
        F.col("n").cast("long").alias("n"),
        F.col("sum_value").cast("double").alias("v"),
    )
    sess = stream_sessionize(spark, sf_dir).select(
        F.lit("sessionize").alias("part"),
        F.col("user_id").cast("string").alias("k1"),
        F.lit("").alias("k2"),
        F.col("n_sessions").cast("long").alias("n"),
        F.lit(-1.0).alias("v"),
    )
    return tumb.unionByName(sess).orderBy("part", "k1", "k2")
