"""robots.txt text parser → politeness table, incl. end-to-end use by the
robots gate."""

import pyspark.sql.functions as F

from nightcrawler_ds_pipeline_spark.functions.robots import parse_robots

BODY_A = """
# comments everywhere
User-agent: *
Disallow: /admin   # trailing comment
Disallow: /cart
Crawl-delay: 2.5

User-agent: otherbot
Disallow: /
"""

BODY_B = """
User-agent: googlebot
User-agent: nightcrawler
Disallow: /private
Crawl-delay: 1

User-agent: *
Disallow: /tmp
"""

BODY_C = """
User-agent: otherbot
Disallow: /
"""

BODY_D = ""  # empty / unfetchable


def _parse(spark, agent="nightcrawler"):
    raw = spark.createDataFrame(
        [("a.ch", BODY_A), ("b.com", BODY_B), ("c.com", BODY_C), ("d.com", BODY_D)],
        "host string, body string",
    )
    return {r["host"]: r for r in parse_robots(raw, agent=agent).collect()}


def test_parse_basic_groups(spark):
    out = _parse(spark)
    a = out["a.ch"]
    assert a["disallow_prefixes"] == ["/admin", "/cart"]
    assert a["crawl_delay_ms"] == 2500
    # both groups apply to us on b.com (named UA + wildcard) → union
    b = out["b.com"]
    assert b["disallow_prefixes"] == ["/private", "/tmp"]
    assert b["crawl_delay_ms"] == 1000
    # no applicable group → permissive default
    c = out["c.com"]
    assert c["disallow_prefixes"] == [] and c["crawl_delay_ms"] == 1000
    d = out["d.com"]
    assert d["disallow_prefixes"] == [] and d["crawl_delay_ms"] == 1000


def test_parse_feeds_robots_gate(spark):
    from nightcrawler_ds_pipeline_spark.crawl.politeness import robots_filter

    raw = spark.createDataFrame([("a.ch", BODY_A)], "host string, body string")
    robots = parse_robots(raw).withColumn("fetched_at_iter", F.lit(0))
    frontier = spark.createDataFrame(
        [
            ("a.ch", "https://a.ch/admin/x"),
            ("a.ch", "https://a.ch/p/1"),
            ("a.ch", "https://a.ch/cart"),
        ],
        "host string, canonical_url string",
    )
    kept = robots_filter(frontier, robots).select("canonical_url").collect()
    assert [r["canonical_url"] for r in kept] == ["https://a.ch/p/1"]
    # crawl delay attached for the budget computation
    row = robots_filter(frontier, robots).select("crawl_delay_ms").first()
    assert row["crawl_delay_ms"] == 2500


def test_parse_is_jvm_only(spark):
    raw = spark.createDataFrame([("a.ch", BODY_A)], "host string, body string")
    plan = parse_robots(raw)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure column algebra, no Python UDFs
