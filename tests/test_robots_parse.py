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


def _py_reference_parse(body: str, agent: str = "nightcrawler",
                        default_delay: int = 1000):
    """Independent pure-Python parse of the same grammar (differential
    oracle for the DataFrame parser)."""
    groups = []  # list of (ua_set, rules)
    cur_uas, cur_rules, in_ua_run = None, None, False
    for raw in (body or "").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        directive, value = line.split(":", 1)
        directive, value = directive.strip().lower(), value.strip()
        if directive == "user-agent":
            if not in_ua_run:
                if cur_uas is not None:
                    groups.append((cur_uas, cur_rules))
                cur_uas, cur_rules = set(), []
            cur_uas.add(value.lower())
            in_ua_run = True
        else:
            in_ua_run = False
            if cur_uas is not None:
                cur_rules.append((directive, value))
    if cur_uas is not None:
        groups.append((cur_uas, cur_rules))
    prefixes, delay = set(), None
    for uas, rules in groups:
        if "*" not in uas and agent.lower() not in uas:
            continue
        for d, v in rules:
            if d == "disallow" and v != "":
                prefixes.add(v)
            elif d == "crawl-delay":
                try:
                    ms = int(float(v) * 1000)
                except ValueError:
                    continue
                delay = ms if delay is None else min(delay, ms)
    return sorted(prefixes), (default_delay if delay is None else delay)


def test_parse_differential_fuzz(spark):
    """Seeded fuzz corpus (garbage lines, comments, weird casing, empty
    values, unknown directives) — the DataFrame parser must agree with the
    independent pure-Python reference on every body, and never crash."""
    import numpy as np

    rng = np.random.default_rng(11)
    frags = [
        "User-agent: *", "User-agent: nightcrawler", "User-agent: otherbot",
        "user-AGENT: NightCrawler", "Disallow: /a", "Disallow: /b/c",
        "disallow: ", "Disallow: /x # comment", "Crawl-delay: 2",
        "crawl-delay: 0.5", "Crawl-delay: fast", "Sitemap: /map.xml",
        "# pure comment", "", "garbage without colon", ":", "Allow: /ok",
        "   Disallow:   /pad   ", "User-agent:", "Unknown: thing",
    ]
    bodies = []
    for i in range(150):
        n = int(rng.integers(0, 14))
        bodies.append("\n".join(frags[int(k)] for k in rng.integers(0, len(frags), n)))
    raw = spark.createDataFrame(
        [(f"h{i}.com", b) for i, b in enumerate(bodies)], "host string, body string"
    )
    got = {r["host"]: r for r in parse_robots(raw).collect()}
    assert len(got) == 150
    for i, b in enumerate(bodies):
        prefixes, delay = _py_reference_parse(b)
        r = got[f"h{i}.com"]
        assert r["disallow_prefixes"] == prefixes, (i, b)
        assert r["crawl_delay_ms"] == delay, (i, b)


def test_parse_is_jvm_only(spark):
    raw = spark.createDataFrame([("a.ch", BODY_A)], "host string, body string")
    plan = parse_robots(raw)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure column algebra, no Python UDFs
