"""robots.txt cache TTL (north_rule "robots.txt cache"): stale entries
re-fetch from the source and re-stamp; fresh entries serve from cache;
the loop's cache table commits/rolls back with the rest of the state."""

import pyspark.sql.functions as F

from nightcrawler_ds_pipeline_spark.crawl.loop import CrawlConfig, run_crawl
from nightcrawler_ds_pipeline_spark.crawl.politeness import refresh_robots
from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog


def _robots(spark, rows):
    return spark.createDataFrame(
        rows,
        "host string, crawl_delay_ms int, disallow_prefixes array<string>, "
        "fetched_at_iter int",
    )


def test_refresh_robots_semantics(spark):
    cached = _robots(spark, [
        ("a.com", 1000, ["/x"], 0),   # stale at iter 5 under max_age 3
        ("b.com", 2000, [], 4),       # fresh
        ("gone.com", 500, [], 4),     # fresh, absent in source
        ("dead.com", 500, [], 0),     # STALE and absent in source
    ])
    source = _robots(spark, [
        ("a.com", 9000, ["/y"], 0),   # rules CHANGED since the cache entry
        ("b.com", 7000, ["/z"], 0),   # changed too — but cache is fresh
        ("c.com", 100, [], 0),        # new host
    ])
    out = {
        r["host"]: (r["crawl_delay_ms"], list(r["disallow_prefixes"]),
                    r["fetched_at_iter"])
        for r in refresh_robots(cached, source, current_iter=5,
                                max_age_iters=3).collect()
    }
    assert out["a.com"] == (9000, ["/y"], 5)   # stale → refetched + stamped
    assert out["b.com"] == (2000, [], 4)       # fresh → served from cache
    assert out["c.com"] == (100, [], 5)        # new → fetched
    # serve-until-expiry: a fresh entry survives the source dropping it...
    assert out["gone.com"] == (500, [], 4)
    # ...and is evicted once it EXPIRES with nothing to refetch
    assert "dead.com" not in out
    # first fill (no cache yet): everything fetched and stamped
    first = refresh_robots(None, source, current_iter=2, max_age_iters=3)
    assert {r["fetched_at_iter"] for r in first.collect()} == {2}


def test_loop_robots_cache_refresh(spark, t1_dir, tmp_path):
    """On a static robots source the TTL cache changes NOTHING about the
    crawl (refetch returns identical rules) while the catalog's robots
    table shows the refresh machinery at work (stamps advance)."""
    plain = SnapshotCatalog(str(tmp_path / "plain"))
    run_crawl(spark, plain, t1_dir, CrawlConfig(iterations=3))

    cached = SnapshotCatalog(str(tmp_path / "cached"))
    run_crawl(spark, cached, t1_dir,
              CrawlConfig(iterations=3, robots_max_age_iters=1))

    def state(cat):
        res = cat.read(spark, "results")
        return sorted(
            (r["iter"], r["seq"], r["url_hash"])
            for r in res.select("iter", "seq", "url_hash").collect()
        )

    assert state(plain) == state(cached)
    # the cache table exists only in the TTL run, and with max_age=1 every
    # entry was re-stamped at the last iteration
    assert plain.read(spark, "robots") is None
    rob = cached.read(spark, "robots")
    assert rob is not None
    stamps = {int(r["fetched_at_iter"]) for r in rob.collect()}
    assert stamps == {2}, stamps  # all refreshed at the final iteration
