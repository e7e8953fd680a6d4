"""TTL re-crawl (reference cache_duration semantics, api_caller.py:24,74):
an expired seen entry stops suppressing the re-fetch — the URL is
re-dequeued exactly once when rediscovered, and never without TTL."""

import pandas as pd
import pytest

from nightcrawler_ds_pipeline_spark.crawl.loop import CrawlConfig, run_crawl
from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog

URL_A = "https://a.example.ch/p/1"
URL_B = "https://b.example.com/p/2"


@pytest.fixture()
def pingpong_dir(tmp_path, t1_dir):
    """Two URLs that link to each other: A is the seed, fetching A
    discovers B, fetching B rediscovers A."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import shutil

    d = tmp_path / "fx"
    d.mkdir()
    serp = pd.DataFrame(
        [
            {
                "keyword": "k", "offer_root": "GOOGLE", "position": 1,
                "url": URL_A, "image_url": None, "keyword_enriched": None,
                "keyword_volume": -1.0, "keyword_language": None,
                "keyword_location": None,
            }
        ]
    )
    serp["position"] = serp["position"].astype("int32")

    def resp(url, j, outlinks):
        return {
            "url": url, "error": False, "product_name": f"P{j}",
            "product_price": "10.00", "currency_raw": "CHF",
            "description": "d", "probability": 0.9,
            "main_image_url": "img://img000000000000",
            "image_urls": ["img://img000000000000"],
            "http_response_body": b"<html/>", "seconds_taken": 0.1,
            "outlinks": outlinks,
        }

    responses = pd.DataFrame([resp(URL_A, 0, [URL_B]), resp(URL_B, 1, [URL_A])])
    robots = pd.DataFrame(
        [
            {"host": "a.example.ch", "crawl_delay_ms": 0,
             "disallow_prefixes": [], "fetched_at_iter": 0},
            {"host": "b.example.com", "crawl_delay_ms": 0,
             "disallow_prefixes": [], "fetched_at_iter": 0},
        ]
    )
    robots["crawl_delay_ms"] = robots["crawl_delay_ms"].astype("int32")
    robots["fetched_at_iter"] = robots["fetched_at_iter"].astype("int32")
    for name, pdf in [("serp_results", serp), ("fetch_responses", responses),
                      ("robots", robots)]:
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       str(d / f"{name}.parquet"))
    shutil.copy(f"{t1_dir}/images.parquet", str(d / "images.parquet"))
    return str(d)


def _crawled_iters(spark, catalog, url):
    results = catalog.read(spark, "results")
    return sorted(
        r["iter"] for r in results.filter(results.url == url).collect()
    )


def test_ttl_expired_url_redequeued_exactly_once(spark, pingpong_dir, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat_ttl"))
    run_crawl(spark, cat, pingpong_dir, CrawlConfig(iterations=3, ttl_iters=1))
    # iter0: A; iter1: B (A rediscovered, expired at it=1 under ttl=1);
    # iter2: A again — exactly once more
    assert _crawled_iters(spark, cat, URL_A) == [0, 2]
    assert _crawled_iters(spark, cat, URL_B) == [1]
    # seen table records both crawls of A
    seen = cat.read(spark, "seen")
    a_seen = sorted(
        r["seen_iter"] for r in seen.filter(seen.canonical_url == URL_A).collect()
    )
    assert a_seen == [0, 2]


def test_no_ttl_never_recrawls(spark, pingpong_dir, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat_nottl"))
    run_crawl(spark, cat, pingpong_dir, CrawlConfig(iterations=3))
    assert _crawled_iters(spark, cat, URL_A) == [0]
    assert _crawled_iters(spark, cat, URL_B) == [1]
