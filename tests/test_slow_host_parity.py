"""Regression (code-review findings): hosts with crawl_delay_ms > window_ms
must accrue tokens across empty iterations and eventually be crawled — and
the Spark loop must stay in exact parity with the oracle in that regime
(budget clamp 0, accrual-only iterations, error-response outlinks)."""

import shutil

import pyspark.sql.functions as F

from nightcrawler_ds_pipeline_spark.crawl.loop import CrawlConfig, run_crawl
from nightcrawler_ds_pipeline_spark.crawl.reference_crawl_oracle import (
    run_crawl_oracle,
)
from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog
from nightcrawler_ds_pipeline_spark.functions.urls import canonicalize


def _mk_fixtures(spark, t1_dir, out_dir):
    """Tiny corpus: one slow host (delay 15000 > window 10000), one normal
    host; one error response WITH outlinks (must NOT become edges)."""
    urls_slow = [f"https://slow.example.com/p/{i}" for i in range(4)]
    urls_fast = [f"https://fast.example.com/p/{i}" for i in range(4)]
    serp = spark.createDataFrame(
        [("kw", "GOOGLE", i + 1, u, None, None, float(100 - i), None, None)
         for i, u in enumerate(urls_slow + urls_fast)],
        "keyword string, offer_root string, position int, url string, "
        "image_url string, keyword_enriched string, keyword_volume double, "
        "keyword_language string, keyword_location string",
    )
    responses = spark.createDataFrame(
        [
            # error row WITH outlinks — a partial fetch; its links must not crawl
            (urls_fast[0], True, None, None, ["https://fast.example.com/p/99"], 0.1),
            (urls_fast[1], False, "P1", "img://img000000000000",
             ["https://fast.example.com/p/2"], 0.2),
            (urls_slow[0], False, "P2", "img://img000000000001", [], 0.3),
            (urls_slow[1], False, "P3", "img://img000000000002", [], 0.3),
        ],
        "url string, error boolean, product_name string, main_image_url string, "
        "outlinks array<string>, seconds_taken double",
    ).select(
        "url", "error", "product_name",
        F.lit(None).cast("string").alias("product_price"),
        F.lit(None).cast("string").alias("currency_raw"),
        F.lit(None).cast("string").alias("description"),
        F.lit(0.5).alias("probability"),
        "main_image_url",
        F.array().cast("array<string>").alias("image_urls"),
        F.lit(None).cast("binary").alias("http_response_body"),
        "seconds_taken", "outlinks",
    )
    robots = spark.createDataFrame(
        [("slow.example.com", 15_000, [], 0), ("fast.example.com", 0, [], 0)],
        "host string, crawl_delay_ms int, disallow_prefixes array<string>, "
        "fetched_at_iter int",
    )
    serp.write.mode("overwrite").parquet(f"{out_dir}/serp_results.parquet")
    responses.write.mode("overwrite").parquet(f"{out_dir}/fetch_responses.parquet")
    robots.write.mode("overwrite").parquet(f"{out_dir}/robots.parquet")
    shutil.copy(f"{t1_dir}/images.parquet", f"{out_dir}/images.parquet")
    return serp, responses, robots


def test_slow_host_accrues_and_matches_oracle(spark, t1_dir, tmp_path):
    fx = str(tmp_path / "fx")
    serp, responses, robots = _mk_fixtures(spark, t1_dir, fx)
    cfg = CrawlConfig(iterations=6, max_per_host=10, window_ms=10_000)
    catalog = SnapshotCatalog(str(tmp_path / "cat"))
    run_crawl(spark, catalog, fx, cfg)

    results = catalog.read(spark, "results")
    # the slow host (budget floor 0 in iter 0, accrual after) IS crawled
    slow = results.filter(F.col("host") == "slow.example.com")
    assert slow.count() > 0
    # iter 0 must dequeue 0 slow-host urls (10000/15000 floors to 0)
    assert slow.filter(F.col("iter") == 0).count() == 0
    # the error response's outlinks never got crawled
    assert results.filter(F.col("url") == "https://fast.example.com/p/99").count() == 0
    # the good response's outlink DID get crawled (already-seeded url — fine
    # either way; just ensure no crash) — now full parity:
    serp_rows = [r.asDict() for r in serp.collect()]
    resp_rows = {r["url"]: r.asDict() for r in responses.collect()}
    robots_rows = [r.asDict() for r in robots.collect()]
    all_urls = [r["url"] for r in serp_rows] + [
        l for v in resp_rows.values() for l in (v.get("outlinks") or [])
    ]
    cus = sorted({canonicalize(u) for u in all_urls})
    hmap = {
        r["cu"]: r["h"]
        for r in spark.createDataFrame([(c,) for c in cus], "cu string")
        .select("cu", F.xxhash64("cu").alias("h"))
        .collect()
    }
    oracle = run_crawl_oracle(
        serp_rows, resp_rows, robots_rows, hmap,
        iterations=cfg.iterations, window_ms=cfg.window_ms,
        max_per_host=cfg.max_per_host,
        outlink_priority_decay=cfg.outlink_priority_decay,
    )
    spark_order = sorted(
        (r["iter"], r["seq"], r["url_hash"])
        for r in results.select("iter", "seq", "url_hash").collect()
    )
    assert spark_order == sorted(oracle.crawl_order)
    seen = {r["url_hash"] for r in catalog.read(spark, "seen").collect()}
    assert seen == oracle.seen
