"""Exact-resume: a crash mid-iteration (snapshots written, lineage not)
must roll back cleanly; the resumed run must equal an uninterrupted run."""

import pyspark.sql.functions as F

from nightcrawler_ds_pipeline_spark.crawl.loop import CrawlConfig, run_crawl
from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog


def _final_state(spark, catalog):
    res = catalog.read(spark, "results")
    seen = catalog.read(spark, "seen")
    order = sorted(
        (r["iter"], r["seq"], r["url_hash"])
        for r in res.select("iter", "seq", "url_hash").collect()
    )
    seen_set = sorted(r["url_hash"] for r in seen.select("url_hash").collect())
    return order, seen_set


def test_resume_after_simulated_crash(spark, t1_dir, tmp_path):
    cfg = CrawlConfig(iterations=3, max_per_host=10, window_ms=10_000)

    # clean uninterrupted run
    cat_a = SnapshotCatalog(str(tmp_path / "a"))
    run_crawl(spark, cat_a, t1_dir, cfg)
    golden = _final_state(spark, cat_a)

    # interrupted run: stop after iteration 0, then simulate a crash during
    # iteration 1 — some snapshots committed but lineage (the finalizer) not
    cat_b = SnapshotCatalog(str(tmp_path / "b"))
    run_crawl(spark, cat_b, t1_dir, CrawlConfig(iterations=1, max_per_host=10, window_ms=10_000))
    junk = spark.range(7).select(
        F.lit(1).cast("int").alias("iter"),
        (F.col("id") + 1).alias("seq"),
        F.lit("https://junk").alias("url"),
        F.lit("https://junk").alias("canonical_url"),
        F.col("id").alias("url_hash"),
        F.lit("junk.host").alias("host"),
        F.lit(False).alias("error"),
        F.lit(None).cast("string").alias("image_id"),
        F.lit(None).cast("int").alias("w"),
        F.lit(None).cast("int").alias("h"),
        F.lit(None).cast("string").alias("fmt"),
        F.lit(None).cast("string").alias("caption"),
        F.lit(None).cast("long").alias("phash"),
        F.lit(False).alias("decode_ok"),
        F.lit(False).alias("is_phash_dup"),
    )
    cat_b.write(junk, "results", mode="append", meta={"iter": 1})  # orphan
    cat_b.write(junk.select("url_hash", F.col("url").alias("canonical_url"),
                            F.lit(1).cast("int").alias("seen_iter")),
                "seen", mode="append", meta={"iter": 1})  # orphan

    # resume: iteration 1 must be recomputed from committed state only, and
    # the orphan snapshots must be PHYSICALLY rolled back (no junk filter —
    # without the rollback the orphan rows would duplicate forever)
    out = run_crawl(spark, cat_b, t1_dir, cfg)
    assert out["start_iter"] == 1

    res = cat_b.read(spark, "results")
    assert res.filter(F.col("url") == "https://junk").count() == 0
    order = sorted(
        (r["iter"], r["seq"], r["url_hash"])
        for r in res.select("iter", "seq", "url_hash").collect()
    )
    assert order == golden[0]
    # seen table also clean of orphans
    seen = cat_b.read(spark, "seen")
    assert seen.count() == seen.select("url_hash").distinct().count()


def test_resume_across_bloom_partition_upgrade(spark, tmp_path, t1_dir):
    """A catalog written with one Bloom modulus must resume cleanly under a
    different bloom_partitions config (engine-default upgrade): sketches
    rebuild from the seen table; results equal an uninterrupted run."""
    from nightcrawler_ds_pipeline_spark.crawl.loop import CrawlConfig, run_crawl
    from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog

    upgraded = SnapshotCatalog(str(tmp_path / "up"))
    run_crawl(spark, upgraded, t1_dir,
              CrawlConfig(iterations=2, bloom_partitions=16))
    run_crawl(spark, upgraded, t1_dir,
              CrawlConfig(iterations=4, bloom_partitions=32))

    pure = SnapshotCatalog(str(tmp_path / "pure"))
    run_crawl(spark, pure, t1_dir,
              CrawlConfig(iterations=4, bloom_partitions=32))

    cols = ["iter", "seq", "url_hash"]
    got = sorted(tuple(r) for r in upgraded.read(spark, "results").select(*cols).collect())
    want = sorted(tuple(r) for r in pure.read(spark, "results").select(*cols).collect())
    assert got == want
    # and the stored sketches now carry the new modulus
    mods = {int(r[0]) for r in upgraded.read(spark, "bloom").select("num_partitions").collect()}
    assert mods == {32}
