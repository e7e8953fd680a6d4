"""assign_global_seq: the scalable two-pass numbering must equal the
single-window path exactly (same total order)."""

import pyspark.sql.functions as F

from nightcrawler_ds_pipeline_spark.crawl.politeness import assign_global_seq


def _mk(spark, n=5000):
    return spark.range(n).select(
        ((F.col("id") * 37) % 100 / 10.0).alias("priority"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.col("id"),
    )


def test_two_pass_equals_window(spark):
    df = _mk(spark)
    small = assign_global_seq(df)
    # force two-pass by declaring a known count above the threshold
    large = assign_global_seq(df, single_window_threshold=1, known_count=5000)
    a = {r["url_hash"]: r["seq"] for r in small.collect()}
    b = {r["url_hash"]: r["seq"] for r in large.collect()}
    assert a == b
    # dense 1..n
    seqs = sorted(a.values())
    assert seqs == list(range(1, len(seqs) + 1))
    # order respects (priority desc, url_hash asc)
    rows = sorted(
        ((r["seq"], r["priority"], r["url_hash"]) for r in small.collect())
    )
    for (s1, p1, h1), (s2, p2, h2) in zip(rows, rows[1:]):
        assert (p1 > p2) or (p1 == p2 and h1 < h2)
