"""S4 paginated scan: page cap + early exit on empty page."""

import pyspark.sql.functions as F

from nightcrawler_ds_pipeline_spark.operators.pagination import paginate_scan


def test_early_exit_on_empty_page(spark):
    calls = []

    def fetch_page(i):
        calls.append(i)
        n = [5, 3, 0, 7][i]  # page 2 empty → page 3 must never be fetched
        return spark.range(n).select(
            F.lit(i).alias("page"), F.col("id").alias("row")
        )

    out = paginate_scan(fetch_page, max_pages=4)
    assert calls == [0, 1, 2]
    assert out.count() == 8
    assert {r["page"] for r in out.collect()} == {0, 1}


def test_page_cap(spark):
    def fetch_page(i):
        return spark.range(2).select(F.lit(i).alias("page"), F.col("id").alias("row"))

    out = paginate_scan(fetch_page, max_pages=4)
    assert out.count() == 8  # capped at 4 pages despite never-empty source


def test_empty_first_page(spark):
    assert paginate_scan(lambda i: spark.range(0).select(F.col("id")), 4) is None


def test_fixture_race_safety(tmp_path):
    # two "processes" (sequential here) publishing the same tier must both
    # succeed and agree
    from nightcrawler_ds_pipeline_spark.fixtures import write_fixture_parquet

    a = write_fixture_parquet("t1", str(tmp_path))
    b = write_fixture_parquet("t1", str(tmp_path))
    assert a == b
    import os

    assert os.path.exists(os.path.join(a, "_COMPLETE"))
    assert not [d for d in os.listdir(tmp_path) if "staging" in d]
