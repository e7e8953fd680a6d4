"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``nightcrawler_ds_pipeline_spark`` (see SURVEY.md).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def _synth_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic URL corpus synthesized from the orders table — used to
    exercise the crawl operator stack on driver testdata (both Spark and the
    DuckDB oracle can compute the same string expressions)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.select(
        F.concat(
            F.lit("https://shop"),
            (F.col("o_custkey") % 50).cast("string"),
            F.lit(".example.com/p/"),
            F.col("o_orderkey").cast("string"),
            F.when(F.col("o_orderkey") % 4 == 0, F.lit("?utm_source=serp&aa=bb"))
            .when(F.col("o_orderkey") % 4 == 1, F.lit("?srsltid=XYZ"))
            .otherwise(F.lit("")),
        ).alias("url"),
        F.col("o_totalprice").alias("priority"),
        F.col("o_orderkey"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the frontier dequeue pipeline on sf0.001 — canonicalize
    synthesized URLs, dedup by url_hash, per-host politeness top-K in
    deterministic (priority desc, url_hash asc) crawl order."""
    from pyspark.sql import Window

    from nightcrawler_ds_pipeline_spark.functions.urls import with_canonical

    urls = _synth_urls(spark, SF0001)
    canon = with_canonical(urls, "url")
    w_dedup = Window.partitionBy("url_hash").orderBy(F.col("priority").desc())
    frontier = (
        canon.withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    w_host = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("url_hash").asc()
    )
    return (
        frontier.withColumn("rank_in_host", F.row_number().over(w_host))
        .filter(F.col("rank_in_host") <= 5)
        .select("host", "canonical_url", "url_hash", "priority", "rank_in_host")
        .orderBy("host", "rank_in_host")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from nightcrawler_ds_pipeline_spark.registry import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() key (same column aliases)."""
    from nightcrawler_ds_pipeline_spark.registry import build_oracle_sql

    return build_oracle_sql()
