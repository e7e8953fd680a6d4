"""Shared SQL fragments for the DuckDB oracle + matching Spark builders.

The driver's testdata has no URL column, so URL-shaped operators run over a
deterministic URL corpus synthesized from ``orders`` with expressions both
engines compute identically (pure string concat of integers — no
float-to-string casts, which differ between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Deterministic synth-URL corpus: ~25% utm-tracking, ~25% srsltid, rest clean.
SYNTH_URLS_CTE = """
WITH urls AS (
  SELECT
    concat(
      'https://shop', CAST(o_custkey % 50 AS VARCHAR), '.example.com/p/',
      CAST(o_orderkey AS VARCHAR),
      CASE
        WHEN o_orderkey % 4 = 0 THEN '?utm_source=serp&aa=bb'
        WHEN o_orderkey % 4 = 1 THEN '?srsltid=XYZ'
        ELSE ''
      END
    ) AS url,
    o_totalprice AS priority,
    o_orderkey,
    o_custkey
  FROM orders
)
"""

# canonical form of the synth corpus (what remove_tracking_parameters yields):
# utm_* params dropped (aa=bb kept), srsltid dropped entirely.
SYNTH_CANON_CTE = """
WITH urls AS (
  SELECT
    concat(
      'https://shop', CAST(o_custkey % 50 AS VARCHAR), '.example.com/p/',
      CAST(o_orderkey AS VARCHAR),
      CASE WHEN o_orderkey % 4 = 0 THEN '?aa=bb' ELSE '' END
    ) AS canonical_url,
    concat('shop', CAST(o_custkey % 50 AS VARCHAR), '.example.com') AS host,
    o_totalprice AS priority,
    o_orderkey,
    o_custkey
  FROM orders
)
"""


def synth_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of SYNTH_URLS_CTE."""
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
        F.col("o_custkey"),
    )


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
