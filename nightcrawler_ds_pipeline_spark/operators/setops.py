"""Set / dedup / limit operators (SURVEY.md §2.6, L-family).

The reference's set ops run on Python ``set``s (helpers/utils.py:234-253),
i.e. DISTINCT semantics — ``intersect``/``union().distinct()``/``exceptAll``
-free ``except`` map exactly.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.registry import register
from nightcrawler_ds_pipeline_spark.operators.sqlfrags import read_table


# L6 — set intersection (compare_lists "intersection")
def setop_intersect(spark, sf_dir):
    a = read_table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    b = read_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    return a.intersect(b).orderBy("k")


# L6 — set difference (compare_lists "list1_only")
def setop_except(spark, sf_dir):
    # set semantics (Python set difference, utils.py:239-242) = distinct
    # left side minus membership — a left-anti join, NOT exceptAll.
    a = read_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    b = read_table(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    return a.distinct().join(b.distinct(), "k", "left_anti").orderBy("k")


# L6 — set union (compare_lists "union")
def setop_union_distinct(spark, sf_dir):
    a = read_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    b = read_table(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    return a.union(b).distinct().orderBy("k")


# L8 — drop_duplicates keep=first under a deterministic order
# (utils.py:219,228 — pandas keep='first'; determinism via explicit sort)
def setop_dedup_keep_first(spark, sf_dir):
    # NB (l_orderkey, l_linenumber) is NOT unique in the driver testdata —
    # keep=first needs a TOTAL order or the kept row is nondeterministic
    # (SURVEY §7 hard-point a); the 5-column key is verified unique.
    li = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .orderBy("l_orderkey")
    )


# L2/L3 — caps: ordered limit 200 (the reference's hard cap,
# serp_api.py:98-114) with a deterministic total order.
def setop_cap_200(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(200)
    )


# L7 — image-set dedup (s04:126-131): set() over mainImage + images[] →
# array_distinct. Expressed relationally: distinct count per key.
def setop_image_set_dedup(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.countDistinct("l_partkey").alias("n_images"))
        .orderBy("k")
    )


# --- composite driver query -------------------------------------------------
# One registered entry for the whole L-family so the round driver's bounded
# query sample always hash-checks every set op (each sub-op above remains an
# independently callable operator). Unused cells carry SENTINELS ('' / -1)
# instead of NULL: the union's sort keys must be non-null because Spark
# orders NULLS FIRST and DuckDB NULLS LAST by default — a silent row-order
# divergence under the driver's value hash.
@register(
    "setop_suite",
    oracle="""
    WITH
    intersect_ AS (
      SELECT o_orderkey AS k FROM orders
      INTERSECT SELECT l_orderkey FROM lineitem
    ),
    except_ AS (
      SELECT o_custkey AS k FROM orders
      EXCEPT SELECT user_id FROM events
    ),
    union_ AS (
      SELECT o_custkey AS k FROM orders
      UNION SELECT user_id FROM events
    ),
    keepfirst AS (
      SELECT l_orderkey, l_linenumber, l_partkey FROM (
        SELECT l_orderkey, l_linenumber, l_partkey,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber, l_partkey, l_suppkey,
                                           l_extendedprice) AS rn
        FROM lineitem
      ) WHERE rn = 1
    ),
    cap200 AS (
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 200
    ),
    imageset AS (
      SELECT l_orderkey AS k, COUNT(DISTINCT l_partkey) AS n_images
      FROM lineitem GROUP BY 1
    )
    SELECT part, CAST(k1 AS BIGINT) AS k1, CAST(k2 AS BIGINT) AS k2,
           CAST(k3 AS BIGINT) AS k3, CAST(v AS DOUBLE) AS v
    FROM (
      SELECT 'intersect' AS part, k AS k1, -1 AS k2, -1 AS k3, -1.0 AS v
        FROM intersect_
      UNION ALL
      SELECT 'except', k, -1, -1, -1.0 FROM except_
      UNION ALL
      SELECT 'union', k, -1, -1, -1.0 FROM union_
      UNION ALL
      SELECT 'keep_first', l_orderkey, l_linenumber, l_partkey, -1.0
        FROM keepfirst
      UNION ALL
      SELECT 'cap200', o_orderkey, -1, -1, o_totalprice FROM cap200
      UNION ALL
      SELECT 'image_set', k, n_images, -1, -1.0 FROM imageset
    )
    ORDER BY part, k1
    """,
)
def setop_suite(spark, sf_dir):
    def aligned(df, part, k1, k2=None, k3=None, v=None):
        return df.select(
            F.lit(part).alias("part"),
            F.col(k1).cast("long").alias("k1"),
            (F.col(k2) if k2 else F.lit(-1)).cast("long").alias("k2"),
            (F.col(k3) if k3 else F.lit(-1)).cast("long").alias("k3"),
            (F.col(v) if v else F.lit(-1.0)).cast("double").alias("v"),
        )

    out = (
        aligned(setop_intersect(spark, sf_dir), "intersect", "k")
        .unionByName(aligned(setop_except(spark, sf_dir), "except", "k"))
        .unionByName(aligned(setop_union_distinct(spark, sf_dir), "union", "k"))
        .unionByName(
            aligned(
                setop_dedup_keep_first(spark, sf_dir),
                "keep_first", "l_orderkey", "l_linenumber", "l_partkey",
            )
        )
        .unionByName(
            aligned(setop_cap_200(spark, sf_dir), "cap200", "o_orderkey", v="o_totalprice")
        )
        .unionByName(
            aligned(setop_image_set_dedup(spark, sf_dir), "image_set", "k", "n_images")
        )
    )
    # k1 is unique within each part (see sub-op docstrings) → total order
    return out.orderBy("part", "k1")
