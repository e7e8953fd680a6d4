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
@register(
    "setop_intersect",
    oracle="""
    SELECT o_orderkey AS k FROM orders
    INTERSECT
    SELECT l_orderkey FROM lineitem
    ORDER BY k
    """,
)
def setop_intersect(spark, sf_dir):
    a = read_table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    b = read_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    return a.intersect(b).orderBy("k")


# L6 — set difference (compare_lists "list1_only")
@register(
    "setop_except",
    oracle="""
    SELECT o_custkey AS k FROM orders
    EXCEPT
    SELECT user_id FROM events
    ORDER BY k
    """,
)
def setop_except(spark, sf_dir):
    # set semantics (Python set difference, utils.py:239-242) = distinct
    # left side minus membership — a left-anti join, NOT exceptAll.
    a = read_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    b = read_table(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    return a.distinct().join(b.distinct(), "k", "left_anti").orderBy("k")


# L6 — set union (compare_lists "union")
@register(
    "setop_union_distinct",
    oracle="""
    SELECT o_custkey AS k FROM orders
    UNION
    SELECT user_id FROM events
    ORDER BY k
    """,
)
def setop_union_distinct(spark, sf_dir):
    a = read_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    b = read_table(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    return a.union(b).distinct().orderBy("k")


# L8 — drop_duplicates keep=first under a deterministic order
# (utils.py:219,228 — pandas keep='first'; determinism via explicit sort)
@register(
    "setop_dedup_keep_first",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey
    FROM (
      SELECT l_orderkey, l_linenumber, l_partkey,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey, l_suppkey,
                                         l_extendedprice) AS rn
      FROM lineitem
    ) WHERE rn = 1
    ORDER BY l_orderkey
    """,
)
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
@register(
    "setop_cap_200",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 200
    """,
)
def setop_cap_200(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(200)
    )


# L7 — image-set dedup (s04:126-131): set() over mainImage + images[] →
# array_distinct. Expressed relationally: distinct count per key.
@register(
    "setop_image_set_dedup",
    oracle="""
    SELECT l_orderkey AS k, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_images
    FROM lineitem GROUP BY 1 ORDER BY k
    """,
)
def setop_image_set_dedup(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.countDistinct("l_partkey").alias("n_images"))
        .orderBy("k")
    )
