"""Join-strategy showcase queries over the driver's dimension tables.

The crawl engine's own joins are covered by J1-J6 (COVERAGE.md §2.3); these
two exercise the remaining join SHAPES a user of a general engine needs,
over the driver tables the crawl queries don't touch (region / nation /
customer / supplier / part):

- star join: fact ⋈ chain of small dims — every dim side must BROADCAST
  (a shuffle here would be the classic anti-pattern; the plan gate in
  tests/test_plans_curation.py asserts BroadcastHashJoin and zero
  sort-merge joins on the dim chain)
- big fact ⋈ fact equi-join (lineitem ⋈ part) — shuffle hash/sort-merge on
  the key, map-side pre-aggregation AFTER the join keyed only by the tiny
  group column.

Reference analogue: J5 config-lookup broadcast (crawl/politeness.py) is the
same plan shape at 2 tables; these pin it at depth 4 and at fact scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.registry import register
from nightcrawler_ds_pipeline_spark.operators.sqlfrags import read_table


# TPC-H Q5-shaped star join: revenue by region via customer → nation →
# region dim chain, all three dims broadcast.
@register(
    "join_star_region_revenue",
    oracle="""
    SELECT r.r_name AS region_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus <> 'X'
    GROUP BY r.r_name
    ORDER BY region_name
    """,
)
def join_star_region_revenue(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "X")
    customer = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = read_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        orders.join(
            F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
        )
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        joined.groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("region_name")
    )


# TPC-H Q14-shaped fact ⋈ dim join + conditional aggregate: promo revenue
# share per part brand. part is small enough to broadcast at any SF the
# driver ships; at a 100 TB part table the same code degrades to a
# sort-merge join on the key — no logic change.
@register(
    "join_promo_brand_share",
    oracle="""
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END), 2) AS promo_revenue,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY brand
    """,
)
def join_promo_brand_share(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), net).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(promo), 2).alias("promo_revenue"),
            F.round(F.sum(net), 2).alias("revenue"),
        )
        .orderBy("brand")
    )


# supplier-side variant exercising the last untouched table: supplier ⋈
# nation rollup (account balance by nation) — broadcast dim again.
@register(
    "join_supplier_nation_balance",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(SUM(s.s_acctbal), 2) AS total_acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation_name
    """,
)
def join_supplier_nation_balance(spark, sf_dir):
    supplier = read_table(spark, sf_dir, "supplier").select("s_nationkey", "s_acctbal")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supplier.join(
            F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"]
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("nation_name")
    )
