"""Window / ranking operators (SURVEY.md §2.5, W0-W2).

Ranks are cast to BIGINT so schemas match the DuckDB oracle (whose
ROW_NUMBER returns BIGINT; Spark's returns INT).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.registry import register
from nightcrawler_ds_pipeline_spark.operators.sqlfrags import (
    SYNTH_CANON_CTE,
    read_table,
)

# W0 — rank-based CTR traffic model (keywords_selection.py:100-147):
# positions 1..20 get a click share; volume_i = round(share_i × volume).
from nightcrawler_ds_pipeline_spark.constants import RANK_CLICK_SHARES  # noqa: E402

_SHARES_SQL_ROWS = ", ".join(
    f"({i + 1}, {s})" for i, s in enumerate(RANK_CLICK_SHARES)
)


@register(
    "window_ctr_volume",
    oracle=f"""
    WITH shares(pos, share) AS (VALUES {_SHARES_SQL_ROWS}),
    ranked AS (
      SELECT l_orderkey, l_linenumber, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey, l_suppkey,
                                         l_extendedprice) AS pos
      FROM lineitem
    )
    SELECT r.l_orderkey, CAST(r.pos AS BIGINT) AS pos,
           ROUND(s.share * r.l_quantity * 100, 0) AS est_volume
    FROM ranked r JOIN shares s ON r.pos = s.pos
    WHERE r.pos <= 20
    ORDER BY r.l_orderkey, pos
    """,
)
def window_ctr_volume(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    shares = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(RANK_CLICK_SHARES)], ["pos", "share"]
    )
    # total order: (l_orderkey, l_linenumber) alone is not unique in the
    # driver testdata — extend the order to a verified-unique key
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    # repartition on the window key with exactly shuffle-partitions
    # partitions: the window's ENSURE_REQUIREMENTS exchange is satisfied by
    # this one (guide §2.4 — same key, same count ⇒ one exchange), and the
    # full window sort runs distributed instead of the previous plan's
    # single-task partial WindowGroupLimit sort (the source parquet is one
    # row group — scans cannot split, so map-side work ran on 1 core).
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranked = (
        li.select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_partkey",
            "l_suppkey", "l_extendedprice"
        )
        .repartition(n, "l_orderkey")
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .filter(F.col("pos") <= 20)
    )
    return (
        ranked.join(F.broadcast(shares), "pos")
        .select(
            "l_orderkey",
            "pos",
            F.round(F.col("share") * F.col("l_quantity") * 100, 0).alias("est_volume"),
        )
        .orderBy("l_orderkey", "pos")
    )


# W1 — per-host priority dequeue (north_rule): top-K per host by
# (priority desc, tiebreak asc). The oracle ties on canonical_url (DuckDB
# has no xxhash64); engine-side production code ties on url_hash — both are
# total orders, and this query pins the shared semantics.
@register(
    "window_host_dequeue",
    oracle=SYNTH_CANON_CTE
    + """
    SELECT host, canonical_url, priority,
           CAST(rk AS BIGINT) AS rank_in_host
    FROM (
      SELECT host, canonical_url, priority,
             ROW_NUMBER() OVER (PARTITION BY host
                                ORDER BY priority DESC, canonical_url) AS rk
      FROM (SELECT DISTINCT host, canonical_url, priority FROM urls)
    ) WHERE rk <= 5
    ORDER BY host, rank_in_host
    """,
)
def window_host_dequeue(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.functions.urls import canonicalize_udf
    from nightcrawler_ds_pipeline_spark.operators.sqlfrags import synth_urls

    # the source parquet opens as a handful of input splits; without an
    # explicit spread the per-row canonicalize UDF runs on 1-4 tasks (same
    # hazard as scaling._fetched_stage — AQE coalesces by bytes, and these
    # rows are narrow). Repartition BEFORE the UDF so it uses every core.
    urls = synth_urls(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    canon = (
        urls.withColumn("canonical_url", canonicalize_udf(F.col("url")))
        .withColumn(
            "host", F.lower(F.parse_url(F.col("canonical_url"), F.lit("HOST")))
        )
        .select("host", "canonical_url", "priority")
        .distinct()
    )
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("canonical_url").asc()
    )
    return (
        canon.withColumn("rank_in_host", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_host") <= 5)
        .orderBy("host", "rank_in_host")
    )


# W2 — global result ranking hook (s11 stub; real ordering is A2's
# volume-desc): dense_rank over a configurable key.
@register(
    "window_global_rank",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rank
    FROM (
      SELECT o_orderkey, o_totalprice,
             DENSE_RANK() OVER (ORDER BY o_totalprice DESC) AS rk
      FROM orders
    ) WHERE rk <= 10
    ORDER BY rank, o_orderkey
    """,
)
def window_global_rank(spark, sf_dir):
    # Scale-safe top-k by dense rank: dense_rank ≤ 10 ⇔ o_totalprice is one
    # of the 10 largest DISTINCT values. Compute the 10th-largest distinct
    # value (distinct on ONE column + TakeOrderedAndProject — never a global
    # sort of the table), broadcast the 1-row cutoff, filter survivors, and
    # only THEN rank — the window runs over the tiny survivor set, keyed by
    # a derived partition so no unpartitioned window over the full table.
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    cutoff = (
        orders.select("o_totalprice")
        .distinct()
        .orderBy(F.col("o_totalprice").desc())
        .limit(10)
        .agg(F.min("o_totalprice").alias("__cut"))
    )
    survivors = orders.join(F.broadcast(cutoff)).filter(
        F.col("o_totalprice") >= F.col("__cut")
    )
    # survivors hold ≤10 distinct prices: rank = count of distinct prices
    # strictly greater — a windowless dense_rank over a bounded value set
    vals = survivors.select("o_totalprice").distinct()
    higher = vals.select(F.col("o_totalprice").alias("__hi"))
    ranks = (
        vals.join(F.broadcast(higher), F.col("__hi") > F.col("o_totalprice"), "left")
        .groupBy("o_totalprice")
        .agg((F.count("__hi") + 1).cast("long").alias("rank"))
    )
    return (
        survivors.join(F.broadcast(ranks), "o_totalprice")
        .filter(F.col("rank") <= 10)
        .select("o_orderkey", "o_totalprice", "rank")
        .orderBy("rank", "o_orderkey")
    )


# Top-K per group, the generic form of W1 (guide: row_number ≤ K) — kept as
# a separate named operator because the reference's L4 top-20-per-keyword
# (keywords_selection.py:145) is exactly this.
@register(
    "window_topk_per_group",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_extendedprice, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT l_suppkey, l_orderkey, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                ORDER BY l_extendedprice DESC, l_orderkey,
                                         l_linenumber, l_partkey) AS rk
      FROM lineitem
    ) WHERE rk <= 3
    ORDER BY l_suppkey, rk
    """,
)
def window_topk_per_group(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"),
        F.col("l_linenumber"), F.col("l_partkey")
    )
    return (
        li.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("l_suppkey", "l_orderkey", "l_extendedprice", "rk")
        .orderBy("l_suppkey", "rk")
    )
