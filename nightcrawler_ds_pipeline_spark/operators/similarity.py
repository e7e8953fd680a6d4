"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

- brute-force cosine top-k (the exactness baseline): JVM-side
  ``zip_with``/``aggregate`` dot products — no Python in the loop
- LSH-bucketed ANN (the scale path): random-hyperplane signs → bucket join,
  so only same-bucket pairs are scored. Spark-only (the hyperplane matrix is
  a broadcast numpy artifact); exactness vs brute force is checked in pytest
  via recall, and the driver records a rows-only check.
- embedding cosine near-dup pairs (dedup by semantic similarity)

Cosines are computed in float64 after an explicit element cast in BOTH
engines (DuckDB ``CAST(embedding AS DOUBLE[])``), so the sequential
left-to-right summation yields bit-identical IEEE results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nightcrawler_ds_pipeline_spark.registry import register
from nightcrawler_ds_pipeline_spark.operators.sqlfrags import read_table


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


_COS_DUCK = (
    "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
)


# brute-force cosine top-k for a bounded query set — the ANN ground truth
@register(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_COS_DUCK} AS cos
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < 5
    )
    SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rank,
           ROUND(cos, 6) AS cosine
    FROM (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rk
      FROM pairs
    ) WHERE rk <= 10
    ORDER BY query_id, rank
    """,
)
def sim_topk_bruteforce(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    # spread the bounded query side before the nested-loop join — same
    # single-scan-task hazard as dedup_embedding_cosine_pairs above
    q = (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    pairs = (
        q.crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", _dot(F.col("qe"), F.col("ce")) / (_norm(F.col("qe")) * _norm(F.col("ce"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


# embedding-cosine near-duplicate pairs (semantic dedup)
def dedup_embedding_cosine_pairs(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    # the cross join is a BroadcastNestedLoopJoin whose parallelism is the
    # LEFT side's partitioning — the one-row-group source parquet scans as
    # a single task, so all ~45k interpreted higher-order-function dot
    # products ran on one core. Spread the bounded left side first
    # (guide §2: distribute the map side). 1.9 s → 0.7 s at sf0.1.
    n = spark.sparkContext.defaultParallelism
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")
    ).repartition(n)
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        pairs.withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= 0.9)
        .select("id_a", "id_b", F.round("cosine_raw", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


# LSH-bucketed ANN — the 100TB path: multi-table random-hyperplane LSH.
# L independent tables of K hyperplanes each; a pair is a candidate if it
# collides in ANY table (union → recall compounds across tables while each
# join stays a cheap equi-join on (table, bucket) — never a cross join).
NUM_TABLES = 16
PLANES_PER_TABLE = 6  # ANN top-k: coarse buckets (recall on ~θ≈60° pairs)
# semantic dedup targets cos ≥ 0.9 (θ ≤ 25.8°): K=10 keeps per-pair recall
# ≈ 1−(1−0.856^10)^16 ≈ 0.98 while random near-orthogonal pairs collide at
# only 16·2⁻¹⁰ ≈ 1.6% — ~15× fewer candidates to exact-score than K=6.
# LSH K must match the target threshold; one size does not fit both uses.
DEDUP_PLANES_PER_TABLE = 10
EMBED_DIM = 64


def _hyperplanes(planes_per_table: int = PLANES_PER_TABLE) -> np.ndarray:
    return np.random.default_rng(42).standard_normal(
        (NUM_TABLES, planes_per_table, EMBED_DIM)
    )


def lsh_buckets_udf(spark, planes_per_table: int = PLANES_PER_TABLE):
    """Arrow-batched pandas UDF: embedding → its L bucket ids (one per
    hyperplane table; bucket id = table·2^K + sign-pattern)."""
    planes = spark.sparkContext.broadcast(_hyperplanes(planes_per_table))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(embs: pd.Series) -> pd.Series:
        mat = np.vstack(embs.values).astype(np.float64)  # (n, d)
        p = planes.value  # (L, K, d)
        signs = np.einsum("nd,lkd->nlk", mat, p) > 0  # (n, L, K)
        weights = 1 << np.arange(planes_per_table)
        vals = (signs * weights).sum(axis=2)  # (n, L)
        # disambiguate tables: bucket id = table*2^K + local bucket
        vals = vals + (np.arange(NUM_TABLES) << planes_per_table)
        return pd.Series(list(vals.astype(np.int32)))

    return buckets


def embedding_lsh_pairs(
    spark, emb: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Scale-safe semantic near-dup pairs: hyperplane-LSH bucket equi-join
    (never a crossJoin), exact cosine only on same-bucket candidates.

    With cos ≥ 0.9 (θ ≤ 25.8°) the per-table collision probability at
    K=10 is (1−θ/π)^K ≈ 0.21, so missing ALL L=16 tables happens with
    probability (1−0.21)^16 ≈ 0.02 — recall ≈ 0.98 by construction
    (verified ≥0.9 against the exact all-pairs oracle in
    tests/test_similarity_recall.py), while random near-orthogonal pairs
    collide ~15× less often than at the ANN path's K=6 — the exact-scoring
    stage sees ~1.6% of all pairs instead of ~23%.
    """
    buckets = lsh_buckets_udf(spark, planes_per_table=DEDUP_PLANES_PER_TABLE)
    # bucket join + cross-table union on BARE IDS (16 B/row): a pair that
    # collides in k of the L tables would otherwise drag 2×64 floats
    # through the shuffle k times; embeddings join back AFTER the distinct,
    # exactly once per surviving pair (measured ~2× on the sf0.1 bench).
    bucketed = emb.select("vec_id", F.explode(buckets(F.col("embedding"))).alias("bucket"))
    a = bucketed.select(F.col("vec_id").alias("id_a"), "bucket")
    b = bucketed.select(F.col("vec_id").alias("id_b"), "bucket")
    pair_ids = (
        a.join(b, "bucket")  # equi-join on (table ⊕ bucket)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()  # union across tables
    )
    # norms precomputed ONCE per vector (n rows), not per candidate pair
    # (the dot is 64 fused ops/pair; two per-pair norms would double it)
    ea = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
        _norm(F.col("embedding")).alias("na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
        _norm(F.col("embedding")).alias("nb"),
    )
    cand = pair_ids.join(ea, "id_a").join(eb, "id_b")
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        cand.withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= threshold)
        .select("id_a", "id_b", F.round("cosine_raw", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


# the 100TB semantic-dedup path: same output shape as the exact
# dedup_embedding_cosine_pairs (which stays as its bounded recall oracle),
# but candidates come from the LSH bucket join — no all-pairs anywhere.
# Oracle: the exact all-pairs ground truth over the FULL table. The
# hyperplanes are seed-fixed, so LSH-vs-exact equality on the driver data
# is DETERMINISTIC, and it holds today because the driver embeddings
# contain no pairs with cos ≥ 0.9 at any SF (verified; max off-diagonal
# cosine ≈ 0.6) — the oracle pins that emptiness plus the no-false-
# positives direction. If future testdata plants qualifying pairs, each is
# missed with p ≈ 0.02 at K=10 (0.79^16), so this oracle would need a
# re-check then; recall on data WITH planted near-dups is pinned ≥0.9 in
# tests/test_similarity_recall.py either way.
def dedup_embedding_lsh_pairs(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    return embedding_lsh_pairs(spark, emb, threshold=0.9)


# IVF ANN — the second scale path (task brief: "an IVF or LSH-bucketed
# variant"): k-means coarse quantizer (pyspark.ml, seeded), inverted lists
# keyed by cluster id, queries probe their NPROBE nearest centroids and
# score exact cosine only inside those lists. All joins are equi-joins on
# the cluster id; the only broadcast is the k×d centroid table (model
# metadata, a few KB).
IVF_CLUSTERS = 16
IVF_NPROBE = 8


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_topk(
    spark,
    emb: DataFrame,
    num_queries: int = 5,
    k: int = 10,
    n_clusters: int = IVF_CLUSTERS,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.withColumn("vec", array_to_vector(F.col("embedding")))
    # maxIter=5: the coarse quantizer only needs rough Voronoi cells —
    # recall comes from probing nprobe cells, not centroid polish, and each
    # extra Lloyd iteration is a full job round-trip (measured ~3.4 → ~2.2 s
    # at sf0.1 with recall unchanged on the planted-dup suite)
    model = KMeans(
        k=n_clusters, seed=42, maxIter=5, featuresCol="vec",
        predictionCol="cluster"
    ).fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "embedding", "cluster")
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, centroid array<double>",
    )
    q = assigned.filter(F.col("vec_id") < num_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    w_c = Window.partitionBy("query_id").orderBy(F.col("dist"), F.col("cluster"))
    probes = (
        q.crossJoin(F.broadcast(cents))  # 5 × k rows — the centroid table
        .withColumn("dist", _sq_dist(F.col("qe"), F.col("centroid")))
        .withColumn("__r", F.row_number().over(w_c))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "qe", "cluster")
    )
    cand = (
        probes.join(assigned, "cluster")  # equi-join on the inverted-list key
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "qe",
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("ce"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    pairs = cand.withColumn(
        "cos", _dot(F.col("qe"), F.col("ce")) / (_norm(F.col("qe")) * _norm(F.col("ce")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


def sim_ann_ivf(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    return ivf_topk(spark, emb)


def sim_ann_lsh(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    buckets = lsh_buckets_udf(spark)
    # same narrow-shuffle shape as embedding_lsh_pairs: bucket-join bare
    # ids, distinct across tables, then join embeddings back once
    bucketed = emb.select(
        "vec_id", F.explode(buckets(F.col("embedding"))).alias("bucket")
    )
    q = bucketed.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "bucket"
    )
    c = bucketed.select(F.col("vec_id").alias("neighbor_id"), "bucket")
    pair_ids = (
        q.join(c, "bucket")  # equi-join on (table ⊕ bucket), never cross
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()  # union across tables
    )
    qe = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm(F.col("embedding")).alias("nq"),
    )
    ce = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm(F.col("embedding")).alias("nc"),
    )
    cand = pair_ids.join(F.broadcast(qe.filter(F.col("query_id") < 5)), "query_id").join(
        ce, "neighbor_id"
    )
    pairs = cand.withColumn(
        "cos", _dot(F.col("qe"), F.col("ce")) / (F.col("nq") * F.col("nc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


# --- composite driver queries ------------------------------------------------
# Exact-bounded + LSH semantic-dedup pairs fold into one ORACLED entry (both
# return (id_a,id_b,cosine); the LSH part's exact-all-pairs oracle validity
# is argued at dedup_embedding_lsh_pairs' docstring), and the two ANN paths
# fold into one rows-only entry (ANN != exact top-k on the driver's
# unstructured embeddings — recall pinned in tests/test_similarity_recall.py).
@register(
    "dedup_embedding_pairs",
    oracle=f"""
    SELECT part, id_a, id_b, cosine FROM (
      SELECT 'exact300' AS part, a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND({_COS_DUCK}, 6) AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE a.vec_id < 300 AND b.vec_id < 300 AND {_COS_DUCK} >= 0.9
      UNION ALL
      SELECT 'lsh', a.vec_id, b.vec_id, ROUND({_COS_DUCK}, 6)
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE {_COS_DUCK} >= 0.9
    )
    ORDER BY part, id_a, id_b
    """,
)
def dedup_embedding_pairs(spark, sf_dir):
    exact = dedup_embedding_cosine_pairs(spark, sf_dir).select(
        F.lit("exact300").alias("part"), "id_a", "id_b", "cosine"
    )
    lsh = dedup_embedding_lsh_pairs(spark, sf_dir).select(
        F.lit("lsh").alias("part"), "id_a", "id_b", "cosine"
    )
    return exact.unionByName(lsh).orderBy("part", "id_a", "id_b")


@register("sim_ann_suite")  # rows-only: see composite docnote above
def sim_ann_suite(spark, sf_dir):
    lsh = sim_ann_lsh(spark, sf_dir).select(
        F.lit("lsh").alias("part"), "query_id", "neighbor_id", "rank", "cosine"
    )
    ivf = sim_ann_ivf(spark, sf_dir).select(
        F.lit("ivf").alias("part"), "query_id", "neighbor_id", "rank", "cosine"
    )
    return lsh.unionByName(ivf).orderBy("part", "query_id", "rank")
