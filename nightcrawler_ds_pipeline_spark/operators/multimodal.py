"""Multimodal (image-payload) queries — Spark-only driver entries.

These run over the engine's own deterministic fixture tables (the
BASELINE.json ``input_hint`` shape), generated on first use at the t1 tier.
They exercise: binary-column decode via mapInPandas, phash dedup (exact +
hamming-band near-dup), PSNR verification, and the full crawl-loop snapshot.
No DuckDB oracle exists for these (binary image payloads + pandas UDFs) —
the driver records rows-only checks; exactness is covered by pytest
(tests/test_codecs.py, test_crawl_loop.py, test_images_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.registry import register


def _images(spark):
    from nightcrawler_ds_pipeline_spark.fixtures import write_fixture_parquet

    fx = write_fixture_parquet("t1")
    return spark.read.parquet(f"{fx}/images.parquet")


# binary decode via Arrow-batched mapInPandas: (w,h,phash,decode_ok) stats
def image_decode_stats(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.functions.image_udfs import decode_images

    decoded = decode_images(_images(spark))
    return (
        decoded.groupBy("fmt", "decode_ok")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.col("decode_ok")
                    & (F.col("w_decoded") == F.col("w"))
                    & (F.col("h_decoded") == F.col("h")),
                    1,
                ).otherwise(0)
            ).alias("n_dims_match"),
            F.sum(
                F.when(F.col("decode_ok") & (F.col("phash_decoded") == F.col("phash")), 1)
                .otherwise(0)
            ).alias("n_phash_match"),
        )
        .orderBy("fmt", "decode_ok")
    )


# exact phash dedup over the image corpus
def image_phash_dedup(spark, sf_dir):
    imgs = _images(spark).filter(F.col("phash") != 0)
    return (
        imgs.groupBy("phash")
        .agg(F.count("*").alias("group_size"), F.min("image_id").alias("keep_id"))
        .filter(F.col("group_size") > 1)
        .orderBy("phash")
    )


# near-dup via the Manku et al. (WWW'07, "Detecting near-duplicates for web
# crawling") block-permutation scheme: split the 64-bit phash into 8 blocks
# of 8 bits and key candidates on every C(8,2)=28 ordered block-pair (a
# 16-bit key per combo). A pair within hamming ≤ 6 touches ≤ 6 blocks, so
# ≥ 2 blocks are identical and at least one of the 28 combos matches —
# recall is COMPLETE for the ≤ 6 threshold (the old single-band top-16-bit
# key missed pairs whose differing bits fell in the key band). Confirm with
# JVM-side bit_count(xor). Still pure equi-joins: 28× exploded rows, 2^16
# key space → ~28·N²/2^16 spurious candidates on random hashes, distinct'd
# before the hamming confirm. Pigeonhole completeness is pytest-pinned
# against all-pairs brute force (test_components).
def image_phash_neardup(spark, sf_dir, max_hamming: int = 6):
    from nightcrawler_ds_pipeline_spark.functions.image_udfs import hamming64_col

    imgs = _images(spark).filter(F.col("phash") != 0)
    blocks = [
        F.shiftrightunsigned("phash", 8 * i).bitwiseAND(F.lit(255))
        for i in range(8)
    ]
    combos = []
    for i in range(8):
        for j in range(i + 1, 8):
            combos.append(
                F.struct(
                    F.lit(len(combos)).alias("combo"),
                    (blocks[i] * 256 + blocks[j]).cast("int").alias("key"),
                )
            )
    banded = imgs.select(
        "image_id", "phash", F.explode(F.array(*combos)).alias("bk")
    ).select("image_id", "phash", F.col("bk.combo").alias("combo"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.combo") == F.col("b.combo"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .select(
            F.col("a.image_id").alias("id_a"),
            F.col("b.image_id").alias("id_b"),
            F.col("a.phash").alias("phash_a"),
            F.col("b.phash").alias("phash_b"),
        )
        .distinct()  # same pair can match several combos (hamming-0 dups match all 28)
        .withColumn("hamming", hamming64_col(F.col("phash_a"), F.col("phash_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("id_a", "id_b")
    )


# real area-average image resize (thumbnailing) over the binary column
def image_resize_stats(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.functions.multimodal_udfs import resize_images

    resized = resize_images(_images(spark).select("image_id", "fmt", "bytes"))
    return (
        resized.groupBy("fmt", "resize_ok")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("thumb_mean"), 4).alias("avg_thumb_mean"),
        )
        .orderBy("fmt", "resize_ok")
    )


# audio feature extraction (codec step stubbed — no audio lib in env;
# Spark plumbing + Arrow batching real)
def audio_feature_stats(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.fixtures.multimodal import gen_audio_pdf
    from nightcrawler_ds_pipeline_spark.functions.multimodal_udfs import audio_features

    audio = spark.createDataFrame(gen_audio_pdf(200))
    feats = audio_features(audio)
    return (
        feats.groupBy("sample_rate", "decode_ok")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("rms"), 4).alias("avg_rms"),
            F.round(F.avg("duration_s"), 4).alias("avg_duration_s"),
        )
        .orderBy("sample_rate", "decode_ok")
    )


# video frame sampling (codec step stubbed — no video lib in env)
def video_frame_sample_stats(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.fixtures.multimodal import gen_video_pdf
    from nightcrawler_ds_pipeline_spark.functions.multimodal_udfs import (
        video_frame_sample,
    )

    video = spark.createDataFrame(gen_video_pdf(100))
    sampled = video_frame_sample(video, every_n=5)
    return (
        sampled.groupBy("fps", "decode_ok")
        .agg(
            F.count("*").alias("n"),
            F.sum("sampled_frames").cast("long").alias("total_sampled"),
        )
        .orderBy("fps", "decode_ok")
    )


# one full crawl iteration snapshot — the flagship loop as a driver query
@register("crawl_iteration_snapshot")
def crawl_iteration_snapshot(spark, sf_dir):
    import shutil
    import tempfile

    from nightcrawler_ds_pipeline_spark.crawl.loop import CrawlConfig, run_crawl
    from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog
    from nightcrawler_ds_pipeline_spark.fixtures import write_fixture_parquet

    fx = write_fixture_parquet("t1")
    tmp = tempfile.mkdtemp(prefix="ncds_q_cat_")
    try:
        catalog = SnapshotCatalog(tmp)
        run_crawl(spark, catalog, fx, CrawlConfig(iterations=1, max_per_host=10))
        res = catalog.read(spark, "results")
        out = res.select(
            "iter", "seq", "canonical_url", "host", "error", "decode_ok",
            "is_phash_dup",
        ).orderBy("iter", "seq")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach from tmp files
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --- composite driver queries (rows-only — binary codecs have no SQL twin) ---
# Folded so the driver's bounded sample covers every multimodal path each
# round; pytest (test_codecs/test_multimodal/test_components) pins values.
@register("image_decode_resize_stats")
def image_decode_resize_stats(spark, sf_dir):
    dec = image_decode_stats(spark, sf_dir).select(
        F.lit("decode").alias("part"), "fmt", F.col("decode_ok").alias("ok"),
        F.col("n").cast("long").alias("n"),
        F.col("n_dims_match").cast("double").alias("m1"),
        F.col("n_phash_match").cast("double").alias("m2"),
    )
    rs = image_resize_stats(spark, sf_dir).select(
        F.lit("resize").alias("part"), "fmt", F.col("resize_ok").alias("ok"),
        F.col("n").cast("long").alias("n"),
        F.col("avg_thumb_mean").cast("double").alias("m1"),
        F.lit(-1.0).alias("m2"),
    )
    return dec.unionByName(rs).orderBy("part", "fmt", "ok")


@register("image_phash_suite")
def image_phash_suite(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.operators.components import (
        image_phash_groups,
    )

    exact = image_phash_dedup(spark, sf_dir).select(
        F.lit("exact").alias("part"),
        F.col("phash").cast("string").alias("k1"),
        F.col("keep_id").alias("k2"),
        F.col("group_size").cast("long").alias("n"),
    )
    near = image_phash_neardup(spark, sf_dir).select(
        F.lit("neardup").alias("part"),
        F.col("id_a").alias("k1"),
        F.col("id_b").alias("k2"),
        F.col("hamming").cast("long").alias("n"),
    )
    groups = image_phash_groups(spark, sf_dir).select(
        F.lit("groups").alias("part"),
        F.col("image_id").alias("k1"),
        F.col("group_id").alias("k2"),
        F.lit(-1).cast("long").alias("n"),
    )
    return exact.unionByName(near).unionByName(groups).orderBy("part", "k1", "k2")


@register("av_feature_stats")
def av_feature_stats(spark, sf_dir):
    audio = audio_feature_stats(spark, sf_dir).select(
        F.lit("audio").alias("part"),
        F.col("sample_rate").cast("long").alias("rate"),
        F.col("decode_ok").alias("ok"),
        F.col("n").cast("long").alias("n"),
        F.col("avg_rms").cast("double").alias("v1"),
        F.col("avg_duration_s").cast("double").alias("v2"),
    )
    video = video_frame_sample_stats(spark, sf_dir).select(
        F.lit("video").alias("part"),
        F.col("fps").cast("long").alias("rate"),
        F.col("decode_ok").alias("ok"),
        F.col("n").cast("long").alias("n"),
        F.col("total_sampled").cast("double").alias("v1"),
        F.lit(-1.0).alias("v2"),
    )
    return audio.unionByName(video).orderBy("part", "rate", "ok")
