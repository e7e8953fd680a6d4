"""Fetch stage: fixture-backed "web" + vectorized image decode.

In production this stage is `mapInPandas` issuing batched HTTP requests with
bounded retries, returning error rows instead of raising (reference:
s04_zyte.py:53-92 — error dicts at 83-90; retries serp_api.py:73-96). In
this sandbox the web is the deterministic ``fetch_responses`` fixture table,
so the fetch is an equi-join on ``url`` (the reference correlates the same
pairing positionally at s04_zyte.py:110-114 — an implicit equi-join). The
dequeued batch is politeness-bounded (hosts × budget), i.e. tiny relative
to the response corpus, so we broadcast the batch side.

Image payloads arrive as ``img://<image_id>`` references into the
BASELINE.json-shaped ``images`` table; decode + phash run in one
``mapInPandas`` pass (Arrow batches, no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.functions.image_udfs import decode_images


def fetch_batch(
    batch: DataFrame,
    responses: DataFrame,
    images: DataFrame,
) -> DataFrame:
    """Join the dequeued batch to fixture responses, resolve image bytes,
    decode, and compute phash. Missing response → error row (never drop —
    the seen set still records the attempt)."""
    resp = responses.select(
        "url",
        F.col("error").alias("fetch_error"),
        "product_name",
        "probability",
        "main_image_url",
        "outlinks",
        "seconds_taken",
    )
    joined = batch.hint("broadcast").join(resp, "url", "left")
    joined = joined.withColumn(
        "error", F.coalesce(F.col("fetch_error"), F.lit(True))
    ).drop("fetch_error")

    # img://<image_id> → image_id; non-image or absent → null
    joined = joined.withColumn(
        "image_id",
        F.when(
            F.col("main_image_url").startswith("img://"),
            F.substring(F.col("main_image_url"), 7, 1_000),
        ),
    )

    img = images.select(
        F.col("image_id"),
        F.col("bytes"),
        F.col("fmt"),
        F.col("caption"),
        F.col("phash").alias("phash_stored"),
        F.col("w").alias("w_stored"),
        F.col("h").alias("h_stored"),
    )
    with_bytes = joined.join(img, "image_id", "left")

    decoded = decode_images(with_bytes, bytes_col="bytes")
    # Final row shape: keep decoded truth; drop the heavy binary column
    # immediately after decode so it never enters a shuffle (SURVEY.md §4
    # column-pruning note).
    return (
        decoded.drop("bytes")
        .withColumnsRenamed(
            {"w_decoded": "w", "h_decoded": "h", "phash_decoded": "phash"}
        )
        .withColumn("caption", F.col("caption"))
    )
