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


# Above this many dequeued rows the batch-side broadcast is no longer safe
# (keys alone would be ~60 MB/1M rows; the politeness budget ordinarily keeps
# iterations far below it) — fall back to the AQE-sized shuffle join.
BROADCAST_BATCH_MAX = 1_000_000


def fetch_batch(
    batch: DataFrame,
    responses: DataFrame,
    images: DataFrame,
    backend: str = "zyte",
    batch_count: int | None = None,
) -> DataFrame:
    """Join the dequeued batch to fixture responses, resolve image bytes,
    decode, and compute phash. Missing response → error row (never drop —
    the seen set still records the attempt). ``backend`` selects the
    response adapter (S8): zyte-shaped rows pass through, diffbot-shaped
    rows are normalized column-algebraically (crawl/backends.py)."""
    from nightcrawler_ds_pipeline_spark.crawl.backends import normalize_responses

    responses = normalize_responses(responses, backend)
    resp = responses.select(
        "url",
        F.col("error").alias("fetch_error"),
        "product_name",
        "probability",
        "main_image_url",
        "outlinks",
        "seconds_taken",
    )
    # left join keeps every dequeued row (missing response → error row).
    # When the caller proves the batch is small (``batch_count``, which the
    # crawl loop always knows from its dequeue count), shrink resp to the
    # batch's URLs with a broadcast semi-join FIRST (guide §3.2: reduce the
    # big side before it shuffles); the surviving resp side is ≤ |batch|
    # rows and broadcasts, so the dequeued rows never shuffle at all.
    # Unknown or over-threshold batch sizes keep the AQE-sized shuffle join
    # — a forced broadcast of an unbounded dequeue would OOM at 10^10.
    small_batch = batch_count is not None and batch_count <= BROADCAST_BATCH_MAX
    if small_batch:
        resp = resp.join(
            F.broadcast(batch.select("url").distinct()), "url", "left_semi"
        )
        joined = batch.join(F.broadcast(resp), "url", "left")
    else:
        joined = batch.join(resp, "url", "left")
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

    # Decode each DISTINCT image once, at the scan — the binary payload
    # never enters a shuffle. Joining bytes onto the batch first was
    # measured at 3× the whole stage cost (4 GB of bytes through the join
    # shuffle + repartition + Arrow). Instead:
    #   batch keys (small) --broadcast semi-join--> images scan (narrow)
    #   → decode (bytes cross Arrow once) → tiny (image_id, w, h, phash)
    #   result joins back to the batch.
    # the needed image ids: in the small-batch branch resp is already
    # reduced to ≤|batch| rows, so derive them from resp directly — the
    # batch⋈resp subtree is then executed once, not re-run for the key set
    # (an image_id is non-null in `joined` exactly where resp matched)
    keys_src = resp if small_batch else joined
    keys = (
        keys_src.select(
            F.when(
                F.col("main_image_url").startswith("img://"),
                F.substring(F.col("main_image_url"), 7, 1_000),
            ).alias("image_id")
        )
        .filter(F.col("image_id").isNotNull())
        .distinct()
    )
    needed = images.join(F.broadcast(keys), "image_id", "left_semi")
    # fmt/caption ride THROUGH the decode pass (mapInPandas passes every
    # non-bytes column along) instead of a second images join afterwards —
    # one broadcast build + one join fewer per crawl iteration
    decoded = decode_images(needed.select("image_id", "bytes", "fmt", "caption"))

    dec_meta = decoded.select(
        "image_id",
        F.col("w_decoded").alias("w"),
        F.col("h_decoded").alias("h"),
        F.col("phash_decoded").alias("phash"),
        F.col("decode_ok"),
        "fmt",
        "caption",
    )
    return joined.join(dec_meta, "image_id", "left").withColumn(
        "decode_ok", F.coalesce(F.col("decode_ok"), F.lit(False))
    ).withColumn("phash", F.coalesce(F.col("phash"), F.lit(0)))
