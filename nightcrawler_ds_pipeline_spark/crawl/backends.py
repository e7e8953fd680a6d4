"""S8 — alternate fetch backends as response-normalization adapters.

The reference carries two extraction backends: Zyte (the main path,
s04_zyte.py) and Diffbot (helpers/api/diffbot_api.py — ``/v3/product``,
unused by the main pipeline). The engine keeps ONE canonical response
schema (the zyte-shaped ``fetch_responses`` fixture columns) and expresses
a backend as a pure column mapping applied before the fetch join, so the
crawl loop and the 11-stage pipeline are backend-agnostic.

Diffbot-shaped rows (public /v3/product response, diffbot_api.py:17,33-47):
``url``, ``errorCode`` (int, present on failure), ``seconds_taken`` (added
by APICaller), and ``objects: array<struct<title, offerPrice, text,
images: array<struct<url, primary>>, links: array<string>>>`` — the
product payload is ``objects[0]``. ``offerPrice`` is a single
"<amount> <currency>" string (vs zyte's split price/currency fields).

Everything here is JVM-side column algebra (codegen'd) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BACKENDS = ("zyte", "diffbot")


def normalize_responses(responses: DataFrame, backend: str = "zyte") -> DataFrame:
    """Map a backend-shaped response table to the canonical zyte-shaped
    schema consumed by ``fetch_batch`` and ``s04_zyte_fetch``."""
    if backend == "zyte":
        return responses
    if backend != "diffbot":
        raise ValueError(f"unknown fetch backend {backend!r}; one of {BACKENDS}")

    obj = F.element_at(F.col("objects"), 1)
    has_obj = F.col("objects").isNotNull() & (F.size("objects") > 0)
    err = F.col("errorCode").isNotNull() | ~has_obj
    images = F.coalesce(obj["images"], F.array())
    primary = F.filter(images, lambda x: F.coalesce(x["primary"], F.lit(False)))
    main_image = F.coalesce(
        F.element_at(primary, 1)["url"], F.element_at(images, 1)["url"]
    )
    return responses.select(
        F.col("url"),
        err.alias("error"),
        F.when(~err, obj["title"]).alias("product_name"),
        F.when(~err, F.split_part(obj["offerPrice"], F.lit(" "), F.lit(1))).alias(
            "product_price"
        ),
        F.when(~err, F.split_part(obj["offerPrice"], F.lit(" "), F.lit(2))).alias(
            "currency_raw"
        ),
        F.when(~err, obj["text"]).alias("description"),
        # diffbot has no zyte-style extraction probability; the page-type
        # stage's COALESCE(probability, 0) handles the null (s07 semantics)
        F.lit(None).cast("double").alias("probability"),
        F.when(~err, main_image).alias("main_image_url"),
        F.when(~err, F.transform(images, lambda x: x["url"])).alias("image_urls"),
        F.lit(None).cast("binary").alias("http_response_body"),
        F.col("seconds_taken"),
        F.when(~err, obj["links"]).alias("outlinks"),
    )
