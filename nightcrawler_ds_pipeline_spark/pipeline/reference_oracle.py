"""Pure-Python oracle mirroring the reference pipeline's row-at-a-time
semantics, line-for-line (used ONLY in parity tests — never by the engine).

Each function cites the reference lines it mirrors, including the known
quirks: the s05:128-133 ``ch-de_in_url`` key mismatch, the s02:69-74
discarded blacklist, the s04:110-112 replace-not-append error-row drop, and
the s07:41-54 ``if not zyte_probability`` null/zero handling.
"""

from __future__ import annotations

import hashlib

# s05_dataprocessor.py:82-106 — verbatim lists
LANGUAGES = ["ch-de", "/ch/", "swiss", "/CH/", "/fr"]
SHOPS = [
    "anastore", "ayurveda101", "biovea", "bodysport", "brack", "brain-effect",
    "ebay", "gesund-gekauft", "kanela", "myfairtrade", "nurnatur", "nu3",
    "plantavis", "shop-apotheke", "herbano", "onebioshop", "puravita",
    "sembrador", "vitaminexpress", "wish",
]
WEB_EXTENSIONS = [".ch", "ch."]
PRICE_FRANCS = ["CHF", "SFr"]


def _is_substring_in_column(value, substrings):
    # s05:162-176 — evaluate_not_na guard + any-of containment
    if value is None or value == "":
        return False
    return any(s in value for s in substrings)


def swiss_features(url: str, price: str) -> dict:
    # s05:108-125
    feats = {
        "ch_de_in_url": _is_substring_in_column(url, LANGUAGES),
        "swisscompany_in_url": _is_substring_in_column(url, SHOPS),
        "web_extension_in_url": _is_substring_in_column(url, WEB_EXTENSIONS),
        "francs_in_url": _is_substring_in_column(price, PRICE_FRANCS),
    }
    # s05:128-144 — NB checks 'ch-de_in_url' (hyphen) which never exists →
    # .get(..., False) silently drops the language flag
    features_to_check = [
        "ch-de_in_url", "swisscompany_in_url", "web_extension_in_url",
        "francs_in_url",
    ]
    feats["result_sold_CH"] = any(feats.get(f, False) for f in features_to_check)
    return feats


def price_concat(price, currency) -> str:
    # s04_zyte.py:122-125
    p = f"{price if price is not None else ''} {currency if currency is not None else ''}"
    return p if len(p.strip()) > 1 else ""


def page_type(zyte_probability, threshold=0.4) -> str:
    # s07:41-54 — `if not zyte_probability` → None and 0.0 both become 0
    if not zyte_probability:
        zyte_probability = 0
    return "ecommerce_product" if zyte_probability > threshold else "other"


def image_set(main_image_url, image_urls) -> set:
    # s04:126-131 — Python set over mainImage + images[]
    images = set()
    if main_image_url:
        images.add(main_image_url)
    for u in image_urls or []:
        images.add(u)
    return images


def checksum_uid(url: str, title: str) -> str:
    # full_pipeline.py:204 — pinned here as sha256 hex (SURVEY F18)
    base = f"{url.split('?')[0]}_{title if title is not None else ''}"
    return hashlib.sha256(base.encode("utf-8")).hexdigest()


def run_reference_pipeline(
    serp_rows: list[dict],
    responses_by_url: dict[str, dict],
    country: str = "CH",
    hard_cap: int = 200,
) -> tuple[list[dict], dict]:
    """The full E1 chain, row-at-a-time like the reference. Returns
    (final_rows, stage_counts)."""
    counts = {}

    # s01: per-(keyword, offer_root) position order + hard cap
    rows = [r for r in serp_rows if r["offer_root"] != "REVERSE_IMAGE_SEARCH"]
    by_group: dict[tuple, list[dict]] = {}
    for r in sorted(rows, key=lambda r: (r["keyword"], r["offer_root"], r["position"])):
        by_group.setdefault((r["keyword"], r["offer_root"]), []).append(r)
    rows = [r for grp in by_group.values() for r in grp[:hard_cap]]
    counts["serpapi"] = len(rows)

    # s04: fetch; error rows / missing responses VANISH (replace semantics)
    zyte_rows = []
    for r in rows:
        resp = responses_by_url.get(r["url"])
        if resp is None or resp["error"]:
            continue
        zyte_rows.append(
            {
                **r,
                "title": resp.get("product_name") or "",
                "price": price_concat(resp.get("product_price"), resp.get("currency_raw")),
                "full_description": resp.get("description") or "",
                "zyte_probability": resp.get("probability"),
                "zyte_execution_time": resp.get("seconds_taken") or 0.0,
                "images": sorted(image_set(resp.get("main_image_url"), resp.get("image_urls"))),
            }
        )
    counts["zyte"] = len(zyte_rows)

    # s05: swiss flags + country filter
    for r in zyte_rows:
        r.update(swiss_features(r["url"], r["price"]))
    counts["processing_raw"] = len(zyte_rows)
    if country == "CH":
        zyte_rows = [r for r in zyte_rows if r["result_sold_CH"]]
    counts["processing_filtered"] = len(zyte_rows)

    # s06 pass-through
    counts["delivery_policy"] = len(zyte_rows)
    # s07 page type
    for r in zyte_rows:
        r["page_type"] = page_type(r.get("zyte_probability"))
    counts["page_type"] = len(zyte_rows)
    # s08-s11 pass-throughs
    for stage in ("blocked_content", "content_domain", "suspiciousness", "ranker"):
        counts[stage] = len(zyte_rows)

    final = [
        {
            "url": r["url"],
            "title": r["title"],
            "root": r["offer_root"],
            "uid": checksum_uid(r["url"], r["title"]),
            "score": 0.0,
            "page_type": r["page_type"],
            "result_sold_CH": r["result_sold_CH"],
        }
        for r in zyte_rows
    ]
    return final, counts
