"""Deterministic synthetic fixtures (FIXTURES.md) — seed=42, no wall-clock.

Shapes mirror the reference's staged checkpoints / API payloads
(`ExtractSerpapiData` base.py:140-160, Zyte payload s04_zyte.py:110-143) plus
the BASELINE.json ``input_hint`` image table. Generation is pure numpy on
the driver and is only used at small scale (tests + local bench); the engine
itself never generates data.

Distribution knobs (FIXTURES.md):
- images: sizes {32×32, 64×48, 128×128}; fmt png/jpg 80/20 by ``i % 5``;
  ~2% exact-duplicate pixels under fresh image_ids (intentional phash dups);
  ~1% corrupt (truncated) bytes → error-row handling.
- serp urls: 50-host pool with 2 hot hosts carrying ~30% (skew); ~25%
  carry ``srsltid``/``utm_*`` tracking params; ~10% ebay strip-all URLs.
- robots: crawl_delay_ms ∈ {0, 500, 1000, 5000}; a few disallow prefixes.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from nightcrawler_ds_pipeline_spark.codecs import encode_image, phash64

SEED = 42

# FIXTURES.md §8 scale tiers: rows (serp / images) + host-pool width.
# The bench tier widens the host pool so politeness budgets don't cap the
# batch (at 10^10 scale the pool is millions of hosts).
TIERS = {
    "t1": {"serp": 200, "images": 500, "hosts": 50},
    "t2": {"serp": 2000, "images": 10_000, "hosts": 50},
    "bench": {"serp": 20_000, "images": 50_000, "hosts": 2000},
}

_SIZES = [(32, 32), (48, 64), (128, 128)]  # (h, w)
_NOUNS = ["aspirin", "serum", "lamp", "sneaker", "watch", "cream", "vitamin", "toy"]
_KEYWORDS = ["aspirin", "vitamin d", "retinol serum", "led lamp", "running shoes"]
_OFFER_ROOTS = ["GOOGLE", "GOOGLE_SHOPPING", "GOOGLE_SITE", "EBAY"]

# host pool; first two are the hot hosts (~30% of traffic combined).
def host_pool(num_hosts: int = 50) -> list[str]:
    return ["www.ebay.ch", "shop-apotheke.ch"] + [
        f"shop{i:02d}.example{'.ch' if i % 3 == 0 else '.com'}"
        for i in range(num_hosts - 2)
    ]


_HOSTS = host_pool(50)


def _base_tile(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Seeded RGB noise-and-gradient tile (FIXTURES.md §1)."""
    yy, xx = np.mgrid[0:h, 0:w]
    grad = ((yy * 255 // max(h - 1, 1)) + (xx * 255 // max(w - 1, 1))) // 2
    noise = rng.integers(0, 64, size=(h, w, 3), dtype=np.int64)
    base = np.stack([grad, 255 - grad, (grad + 85) % 256], axis=-1)
    return np.clip(base + noise - 32, 0, 255).astype(np.uint8)


def gen_images_pdf(n: int, seed: int = SEED) -> pd.DataFrame:
    """The core input table — BASELINE.json input_hint shape, verbatim."""
    rng = np.random.default_rng(seed)
    rows = []
    dup_src: list[dict] = []
    for i in range(n):
        is_dup = i > 50 and (i % 50 == 7) and dup_src  # ~2% exact duplicates
        is_corrupt = i % 100 == 13  # ~1% corrupt bytes
        if is_dup:
            src = dup_src[int(rng.integers(0, len(dup_src)))]
            pixels, fmt = src["pixels"], src["fmt"]
        else:
            h, w = _SIZES[i % 3]
            fmt = "png" if i % 5 != 4 else "jpg"  # 80/20
            pixels = _base_tile(rng, h, w)
        data = encode_image(pixels, fmt)
        if is_corrupt:
            data = data[: max(4, len(data) // 3)]  # truncated → decode error
            ph = 0
            w_, h_ = pixels.shape[1], pixels.shape[0]
        else:
            # phash of the *decoded* pixels (what a consumer would see)
            from nightcrawler_ds_pipeline_spark.codecs import decode_image

            decoded = decode_image(data)
            ph = phash64(decoded)
            h_, w_ = decoded.shape[0], decoded.shape[1]
        rows.append(
            {
                "image_id": f"img{i:012d}",
                "bytes": data,
                "w": np.int32(w_),
                "h": np.int32(h_),
                "fmt": fmt,
                "caption": f"product {_NOUNS[i % len(_NOUNS)]} listing {i}",
                "phash": np.int64(ph),
            }
        )
        if not is_dup and not is_corrupt and len(dup_src) < 64:
            dup_src.append({"pixels": pixels, "fmt": fmt})
    pdf = pd.DataFrame(rows)
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    pdf["phash"] = pdf["phash"].astype("int64")
    return pdf


def _make_url(rng: np.random.Generator, i: int, hosts: list[str] | None = None) -> str:
    hosts = hosts or _HOSTS
    # hot-host skew: 2 hosts carry ~30%
    r = rng.random()
    if r < 0.30:
        host = hosts[int(rng.integers(0, 2))]
    else:
        host = hosts[int(rng.integers(2, len(hosts)))]
    path = f"/p/{_NOUNS[i % len(_NOUNS)]}/{i}"
    url = f"https://{host}{path}"
    q = rng.random()
    if host.startswith("www.ebay"):
        if q < 0.8:
            url += f"?hash=item{i}&var=0"  # strip-all on ebay (utils.py:301-334)
    elif q < 0.15:
        url += f"?srsltid=AfmBO{i:08d}"
    elif q < 0.25:
        url += f"?utm_source=serp&utm_campaign=c{i % 7}&ref=kw"
    elif q < 0.35:
        url += f"?color=red&size={i % 5}"
    return url


def gen_serp_results_pdf(
    n: int, seed: int = SEED, num_hosts: int = 50
) -> pd.DataFrame:
    """Search-result seed rows (FIXTURES.md §2)."""
    hosts = host_pool(num_hosts)
    rng = np.random.default_rng(seed + 1)
    rows = []
    per_group: dict[tuple, int] = {}
    for i in range(n):
        kw = _KEYWORDS[i % len(_KEYWORDS)]
        root = _OFFER_ROOTS[i % len(_OFFER_ROOTS)]
        pos = per_group.get((kw, root), 0) + 1
        per_group[(kw, root)] = pos
        is_ris = i % 17 == 0
        is_enriched = i % 6 == 0
        rows.append(
            {
                "keyword": kw,
                "offer_root": "REVERSE_IMAGE_SEARCH" if is_ris else root,
                "position": np.int32(pos),
                "url": _make_url(rng, i, hosts),
                "image_url": f"https://t.example.com/thumb/{i}.jpg" if is_ris else None,
                "keyword_enriched": f"{kw} {_NOUNS[i % len(_NOUNS)]}" if is_enriched else None,
                "keyword_volume": float(rng.integers(0, 5000)) if is_enriched else -1.0,
                "keyword_language": ["de", "fr", "it", "en"][i % 4] if is_enriched else None,
                "keyword_location": "Switzerland" if is_enriched else None,
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["position"] = pdf["position"].astype("int32")
    return pdf


def gen_fetch_responses_pdf(
    serp_pdf: pd.DataFrame, images_pdf: pd.DataFrame, seed: int = SEED
) -> pd.DataFrame:
    """Zyte-shaped fetch fixtures keyed by url (FIXTURES.md §3).

    Each fetchable URL maps deterministically to an image_id (`img://<id>`)
    and a small outlink set (new frontier edges for later iterations).
    """
    rng = np.random.default_rng(seed + 2)
    image_ids = images_pdf["image_id"].tolist()
    urls = serp_pdf["url"].drop_duplicates().tolist()
    rows = []
    for j, url in enumerate(urls):
        err = rng.random() < 0.05
        img_id = image_ids[j % len(image_ids)]
        currency = "CHF" if rng.random() < 0.15 else ("SFr" if rng.random() < 0.03 else "EUR")
        prob_roll = rng.random()
        probability: float | None
        if prob_roll < 0.1:
            probability = None
        elif prob_roll < 0.15:
            probability = 0.0
        elif prob_roll < 0.2:
            probability = 0.4  # exactly at threshold → OTHER (s07: strict >)
        else:
            probability = round(float(rng.random()), 3)
        main_img = f"img://{img_id}"
        extra_imgs = [f"img://{image_ids[(j + k) % len(image_ids)]}" for k in (1, 2)]
        image_urls = ([main_img] if rng.random() < 0.30 else []) + extra_imgs
        n_out = int(rng.integers(0, 4))
        # ~70% of outlinks point back into the corpus (fetchable pages a
        # real crawl would discover); ~30% are external (error rows).
        outlinks = []
        for k in range(n_out):
            if rng.random() < 0.7:
                outlinks.append(urls[int(rng.integers(0, len(urls)))])
            else:
                outlinks.append(_make_url(rng, j * 7 + k + 1_000_000))
        body = f"<html><body>product {j}</body></html>".encode(
            "windows-1252" if j % 29 == 0 else "utf-8"
        )
        rows.append(
            {
                "url": url,
                "error": bool(err),
                "product_name": None if err else f"Product {j}",
                "product_price": None if err else f"{(j % 90) + 10}.{j % 100:02d}",
                "currency_raw": None if err else currency,
                "description": None if err else f"Description of product {j}",
                "probability": None if err else probability,
                "main_image_url": None if err else main_img,
                "image_urls": None if err else image_urls,
                "http_response_body": None if err else body,
                "seconds_taken": round(0.05 + 0.001 * (j % 100), 3),
                "outlinks": None if err else outlinks,
            }
        )
    return pd.DataFrame(rows)


def gen_robots_pdf(seed: int = SEED, num_hosts: int = 50) -> pd.DataFrame:
    """Politeness fixtures for the full host pool (FIXTURES.md §5)."""
    rng = np.random.default_rng(seed + 3)
    delays = [0, 500, 1000, 5000]
    rows = []
    for k, host in enumerate(host_pool(num_hosts)):
        rows.append(
            {
                "host": host,
                "crawl_delay_ms": np.int32(delays[int(rng.integers(0, 4))]),
                "disallow_prefixes": ["/admin", "/cart"] if k % 4 == 0 else [],
                "fetched_at_iter": np.int32(0),
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["crawl_delay_ms"] = pdf["crawl_delay_ms"].astype("int32")
    pdf["fetched_at_iter"] = pdf["fetched_at_iter"].astype("int32")
    return pdf


# bumped whenever generated content changes so stale /tmp caches rebuild
FIXTURE_VERSION = "v2-ris"


def gen_serp_ris_pdf(
    n_keywords: int = 5,
    per_kw: int = 60,
    seed: int = SEED,
    num_hosts: int = 50,
) -> pd.DataFrame:
    """Dense reverse-image-search tier (FIXTURES.md §2b): ``per_kw`` RIS
    rows per keyword so the image pipeline's 4-page cap (page_size x
    max_pages = 40) actually BITES — the base serp fixture has ~12 sparse
    RIS rows, far under the boundary. Own rng stream + url index offset:
    adding this tier never perturbs the base serp draws."""
    hosts = host_pool(num_hosts)
    rng = np.random.default_rng(seed + 7)
    rows = []
    for k in range(n_keywords):
        for pos in range(1, per_kw + 1):
            i = 10_000 + k * per_kw + pos
            rows.append(
                {
                    "keyword": f"ris-kw{k}",
                    "offer_root": "REVERSE_IMAGE_SEARCH",
                    "position": np.int32(pos),
                    "url": _make_url(rng, i, hosts),
                    "image_url": f"https://t.example.com/thumb/{i}.jpg",
                    "keyword_enriched": None,
                    "keyword_volume": -1.0,
                    "keyword_language": None,
                    "keyword_location": None,
                }
            )
    pdf = pd.DataFrame(rows)
    pdf["position"] = pdf["position"].astype("int32")
    return pdf


def fixture_dir(tier: str, root: str | None = None) -> str:
    root = root or os.environ.get("SPARK_GRAFT_FIXTURES", "/tmp/ncds_fixtures")
    return os.path.join(root, tier)


def _retire_stale_cache(out: str) -> None:
    """Retire an outdated fixture dir by RENAME ONLY, then sweep retired
    copies from PREVIOUS runs.

    The rename is atomic, so a concurrent reader sees either the old
    complete dir or none — never a half-deleted one. The retired copy
    is deliberately LEFT ON DISK: a reader that already planned a
    Spark/pyarrow scan against the old dir's file listing would fail
    mid-read if we rmtree'd it here (this race only opens on
    FIXTURE_VERSION bumps). Retired copies older than the 1-hour grace
    (no longer reachable by any live reader) are swept."""
    import shutil
    import time
    import uuid

    retired = f"{out}.stale-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    try:
        os.rename(out, retired)
        # os.rename does NOT touch the directory's own mtime, so the
        # sweep below would otherwise measure time-since-GENERATION and
        # immediately reap a cache that was retired seconds ago (caches
        # persist across sessions, so they are normally hours old).
        # Stamp retirement time explicitly: the 1-hour grace then
        # measures time since retirement, keeping the in-flight-reader
        # guarantee the rename-only scheme was written for.
        os.utime(retired)
    except OSError:
        pass
    parent = os.path.dirname(out) or "."
    base = os.path.basename(out)
    for entry in os.listdir(parent):
        if not entry.startswith(f"{base}.stale-"):
            continue
        path = os.path.join(parent, entry)
        try:
            old_enough = time.time() - os.path.getmtime(path) > 3600
        except OSError:
            continue
        if old_enough:
            shutil.rmtree(path, ignore_errors=True)


def write_fixture_parquet(tier: str = "t1", root: str | None = None) -> str:
    """Generate + write all fixture tables for a tier.

    Idempotent AND concurrency-safe: generation goes into a process-private
    staging dir which is atomically renamed into place; a loser of the race
    just deletes its staging copy. Readers only ever see a complete dir."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = fixture_dir(tier, root)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                current = f.read().strip() == FIXTURE_VERSION
        except FileNotFoundError:
            current = False  # a racer retired the dir between exists+open
        if current:
            return out
        _retire_stale_cache(out)
    staging = f"{out}.staging-{os.getpid()}"
    os.makedirs(staging, exist_ok=True)
    sizes = TIERS[tier]
    images = gen_images_pdf(sizes["images"])
    serp = gen_serp_results_pdf(sizes["serp"], num_hosts=sizes["hosts"])
    serp_ris = gen_serp_ris_pdf(num_hosts=sizes["hosts"])
    # responses cover serp AND the dense RIS tier; RIS urls are APPENDED so
    # the rng draws for the original serp urls stay bit-identical
    fetch = gen_fetch_responses_pdf(
        pd.concat([serp, serp_ris], ignore_index=True), images
    )
    robots = gen_robots_pdf(num_hosts=sizes["hosts"])
    for name, pdf in [
        ("images", images),
        ("serp_results", serp),
        ("serp_ris", serp_ris),
        ("fetch_responses", fetch),
        ("robots", robots),
    ]:
        # small row groups: a single-row-group file is ONE Spark input split
        # no matter how large (measured: a 960 MB one-group images file made
        # every scan single-task); 2048-row groups give splittable scans.
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            os.path.join(staging, f"{name}.parquet"),
            row_group_size=2048,
        )
    with open(os.path.join(staging, "_COMPLETE"), "w") as f:
        f.write(FIXTURE_VERSION + "\n")
    try:
        os.rename(staging, out)  # atomic publish (same filesystem)
    except OSError:
        # another process won the race — use theirs if complete
        shutil.rmtree(staging, ignore_errors=True)
        if not os.path.exists(marker):
            raise
    return out
