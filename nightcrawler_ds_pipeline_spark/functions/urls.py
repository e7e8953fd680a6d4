"""URL canonicalization / parsing — the seen-key foundation.

Semantics match the reference's pure functions exactly (golden-tested against
the I/O pairs in reference tests/unit/test_url_cleaning.py:4-19):

- ``remove_tracking_parameters`` (reference helpers/utils.py:301-334): drop
  query params whose *name starts with* ``srsltid``/``utm_source``/
  ``utm_medium``/``utm_campaign``/``utm_term``/``utm_content``; drop ALL
  params when the url starts with ``https://www.ebay``; rebuild via urllib
  with ``quote`` escaping.
- ``clean_url`` (reference helpers/utils.py:280-298): strip ``/xx-yy/``
  language path segments, drop the whole query, keep the fragment.

The full urllib rebuild is not expressible with builtin Spark string
functions in the general case (percent re-encoding, blank-value params), so
the column form is an Arrow-batched pandas UDF (no per-row Python rows cross
the JVM boundary). Host extraction and hashing stay JVM-side
(``parse_url`` / ``xxhash64``) for codegen.
"""

from __future__ import annotations

import re
from urllib.parse import (
    ParseResult,
    parse_qsl,
    quote,
    quote_plus,
    urlencode,
    urlparse,
    urlunparse,
)

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_KNOWN_TRACKER_PREFIXES = (
    "srsltid",
    "utm_source",
    "utm_medium",
    "utm_campaign",
    "utm_term",
    "utm_content",
)

_LANG_PATH_RE = re.compile(r"/([a-z]{2}-[a-z]{2})/")


def remove_tracking_parameters(url: str) -> str:
    """Drop tracking query params; on ebay drop all params."""
    remove_all = url.startswith("https://www.ebay")
    parsed = urlparse(url)
    pairs = parse_qsl(parsed.query, keep_blank_values=True)
    if remove_all:
        kept = []
    else:
        kept = [
            (k, v)
            for k, v in pairs
            if not any(k.startswith(t) for t in _KNOWN_TRACKER_PREFIXES)
        ]
    return urlunparse(
        ParseResult(
            scheme=parsed.scheme,
            netloc=parsed.netloc,
            path=parsed.path,
            params=parsed.params,
            query=urlencode(kept, quote_via=quote),
            fragment=parsed.fragment,
        )
    )


def clean_url(url: str) -> str:
    """Strip /xx-yy/ language path segments and the whole query string."""
    parsed = urlparse(url)
    return urlunparse(
        ParseResult(
            scheme=parsed.scheme,
            netloc=parsed.netloc,
            path=_LANG_PATH_RE.sub("/", parsed.path),
            params=parsed.params,
            query="",
            fragment=parsed.fragment,
        )
    )


def canonicalize(url: str) -> str:
    """Engine canonical form = tracking-param removal (the seen-set key)."""
    return remove_tracking_parameters(url)


# --- vectorized canonicalize fast paths -------------------------------------
# The urllib rebuild costs ~10 µs/row of interpreted Python; at crawl-loop
# scale the canonicalize UDF is the hottest Python in the engine. Two fast
# paths cover the overwhelmingly common URL shapes EXACTLY (fuzz-pinned
# against the urllib path in tests/test_url_functions.py), everything else
# falls through to urllib:
#
# 1. no query string: urlparse→urlunparse is the identity for lowercase
#    http(s) URLs with a non-empty netloc and no ';' (urlparse would split
#    path params and a bare trailing ';' is dropped on rebuild — excluded).
# 2. strict k=v&k=v query where every character is quote()-safe
#    ([A-Za-z0-9_.~-]): parse_qsl→urlencode round-trips these verbatim, so
#    the rebuild reduces to "drop tracker pairs, rejoin with '&'". Anything
#    with '%', '+', ' ', '/', ':', blank keys, '#', or malformed pairs is
#    excluded (those are the shapes where urllib re-encodes).
_NOQ_RE = re.compile(r"^https?://[^/?;#][^?;]*$")
_SAFEQ_RE = re.compile(
    r"^https?://[^/?;#][^?#;]*\?"
    r"[A-Za-z0-9_.~-]+=[A-Za-z0-9_.~-]*"
    r"(?:&[A-Za-z0-9_.~-]+=[A-Za-z0-9_.~-]*)*$"
)


def _light_canon(url: str) -> str:
    """canonicalize() for URLs matching _SAFEQ_RE (all-safe chars, strict
    k=v&k=v structure): drop tracker pairs, rejoin — no urllib needed."""
    base, query = url.split("?", 1)
    if url.startswith("https://www.ebay"):
        return base
    kept = [
        p
        for p in query.split("&")
        if not p.split("=", 1)[0].startswith(_KNOWN_TRACKER_PREFIXES)
    ]
    return base + ("?" + "&".join(kept) if kept else "")


def canonicalize_series(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalize over a pandas Series — exact parity with
    ``canonicalize`` per element (null-preserving)."""
    s = urls.fillna("")
    noq = s.str.match(_NOQ_RE)
    safeq = s.str.match(_SAFEQ_RE)
    out = urls.copy()
    slow = ~(noq | safeq) & urls.notna()
    if safeq.any():
        out[safeq] = s[safeq].map(_light_canon)
    if slow.any():
        out[slow] = s[slow].map(canonicalize)
    return out


def double_urlencode(url: str) -> str:
    """F8 — quote_plus applied twice: the reverse-image query-URL quirk.

    Reference: extract/s03_reverse_image_search.py:47-48 ("need to
    double-urlencode the URL to make it work with SerpAPI and Google" —
    ``quote_plus(quote_plus(image_url))``). Python quote_plus semantics
    exactly (space→'+', '~' kept, '*' encoded), golden-tested.
    """
    return quote_plus(quote_plus(url))


@F.pandas_udf(T.StringType())
def double_urlencode_udf(urls: pd.Series) -> pd.Series:  # pragma: no cover - spark
    return urls.map(lambda u: double_urlencode(u) if u is not None else None)


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:  # pragma: no cover - spark
    return canonicalize_series(urls)


@F.pandas_udf(T.StringType())
def clean_url_udf(urls: pd.Series) -> pd.Series:  # pragma: no cover - spark
    return urls.map(lambda u: clean_url(u) if u is not None else None)


def host_col(url: Column | str) -> Column:
    """JVM-side host extraction (codegen'd, no Python)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.parse_url(c, F.lit("HOST")))


def url_hash_col(canonical_url: Column | str) -> Column:
    """Seen-set key: xxhash64(canonical_url) — JVM-side (north_rule)."""
    c = F.col(canonical_url) if isinstance(canonical_url, str) else canonical_url
    return F.xxhash64(c)


def with_canonical(df, url_col: str = "url"):
    """url → canonical_url, url_hash, host (the frontier key triple)."""
    return (
        df.withColumn("canonical_url", canonicalize_udf(F.col(url_col)))
        .withColumn("url_hash", url_hash_col("canonical_url"))
        .withColumn("host", host_col("canonical_url"))
    )
