"""Golden URL-canonicalization pairs (semantics of reference
tests/unit/test_url_cleaning.py:4-19) + clean_url + text functions."""

from nightcrawler_ds_pipeline_spark.functions.urls import (
    canonicalize,
    clean_url,
    remove_tracking_parameters,
)
from nightcrawler_ds_pipeline_spark.functions.text import (
    run_uuid,
    stable_hash_id,
)
from nightcrawler_ds_pipeline_spark.pipeline.reference_oracle import checksum_uid


def test_remove_tracking_golden_pairs():
    base = "https://a.ch/some/levels/"
    url = base + "?srsltid=AfmBOoqCctfdXwRhSCqHCHO3sxdW0PCZaXKHkAUqBwe6PeQClu7nGATWc7s"
    assert remove_tracking_parameters(base) == base
    assert remove_tracking_parameters(url) == base
    assert remove_tracking_parameters(url + "&aa=bb") == base + "?aa=bb"
    assert remove_tracking_parameters(url + "&aa=bb&utm_source=xx") == base + "?aa=bb"
    assert (
        remove_tracking_parameters(url + "&aa=bb&source=xx")
        == base + "?aa=bb&source=xx"
    )
    ebay = "https://www.ebay.ch/some/levels/"
    assert remove_tracking_parameters(ebay) == ebay
    assert remove_tracking_parameters(ebay + "?a=b&c=d") == ebay


def test_tracking_prefix_families():
    u = "https://x.com/p?utm_campaign=a&utm_term=b&utm_content=c&utm_medium=d&keep=1"
    assert canonicalize(u) == "https://x.com/p?keep=1"
    # prefix match, not equality: utm_source_extra is also stripped
    assert canonicalize("https://x.com/p?utm_sourcezz=1&k=2") == "https://x.com/p?k=2"
    # blank values preserved
    assert canonicalize("https://x.com/p?k=") == "https://x.com/p?k="


def test_clean_url_language_segments():
    assert clean_url("https://x.com/ch-de/p/1?q=2") == "https://x.com/p/1"
    assert clean_url("https://x.com/en-us/sub/p") == "https://x.com/sub/p"
    assert clean_url("https://x.com/p/1") == "https://x.com/p/1"


def test_stable_hash_id_range_and_determinism():
    a = stable_hash_id("hello")
    assert 0 <= a < 10**8
    assert a == stable_hash_id("hello")
    assert a != stable_hash_id("hello2")


def test_run_uuid_deterministic():
    u = run_uuid("aspirin", "2024-01-01_00-00-00")
    assert u == run_uuid("aspirin", "2024-01-01_00-00-00")
    assert len(u) == 36 and u.count("-") == 4


def test_checksum_uid_strips_query():
    assert checksum_uid("https://a.ch/p?x=1", "T") == checksum_uid("https://a.ch/p", "T")
    assert checksum_uid("https://a.ch/p", "T") != checksum_uid("https://a.ch/p", "U")


def test_mask_token_col_reference_parity(spark):
    """F17 parity: mask_token_col equals a pure-python twin of the
    reference's _mask_token_in_string (requests_wrapper.py:54-55) on
    realistic alphanumeric API tokens, including multi-occurrence and
    no-occurrence strings; empty token is the no-op guard."""
    import re

    from pyspark.sql import functions as F

    from nightcrawler_ds_pipeline_spark.functions.text import mask_token_col

    def reference_twin(s, token):
        if not token:
            return s
        return re.sub(re.escape(token), f"{re.escape(token[:5])}*****", s)

    token = "sk4Xb9TQmzA71c"
    cases = [
        '{"key": "sk4Xb9TQmzA71c", "status": "ok"}',
        "token=sk4Xb9TQmzA71c&again=sk4Xb9TQmzA71c",
        "no secret here",
        "",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [
        r["m"]
        for r in df.select(mask_token_col("s", token).alias("m"))
        .orderBy(F.monotonically_increasing_id())
        .collect()
    ]
    expect = [reference_twin(c, token) for c in cases]
    assert got == expect
    assert got[0] == '{"key": "sk4Xb*****", "status": "ok"}'
    assert got[1].count("*****") == 2 and token not in got[1]
    # falsy-token guard
    raw = [
        r["m"]
        for r in df.select(mask_token_col("s", "").alias("m")).collect()
    ]
    assert sorted(raw) == sorted(cases)


def test_canonicalize_series_parity_handcrafted_and_fuzz():
    """The vectorized canonicalize fast paths (r6 optimization) must agree
    with the urllib path element-for-element: handcrafted edge shapes plus
    a seeded fuzz corpus covering path params, fragments, percent/plus
    encodings, blank values, empty netlocs, scheme case, ebay, and tracker
    prefix-extended keys."""
    import random

    import pandas as pd

    from nightcrawler_ds_pipeline_spark.functions.urls import (
        canonicalize_series,
    )

    corpus = [
        "https://shop1.example.com/p/123",
        "https://shop1.example.com/p/123?utm_source=serp&aa=bb",
        "https://shop1.example.com/p/124?srsltid=XYZ",
        "https://www.ebay.com/itm/1?x=1&y=2",
        "https://www.ebayx.com/itm/1?a=b",
        "https://x.com/p?", "https://x.com/p?a", "https://x.com/p?a=",
        "https://x.com/p?a=b&", "https://x.com/p?a=b&&c=d",
        "https://x.com/p?a=b+c", "https://x.com/p?a=b%20c",
        "https://x.com/p?a=b/c", "https://x.com/p?a=b:c",
        "https://x.com/p?utm_sourcefoo=1&b=2", "https://x.com/p?xutm_source=1",
        "https://x.com/p?srsltid=1#frag", "https://x.com/p#frag",
        "HTTP://x.com/p", "http://x.com/p;param", "http://x.com/p;",
        "https:////", "ftp://x.com/a?b=c", "//host/p?a=b",
        "not a url at all", "https://x.com/p?a=b=c",
        "https://x.com/p?utm_source=a&utm_source=b&k=v",
        "https://x.com/p?k=v&k=w", "https://x.com/p?K=V",
        "https://x.com/p?a=~b-._c", "", None,
    ]
    rng = random.Random(7)
    chars = "abcXYZ019_.~-%+/:;?&=# "
    for _ in range(3000):
        scheme = rng.choice(["https://", "http://", "", "HTTPS://", "https:////"])
        host = rng.choice(["x.com", "www.ebay.com", "shop9.example.com", "", "u@x.com:8080"])
        path = rng.choice(["", "/"]) + "".join(
            rng.choice("abc/;.") for _ in range(rng.randint(0, 6))
        )
        q = ""
        if rng.random() < 0.75:
            q = "?" + "".join(rng.choice(chars) for _ in range(rng.randint(0, 14)))
        if rng.random() < 0.2:
            q += "#" + "".join(rng.choice("abc?&=;") for _ in range(3))
        corpus.append(scheme + host + path + q)
    ser = pd.Series(corpus, dtype=object)
    fast = canonicalize_series(ser)
    ref = ser.map(lambda u: canonicalize(u) if u is not None else None)
    for u, a, b in zip(corpus, fast, ref):
        assert (a == b) or (pd.isna(a) and pd.isna(b)), (u, a, b)
