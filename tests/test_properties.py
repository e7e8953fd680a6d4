"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings, strategies as st

from nightcrawler_ds_pipeline_spark.codecs import (
    decode_image,
    encode_image,
    hamming64,
    phash64,
    psnr,
)
from nightcrawler_ds_pipeline_spark.crawl.cuckoo import CuckooFilter
from nightcrawler_ds_pipeline_spark.functions.urls import (
    canonicalize,
    remove_tracking_parameters,
)

_url_path = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789/-_.", min_size=0, max_size=30
)
_param = st.tuples(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12),
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=0, max_size=12),
)


@given(
    host=st.sampled_from(["a.ch", "www.ebay.ch", "shop.example.com"]),
    path=_url_path,
    params=st.lists(_param, max_size=5),
)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(host, path, params):
    q = "&".join(f"{k}={v}" for k, v in params)
    url = f"https://{host}/{path}" + (f"?{q}" if q else "")
    once = canonicalize(url)
    assert canonicalize(once) == once  # idempotency — the seen-key contract
    # no tracking param survives
    assert "srsltid=" not in once and "utm_" not in once.split("?")[-1] if "?" in once else True


@given(params=st.lists(_param, min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_ebay_strips_everything(params):
    q = "&".join(f"{k}={v}" for k, v in params)
    url = f"https://www.ebay.ch/itm/x?{q}"
    assert remove_tracking_parameters(url) == "https://www.ebay.ch/itm/x"


@given(
    h=st.integers(min_value=4, max_value=64),
    w=st.integers(min_value=4, max_value=64),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_property(h, w, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(decode_image(encode_image(px, "png")), px)


@given(
    h=st.integers(min_value=8, max_value=64),
    w=st.integers(min_value=8, max_value=64),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_lossy_psnr_property(h, w, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
    out = decode_image(encode_image(px, "jpg"))
    assert psnr(px, out) >= 40.0  # BASELINE gate holds for ALL inputs


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=20, deadline=None)
def test_phash_stable_under_lossy(seed):
    px = np.random.default_rng(seed).integers(0, 256, (32, 32, 3)).astype(np.uint8)
    a = phash64(px)
    b = phash64(decode_image(encode_image(px, "jpg")))
    assert hamming64(a, b) <= 6


@given(keys=st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1,
                     max_size=300, unique=True))
@settings(max_examples=20, deadline=None)
def test_cuckoo_no_false_negatives(keys):
    cf = CuckooFilter(num_buckets=1 << 10)
    inserted = [k for k in keys if cf.insert(int(k))]
    assert cf.contains(np.array(inserted, dtype=np.int64)).all()


@given(
    st.lists(
        st.text(alphabet="abcdef ", min_size=1, max_size=40), min_size=1,
        max_size=8,
    ),
    st.text(alphabet="abcdefgh ", max_size=60),
)
@settings(max_examples=60, deadline=None)
def test_bpe_encode_covers_input(corpus, text):
    """BPE invariants for arbitrary corpora/inputs: the encoded symbols of
    every pre-token concatenate back to exactly that token (+EOW), and the
    token count never exceeds characters + one EOW per word."""
    from nightcrawler_ds_pipeline_spark.functions.bpe import (
        EOW,
        bpe_encode,
        bpe_token_count,
        pretokenize,
        train_bpe,
    )

    merges = train_bpe(corpus, num_merges=32)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in pretokenize(text):
        toks = bpe_encode(w, ranks)
        assert "".join(toks) == w[:-1] + w[-1] + EOW
    n = bpe_token_count(text, ranks)
    words = pretokenize(text)
    assert 0 <= n <= sum(len(w) + 1 for w in words)
    # determinism
    assert n == bpe_token_count(text, ranks)


@given(
    st.sets(st.integers(min_value=-(2**62), max_value=2**62), min_size=1,
            max_size=300),
    st.data(),
)
@settings(max_examples=40, deadline=None)
def test_cuckoo_no_false_negatives_after_deletes(keys, data):
    """Pure-python cuckoo property: after inserting S then deleting D ⊆ S,
    every key in S \\ D still reports membership (the over-approximation
    invariant the crawl loop's correctness rests on)."""
    import numpy as np

    from nightcrawler_ds_pipeline_spark.crawl.cuckoo import CuckooFilter

    cf = CuckooFilter(num_buckets=1 << 10)
    for k in keys:
        assert cf.insert(k)
    dels = data.draw(st.sets(st.sampled_from(sorted(keys)),
                             max_size=len(keys)))
    for k in dels:
        assert cf.delete(k)
    remaining = np.array(sorted(set(keys) - dels), dtype=np.int64)
    if len(remaining):
        assert cf.contains(remaining).all()


# --- PII mask pattern properties (engine-independent: the Java∩RE2 dialect
# is also valid Python `re`, so hypothesis can hunt the pattern space
# cheaply; engine parity itself is pinned in test_pii.py) --------------------
import re as _re

from nightcrawler_ds_pipeline_spark.functions.pii import _MASKS

_PII_ALPHABET = st.sampled_from(list("ab9@.+-() \t") + ["<", ">"])


def _mask_py(text: str) -> str:
    for pat, token in _MASKS:
        text = _re.sub(pat, token, text)
    return text


@given(st.text(alphabet=_PII_ALPHABET, max_size=80))
@settings(max_examples=500, deadline=None)
def test_mask_pii_idempotent(text):
    """Placeholder tokens must never create NEW matches — masking twice
    must equal masking once (e.g. a <PHONE> landing between digit runs
    must not bridge them into a fresh phone match)."""
    once = _mask_py(text)
    assert _mask_py(once) == once, (text, once)


@given(st.text(alphabet=st.sampled_from(list("abc .!?-")), max_size=80))
@settings(max_examples=200, deadline=None)
def test_mask_pii_noop_without_digits_or_at(text):
    """Every PII shape needs a digit or '@' — text with neither must pass
    through byte-identical (the identity half of the masking contract)."""
    assert _mask_py(text) == text


# --- bigram-LM perplexity totality ------------------------------------------
@given(
    corpus=st.lists(
        st.text(alphabet=st.sampled_from(list("abcd ")), min_size=1, max_size=40),
        min_size=1, max_size=10,
    ),
    text=st.text(alphabet=st.sampled_from(list("abcdef ")), max_size=60),
)
@settings(max_examples=100, deadline=None)
def test_perplexity_total_finite_positive(corpus, text):
    """A smoothed LM must score ANY text — including OOV tokens and empty
    strings — with a finite positive perplexity, never raise/inf/nan."""
    import math

    from nightcrawler_ds_pipeline_spark.functions.ngram_lm import (
        perplexity,
        train_bigram_lm,
    )

    model = train_bigram_lm(corpus)
    p = perplexity(text, model)
    assert isinstance(p, float) and math.isfinite(p) and p > 0, (text, p)


# --- language-ID totality ----------------------------------------------------
@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_detect_language_total(text):
    """Arbitrary unicode (emoji, control chars, empty) must classify into
    a known label, never raise."""
    from nightcrawler_ds_pipeline_spark.functions.langid import (
        LANGS,
        detect_language,
    )

    assert detect_language(text) in set(LANGS) | {"und"}
