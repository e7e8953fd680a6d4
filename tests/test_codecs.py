"""Codec correctness: lossless round-trip, lossy PSNR gate, pinned phash."""

import numpy as np
import pytest

from nightcrawler_ds_pipeline_spark.codecs import (
    decode_image,
    decode_png,
    encode_image,
    encode_png,
    hamming64,
    phash64,
    psnr,
)


def _tile(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)


@pytest.mark.parametrize("shape", [(32, 32), (48, 64), (128, 128), (7, 13)])
def test_png_roundtrip_lossless(shape):
    px = _tile(*shape)
    out = decode_png(encode_png(px))
    assert out.shape == px.shape
    assert np.array_equal(out, px)  # allclose-for-lossless gate (exact)


def test_png_gray_and_rgba():
    g = _tile(16, 16)[:, :, 0]
    assert np.array_equal(decode_png(encode_png(g))[:, :, 0], g)
    rgba = np.dstack([_tile(16, 16), np.full((16, 16), 77, np.uint8)])
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)


def test_png_deterministic_bytes():
    px = _tile(32, 32, seed=3)
    assert encode_png(px) == encode_png(px)


def test_lossy_psnr_gate():
    px = _tile(64, 64, seed=1)
    out = decode_image(encode_image(px, "jpg"))
    assert out.shape == px.shape
    assert psnr(px, out) >= 40.0  # BASELINE.json lossy gate


def test_corrupt_bytes_raise():
    px = _tile(32, 32)
    data = encode_image(px, "png")[:20]
    with pytest.raises(ValueError):
        decode_image(data)
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01\x02\x03garbage")


def test_phash_deterministic_and_robust():
    px = _tile(128, 128, seed=5)
    h1 = phash64(px)
    assert h1 == phash64(px.copy())
    assert isinstance(h1, int)
    assert -(1 << 63) <= h1 < (1 << 63)
    # lossy re-encode should barely move the hash (perceptual property)
    lossy = decode_image(encode_image(px, "jpg"))
    assert hamming64(h1, phash64(lossy)) <= 4
    # a very different image should be far
    other = _tile(128, 128, seed=99)
    assert hamming64(h1, phash64(other)) > 10


def test_phash_distinguishes_structured_images():
    # gradient vs inverted gradient
    yy, xx = np.mgrid[0:64, 0:64]
    a = ((yy + xx) * 2 % 256).astype(np.uint8)
    b = (255 - a).astype(np.uint8)
    assert hamming64(phash64(a), phash64(b)) > 8
