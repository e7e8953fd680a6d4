"""Pinned 64-bit DCT perceptual hash (pHash) — numpy only.

This is THE canonical implementation: the fixture generator and the engine's
decode UDF both import it, so phash values agree bit-for-bit (FIXTURES.md §1
requires a single pinned implementation). Algorithm (standard public pHash
construction): Rec.601 luma → exact area-average resize to 32×32 →
orthonormal 2-D DCT-II → top-left 8×8 coefficient block → threshold each of
the 64 coefficients against the median of the 63 AC coefficients → pack
big-endian (row-major, MSB first) → reinterpret the uint64 as signed int64
(Spark LongType has no unsigned 64-bit).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

_HASH_SIZE = 8
_RESIZE = 32


@lru_cache(maxsize=None)
def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix D such that y = D @ x."""
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    d = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0, :] /= np.sqrt(2.0)
    return d


@lru_cache(maxsize=64)  # bounded: real corpora have many distinct dims
def _resize_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) exact area-average resampling matrix (rows sum to 1)."""
    w = np.zeros((n_out, n_in), dtype=np.float64)
    scale = n_in / n_out
    for o in range(n_out):
        lo, hi = o * scale, (o + 1) * scale
        i0, i1 = int(np.floor(lo)), int(np.ceil(hi))
        for i in range(i0, min(i1, n_in)):
            overlap = min(hi, i + 1) - max(lo, i)
            if overlap > 0:
                w[o, i] = overlap
        w[o] /= w[o].sum()
    return w


def _to_gray(pixels: np.ndarray) -> np.ndarray:
    arr = np.asarray(pixels, dtype=np.float64)
    if arr.ndim == 2:
        return arr
    if arr.shape[2] == 1:
        return arr[:, :, 0]
    # Rec.601 luma over the first 3 channels (alpha ignored)
    return 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT pHash of an (H, W[, C]) uint8 image → signed int64."""
    gray = _to_gray(pixels)
    h, w = gray.shape
    g = _resize_weights(h, _RESIZE) @ gray @ _resize_weights(w, _RESIZE).T
    d = _dct_matrix(_RESIZE)
    coef = d @ g @ d.T
    block = coef[:_HASH_SIZE, :_HASH_SIZE].ravel()
    med = np.median(block[1:])  # median of the 63 AC coefficients
    bits = block > med
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # uint64 → signed int64 (two's complement) for Spark LongType
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two signed-int64-packed 64-bit hashes."""
    return int(bin(((a ^ b) + (1 << 64)) & ((1 << 64) - 1)).count("1"))
