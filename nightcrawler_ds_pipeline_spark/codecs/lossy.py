"""Deterministic lossy codec — the container stand-in for JPEG.

STUB NOTE (clearly marked per the build brief): this environment has no
JPEG library (no PIL / libjpeg / cv2), so rows with ``fmt='jpg'`` use this
deterministic quantization codec ("LSJ1") instead of real JPEG. The Spark
plumbing (binary column, Arrow-batched decode UDFs, schema, partitioning) is
identical to what a real JPEG path would use; only the byte format differs.
If PIL is installed, ``encode_image/decode_image`` in ``api.py`` switch to
real JPEG automatically.

Codec: per-channel uniform quantization to 6 bits (v >> 2), zlib-compressed.
Reconstruction v' = 4·q + 1 bounds per-pixel error to {−2, −1, 0, +1}
→ MSE ≤ 1.5 → PSNR ≥ 10·log10(255²/1.5) ≈ 46.4 dB, satisfying the
BASELINE.json lossy gate (PSNR ≥ 40 dB) with margin.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"LSJ1"


def encode_lossy(pixels: np.ndarray, level: int = 6) -> bytes:
    arr = np.asarray(pixels)
    if arr.dtype != np.uint8:
        raise ValueError(f"pixels must be uint8, got {arr.dtype}")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    quant = (arr >> 2).astype(np.uint8)
    payload = zlib.compress(quant.tobytes(), level)
    return _MAGIC + struct.pack(">HHB", w, h, c) + payload


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != _MAGIC:
        raise ValueError("not an LSJ1 payload (bad magic)")
    w, h, c = struct.unpack(">HHB", data[4:9])
    quant = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8)
    if quant.size != h * w * c:
        raise ValueError("bad LSJ1 data size")
    out = (quant.reshape(h, w, c).astype(np.uint8) << 2) + 1
    return out
