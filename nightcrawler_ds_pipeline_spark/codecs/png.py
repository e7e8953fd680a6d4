"""Minimal spec-conformant PNG codec in pure numpy + zlib.

Written from the public PNG specification (RFC 2083 / W3C PNG spec).
Encoder: 8-bit grayscale / RGB / RGBA, filter type 0 (None), fixed zlib
level → byte-deterministic output. Decoder: 8-bit gray/RGB/RGBA with all
five scanline filters (None, Sub, Up, Average, Paeth), so it also reads
PNGs produced by other encoders.

Deterministic by construction — no wall-clock, no randomness.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → channels
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """Encode an (H, W) or (H, W, {1,3,4}) uint8 array as PNG bytes."""
    arr = np.asarray(pixels)
    if arr.dtype != np.uint8:
        raise ValueError(f"pixels must be uint8, got {arr.dtype}")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"unsupported shape {arr.shape}")
    h, w, c = arr.shape
    color_type = _COLOR_TYPE[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 prepended to each scanline
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to an (H, W, C) uint8 array (C ∈ {1, 3, 4})."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = bit_depth = color_type = None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG (chunk header)")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG (chunk payload)")
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={bit_depth} color={color_type})"
                )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    c = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * c
    if raw.size != h * stride:
        raise ValueError("bad PNG data size")
    raw = raw.reshape(h, stride)
    filters = raw[:, 0]
    scan = raw[:, 1:].copy()
    # fast path: all scanlines filter 0 (what our encoder emits) — pure
    # reshape, no per-scanline Python loop (hot path for the decode UDF)
    if not filters.any():
        return scan.reshape(h, w, c)
    out = np.zeros((h, w * c), dtype=np.uint8)
    bpp = c  # bytes per pixel at depth 8
    for y in range(h):
        line = scan[y]
        f = filters[y]
        prev = out[y - 1] if y > 0 else np.zeros(w * c, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub
            acc = line.astype(np.int32)
            for x in range(bpp, w * c):
                acc[x] = (acc[x] + acc[x - bpp]) & 0xFF
            out[y] = acc.astype(np.uint8)
        elif f == 2:  # Up
            out[y] = (line.astype(np.int32) + prev) & 0xFF
        elif f == 3:  # Average
            acc = np.zeros(w * c, dtype=np.int32)
            for x in range(w * c):
                left = acc[x - bpp] if x >= bpp else 0
                acc[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
            out[y] = acc.astype(np.uint8)
        elif f == 4:  # Paeth
            acc = np.zeros(w * c, dtype=np.uint8)
            for x in range(w * c):
                a = acc[x - bpp] if x >= bpp else np.uint8(0)
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else np.uint8(0)
                acc[x] = (int(line[x]) + int(_paeth(np.array(a), np.array(b), np.array(cc)))) & 0xFF
            out[y] = acc
        else:
            raise ValueError(f"bad filter type {f}")
    return out.reshape(h, w, c)
