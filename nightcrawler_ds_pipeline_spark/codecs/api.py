"""Format-dispatching encode/decode used by fixtures and the decode UDFs.

``fmt='png'`` → real PNG (lossless). ``fmt='jpg'`` → real JPEG if PIL is
available, else the deterministic LSJ1 lossy stub (see ``lossy.py``); the
container has no JPEG library, so the stub path is what runs here. The
decoder sniffs magic bytes, so mixed / foreign payloads are handled and
corrupt payloads raise ValueError (the caller converts those to error rows —
reference analogue: error rows at s04_zyte.py:83-90,110-112).
"""

from __future__ import annotations

import io

import numpy as np

from nightcrawler_ds_pipeline_spark.codecs.lossy import decode_lossy, encode_lossy
from nightcrawler_ds_pipeline_spark.codecs.png import decode_png, encode_png

try:  # pragma: no cover - not installed in this container
    from PIL import Image as _PILImage

    _HAS_PIL = True
except ImportError:
    _PILImage = None
    _HAS_PIL = False


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt in ("jpg", "jpeg"):
        if _HAS_PIL:  # pragma: no cover
            buf = io.BytesIO()
            _PILImage.fromarray(pixels).save(buf, format="JPEG", quality=85)
            return buf.getvalue()
        return encode_lossy(pixels)
    raise ValueError(f"unsupported fmt {fmt!r}")


def decode_image(data: bytes) -> np.ndarray:
    """Decode by sniffing magic bytes. Raises ValueError on corrupt input."""
    if data is None or len(data) < 4:
        raise ValueError("empty or too-short image payload")
    head = bytes(data[:8])
    if head.startswith(b"\x89PNG"):
        return decode_png(bytes(data))
    if head.startswith(b"LSJ1"):
        return decode_lossy(bytes(data))
    if head.startswith(b"\xff\xd8"):  # real JPEG
        if _HAS_PIL:  # pragma: no cover
            return np.asarray(_PILImage.open(io.BytesIO(bytes(data))).convert("RGB"))
        raise ValueError("real JPEG payload but no JPEG decoder in environment")
    raise ValueError("unknown image payload (bad magic)")
