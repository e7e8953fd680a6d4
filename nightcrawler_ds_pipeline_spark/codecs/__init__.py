"""Deterministic image codecs (pure numpy + zlib — no native image libs).

``png`` is a real, spec-conformant subset PNG codec (lossless round-trip).
``lossy`` is the container stand-in for JPEG: a clearly-marked deterministic
quantization codec used because PIL/libjpeg are not available in this
environment; its reconstruction error is bounded so PSNR ≥ 46 dB, satisfying
the BASELINE.json ≥ 40 dB lossy gate. ``phash`` is the pinned 64-bit DCT
perceptual hash shared by the fixture generator and the engine.
"""

from nightcrawler_ds_pipeline_spark.codecs.png import encode_png, decode_png
from nightcrawler_ds_pipeline_spark.codecs.lossy import encode_lossy, decode_lossy
from nightcrawler_ds_pipeline_spark.codecs.phash import phash64, hamming64
from nightcrawler_ds_pipeline_spark.codecs.metrics import psnr
from nightcrawler_ds_pipeline_spark.codecs.api import encode_image, decode_image

__all__ = [
    "encode_png",
    "decode_png",
    "encode_lossy",
    "decode_lossy",
    "phash64",
    "hamming64",
    "psnr",
    "encode_image",
    "decode_image",
]
