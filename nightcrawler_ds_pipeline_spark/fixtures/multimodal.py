"""Deterministic audio/video fixture tables (in-memory, seed-stable).

Opaque binary payloads + typed metadata, matching the image table's shape
philosophy (BASELINE input_hint). ~3% corrupt payloads exercise error rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from nightcrawler_ds_pipeline_spark.functions.multimodal_udfs import (
    encode_audio_raw,
    encode_video_raw,
)

SEED = 42


def gen_audio_pdf(n: int = 200, seed: int = SEED) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 10)
    rows = []
    for i in range(n):
        rate = [8000, 16000][i % 2]
        dur_s = 0.2 + (i % 5) * 0.1
        t = np.arange(int(rate * dur_s))
        freq = 110.0 * (1 + i % 8)
        samples = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype(np.int16)
        samples = samples + rng.integers(-500, 500, len(samples)).astype(np.int16)
        data = encode_audio_raw(samples, rate)
        if i % 31 == 7:  # ~3% corrupt
            data = data[: len(data) // 2]
        rows.append(
            {
                "audio_id": f"aud{i:08d}",
                "bytes": data,
                "sample_rate": np.int32(rate),
                "n_samples": np.int32(len(samples)),
                "codec": "rawa",
                "caption": f"audio clip {i} tone {int(freq)}hz",
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["sample_rate"] = pdf["sample_rate"].astype("int32")
    pdf["n_samples"] = pdf["n_samples"].astype("int32")
    return pdf


def gen_video_pdf(n: int = 100, seed: int = SEED) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 11)
    rows = []
    for i in range(n):
        t, h, w = 10 + (i % 3) * 5, 24, 32
        fps = [10, 25][i % 2]
        base = rng.integers(0, 255, (h, w), dtype=np.uint8)
        frames = np.stack(
            [np.roll(base, shift=k, axis=1) for k in range(t)], axis=0
        ).astype(np.uint8)
        data = encode_video_raw(frames, fps)
        if i % 29 == 3:  # ~3% corrupt
            data = data[: len(data) // 3]
        rows.append(
            {
                "video_id": f"vid{i:08d}",
                "bytes": data,
                "fps": np.int32(fps),
                "n_frames": np.int32(t),
                "w": np.int32(w),
                "h": np.int32(h),
                "codec": "rawv",
                "caption": f"video clip {i}",
            }
        )
    pdf = pd.DataFrame(rows)
    for c in ("fps", "n_frames", "w", "h"):
        pdf[c] = pdf[c].astype("int32")
    return pdf
