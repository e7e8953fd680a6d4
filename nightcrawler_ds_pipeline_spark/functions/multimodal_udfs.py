"""Multimodal payload operators: image resize (real), audio features and
video frame-sampling (Spark plumbing real; codec step STUBBED).

Task-brief contract: treat image/audio/video as opaque ``binary`` columns
with typed metadata; implement decode / feature-extract / resize /
frame-sample as Arrow-batched UDFs over ``mapInPandas``. The container has
no audio/video libraries (no soundfile/librosa/av/ffmpeg), so the codec
step for audio/video is STUBBED: if the real library is importable it is
used; otherwise a deterministic fake decoder parses our fixture payload
format ("RAW1" header + zlib PCM/frame planes). The Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape, binary-never-
returns rule — is real and tested either way.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from nightcrawler_ds_pipeline_spark.codecs import decode_image, encode_image
from nightcrawler_ds_pipeline_spark.codecs.phash import _resize_weights

try:  # pragma: no cover - not installed in this container
    import soundfile as _soundfile  # noqa: F401

    _HAS_AUDIO_LIB = True
except ImportError:
    _HAS_AUDIO_LIB = False

try:  # pragma: no cover - not installed in this container
    import av as _av  # noqa: F401

    _HAS_VIDEO_LIB = True
except ImportError:
    _HAS_VIDEO_LIB = False

_AUDIO_MAGIC = b"RAWA"
_VIDEO_MAGIC = b"RAWV"


# --- fixture payload codecs (the deterministic fakes) ------------------------
def encode_audio_raw(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono PCM + zlib — the stub audio container."""
    s = np.asarray(samples, dtype=np.int16)
    return _AUDIO_MAGIC + struct.pack(">IH", len(s), sample_rate) + zlib.compress(
        s.tobytes(), 6
    )


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Audio decode. STUB: real codecs need soundfile/librosa (absent here);
    the fake path handles the fixture RAWA container deterministically."""
    if _HAS_AUDIO_LIB:  # pragma: no cover
        import io

        samples, rate = _soundfile.read(io.BytesIO(bytes(data)), dtype="int16")
        return np.asarray(samples, dtype=np.int16), int(rate)
    if bytes(data[:4]) != _AUDIO_MAGIC:
        raise ValueError("unknown audio payload (no audio lib; expected RAWA stub)")
    n, rate = struct.unpack(">IH", data[4:10])
    samples = np.frombuffer(zlib.decompress(data[10:]), dtype=np.int16)
    if samples.size != n:
        raise ValueError("bad RAWA size")
    return samples, int(rate)


def encode_video_raw(frames: np.ndarray, fps: int) -> bytes:
    """(T, H, W) uint8 grayscale frames + zlib — the stub video container."""
    f = np.asarray(frames, dtype=np.uint8)
    t, h, w = f.shape
    return _VIDEO_MAGIC + struct.pack(">HHHH", t, h, w, fps) + zlib.compress(
        f.tobytes(), 6
    )


def decode_video(data: bytes) -> tuple[np.ndarray, int]:
    """Video decode. STUB: real codecs need PyAV/ffmpeg (absent here)."""
    if _HAS_VIDEO_LIB:  # pragma: no cover
        raise NotImplementedError("real video decode path not wired in sandbox")
    if bytes(data[:4]) != _VIDEO_MAGIC:
        raise ValueError("unknown video payload (no video lib; expected RAWV stub)")
    t, h, w, fps = struct.unpack(">HHHH", data[4:12])
    frames = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8)
    if frames.size != t * h * w:
        raise ValueError("bad RAWV size")
    return frames.reshape(t, h, w), int(fps)


# --- numpy kernels ------------------------------------------------------------
def resize_pixels(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Real area-average resize (same pinned weights as the pHash)."""
    arr = np.asarray(px, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    wh = _resize_weights(h, out_h)
    ww = _resize_weights(w, out_w)
    out = np.einsum("oh,hwc,pw->opc", wh, arr, ww)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# --- mapInPandas stages (binary in, stats out — payload never returns) --------
IMAGE_RESIZE_COLS = "thumb_w int, thumb_h int, thumb_mean double, resize_ok boolean"


def resize_images(df: DataFrame, out_h: int = 16, out_w: int = 16,
                  bytes_col: str = "bytes") -> DataFrame:
    """Decode → area-average resize → thumbnail stats (real end-to-end)."""
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != bytes_col
    ) + ", " + IMAGE_RESIZE_COLS

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            tw = np.zeros(n, dtype="int32")
            th = np.zeros(n, dtype="int32")
            tm = np.zeros(n, dtype="float64")
            ok = np.zeros(n, dtype=bool)
            for i, data in enumerate(pdf[bytes_col].values):
                try:
                    thumb = resize_pixels(decode_image(data), out_h, out_w)
                except Exception:
                    continue
                th[i], tw[i] = thumb.shape[0], thumb.shape[1]
                tm[i] = float(thumb.mean())
                ok[i] = True
            out = pdf.drop(columns=[bytes_col])
            out["thumb_w"], out["thumb_h"] = tw, th
            out["thumb_mean"], out["resize_ok"] = tm, ok
            yield out

    return df.repartition(df.sparkSession.sparkContext.defaultParallelism).mapInPandas(
        op, schema=schema
    )


AUDIO_FEATURE_COLS = (
    "duration_s double, rms double, zero_crossings bigint, decode_ok boolean"
)


def audio_features(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Audio feature-extract: duration / RMS / zero-crossing count."""
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != bytes_col
    ) + ", " + AUDIO_FEATURE_COLS

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            dur = np.zeros(n, dtype="float64")
            rms = np.zeros(n, dtype="float64")
            zc = np.zeros(n, dtype="int64")
            ok = np.zeros(n, dtype=bool)
            for i, data in enumerate(pdf[bytes_col].values):
                try:
                    samples, rate = decode_audio(data)
                except Exception:
                    continue
                x = samples.astype(np.float64) / 32768.0
                dur[i] = len(x) / max(rate, 1)
                rms[i] = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                zc[i] = int(np.count_nonzero(np.diff(np.signbit(x))))
                ok[i] = True
            out = pdf.drop(columns=[bytes_col])
            out["duration_s"], out["rms"] = dur, rms
            out["zero_crossings"], out["decode_ok"] = zc, ok
            yield out

    return df.repartition(df.sparkSession.sparkContext.defaultParallelism).mapInPandas(
        op, schema=schema
    )


VIDEO_SAMPLE_COLS = (
    "decoded_frames int, decoded_fps int, sampled_frames int, "
    "frame_mean double, decode_ok boolean"
)


def video_frame_sample(df: DataFrame, every_n: int = 5,
                       bytes_col: str = "bytes") -> DataFrame:
    """Frame-sample: keep every Nth frame, report stats over the sample."""
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != bytes_col
    ) + ", " + VIDEO_SAMPLE_COLS

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            nf = np.zeros(n, dtype="int32")
            fp = np.zeros(n, dtype="int32")
            sf = np.zeros(n, dtype="int32")
            fm = np.zeros(n, dtype="float64")
            ok = np.zeros(n, dtype=bool)
            for i, data in enumerate(pdf[bytes_col].values):
                try:
                    frames, fps = decode_video(data)
                except Exception:
                    continue
                sample = frames[::every_n]
                nf[i], fp[i], sf[i] = frames.shape[0], fps, sample.shape[0]
                fm[i] = float(sample.mean()) if sample.size else 0.0
                ok[i] = True
            out = pdf.drop(columns=[bytes_col])
            out["decoded_frames"], out["decoded_fps"] = nf, fp
            out["sampled_frames"], out["frame_mean"], out["decode_ok"] = sf, fm, ok
            yield out

    return df.repartition(df.sparkSession.sparkContext.defaultParallelism).mapInPandas(
        op, schema=schema
    )
