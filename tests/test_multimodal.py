"""Multimodal plumbing: resize (real), audio/video (stub codec, real Spark
plumbing) — error containment, payload-never-returns, deterministic stats."""

import numpy as np
import pytest

from nightcrawler_ds_pipeline_spark.fixtures.multimodal import (
    gen_audio_pdf,
    gen_video_pdf,
)
from nightcrawler_ds_pipeline_spark.functions.multimodal_udfs import (
    audio_features,
    decode_audio,
    decode_video,
    encode_audio_raw,
    encode_video_raw,
    resize_images,
    resize_pixels,
    video_frame_sample,
)


def test_resize_pixels_exact_shape_and_range():
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    out = resize_pixels(px, 16, 16)
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8
    # area-average preserves the global mean closely
    assert abs(float(out.mean()) - float(px.mean())) < 2.0


def test_audio_roundtrip_and_corrupt():
    s = (np.sin(np.linspace(0, 50, 8000)) * 10000).astype(np.int16)
    data = encode_audio_raw(s, 8000)
    dec, rate = decode_audio(data)
    assert rate == 8000 and np.array_equal(dec, s)
    with pytest.raises(ValueError):
        decode_audio(b"\x00\x01\x02\x03junk")


def test_video_roundtrip_and_corrupt():
    frames = np.arange(10 * 8 * 8, dtype=np.uint8).reshape(10, 8, 8) % 256
    dec, fps = decode_video(encode_video_raw(frames, 25))
    assert fps == 25 and np.array_equal(dec, frames)
    with pytest.raises(ValueError):
        decode_video(b"nope")


def test_audio_features_stage(spark):
    audio = spark.createDataFrame(gen_audio_pdf(100))
    feats = audio_features(audio)
    assert "bytes" not in feats.columns  # payload never returns
    rows = feats.collect()
    ok = [r for r in rows if r["decode_ok"]]
    bad = [r for r in rows if not r["decode_ok"]]
    assert len(ok) > 0 and len(bad) > 0  # corrupt rows contained, not raised
    for r in ok:
        assert r["duration_s"] > 0 and 0 < r["rms"] < 1 and r["zero_crossings"] > 0


def test_video_frame_sample_stage(spark):
    video = spark.createDataFrame(gen_video_pdf(60))
    sampled = video_frame_sample(video, every_n=5)
    assert "bytes" not in sampled.columns
    rows = sampled.collect()
    ok = [r for r in rows if r["decode_ok"]]
    assert len(ok) > 0
    for r in ok:
        # ceil(n_frames / 5)
        assert r["sampled_frames"] == -(-r["decoded_frames"] // 5)
        assert r["decoded_frames"] == r["n_frames"] and r["decoded_fps"] == r["fps"]


def test_resize_images_stage(spark, t1_dir):
    imgs = spark.read.parquet(f"{t1_dir}/images.parquet").select(
        "image_id", "fmt", "bytes"
    )
    out = resize_images(imgs, 16, 16)
    assert "bytes" not in out.columns
    rows = out.collect()
    ok = [r for r in rows if r["resize_ok"]]
    assert len(ok) > 400  # corrupt fixtures fail, rest succeed
    assert all(r["thumb_w"] == 16 and r["thumb_h"] == 16 for r in ok)
