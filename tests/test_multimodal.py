"""Multimodal plumbing tests: real image features; audio/video through the
deterministic fake containers (codec boundary is a documented stub)."""

from __future__ import annotations

import numpy as np
import pytest

from webcrawl_lowres_lang_spark.functions.imaging import png_encode, render_image
from webcrawl_lowres_lang_spark.operators.multimodal import (
    audio_features,
    image_features,
    sample_video_frames,
)
from webcrawl_lowres_lang_spark.sources import fixtures as fx


def test_image_features(spark):
    lex = [t for t, _ in fx.gen_lexicon_rows(42, 16)]
    pages = fx.gen_pages(spark, 42, 12, lex)
    rows = {r["image_id"]: r for r in image_features(pages).collect()}
    assert len(rows) == 12
    r = rows["img-00000000"]
    assert len(r["thumb"]) == 64
    assert 0.0 <= min(r["thumb"]) and max(r["thumb"]) <= 1.0
    assert 0 < r["mean_r"] < 255 and r["std_gray"] > 0
    # deterministic: recompute locally
    img = render_image(42, "img-00000000", r["w"], r["h"]).astype(np.float64)
    assert abs(img[:, :, 0].mean() - r["mean_r"]) < 1e-9


def _pcm_clip(sr: int, samples: np.ndarray) -> bytearray:
    return bytearray(
        b"PCM16" + sr.to_bytes(4, "little") + (samples * 32767).astype("<i2").tobytes()
    )


def test_audio_features_fake_container(spark):
    t = np.linspace(0, 1, 8000, endpoint=False)
    sine = np.sin(2 * np.pi * 440 * t) * 0.5
    df = spark.createDataFrame(
        [("clip-1", _pcm_clip(8000, sine)), ("clip-2", _pcm_clip(16000, sine * 0.1))],
        "clip_id string, bytes binary",
    )
    rows = {r["clip_id"]: r for r in audio_features(df).collect()}
    assert rows["clip-1"]["sr"] == 8000
    assert rows["clip-1"]["n_samples"] == 8000
    assert abs(rows["clip-1"]["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert rows["clip-2"]["peak"] < rows["clip-1"]["peak"]


def test_audio_unknown_codec_raises(spark):
    df = spark.createDataFrame(
        [("bad", bytearray(b"RIFFxxxx"))], "clip_id string, bytes binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|soundfile"):
        audio_features(df).collect()


def _vid(video_id: str, n_frames: int, fps: int = 25) -> bytearray:
    frames = []
    for i in range(n_frames):
        png = png_encode(render_image(7, f"{video_id}-f{i}", 16, 16))
        frames.append(len(png).to_bytes(4, "little") + png)
    return bytearray(b"VID0" + n_frames.to_bytes(4, "little") + fps.to_bytes(4, "little") + b"".join(frames))


def test_video_frame_sampling(spark):
    df = spark.createDataFrame(
        [("vid-1", _vid("vid-1", 25))], "video_id string, bytes binary"
    )
    rows = sample_video_frames(df, every_n=10).collect()
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 10, 20]
    assert rows[0]["ts_ms"] == 0
    # sampled frames decode back to valid pixels
    from webcrawl_lowres_lang_spark.functions.imaging import png_decode

    img = png_decode(bytes(sorted(rows, key=lambda r: r["frame_idx"])[1]["frame_png"]))
    assert img.shape == (16, 16, 3)


def test_expected_features_fixture_in_sync():
    """The committed oracle fixture (tests/fixtures/multimodal_expected.
    parquet) must be byte-identical to a fresh regeneration of the pandas
    twin — a drift guard so the multimodal oracle can never silently pin
    stale expectations."""
    import pandas as pd

    from webcrawl_lowres_lang_spark.sources.fixtures import expected_image_features_rows

    committed = pd.read_parquet("tests/fixtures/multimodal_expected.parquet")
    fresh = expected_image_features_rows(42, 24, 16)
    pd.testing.assert_frame_equal(committed, fresh)
