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
        [("bad", bytearray(b"OggS" + b"\x00" * 32))], "clip_id string, bytes binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|soundfile"):
        audio_features(df).collect()


def _wav_bytes(sr: int, samples: np.ndarray, sampwidth: int = 2, ch: int = 1) -> bytes:
    """Real WAV written by the INDEPENDENT stdlib ``wave`` module — the
    parser under test never sees its own writer."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        if sampwidth == 2:
            w.writeframes((samples * 32767).astype("<i2").tobytes())
        else:  # 8-bit PCM is unsigned
            w.writeframes(((samples * 127) + 128).clip(0, 255).astype(np.uint8).tobytes())
    return buf.getvalue()


def test_audio_real_wav_mono_and_stereo(spark):
    t = np.linspace(0, 1, 8000, endpoint=False)
    sine = np.sin(2 * np.pi * 440 * t) * 0.5
    stereo = np.stack([sine, sine * 0.2], axis=1).reshape(-1)  # interleaved
    df = spark.createDataFrame(
        [
            ("wav-mono", bytearray(_wav_bytes(8000, sine))),
            ("wav-stereo", bytearray(_wav_bytes(44100, stereo, ch=2))),
            ("wav-8bit", bytearray(_wav_bytes(16000, sine, sampwidth=1))),
        ],
        "clip_id string, bytes binary",
    )
    rows = {r["clip_id"]: r for r in audio_features(df).collect()}
    assert rows["wav-mono"]["sr"] == 8000
    assert rows["wav-mono"]["n_samples"] == 8000
    assert abs(rows["wav-mono"]["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert abs(rows["wav-mono"]["peak"] - 0.5) < 0.01
    # stereo: n_samples counts FRAMES (soundfile convention), rms over both
    # channels; quiet right channel drags rms below the mono clip's
    assert rows["wav-stereo"]["sr"] == 44100
    assert rows["wav-stereo"]["n_samples"] == 8000  # frames, not flat samples
    assert rows["wav-stereo"]["rms"] < rows["wav-mono"]["rms"]
    assert abs(rows["wav-stereo"]["peak"] - 0.5) < 0.01
    # 8-bit unsigned round-trips to the same loudness at ~1/128 resolution
    assert abs(rows["wav-8bit"]["rms"] - 0.5 / np.sqrt(2)) < 0.02
    assert rows["wav-8bit"]["sr"] == 16000


def test_parse_wav_float32_and_malformed():
    from webcrawl_lowres_lang_spark.operators.multimodal import parse_wav

    # IEEE-float-32 fmt chunk built per the spec (format tag 3)
    x = (np.sin(np.linspace(0, 20, 500)) * 0.25).astype("<f4")
    fmt = (
        (3).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (22050).to_bytes(4, "little") + (22050 * 4).to_bytes(4, "little")
        + (4).to_bytes(2, "little") + (32).to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(x.tobytes()).to_bytes(4, "little") + x.tobytes()
    wav = b"RIFF" + len(body).to_bytes(4, "little") + body
    sr, got = parse_wav(wav)
    assert sr == 22050
    np.testing.assert_allclose(got, x.astype(np.float64), atol=1e-7)
    with pytest.raises(ValueError):
        parse_wav(b"RIFFxxxx")  # truncated, no WAVE tag


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


def _avi_bytes(frames_jpeg: list[bytes], usec_per_frame: int) -> bytes:
    """Spec-built RIFF-AVI (hdrl: avih + one vids/MJPG strl; movi: '00dc'
    chunks) — layout straight from the public AVI RIFF form, so the parser
    is exercised on the real container shape including word alignment."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return tag + len(data).to_bytes(4, "little") + data + (b"\x00" if len(data) & 1 else b"")

    def lst(ltype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", ltype + data)

    avih = (
        usec_per_frame.to_bytes(4, "little")  # dwMicroSecPerFrame
        + bytes(12)
        + len(frames_jpeg).to_bytes(4, "little")  # dwTotalFrames
        + bytes(36)
    )
    strh = b"vids" + b"MJPG" + bytes(48)
    strf = bytes(40)  # BITMAPINFOHEADER placeholder
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames_jpeg))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_video_real_avi_mjpeg(spark):
    from webcrawl_lowres_lang_spark.functions.imaging import jpeg_encode, png_decode, psnr

    truths = [render_image(11, f"avi-f{i}", 24, 16) for i in range(25)]
    frames = [jpeg_encode(t, quality=98) for t in truths]
    # odd-length JPEG payloads exercise the word-alignment pad path
    assert any(len(f) & 1 for f in frames)
    df = spark.createDataFrame(
        [("avi-1", bytearray(_avi_bytes(frames, usec_per_frame=40000)))],
        "video_id string, bytes binary",
    )
    rows = sorted(sample_video_frames(df, every_n=10).collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 10, 20]
    assert [r["ts_ms"] for r in rows] == [0, 400, 800]  # 25 fps from avih
    for r in rows:
        img = png_decode(bytes(r["frame_png"]))
        assert img.shape == (16, 24, 3)
        assert psnr(img, truths[r["frame_idx"]]) >= 40.0  # north-rule lossy floor


def test_video_non_mjpeg_avi_raises(spark):
    df = spark.createDataFrame(
        [("avi-bad", bytearray(_avi_bytes([b"\x00\x01notjpeg"], 40000)))],
        "video_id string, bytes binary",
    )
    with pytest.raises(Exception, match="MJPEG|ffmpeg"):
        sample_video_frames(df, every_n=1).collect()


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
