"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via ``mapInPandas``.

What is REAL here (and tested): the Spark-side plumbing — schemas, batch
shapes, partitioning, the pure-numpy PNG decode, nearest-neighbor resize,
and channel-statistics / thumbnail feature extraction.

What is STUBBED (this container ships no codec libraries): JPEG decode
falls back to the deterministic stand-in container
(functions/imaging.decode_image), and audio/video decoding raise
``NotImplementedError`` unless the optional libraries are importable —
the batch interfaces, output schemas, and frame-sampling logic are real,
so swapping in PIL/ffmpeg on a production cluster changes only the inner
decode call.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.imaging import decode_image

IMAGE_FEATURES_SCHEMA = (
    "image_id string, w int, h int, fmt string, "
    "mean_r double, mean_g double, mean_b double, std_gray double, "
    "thumb array<float>"
)

THUMB = 8  # 8x8 grayscale thumbnail -> 64-dim feature vector


def resize_nn(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy — REAL, not a stub)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[np.ix_(yi, xi)]


def image_features(pages: DataFrame) -> DataFrame:
    """bytes -> decoded pixels -> per-channel stats + 8x8 thumbnail vector.

    The thumbnail doubles as a cheap visual embedding for the similarity
    operators (cosine over ``thumb`` plugs straight into ann_*_topk)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for row in b.itertuples(index=False):
                img = decode_image(bytes(row.bytes), row.fmt).astype(np.float64)
                gray = img @ np.array([0.299, 0.587, 0.114])
                thumb = resize_nn(gray, THUMB, THUMB) / 255.0
                out.append(
                    {
                        "image_id": row.image_id,
                        "w": int(row.w),
                        "h": int(row.h),
                        "fmt": row.fmt,
                        "mean_r": float(img[:, :, 0].mean()),
                        "mean_g": float(img[:, :, 1].mean()),
                        "mean_b": float(img[:, :, 2].mean()),
                        "std_gray": float(gray.std()),
                        "thumb": thumb.flatten().astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return pages.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        process, IMAGE_FEATURES_SCHEMA
    )


IMAGE_FEATURES_VALIDATED_SCHEMA = (
    IMAGE_FEATURES_SCHEMA + ", phash_ok boolean, psnr_db double"
)


def image_features_validated(pages: DataFrame, seed: int) -> DataFrame:
    """image_features plus the north-rule per-row decode invariants,
    computed IN the batch UDF so the driver's rows-only check has teeth:

    - ``phash_ok``: phash64 recomputed from the decoded pixels equals the
      stored ``phash`` column;
    - ``psnr_db``: PSNR of decoded pixels vs the independently re-rendered
      ground truth (fixtures.expected_pixels) — exact (capped 99 dB) for
      png, ~46 dB for the lossy stand-in; the invariant floor is 40 dB.

    Callers filter on the invariants, so a broken decode path shows up as
    MISSING ROWS in the driver report, not as silently-wrong features."""
    from ..functions.imaging import phash64, psnr
    from ..sources.fixtures import expected_pixels

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for row in b.itertuples(index=False):
                img = decode_image(bytes(row.bytes), row.fmt).astype(np.float64)
                gray = img @ np.array([0.299, 0.587, 0.114])
                thumb = resize_nn(gray, THUMB, THUMB) / 255.0
                truth = expected_pixels(seed, int(row.image_id[4:]))
                p = psnr(img.astype(np.uint8), truth)
                out.append(
                    {
                        "image_id": row.image_id,
                        "w": int(row.w),
                        "h": int(row.h),
                        "fmt": row.fmt,
                        "mean_r": float(img[:, :, 0].mean()),
                        "mean_g": float(img[:, :, 1].mean()),
                        "mean_b": float(img[:, :, 2].mean()),
                        "std_gray": float(gray.std()),
                        "thumb": thumb.flatten().astype(np.float32).tolist(),
                        "phash_ok": phash64(img.astype(np.uint8)) == int(row.phash),
                        "psnr_db": min(float(p), 99.0),
                    }
                )
            yield pd.DataFrame(out)

    return pages.select("image_id", "bytes", "w", "h", "fmt", "phash").mapInPandas(
        process, IMAGE_FEATURES_VALIDATED_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = "clip_id string, sr int, n_samples long, rms double, peak double"


def audio_features(clips: DataFrame) -> DataFrame:
    """Audio plumbing: binary column -> per-clip loudness stats.

    Decode is a STUB boundary: tries soundfile/librosa, else raises
    NotImplementedError — unless the bytes are this engine's deterministic
    raw-PCM fake (header b'PCM16' + little-endian int16), which tests use
    so the batch path, schema, and math are fully exercised."""

    def decode_audio(data: bytes) -> tuple[int, np.ndarray]:
        if data.startswith(b"PCM16"):
            sr = int.from_bytes(data[5:9], "little")
            x = np.frombuffer(data[9:], dtype="<i2").astype(np.float64) / 32768.0
            return sr, x
        try:  # pragma: no cover - codec libs absent in this container
            import io

            import soundfile as sf

            x, sr = sf.read(io.BytesIO(data))
            return int(sr), np.asarray(x, dtype=np.float64)
        except ImportError:
            raise NotImplementedError(
                "audio decode requires soundfile/librosa; tests use the "
                "deterministic PCM16 fake container"
            ) from None

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for row in b.itertuples(index=False):
                sr, x = decode_audio(bytes(row.bytes))
                out.append(
                    {
                        "clip_id": row.clip_id,
                        "sr": sr,
                        "n_samples": len(x),
                        "rms": float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
                        "peak": float(np.abs(x).max()) if len(x) else 0.0,
                    }
                )
            yield pd.DataFrame(out)

    return clips.select("clip_id", "bytes").mapInPandas(process, AUDIO_FEATURES_SCHEMA)


VIDEO_FRAMES_SCHEMA = "video_id string, frame_idx int, ts_ms long, frame_png binary"


def sample_video_frames(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling plumbing (1->N row expansion inside mapInPandas).

    Decode is a STUB boundary: real containers need ffmpeg/av; the
    deterministic fake container (b'VID0' + frame count + concatenated
    PNG frames with length prefixes) exercises the expansion, timestamp
    arithmetic, and re-encode path for real."""

    def iter_frames(data: bytes):
        if not data.startswith(b"VID0"):
            raise NotImplementedError(
                "video decode requires ffmpeg/av; tests use the deterministic "
                "VID0 fake container"
            )
        n = int.from_bytes(data[4:8], "little")
        fps = int.from_bytes(data[8:12], "little") or 25
        pos = 12
        for i in range(n):
            ln = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
            yield i, int(i * 1000 / fps), data[pos : pos + ln]
            pos += ln

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for row in b.itertuples(index=False):
                for idx, ts, frame in iter_frames(bytes(row.bytes)):
                    if idx % every_n == 0:
                        out.append(
                            {
                                "video_id": row.video_id,
                                "frame_idx": idx,
                                "ts_ms": ts,
                                "frame_png": bytearray(frame),
                            }
                        )
            yield pd.DataFrame(
                out, columns=["video_id", "frame_idx", "ts_ms", "frame_png"]
            )

    return videos.select("video_id", "bytes").mapInPandas(process, VIDEO_FRAMES_SCHEMA)
