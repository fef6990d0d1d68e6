"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via ``mapInPandas``.

What is REAL here (and tested): the Spark-side plumbing — schemas, batch
shapes, partitioning, the pure-numpy PNG/JFIF codecs, nearest-neighbor
resize, channel-statistics / thumbnail feature extraction — and, as of
round 5, the two baseline container formats on the audio/video paths:

- audio: RIFF-WAVE (PCM 8/16/32-bit and IEEE-float-32, mono or
  multi-channel, word-aligned chunk walk) parsed in pure numpy; tested
  against files written by the INDEPENDENT stdlib ``wave`` module;
- video: RIFF-AVI with an MJPEG video stream ('00dc' chunks) — frame
  rate from ``avih.dwMicroSecPerFrame``, each sampled frame entropy-
  decoded by the in-repo T.81 JPEG decoder and re-encoded as PNG.

What remains a STUB boundary: compressed audio (mp3/ogg/flac) and
inter-frame video codecs (H.264 etc.) raise ``NotImplementedError``
unless the optional libraries are importable — the batch interfaces,
output schemas, and frame-sampling logic are identical, so swapping in
soundfile/ffmpeg on a production cluster changes only the inner decode
call. The deterministic fake containers (PCM16/VID0) remain accepted for
cheap fixtures.
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


def _riff_chunks(data: bytes, pos: int, end: int):
    """Walk word-aligned RIFF chunks: yields (fourcc, body_start, body_len).
    Shared by the WAVE and AVI parsers (RIFF is one container spec)."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = pos + 8
        if body + ln > end:
            raise ValueError("truncated RIFF chunk")
        yield tag, body, ln
        pos = body + ln + (ln & 1)  # chunks are 2-byte aligned


def parse_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF-WAVE decode (REAL, pure numpy): PCM 8-bit unsigned / 16-bit /
    32-bit signed and IEEE-float-32, mono or interleaved multi-channel.
    Returns (sample_rate, samples in [-1, 1]; 2-D (frames, ch) when ch>1)
    — the same conventions as ``soundfile.read``, and pinned in tests
    against files written by the independent stdlib ``wave`` module."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    fmt = raw = None
    for tag, body, ln in _riff_chunks(data, 12, min(len(data), 8 + int.from_bytes(data[4:8], "little"))):
        if tag == b"fmt ":
            fmt = data[body : body + ln]
        elif tag == b"data":
            raw = data[body : body + ln]
    if fmt is None or len(fmt) < 16 or raw is None:
        raise ValueError("WAVE stream missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    ch = int.from_bytes(fmt[2:4], "little") or 1
    sr = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    width = max(bits // 8, 1)
    raw = raw[: len(raw) // (width * ch) * width * ch]  # drop a ragged tail
    if (audio_fmt, bits) == (1, 16):
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif (audio_fmt, bits) == (1, 8):  # 8-bit PCM is UNSIGNED per the spec
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif (audio_fmt, bits) == (1, 32):
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    elif (audio_fmt, bits) == (3, 32):
        x = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    else:
        raise NotImplementedError(
            f"unsupported WAVE encoding (format {audio_fmt}, {bits}-bit); "
            "compressed audio needs soundfile/librosa"
        )
    return sr, x.reshape(-1, ch) if ch > 1 else x


def audio_features(clips: DataFrame) -> DataFrame:
    """Audio plumbing: binary column -> per-clip loudness stats.

    RIFF-WAVE decode is REAL (``parse_wav``). Compressed formats are the
    remaining stub boundary: tries soundfile/librosa, else raises
    NotImplementedError. The deterministic raw-PCM fake (header b'PCM16'
    + little-endian int16) stays accepted for cheap fixtures."""

    def decode_audio(data: bytes) -> tuple[int, np.ndarray]:
        if data.startswith(b"PCM16"):
            sr = int.from_bytes(data[5:9], "little")
            x = np.frombuffer(data[9:], dtype="<i2").astype(np.float64) / 32768.0
            return sr, x
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            return parse_wav(data)
        try:  # pragma: no cover - codec libs absent in this container
            import io

            import soundfile as sf

            x, sr = sf.read(io.BytesIO(data))
            return int(sr), np.asarray(x, dtype=np.float64)
        except ImportError:
            raise NotImplementedError(
                "compressed-audio decode requires soundfile/librosa; "
                "WAV (PCM/float) decodes natively"
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


def parse_avi_mjpeg(data: bytes) -> tuple[int, list[bytes]]:
    """RIFF-AVI parse (REAL): returns (micro-sec per frame, the video
    stream's frame payloads). Walks the LIST tree for ``avih`` (frame
    timing, 'hdrl' LIST) and the '00dc'/'00db' chunks ('movi' LIST).
    Only the MJPEG payload form is decodable in-repo (each '00dc' chunk
    is a complete JPEG, handed to functions/imaging.jpeg_decode)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    usec = 40000  # 25 fps default when avih is absent
    frames: list[bytes] = []

    def scan(pos: int, end: int) -> None:
        nonlocal usec
        for tag, body, ln in _riff_chunks(data, pos, end):
            if tag == b"LIST":
                scan(body + 4, body + ln)  # recurse past the list type
            elif tag == b"avih" and ln >= 4:
                usec = int.from_bytes(data[body : body + 4], "little") or usec
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                frames.append(data[body : body + ln])

    scan(12, min(len(data), 8 + int.from_bytes(data[4:8], "little")))
    return usec, frames


def sample_video_frames(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling plumbing (1->N row expansion inside mapInPandas).

    RIFF-AVI with an MJPEG stream decodes for REAL: container parse above,
    per-frame entropy decode through the in-repo T.81 JPEG decoder,
    re-encode as PNG (the schema's frame format). Inter-frame codecs
    (H.264 etc.) are the remaining stub boundary (need ffmpeg/av). The
    deterministic fake container (b'VID0' + frame count + concatenated
    PNG frames with length prefixes) stays accepted for cheap fixtures."""
    from ..functions.imaging import jpeg_decode, png_encode

    def iter_frames(data: bytes):
        """Yields (idx, ts_ms, kind, payload); the MJPEG transcode runs in
        ``process`` AFTER the every_n sample gate, so skipped frames cost a
        container-offset walk, never an entropy decode."""
        if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
            usec, frames = parse_avi_mjpeg(data)
            for i, frame in enumerate(frames):
                yield i, i * usec // 1000, "jpeg", frame
            return
        if not data.startswith(b"VID0"):
            raise NotImplementedError(
                "video decode: RIFF-AVI/MJPEG is native; other containers "
                "require ffmpeg/av"
            )
        n = int.from_bytes(data[4:8], "little")
        fps = int.from_bytes(data[8:12], "little") or 25
        pos = 12
        for i in range(n):
            ln = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
            yield i, int(i * 1000 / fps), "png", data[pos : pos + ln]
            pos += ln

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for row in b.itertuples(index=False):
                for idx, ts, kind, frame in iter_frames(bytes(row.bytes)):
                    if idx % every_n != 0:
                        continue
                    if kind == "jpeg":
                        if not frame.startswith(b"\xff\xd8"):
                            raise NotImplementedError(
                                "only MJPEG AVI streams decode in-repo; "
                                "other codecs need ffmpeg/av"
                            )
                        frame = png_encode(jpeg_decode(frame))
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
