"""Image codec + perceptual hashing for the image+caption content store
(BASELINE.json input_hint: ``bytes:binary, w:int32, h:int32, fmt:string,
phash:int64``; per-row invariant: decoded-pixel allclose / PSNR>=40dB for
lossy formats).

The sandbox has no image libraries (no PIL/opencv), so:
- ``png`` is a REAL, self-contained codec: pure numpy + zlib PNG
  (8-bit RGB, filter-0 scanlines) — lossless round-trip.
- ``jpeg`` is a clearly-marked deterministic STAND-IN for a lossy codec:
  pixels are quantized (step 4 -> PSNR ~46 dB, above the 40 dB gate) and
  stored in the same PNG container. ``decode_image`` first tries a real
  JPEG via PIL if present; otherwise it decodes the stand-in container.
  On a production cluster with codec libs installed, only ``_decode_jpeg``
  changes — every Spark-side signature, schema, batch shape, and test
  stays identical.

All batch entry points are Arrow/pandas-UDF-shaped (numpy over pd.Series),
never per-row Python in the Spark hot path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_QUANT_STEP = 4  # stand-in lossy quantization; PSNR ≈ 46.4 dB


# --- PNG codec (pure numpy + zlib) ------------------------------------------


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 -> PNG bytes (color type 2, bit depth 8, filter 0)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("png_encode expects HxWx3 uint8")
    h, w, _ = arr.shape
    scan = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 1:] = arr.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes produced by ``png_encode`` (filter 0/1/2 supported)."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos, w, h, idat = len(_PNG_MAGIC), 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    filters, scan = raw[:, 0], raw[:, 1:].copy()
    out = np.zeros_like(scan)
    for i in range(h):
        f, line = filters[i], scan[i].astype(np.int64)
        if f == 0:
            out[i] = line
        elif f == 1:  # Sub
            acc = line.reshape(w, 3)
            for x in range(1, w):
                acc[x] = (acc[x] + acc[x - 1]) & 0xFF
            out[i] = acc.reshape(-1)
        elif f == 2:  # Up
            out[i] = (line + out[i - 1]) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {f}")
    return out.astype(np.uint8).reshape(h, w, 3)


# --- lossy stand-in -----------------------------------------------------------


def jpeg_encode_standin(arr: np.ndarray) -> bytes:
    """Deterministic lossy stand-in: quantize then store as PNG container.

    STUB for a real JPEG encoder (no codec libs in this container). The
    quantization loses information like a real lossy codec, with PSNR
    ~46 dB — above the 40 dB per-row invariant gate.
    """
    q = _JPEG_QUANT_STEP
    quant = ((arr.astype(np.int32) + q // 2) // q * q).clip(0, 255).astype(np.uint8)
    return png_encode(quant)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode stored bytes -> HxWx3 uint8 pixels.

    png -> pure-numpy decoder. jpeg -> real PIL decode when available,
    else the deterministic stand-in container; anything else raises
    NotImplementedError (clearly-marked stub boundary).
    """
    if fmt == "png":
        return png_decode(data)
    if fmt == "jpeg":
        try:
            from io import BytesIO

            from PIL import Image  # pragma: no cover - not in sandbox

            return np.asarray(Image.open(BytesIO(data)).convert("RGB"))
        except ImportError:
            if data.startswith(_PNG_MAGIC):
                return png_decode(data)  # stand-in container
            raise NotImplementedError(
                "real JPEG decode requires an image codec library (PIL); "
                "sandbox uses the deterministic PNG-container stand-in"
            ) from None
    raise NotImplementedError(f"unsupported image format: {fmt}")


# --- deterministic renderer ----------------------------------------------------


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(31)
    return x


def render_image(seed: int, key: str, w: int, h: int) -> np.ndarray:
    """Deterministic HxWx3 uint8 image keyed by (seed, key): smooth gradient
    + structured noise. Same (seed,key,w,h) -> identical pixels anywhere."""
    # uint64 wraparound here is intentional (splitmix-style mixing) —
    # errstate keeps numpy's overflow RuntimeWarning out of test output
    with np.errstate(over="ignore"):
        base = np.uint64(zlib.crc32(key.encode()) ^ (seed & 0xFFFFFFFF)) * np.uint64(
            0x9E3779B97F4A7C15
        )
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    s = _splitmix64(np.arange(6, dtype=np.uint64) + base).astype(np.float64) * (2.0 ** -64)
    img = np.zeros((h, w, 3), dtype=np.float64)
    for c in range(3):
        img[:, :, c] = (
            127.5
            + 80 * np.sin(2 * np.pi * (s[c] + xs / max(w, 1) * (1 + 2 * s[c + 3])))
            + 60 * np.cos(2 * np.pi * (s[c + 3] + ys / max(h, 1)))
        )
    noise_keys = base + np.arange(h * w, dtype=np.uint64)
    noise = (_splitmix64(noise_keys).astype(np.float64) * (2.0 ** -64) - 0.5) * 24
    img += noise.reshape(h, w, 1)
    return img.clip(0, 255).astype(np.uint8)


# --- perceptual hash + PSNR -----------------------------------------------------

_PHASH_SIZE = 32
_DCT = np.cos(
    np.pi / _PHASH_SIZE * (np.arange(_PHASH_SIZE)[:, None] + 0.5) * np.arange(_PHASH_SIZE)[None, :]
).T  # DCT-II basis, (freq, sample)


def _resize_nn(gray: np.ndarray, size: int) -> np.ndarray:
    h, w = gray.shape
    yi = (np.arange(size) * h // size).clip(0, h - 1)
    xi = (np.arange(size) * w // size).clip(0, w - 1)
    return gray[np.ix_(yi, xi)]


def phash64(arr: np.ndarray) -> int:
    """Classic 64-bit DCT perceptual hash: grayscale -> 32x32 -> DCT-II ->
    top-left 8x8 (minus DC) thresholded at the median. Signed int64 so it
    fits the Iceberg ``phash:int64`` column."""
    gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _resize_nn(gray, _PHASH_SIZE)
    freq = _DCT @ small @ _DCT.T
    block = freq[:8, :8].flatten()
    block = np.delete(block, 0)  # drop DC
    bits = block > np.median(block)
    val = np.uint64(0)
    for b in bits[:63]:  # 63 AC bits + leading zero keeps it in int64 range
        val = (val << np.uint64(1)) | np.uint64(bool(b))
    return int(val.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0) - 10 * np.log10(mse)
