"""Imaging codec tests: PNG round-trip lossless, lossy stand-in >=40dB,
phash locality, renderer determinism."""

from __future__ import annotations

import numpy as np

from webcrawl_lowres_lang_spark.functions.imaging import (
    decode_image,
    hamming64,
    jpeg_encode_standin,
    phash64,
    png_decode,
    png_encode,
    psnr,
    render_image,
)


def test_png_roundtrip_lossless():
    img = render_image(42, "img-00000001", 48, 32)
    assert img.shape == (32, 48, 3)
    out = png_decode(png_encode(img))
    assert (out == img).all()


def test_lossy_standin_meets_psnr_gate():
    img = render_image(42, "img-00000002", 64, 64)
    dec = decode_image(jpeg_encode_standin(img), "jpeg")
    p = psnr(img, dec)
    assert p >= 40.0, f"PSNR {p:.1f} below the 40dB per-row invariant"
    assert not (dec == img).all()  # genuinely lossy


def test_renderer_deterministic_and_distinct():
    a1 = render_image(42, "img-x", 32, 32)
    a2 = render_image(42, "img-x", 32, 32)
    b = render_image(42, "img-y", 32, 32)
    c = render_image(43, "img-x", 32, 32)
    assert (a1 == a2).all()
    assert not (a1 == b).all()
    assert not (a1 == c).all()


def test_phash_locality():
    img = render_image(42, "img-z", 64, 64)
    near = img.copy()
    near[:4, :4] = (near[:4, :4].astype(np.int32) + 2).clip(0, 255).astype(np.uint8)
    far = render_image(42, "img-w", 64, 64)
    h0, hn, hf = phash64(img), phash64(near), phash64(far)
    assert hamming64(h0, hn) <= 4, "near-duplicate must land within Hamming 4"
    assert hamming64(h0, hf) > 10, "distinct images must be far apart"
    assert -(2**63) <= h0 < 2**63  # fits int64 storage column


def test_phash_survives_lossy_roundtrip():
    img = render_image(42, "img-q", 64, 64)
    dec = decode_image(jpeg_encode_standin(img), "jpeg")
    assert hamming64(phash64(img), phash64(dec)) <= 4
