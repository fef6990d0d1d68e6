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


def test_jpeg_real_roundtrip_psnr_and_structure():
    """The baseline JFIF codec is REAL (round 4): spec markers present,
    quality-97 round-trip PSNR >= 40 dB (the north-rule gate) on the
    noisy synthetic renders, exact dims restored for non-multiple-of-8
    sizes, decoder tables read from the file's own segments."""
    from webcrawl_lowres_lang_spark.functions.imaging import (
        jpeg_decode,
        jpeg_encode,
        psnr,
        render_image,
    )

    for k, (w, h) in enumerate([(32, 32), (45, 33), (96, 97), (61, 80)]):
        img = render_image(42, f"jt-{k}", w, h)
        data = jpeg_encode(img, quality=97)
        # marker structure: SOI, JFIF APP0, 2x DQT, SOF0, 4x DHT, SOS, EOI
        assert data.startswith(b"\xFF\xD8\xFF\xE0") and data.endswith(b"\xFF\xD9")
        assert data.count(b"\xFF\xDB") >= 2 and data.count(b"\xFF\xC4") >= 4
        assert b"\xFF\xC0" in data and b"\xFF\xDA" in data and b"JFIF\x00" in data
        dec = jpeg_decode(data)
        assert dec.shape == (h, w, 3)
        assert psnr(img, dec) >= 40.0


def test_jpeg_decode_rejects_out_of_subset():
    """Progressive / subsampled streams fail loudly, not wrongly."""
    import numpy as np
    import pytest

    from webcrawl_lowres_lang_spark.functions.imaging import (
        jpeg_decode,
        jpeg_encode,
        render_image,
    )

    data = bytearray(jpeg_encode(render_image(1, "x", 16, 16)))
    sof = data.find(b"\xFF\xC0")
    data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(data))
    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg")


def test_jpeg_quality_monotone_and_deterministic():
    from webcrawl_lowres_lang_spark.functions.imaging import (
        jpeg_decode,
        jpeg_encode,
        psnr,
        render_image,
    )

    img = render_image(7, "q", 48, 40)
    p = [psnr(img, jpeg_decode(jpeg_encode(img, quality=q))) for q in (70, 90, 97)]
    assert p[0] < p[1] < p[2]
    assert jpeg_encode(img, quality=90) == jpeg_encode(img, quality=90)
