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


def test_jpeg_subsampled_roundtrip():
    """4:2:2 and 4:2:0 MCU-interleaved streams (the layouts nearly all
    real-world JPEGs use) decode through the generic sampling-grid path:
    exact dims restored for odd sizes, luma fidelity unimpaired (>=38dB —
    luma is never subsampled), full-RGB PSNR above the 28dB floor nearest
    -neighbor chroma upsampling yields on the noisy synthetic renders."""
    from webcrawl_lowres_lang_spark.functions.imaging import (
        jpeg_decode,
        jpeg_encode,
        psnr,
        render_image,
    )

    def luma(a):
        return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]

    for ss in ("422", "420"):
        for w, h in ((32, 32), (45, 33), (61, 80)):
            img = render_image(11, f"ss-{ss}", w, h)
            dec = jpeg_decode(jpeg_encode(img, quality=95, subsampling=ss))
            assert dec.shape == (h, w, 3)
            assert psnr(img, dec) >= 28.0
            lp = 10 * np.log10(255.0**2 / ((luma(img) - luma(dec)) ** 2).mean())
            assert lp >= 38.0


def test_jpeg_restart_markers_decode_identically():
    """DRI/RSTn streams carry the same coefficients split into restart
    segments; decode must be pixel-identical to the unsegmented stream."""
    from webcrawl_lowres_lang_spark.functions.imaging import (
        jpeg_decode,
        jpeg_encode,
        render_image,
    )

    img = render_image(3, "rst", 48, 41)
    for ss in ("444", "420"):
        plain = jpeg_decode(jpeg_encode(img, quality=90, subsampling=ss))
        for ri in (1, 3, 7):  # >8 restarts exercises RSTn modulo-8 cycling
            rst = jpeg_decode(
                jpeg_encode(img, quality=90, subsampling=ss, restart_interval=ri)
            )
            assert (rst == plain).all()


def test_jpeg_grayscale_roundtrip():
    """1-component (luma-only) streams decode via the non-interleaved
    single-component scan path and replicate to RGB."""
    from webcrawl_lowres_lang_spark.functions.imaging import (
        jpeg_decode,
        jpeg_encode,
        psnr,
        render_image,
    )

    img = render_image(5, "gray", 61, 40)
    lum = (
        (0.299 * img[:, :, 0].astype(np.float64) + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2])
        .round().clip(0, 255).astype(np.uint8)
    )
    gray3 = np.stack([lum] * 3, axis=2)
    for ri in (0, 5):
        dec = jpeg_decode(jpeg_encode(img, quality=95, subsampling="gray", restart_interval=ri))
        assert dec.shape == (40, 61, 3)
        assert (dec[:, :, 0] == dec[:, :, 1]).all() and (dec[:, :, 1] == dec[:, :, 2]).all()
        assert psnr(gray3, dec) >= 40.0


def test_jpeg_decode_rejects_out_of_subset():
    """Progressive streams fail loudly, not wrongly (and decode_image's
    PIL fallback stays import-gated: absent in this sandbox, the original
    NotImplementedError must surface)."""
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

    from webcrawl_lowres_lang_spark.functions.imaging import decode_image

    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(NotImplementedError):
            decode_image(bytes(data), "jpeg")


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
