"""Text-extraction stage (S17-S19/U3): real HTML extraction semantics,
fake-container PDF/DOCX plumbing, stub boundary on real containers."""

from __future__ import annotations

import pytest

from webcrawl_lowres_lang_spark.operators.extract import (
    extract_docx,
    extract_html,
    extract_pdf,
    extract_text_stage,
    fake_docx,
    fake_pdf,
)

HTML = (
    b"<html><head><title>T</title><style>p { x: y; }</style></head>"
    b"<body><h1>Head&amp;er</h1>\n<p>  para one </p><p>two</p>"
    b"<script>var x = '<p>not text</p>';</script></body></html>"
)


def test_extract_html_get_text_semantics():
    # tags -> line breaks, script/style dropped, entities unescaped,
    # lines stripped, empties dropped (nlp.py:90-99 via bs4 get_text)
    assert extract_html(HTML) == "T\nHead&er\npara one\ntwo"


def test_extract_html_handles_bad_utf8():
    assert "ok" in extract_html(b"<p>ok\xff</p>")


def test_fake_pdf_docx_roundtrip():
    assert extract_pdf(fake_pdf(["page 1", "page 2"])) == "page 1\npage 2"
    assert extract_docx(fake_docx(["para A", "para B", ""])) == "para A\npara B\n"


def test_unrecognized_containers_raise():
    """Since round 4 real %PDF / PK-zip bytes PARSE (see the real-format
    tests below); NotImplementedError is reserved for bytes that are
    neither the real format nor the deterministic test container, and a
    corrupt zip propagates its decode error (quarantine-at-caller)."""
    with pytest.raises(NotImplementedError):
        extract_pdf(b"not a pdf at all")
    with pytest.raises(NotImplementedError):
        extract_docx(b"not a docx at all")
    import zipfile

    with pytest.raises(zipfile.BadZipFile):
        extract_docx(b"PK\x03\x04 truncated zip")


def test_extract_stage_batches(spark):
    rows = [
        ("a", bytearray(HTML), "html"),
        ("b", bytearray(fake_pdf(["pg"])), "pdf"),
        ("c", bytearray(fake_docx(["pa"])), "docx"),
        ("d", bytearray(b"\x00\x01"), "exe"),  # unknown type -> not ok
    ]
    df = spark.createDataFrame(rows, "doc_key string, bytes binary, doc_type string")
    got = {r["doc_key"]: (r["text"], r["extract_ok"]) for r in extract_text_stage(df).collect()}
    assert got["a"] == ("T\nHead&er\npara one\ntwo", True)
    assert got["b"] == ("pg", True)
    assert got["c"] == ("pa", True)
    assert got["d"] == (None, False)


def _real_docx(paras: list[list[str]]) -> bytes:
    """Build a REAL minimal .docx (zip + WordprocessingML), as Word would:
    content types, package rels, and word/document.xml. Each item is a
    paragraph given as its list of run texts."""
    import io
    import zipfile

    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = "".join(
        "<w:p>" + "".join(f"<w:r><w:t>{t}</w:t></w:r>" for t in runs) + "</w:p>"
        for runs in paras
    )
    doc = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W}"><w:body>{body}</w:body></w:document>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/'
            'package/2006/content-types"><Default Extension="xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.wordprocessingml.'
            'document.main+xml"/></Types>',
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            'openxmlformats.org/package/2006/relationships"><Relationship Id="R1" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
            'relationships/officeDocument" Target="word/document.xml"/></Relationships>',
        )
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def _real_pdf(content_stream: bytes, compress: bool) -> bytes:
    """Build a REAL minimal single-page PDF per the spec (catalog, page
    tree, Helvetica font, content stream, xref, trailer)."""
    import zlib

    body = zlib.compress(content_stream) if compress else content_stream
    filt = b" /Filter /FlateDecode" if compress else b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length " + str(len(body)).encode() + filt + b" >>\nstream\n"
        + body + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def test_real_docx_extraction():
    """S19 for real: a standards-shaped .docx parses via the stdlib."""
    data = _real_docx([["He kupu ", "tuatahi."], ["Second paragraph."]])
    assert extract_docx(data) == "He kupu tuatahi.\nSecond paragraph."


def test_real_pdf_extraction_flate_and_plain():
    """S18 for real: Tj/TJ literal text out of a spec-valid PDF, both
    FlateDecode-compressed and uncompressed, with escapes and octal."""
    content = (
        b"BT /F1 12 Tf 72 720 Td (Hello \\(kupu\\)) Tj T* "
        b"[(sec) -20 (ond\\040line)] TJ ET"
    )
    for compress in (True, False):
        data = _real_pdf(content, compress)
        assert extract_pdf(data) == "Hello (kupu)\nsecond line", compress


def test_real_pdf_unsupported_filter_falls_back_empty():
    """A PDF whose only stream uses an unsupported filter yields '' (the
    same degraded answer PyPDF2 gives on image-only pages), not a crash."""
    data = _real_pdf(b"\x00\x01\x02", compress=False).replace(
        b"/Length 3", b"/Length 3 /Filter /DCTDecode"
    )
    assert extract_pdf(data) == ""
