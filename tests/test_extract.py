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


def test_real_containers_hit_stub_boundary():
    with pytest.raises(NotImplementedError):
        extract_pdf(b"%PDF-1.4 real pdf bytes")
    with pytest.raises(NotImplementedError):
        extract_docx(b"PK\x03\x04 real docx zip")


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
