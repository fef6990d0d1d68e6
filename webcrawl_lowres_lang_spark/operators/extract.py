"""Document text extraction stage (SURVEY S17-S19 / U3; reference
``nlp.py:90-115``): opaque document ``binary`` + doc_type -> plain text,
in Arrow batches via ``mapInPandas`` — the same stub-boundary pattern as
operators/multimodal.py.

What is REAL here (and tested): the batch plumbing, schemas, and the HTML
extractor — a dependency-free re-expression of the reference's
``BeautifulSoup(...).get_text(separator='\\n', strip=True)`` semantics
(``nlp.py:90-99``): drop script/style subtrees, every tag boundary becomes
a line break, entities unescaped, lines stripped, empties dropped.

What is STUBBED (this container ships no PyPDF2/python-docx): PDF and DOCX
decode try their optional libraries, else raise ``NotImplementedError`` —
unless the bytes are this engine's deterministic fake containers
(``%FPDF``/``DOCX0`` + length-prefixed UTF-8 page/para texts), which tests
use so the page-loop / para-join logic (``nlp.py:100-112``) is fully
exercised. Swapping in the real codecs on a production cluster changes only
the inner decode call.
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_SCRIPT_STYLE_RE = re.compile(r"(?is)<(script|style)[^>]*>.*?</\1>")
_TAG_RE = re.compile(r"(?s)<[^>]+>")

EXTRACT_SCHEMA = "doc_key string, doc_type string, text string, extract_ok boolean"


def extract_html(data: bytes) -> str:
    """HTML -> text, bs4 get_text(separator='\\n', strip=True) semantics."""
    s = data.decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub("\n", s)
    s = _html.unescape(s)
    return "\n".join(ln.strip() for ln in s.split("\n") if ln.strip())


def _read_length_prefixed(data: bytes, offset: int, n: int) -> list[str]:
    out, pos = [], offset
    for _ in range(n):
        ln = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        out.append(data[pos : pos + ln].decode("utf-8"))
        pos += ln
    return out


def extract_pdf(data: bytes) -> str:
    """PDF -> text: page loop joined by newlines (nlp.py:100-109)."""
    if data.startswith(b"%FPDF"):  # deterministic fake container
        n = int.from_bytes(data[5:9], "little")
        return "\n".join(_read_length_prefixed(data, 9, n))
    try:  # pragma: no cover - codec lib absent in this container
        import io

        from PyPDF2 import PdfReader

        reader = PdfReader(io.BytesIO(data))
        return "\n".join(page.extract_text() or "" for page in reader.pages)
    except ImportError:
        raise NotImplementedError(
            "PDF extraction requires PyPDF2; tests use the deterministic "
            "%FPDF fake container"
        ) from None


def extract_docx(data: bytes) -> str:
    """DOCX -> text: paragraphs joined by newlines (nlp.py:110-112)."""
    if data.startswith(b"DOCX0"):  # deterministic fake container
        n = int.from_bytes(data[5:9], "little")
        return "\n".join(_read_length_prefixed(data, 9, n))
    try:  # pragma: no cover - codec lib absent in this container
        import io

        import docx

        d = docx.Document(io.BytesIO(data))
        return "\n".join(p.text for p in d.paragraphs)
    except ImportError:
        raise NotImplementedError(
            "DOCX extraction requires python-docx; tests use the "
            "deterministic DOCX0 fake container"
        ) from None


_EXTRACTORS = {"html": extract_html, "pdf": extract_pdf, "docx": extract_docx}


def extract_text_stage(
    docs: DataFrame,
    key_col: str = "doc_key",
    bytes_col: str = "bytes",
    type_col: str = "doc_type",
) -> DataFrame:
    """(key, bytes, doc_type) -> (key, doc_type, text, extract_ok).

    Unknown doc types yield text=NULL / extract_ok=false (the reference
    drops unknown content types, ``lrl-crawler.py:192-206``); decode errors
    on known types propagate (a real pipeline would quarantine them)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for row in b.itertuples(index=False):
                dt = getattr(row, type_col)
                fn = _EXTRACTORS.get(dt)
                text = fn(bytes(getattr(row, bytes_col))) if fn else None
                out.append(
                    {
                        "doc_key": str(getattr(row, key_col)),
                        "doc_type": dt,
                        "text": text,
                        "extract_ok": text is not None,
                    }
                )
            yield pd.DataFrame(out, columns=["doc_key", "doc_type", "text", "extract_ok"])

    return docs.select(
        docs[key_col].alias(key_col), docs[bytes_col].alias(bytes_col),
        docs[type_col].alias(type_col),
    ).mapInPandas(process, EXTRACT_SCHEMA)


def fake_pdf(pages: list[str]) -> bytes:
    """Build the deterministic %FPDF test container."""
    body = b"".join(len(p.encode()).to_bytes(4, "little") + p.encode() for p in pages)
    return b"%FPDF" + len(pages).to_bytes(4, "little") + body


def fake_docx(paras: list[str]) -> bytes:
    """Build the deterministic DOCX0 test container."""
    body = b"".join(len(p.encode()).to_bytes(4, "little") + p.encode() for p in paras)
    return b"DOCX0" + len(paras).to_bytes(4, "little") + body
