"""Document text extraction stage (SURVEY S17-S19 / U3; reference
``nlp.py:90-115``): opaque document ``binary`` + doc_type -> plain text,
in Arrow batches via ``mapInPandas`` — the same stub-boundary pattern as
operators/multimodal.py.

What is REAL here (and tested): the batch plumbing, schemas, and the HTML
extractor — a dependency-free re-expression of the reference's
``BeautifulSoup(...).get_text(separator='\\n', strip=True)`` semantics
(``nlp.py:90-99``): drop script/style subtrees, every tag boundary becomes
a line break, entities unescaped, lines stripped, empties dropped.

Since round 4 PDF and DOCX are REAL too (stdlib-only): DOCX parses
``word/document.xml`` out of the zip (WordprocessingML), and PDF recovers
Tj/'/\"/TJ literal-string text from FlateDecode/uncompressed content
streams (the simple-encoding subset PyPDF2's extract_text covers; CID
fonts + ToUnicode CMaps remain out of scope and fall back to PyPDF2 when
importable). The deterministic fake containers (``%FPDF``/``DOCX0`` +
length-prefixed UTF-8 page/para texts) are kept for the page-loop /
para-join tests (``nlp.py:100-112``).
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


_PDF_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_PDF_TEXT_OP_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)\s*(?P<op>Tj|'|\")"  # (s) Tj / ' / "
    rb"|\[(?P<arr>(?:\((?:\\.|[^\\()])*\)|[^\]])*)\]\s*TJ"  # [(a) -5 (b)] TJ
    rb"|(?P<nl>T\*|Td|TD)",  # line-advance operators
    re.S,
)
_PDF_LIT_RE = re.compile(rb"\((?:\\.|[^\\()])*\)", re.S)
_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_unescape(lit: bytes) -> bytes:
    """PDF literal-string unescape (spec 7.3.4.2): named escapes, \\ddd
    octal, line continuations."""
    out, i = bytearray(), 0
    while i < len(lit):
        c = lit[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = lit[i + 1 : i + 2]
        if nxt in _PDF_ESCAPES:
            out += _PDF_ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():
            j = i + 1
            while j < len(lit) and j < i + 4 and lit[j : j + 1].isdigit():
                j += 1
            out.append(int(lit[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
        else:
            out += nxt
            i += 2
    return bytes(out)


def _pdf_content_text(content: bytes) -> list[str]:
    """Text lines from one decoded content stream: Tj/'/\" and TJ string
    arguments in stream order; T*/Td/TD/'/\" start a new line."""
    lines: list[list[bytes]] = [[]]
    for m in _PDF_TEXT_OP_RE.finditer(content):
        if m.group("nl") is not None or m.group("op") in (b"'", b'"'):
            if lines[-1]:
                lines.append([])
        if m.group("lit") is not None:
            lines[-1].append(_pdf_unescape(m.group("lit")))
        elif m.group("arr") is not None:
            for s in _PDF_LIT_RE.findall(m.group("arr")):
                lines[-1].append(_pdf_unescape(s[1:-1]))
    return [
        b"".join(parts).decode("utf-8", errors="replace")
        for parts in lines
        if parts
    ]


def extract_pdf(data: bytes) -> str:
    """PDF -> text: page loop joined by newlines (nlp.py:100-109).

    REAL for the standard simple-text case (this was a stub through round
    3): content streams are located by ``<<dict>> stream .. endstream``
    scan, FlateDecode streams inflated with stdlib zlib (uncompressed
    streams pass through), and text drawn with Tj / ' / \" / TJ literal
    strings is recovered in stream order with T*/Td/TD line advances —
    the same subset PyPDF2's extract_text covers for Type1/TrueType
    simple encodings. NOT implemented (returns whatever literal text
    exists, like PyPDF2 often does on such files): CID/Type0 fonts with
    ToUnicode CMaps, hex-string text, encrypted PDFs. PyPDF2 is still
    preferred when importable and the subset parser finds nothing."""
    if data.startswith(b"%FPDF"):  # deterministic fake container
        n = int.from_bytes(data[5:9], "little")
        return "\n".join(_read_length_prefixed(data, 9, n))
    if data.startswith(b"%PDF"):
        import zlib

        lines: list[str] = []
        for m in _PDF_STREAM_RE.finditer(data):
            params, body = m.group(1), m.group(2)
            if b"/FlateDecode" in params:
                try:
                    body = zlib.decompress(body.rstrip(b"\r\n"))
                except zlib.error:
                    continue
            elif b"/Filter" in params:
                continue  # unsupported filter (DCT, LZW, ...)
            lines.extend(_pdf_content_text(body))
        if lines:
            return "\n".join(lines)
        try:  # pragma: no cover - lib absent in this container
            import io

            from PyPDF2 import PdfReader

            reader = PdfReader(io.BytesIO(data))
            return "\n".join(page.extract_text() or "" for page in reader.pages)
        except ImportError:
            return ""  # valid PDF, no extractable simple text
    raise NotImplementedError("not a PDF (or the %FPDF test container)")


_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def extract_docx(data: bytes) -> str:
    """DOCX -> text: paragraphs joined by newlines (nlp.py:110-112).

    REAL via the stdlib (this was a stub through round 3): a .docx is a
    zip whose ``word/document.xml`` holds WordprocessingML — paragraph =
    ``<w:p>``, text runs = ``<w:t>``, explicit tabs/breaks = ``<w:tab>``/
    ``<w:br>``. This reproduces python-docx's ``p.text`` per paragraph
    with zero third-party code; any Word/LibreOffice-produced file
    parses."""
    if data.startswith(b"DOCX0"):  # deterministic fake container
        n = int.from_bytes(data[5:9], "little")
        return "\n".join(_read_length_prefixed(data, 9, n))
    if data.startswith(b"PK"):
        import io
        import xml.etree.ElementTree as ET
        import zipfile

        with zipfile.ZipFile(io.BytesIO(data)) as z:
            root = ET.fromstring(z.read("word/document.xml"))
        paras = []
        for p in root.iter(_W_NS + "p"):
            parts = []
            for node in p.iter():
                if node.tag == _W_NS + "t":
                    parts.append(node.text or "")
                elif node.tag == _W_NS + "tab":
                    parts.append("\t")
                elif node.tag == _W_NS + "br":
                    parts.append("\n")
            paras.append("".join(parts))
        return "\n".join(paras)
    raise NotImplementedError("not a DOCX zip (or the DOCX0 test container)")


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
