"""URL canonicalizer + registrable-domain unit/property tests (SURVEY §5.1)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from webcrawl_lowres_lang_spark.functions.urls import (
    canonicalize_one,
    registrable_domain_one,
)

CASES = {
    # scheme/host case, default port
    "HTTP://Example.COM:80/a": "http://example.com/a",
    "https://example.com:443/": "https://example.com/",
    "https://example.com:8443/x": "https://example.com:8443/x",
    # empty path
    "http://example.com": "http://example.com/",
    # fragment stripped
    "http://example.com/a#frag": "http://example.com/a",
    # dot segments
    "http://example.com/a/./b/../c": "http://example.com/a/c",
    "http://example.com/a/b/..": "http://example.com/a/",
    "http://example.com/../a": "http://example.com/a",
    # percent normalization: unreserved decoded, rest uppercased
    "http://example.com/%7euser/%2fx%2F": "http://example.com/~user/%2Fx%2F",
    # query param sort (stable)
    "http://example.com/p?b=2&a=1&a=0": "http://example.com/p?a=0&a=1&b=2",
    # trailing dot host
    "http://example.com./x": "http://example.com/x",
    # userinfo preserved
    "http://u:pw@example.com/": "http://u:pw@example.com/",
}

REL_OR_BAD = ["/relative/path", "page.html", "", "   ", "mailto:x@y.z", "javascript:void(0)", None]


def test_canonicalize_cases():
    for raw, want in CASES.items():
        assert canonicalize_one(raw) == want, raw


def test_relative_guard_returns_none():
    # reference: lrl-crawler.py:157-162 drops scheme-less/relative URLs
    for u in REL_OR_BAD:
        assert canonicalize_one(u) is None, u


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=0,
        max_size=40,
    )
)
def test_canonicalize_idempotent(path):
    u = f"http://example.com/{path}"
    c1 = canonicalize_one(u)
    if c1 is None:
        return
    assert canonicalize_one(c1) == c1


def test_registrable_domain():
    assert registrable_domain_one("images.example.co.nz") == "example.co.nz"
    assert registrable_domain_one("a.b.example.com") == "example.com"
    assert registrable_domain_one("example.com") == "example.com"
    assert registrable_domain_one("localhost") == "localhost"
    assert registrable_domain_one("192.168.0.1") == "192.168.0.1"
    assert registrable_domain_one("www.waikato.ac.nz") == "waikato.ac.nz"
    assert registrable_domain_one(None) is None


def test_with_url_keys_spark(spark):
    from webcrawl_lowres_lang_spark.functions.urls import with_url_keys

    df = spark.createDataFrame(
        [("HTTP://Example.COM:80/a?b=2&a=1",), ("/relative",), ("https://x.co.nz/p",)],
        ["url"],
    )
    rows = {r["url"]: r for r in with_url_keys(df).collect()}
    good = rows["HTTP://Example.COM:80/a?b=2&a=1"]
    assert good["url_canon"] == "http://example.com/a?a=1&b=2"
    assert good["host"] == "example.com"
    assert good["domain"] == "example.com"
    assert isinstance(good["url_hash"], int)
    assert len(good["md5_hash"]) == 32
    assert rows["/relative"]["url_canon"] is None
    assert rows["https://x.co.nz/p"]["domain"] == "x.co.nz"
