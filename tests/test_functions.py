"""Property/golden tests for the scalar library against the reference's
observable behaviors (SURVEY §5 item 5)."""

import pyarrow as pa
import pytest

from warcit_ray.functions.charset import charset_suffix, detect_charset
from warcit_ray.functions.digests import record_id, sha1_b32
from warcit_ray.functions.filters import IncludeExclude
from warcit_ray.functions.mime import MimeOverrides, resolve_mime, sniff_mime
from warcit_ray.functions.timestamps import (
    normalize_fixed_dt,
    pad_timestamp,
    timestamp_to_iso_date,
)
from warcit_ray.functions.urls import (
    escape_path,
    escape_path_array,
    surt,
    surt_hash64,
    surt_host,
    url_dirname_index,
)


def test_escape_path_reference_semantics():
    # base.py:106-109: lowercase %xx for '#;?:@&=+$, ', strip('./')
    assert escape_path("a b/c#d") == "a%20b/c%23d"
    assert escape_path("./x/y.html") == "x/y.html"
    assert escape_path("q?a=1&b=2") == "q%3fa%3d1%26b%3d2"
    assert escape_path("p;q:r@s+t$u,v") == "p%3bq%3ar%40s%2bt%24u%2cv"


def test_escape_path_array_matches_scalar():
    paths = ["a b/c#d", "./x/y.html", "q?a=1&b=2", "plain/path.css", "..//weird"]
    arr = escape_path_array(pa.array(paths), "http://ex.com/")
    assert arr.to_pylist() == ["http://ex.com/" + escape_path(p) for p in paths]


def test_timestamp_pad_down_golden():
    # test_warcit.py:88-95 golden
    assert normalize_fixed_dt("2010-12-26T10:11:12") == "2010-12-26T10:11:12Z"
    # pad-down: partial timestamps floor to the earliest instant
    assert normalize_fixed_dt("2010") == "2010-01-01T00:00:00Z"
    assert normalize_fixed_dt("201006") == "2010-06-01T00:00:00Z"
    assert pad_timestamp("2019") == "20190101000000"
    assert timestamp_to_iso_date("20190102030000") == "2019-01-02T03:00:00Z"


def test_include_exclude_truth_table():
    # warcit.py:466-476
    both = IncludeExclude(["*.html"], ["*.js"])
    assert both.keep("a/b.html")
    assert not both.keep("a/b.js")
    assert both.keep("a/b.css")  # matches neither -> kept
    inc = IncludeExclude(["*.html"], None)
    assert inc.keep("A/B.HTML")  # case-insensitive
    assert not inc.keep("a/b.css")
    exc = IncludeExclude(None, ["*.js"])
    assert exc.keep("a/b.css")
    assert not exc.keep("a/B.JS")


def test_mime_precedence():
    ov = MimeOverrides("*/index.html=custom/mime")
    assert resolve_mime("http://x/index.html", None, ov, "filename", b"", False) == "custom/mime"
    assert resolve_mime("http://x/a.css?v=2", None, None, "filename", b"", False) == "text/css"
    assert resolve_mime("http://x/a.ico", None, None, "filename", b"", False) == "image/x-icon"
    assert resolve_mime("http://x/noext", None, None, "filename", b"", False) == "text/html"
    # mapfile content-type wins, pre-';' only (warcit.py:622-624)
    assert resolve_mime("http://x/a.css", "a/b; charset=x", None, "filename", b"", False) == "a/b"
    # no_xhtml rewrite (warcit.py:654-655)
    assert resolve_mime("http://x/a.xhtml", None, None, "filename", b"", True) == "text/html"


def test_sniff_mime():
    assert sniff_mime(b"\x89PNG\r\n\x1a\nrest") == "image/png"
    assert sniff_mime(b"BMxxxx") == "image/bmp"
    assert sniff_mime(b"  <!DOCTYPE html><html>") == "text/html"
    assert sniff_mime(b"plain words") == "text/plain"
    assert sniff_mime(b"\xff\xfe\x00\x01\x02") == "application/octet-stream"


def test_charset_semantics():
    # ascii detected -> dropped (warcit.py:679-684)
    assert detect_charset(b"hello world") == ""
    assert detect_charset("héllo".encode("utf-8")) == "UTF-8"
    assert detect_charset(b"h\xe9llo") == "windows-1252"
    assert charset_suffix("text/html", "custom", b"x") == "; charset=custom"
    assert charset_suffix("image/png", "custom", b"x") == ""        # non-text
    assert charset_suffix("text/html", None, b"x") == ""            # no mode
    assert charset_suffix("text/html", "detect", b"ascii only") == ""
    # mapfile content-type charset passthrough (warcit.py:662-665)
    assert charset_suffix("text/html", None, b"", "text/html; charset=zz") == "; charset=zz"


def test_digest_parity_format():
    # RFC 4648 base32 of SHA-1, 'sha1:' prefix (warcio format)
    assert sha1_b32(b"") == "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ"
    assert sha1_b32(b"abc") == "sha1:VGMT4NSHA2AWVOR6EVYXQUGCNSONBWE5"


def test_record_id_deterministic():
    a = record_id("http://x/", "2020-01-01T00:00:00Z", "d", "resource", 5)
    b = record_id("http://x/", "2020-01-01T00:00:00Z", "d", "resource", 5)
    c = record_id("http://x/", "2020-01-01T00:00:00Z", "d", "resource", 6)
    assert a == b != c
    assert a.startswith("<urn:uuid:") and a.endswith(">")


def test_surt_and_host():
    assert surt("http://WWW.Example.com:80/a/b?x=1") == "com,example,www)/a/b?x=1"
    assert surt("https://example.com:8443/") == "com,example:8443)/"
    assert surt("file:///tmp/a.html") == "file:/tmp/a.html"
    assert surt("zip://ar.zip!m/x.html") == "zip:ar.zip!m/x.html"
    assert surt_host("http://A.B.com/x") == "a.b.com"
    assert surt_host("zip://ar.zip!m/x") == "zip:ar.zip"
    assert surt_host("file:///tmp/x") == "file:"
    assert surt_hash64("x") != surt_hash64("y")


def test_url_dirname_index():
    assert url_dirname_index("http://x/a/index.html") == "http://x/a/"


def test_surt_batch_parity():
    """surt_batch's Arrow fast path + scalar fallback == scalar surt on
    every URL shape the engine routes (simple, ports, userinfo, query,
    fragment, pseudo-URLs, trailing dots, case, no-path, odd chars)."""
    import pyarrow as pa

    from warcit_ray.functions.urls import surt, surt_batch

    urls = [
        "http://h07.example/img/img00000007",
        "https://h1757.example/private/img00001757",
        "http://WWW.Example.com:80/a/b?x=1",
        "https://example.com:8443/",
        "http://example.com",                     # no path
        "https://example.com./x",                 # trailing dot host
        "http://User:pw@example.com/x",           # userinfo
        "http://example.com/a#frag",              # fragment
        "http://example.com/a?x=1&y=2",           # query
        "file:///tmp/a.html",
        "zip://ar.zip!m/x.html",
        "http://[::1]:8080/x",                    # ipv6
        "http://ex_ample.com/x",                  # underscore host
        "http://EXAMPLE.COM/UPPER/path",
        "http://a.b.c.d.example.com/deep/path/x",
        "not-a-url",
        "",
    ]
    got = surt_batch(pa.array(urls, type=pa.string()))
    want = [surt(u) for u in urls]
    assert got == want


def test_bpeish_counts_match_regex():
    """VERDICT r4 #7: the vectorized run-classification piece counter
    (both the ASCII Arrow-buffer path and the Unicode join path) must
    equal len(_BPEISH_RX.findall(t)) for every text."""
    import random

    from warcit_ray.stages.text import (
        _BPEISH_RX,
        _bpeish_counts,
        _bpeish_counts_arrow,
        token_count_batch,
    )

    cases = ["", "hello world", "a1", "a-b", "--a", "x!y?z", "  \t\n ",
             "foo.bar!baz??12ab34", "é!", "naïve café's 123 ٣٤",
             "中文字符 mixed中with ascii", "1٣", " nbsp sep"]
    want = [len(_BPEISH_RX.findall(t)) for t in cases]
    assert list(_bpeish_counts(cases)) == want

    rng = random.Random(7)
    pool = "abcXYZ019 \t\n.,;!-'\"()"
    fuzz = ["".join(rng.choice(pool) for _ in range(rng.randrange(0, 120)))
            for _ in range(300)]
    want_f = [len(_BPEISH_RX.findall(t)) for t in fuzz]
    assert list(_bpeish_counts(fuzz)) == want_f
    # pure-ASCII fuzz goes through the zero-copy Arrow-buffer path
    arrow = _bpeish_counts_arrow(pa.array(fuzz))
    assert arrow is not None and list(arrow) == want_f
    # sliced column (nonzero Arrow offset)
    sl = pa.array(fuzz).slice(37, 120)
    assert list(_bpeish_counts_arrow(sl)) == want_f[37:157]
    # non-ASCII and null columns punt to the join path
    assert _bpeish_counts_arrow(pa.array(["café"])) is None
    out = token_count_batch(pa.table({"text": ["a b", None, "x!"]}))
    assert out.column("bpeish_tokens").to_pylist() == [2, 0, 2]
    # ws_tokens keeps Arrow null semantics for null text (pre-existing)
    assert out.column("ws_tokens").to_pylist() == [2, None, 1]
