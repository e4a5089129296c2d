"""MIME detection (reference M4, warcit.py:620-659) and the magic-lite
content sniffer used where the reference shells out to libmagic.

Precedence reproduced exactly (warcit.py:620-659):
  mapfile Content-Type (pre-';') -> --mime-overrides fnmatch on URL ->
  method ('filename' | 'magic') -> no_xhtml rewrite -> default 'text/html'.
'.ico' -> 'image/x-icon' is pre-registered (warcit.py:258-260).
"""

from __future__ import annotations

import fnmatch
import mimetypes
import re

_mimetypes_inited = False


def _init_mimes() -> None:
    global _mimetypes_inited
    if not _mimetypes_inited:
        mimetypes.add_type("image/x-icon", ".ico", True)
        # our in-repo codec formats
        mimetypes.add_type("image/x-portable-pixmap", ".ppm", True)
        mimetypes.add_type("image/x-dctq", ".dctq", True)
        _mimetypes_inited = True


def guess_mime_filename(url: str, cache: dict | None = None) -> str | None:
    """mimetypes.guess_type on the URL sans query, strict=False
    (warcit.py:633-636). ``cache`` maps basename->mime for batch reuse."""
    _init_mimes()
    base = url.split("?", 1)[0]
    name = base.rsplit("/", 1)[-1]
    if cache is not None and name in cache:
        return cache[name]
    mime = mimetypes.guess_type(base, False)[0]
    if cache is not None:
        cache[name] = mime
    return mime


def guess_mime_filename_batch(urls) -> list:
    cache: dict = {}
    return [guess_mime_filename(u, cache) for u in urls]


class MimeOverrides:
    """--mime-overrides: ordered pattern=mime fnmatch on the URL
    (warcit.py:218-222,626-629). Patterns compiled once."""

    def __init__(self, overrides: dict[str, str] | str | None):
        if isinstance(overrides, str):
            overrides = dict(p.split("=", 1) for p in overrides.split(","))
        self.rules = [
            (re.compile(fnmatch.translate(pat)), mime)
            for pat, mime in (overrides or {}).items()
        ]

    def match(self, url: str) -> str | None:
        for rx, mime in self.rules:
            if rx.match(url):
                return mime
        return None


# --- magic-lite content sniffer -------------------------------------------
# The reference feeds the first BUFF_SIZE=2048 bytes to libmagic
# (warcit.py:28,638-640). libmagic is not available here; this is a
# self-contained signature table covering the formats this engine
# produces/consumes plus common web types.

BUFF_SIZE = 2048

_SIGNATURES: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"BM", "image/bmp"),
    (b"P6", "image/x-portable-pixmap"),
    (b"DCTQ", "image/x-dctq"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"\x1f\x8b", "application/gzip"),
    (b"PK\x03\x04", "application/zip"),
    (b"%PDF", "application/pdf"),
    (b"\x00\x00\x01\x00", "image/x-icon"),
]

_HTML_RX = re.compile(rb"^\s*(?:<!doctype\s+html|<html|<head|<body)", re.I)
_XML_RX = re.compile(rb"^\s*<\?xml", re.I)


def sniff_mime(head: bytes) -> str:
    """Detect mime from the first bytes of a payload (magic analogue)."""
    head = head[:BUFF_SIZE]
    for sig, mime in _SIGNATURES:
        if head.startswith(sig):
            return mime
    if _HTML_RX.search(head):
        return "text/html"
    if _XML_RX.search(head):
        return "text/xml"
    try:
        head.decode("utf-8")
        return "text/plain"
    except UnicodeDecodeError:
        return "application/octet-stream"


def resolve_mime(
    url: str,
    mapfile_content_type: str | None,
    overrides: MimeOverrides | None,
    method: str,
    payload_head: bytes | None,
    no_xhtml: bool,
    cache: dict | None = None,
) -> str:
    """Full M4 precedence chain (warcit.py:620-659)."""
    if mapfile_content_type:
        return mapfile_content_type.split(";")[0]
    if overrides is not None:
        m = overrides.match(url)
        if m:
            return m
    mime = None
    if method == "filename":
        mime = guess_mime_filename(url, cache)
    elif method == "magic":
        mime = sniff_mime(payload_head or b"")
    elif method == "tika":
        raise NotImplementedError(
            "mime method 'tika' requires an Apache Tika server, which is "
            "not available in this environment (strict stub; reference "
            "behavior at warcit.py:362-371,642-651)")
    if no_xhtml and mime == "application/xhtml+xml":
        mime = "text/html"
    return mime or "text/html"
