"""Charset detection (reference M5, warcit.py:661-716).

Semantics reproduced: charset only for ``text/*`` mimes and only when a
charset mode is configured; detected 'ascii' is DROPPED (warcit.py:679-684
— browsers should figure plain ASCII out themselves); any other
configured string is taken literally; result is rendered as
``'; charset=X'`` or ``''`` (warcit.py:713-716).

cchardet is unavailable here, so the 'detect' mode is a self-contained
detector: ascii -> drop, valid UTF-8 (with non-ascii bytes) -> 'UTF-8',
else 'windows-1252'.
"""

from __future__ import annotations


def detect_charset(payload: bytes) -> str:
    try:
        payload.decode("ascii")
        return ""  # ascii -> suppressed, matching the reference's drop
    except (UnicodeDecodeError, AttributeError):
        pass
    try:
        payload.decode("utf-8")
        return "UTF-8"
    except UnicodeDecodeError:
        return "windows-1252"


def charset_suffix(mime: str, mode: str | None, payload: bytes | None,
                   mapfile_content_type: str | None = None) -> str:
    """Returns '' or '; charset=X' (full M5 chain, warcit.py:661-716)."""
    if mapfile_content_type and ";" in mapfile_content_type:
        return ";" + mapfile_content_type.split(";", 1)[1]
    if not mime.startswith("text/") or not mode:
        return ""
    if mode == "detect":
        charset = detect_charset(payload or b"")
    else:
        charset = mode  # literal charset string
    return ("; charset=" + charset) if charset else ""
