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
  print.css). The decision is a confidence contest, not a whitelist:

  * UTF-8 confidence uses uchardet's published one-char-probability
    formula — ``1 - 0.99 * 0.5**n`` for ``n < 6`` multibyte chars,
    0.99 beyond — so rich UTF-8 always wins.
  * Each SBCS candidate (windows-1252/1258, latin-1) is scored by a
    micro sequence model over the DECODED non-ascii characters: a
    decoded letter sitting inside a word (adjacent to another letter,
    e.g. ``Internet’s`` -> ``Internetâ€™s`` where ``â`` is
    letter-adjacent) is positive word evidence for the single-byte
    reading; decoded symbols/punctuation or letters floating between
    non-letters (print.css's `` ▶`` -> `` â–¶``) are not. Unmappable
    or control decodes (latin-1's C1 block) discount the candidate.
  * windows-1258 gets a small tie-break bonus when the positive
    letter evidence lies in its Vietnamese letter repertoire —
    uchardet's Vietnamese model is exactly why the reference golden
    says windows-1258 rather than windows-1252.

  * Positive word evidence only counts when the non-ascii byte run
    contains a 0x80-0x9F byte — the range where cp125x differs from
    latin-1 and where curly punctuation's UTF-8 encoding (E2 80 9x)
    lands. Plain accented Latin UTF-8 ('naïve café', C3 xx pairs)
    carries no such byte and stays UTF-8 (ADVICE r3).

  Net behavior: SPARSE in-word cp125x-range evidence — one or two
  curly quotes inside words (the iana index.html shape) — reads as
  windows-1258, mirroring uchardet's documented weakness on sparse
  multibyte evidence (the reference golden IS such a misread: real
  cchardet labels a UTF-8 page windows-1258 on one ’). Non-ascii with
  no word adjacency (print.css), accented-Latin-only evidence, or >=3
  multibyte chars read as UTF-8; >=6 short-circuits to UTF-8 before
  any SBCS decode.
  Byte streams that are NOT valid UTF-8 are scored against the
  windows-125x / latin-1 codepages by decoded-character plausibility
  (letter/space/punct ratio).

``tika`` is accepted as a mode token for CLI parity but raises an
honest NotImplementedError (no Tika server in this environment —
same strict-stub pattern as stages/multimodal.py).
"""

from __future__ import annotations

import re
import unicodedata

_SBCS_CANDIDATES = ("windows-1252", "windows-1258", "iso-8859-1")

# C-speed scan for decoded non-ascii characters (the only ones whose
# interpretation differs between the candidate readings)
_NON_ASCII_RX = re.compile(r"[^\x00-\x7f]")

# windows-1258 is the Vietnamese codepage: positive letter evidence in
# its repertoire is what makes uchardet's SBCS group answer 1258
_VIET_LETTERS = set(
    "\u00e2\u00ea\u00f4\u0103\u01a1\u01b0\u0111\u00e0\u00e8\u00ec\u00f2\u00f9"
    "\u00fd\u00e3\u00f5\u0129\u0169\u1ef3"
    "\u00c2\u00ca\u00d4\u0102\u01a0\u01af\u0110\u00c0\u00c8\u00cc\u00d2\u00d9"
    "\u00dd\u00c3\u00d5\u0128\u0168\u1ef2"
)



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
    # valid UTF-8: confidence contest vs the SBCS readings
    n_mb = len(_NON_ASCII_RX.findall(text))
    if n_mb >= 6:
        # utf8_conf saturates at 0.99 > any possible SBCS conf
        # (0.95 + 0.02 tie-break) — skip the candidate decodes entirely
        # (they re-decode the full payload per codepage)
        return "UTF-8"
    utf8_conf = 1.0 - 0.99 * (0.5 ** n_mb)
    best, best_conf = "UTF-8", utf8_conf
    for enc in _SBCS_CANDIDATES:
        conf = _sbcs_confidence(payload, enc)
        if conf > best_conf + 1e-9:
            best, best_conf = enc, conf
    return best


def _run_has_cp125x_lead(payload: bytes, i: int) -> bool:
    """True iff the maximal non-ascii byte RUN containing position ``i``
    includes a byte in 0x80-0x9F — the range where the windows-125x
    codepages differ from latin-1 (curly punctuation: U+2018/19/1C/1D
    encode in UTF-8 as E2 80 9x). Plain accented Latin (C3 8x-BF pairs
    decode the second byte >= 0xA0) never has one, so valid UTF-8 with
    ordinary diacritics ('naïve café') cannot flip to windows-1258; only
    the golden curly-punctuation shape carries this positive evidence."""
    lo = i
    while lo > 0 and payload[lo - 1] >= 0x80:
        lo -= 1
    hi = i
    n = len(payload)
    while hi + 1 < n and payload[hi + 1] >= 0x80:
        hi += 1
    return any(0x80 <= payload[j] <= 0x9F for j in range(lo, hi + 1))


def _sbcs_confidence(payload: bytes, encoding: str) -> float:
    """Single-byte-reading confidence from a micro sequence model over
    the DECODED non-ascii characters (module docstring): in-word
    letters are positive evidence, floating symbols are not, control /
    unmappable decodes discount. Only the non-ascii positions are
    scanned (regex at C speed) — the ASCII bulk reads identically
    under every candidate and carries no signal between them.

    Positive evidence additionally requires the byte run to include a
    0x80-0x9F byte (``_run_has_cp125x_lead``): the golden windows-1258
    shape is cp125x-specific punctuation misread as in-word letters, and
    without this gate any two in-word accented UTF-8 letters would
    out-score the sparse-evidence UTF-8 confidence (ADVICE r3)."""
    try:
        text = payload.decode(encoding)
    except (UnicodeDecodeError, LookupError):
        return -1.0
    pos = neg = bad = viet = 0
    n = len(text)
    for m in _NON_ASCII_RX.finditer(text):
        i = m.start()
        ch = m.group()
        cat = unicodedata.category(ch)
        if cat[0] == "C":
            bad += 1
        elif cat[0] == "L" and (
            (i > 0 and text[i - 1].isalpha())
            or (i + 1 < n and text[i + 1].isalpha())
        ) and _run_has_cp125x_lead(payload, i):
            pos += 1
            if ch in _VIET_LETTERS:
                viet += 1
        else:
            neg += 1
    total = pos + neg + bad
    if total == 0:
        return 0.0
    plaus = 1.0 - bad / total
    if pos == 0:
        return 0.3 * plaus  # symbols only: weak single-byte evidence
    conf = plaus * (0.6 + 0.35 * pos / total)
    if viet and encoding == "windows-1258":
        conf += 0.02  # Vietnamese-repertoire tie-break (uchardet parity)
    return conf


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
