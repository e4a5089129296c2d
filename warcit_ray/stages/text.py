"""Text-analysis operators for training-data pipelines (first-class
engine components per the build brief): language ID, quality scoring,
token counting, document fingerprinting.

All are single-pass ``map_batches`` stages over the ``documents`` table
(columns doc_id, text, lang, source, n_chars). Regexes and stopword
tables are module-level constants compiled at import (once per worker
process) — callable classes are provided for actor-pool use where the
setup matters.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\s+")
_TOKEN_RX = re.compile(r"[a-za-z0-9]+(?:'[a-z]+)?", re.I)
# BPE-ish pretokenizer: word pieces, numbers, punctuation runs
_BPEISH_RX = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")
_PUNCT_RX = re.compile(r"[^\w\s]")

STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit", "sich", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "por", "que"},
}


def _bpe_class_of(ch: str) -> int:
    """Character class under _BPEISH_RX's alternation: 1 = [A-Za-z],
    2 = \\d, 3 = \\s, 0 = everything else (the punct-run class).
    Classified with the same `re` predicates so Unicode digits/spaces
    land exactly where the regex puts them."""
    if re.match(r"\s", ch):
        return 3
    if "A" <= ch <= "Z" or "a" <= ch <= "z":
        return 1
    if re.match(r"\d", ch):
        return 2
    return 0


_BPE_ASCII_TAB = np.array([_bpe_class_of(chr(i)) for i in range(128)],
                          dtype=np.uint8)


def _bpeish_counts(texts: list) -> np.ndarray:
    """Piece counts equal to ``len(_BPEISH_RX.findall(t))`` per text,
    vectorized: all texts join on a single space (class S — never a
    piece and always a run break), characters classify into
    {letter, digit, space, other} in one numpy pass, and a piece is a
    position whose class differs from its predecessor's and is not
    space. Per-text counts come from two searchsorteds of the piece
    starts against the text offsets — no per-row regex."""
    n = len(texts)
    lens = np.fromiter((len(t) if t else 0 for t in texts),
                       dtype=np.int64, count=n)
    if n == 0 or int(lens.sum()) == 0:
        return np.zeros(n, dtype=np.int64)
    big = " ".join(t or "" for t in texts)
    raw = big.encode("utf-8", "surrogatepass")
    if len(raw) == len(big):  # pure ASCII: bytes are codepoints
        cp = np.frombuffer(raw, dtype=np.uint8)
        cls = _BPE_ASCII_TAB[cp]
    else:
        cp = np.frombuffer(big.encode("utf-32-le", "surrogatepass"),
                           dtype=np.uint32)
        cls = np.zeros(len(cp), dtype=np.uint8)
        small = cp < 128
        cls[small] = _BPE_ASCII_TAB[cp[small]]
        hi = cp[~small]
        if len(hi):
            uniq = np.unique(hi)
            lut = np.array([_bpe_class_of(chr(int(u))) for u in uniq],
                           dtype=np.uint8)
            cls[~small] = lut[np.searchsorted(uniq, hi)]
    prev = np.empty_like(cls)
    prev[0] = 3
    prev[1:] = cls[:-1]
    start_pos = np.flatnonzero((cls != 3) & (cls != prev))
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens + 1, out=offs[1:])
    begin = offs[:-1]
    return (np.searchsorted(start_pos, begin + lens)
            - np.searchsorted(start_pos, begin)).astype(np.int64)


def _bpeish_counts_arrow(col) -> "np.ndarray | None":
    """Zero-copy fast path over the string column's own UTF-8 data
    buffer (no to_pylist, no join, no re-encode): classify the bytes in
    place and force a run break at every row's start offset. Only valid
    when the buffer is pure ASCII (bytes == codepoints); returns None
    to punt to :func:`_bpeish_counts` otherwise."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count or not pa.types.is_string(col.type):
        return None
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    lo = off[0]
    seg = np.frombuffer(bufs[2], dtype=np.uint8)[lo: off[-1]]
    if seg.size == 0:
        return np.zeros(len(col), dtype=np.int64)
    if int(seg.max()) >= 128:
        return None
    cls = _BPE_ASCII_TAB[seg]
    prev = np.empty_like(cls)
    prev[0] = 3
    prev[1:] = cls[:-1]
    begins = off[:-1] - lo
    prev[begins[begins < len(cls)]] = 3  # rows never share a run
    start_pos = np.flatnonzero((cls != 3) & (cls != prev))
    return (np.searchsorted(start_pos, off[1:] - lo)
            - np.searchsorted(start_pos, begins)).astype(np.int64)


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish piece count, vectorized via the
    Arrow split/list kernels (ws_tokens) and the run-classification
    pass in :func:`_bpeish_counts_arrow` / :func:`_bpeish_counts`
    (bpeish_tokens) — no per-row regex in either column."""
    text = batch.column(text_col)
    ws = pc.list_value_length(pc.utf8_split_whitespace(text))
    counts = _bpeish_counts_arrow(text)
    if counts is None:
        counts = _bpeish_counts(text.to_pylist())
    pieces = pa.array(counts, type=pa.int64())
    return batch.append_column("ws_tokens", pc.cast(ws, pa.int64())).append_column(
        "bpeish_tokens", pieces
    )


def quality_score_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Heuristic quality features: length, punctuation ratio, stopword
    ratio, mean token length, plus a composed [0,1] score."""
    texts = df[text_col].fillna("")
    n_chars = texts.str.len().astype("int64")
    toks = texts.str.split()
    n_tokens = toks.str.len().fillna(0).astype("int64")
    mean_tok = (n_chars / n_tokens.clip(lower=1)).astype("float64")
    punct = texts.str.count(r"[^\w\s]").astype("int64")
    punct_ratio = (punct / n_chars.clip(lower=1)).astype("float64")
    # vectorized stopword hits: explode tokens, one isin pass, group-sum
    # back by row index (no per-row Python closure)
    ex = toks.explode()
    hit = ex.str.lower().isin(STOPWORDS["en"])
    stop_hits = hit.groupby(level=0).sum().reindex(texts.index, fill_value=0)
    stop_ratio = (stop_hits / n_tokens.clip(lower=1)).astype("float64")
    score = (
        np.clip(n_tokens / 64.0, 0, 1) * 0.4
        + np.clip(1.0 - punct_ratio * 4.0, 0, 1) * 0.3
        + np.clip(stop_ratio * 4.0, 0, 1) * 0.3
    )
    df = df.copy()
    df["n_tokens"] = n_tokens
    df["mean_token_len"] = mean_tok
    df["punct_ratio"] = punct_ratio
    df["stopword_ratio"] = stop_ratio
    df["quality"] = score.astype("float64")
    return df


def repetition_score_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Gopher-style repetition feature: the fraction of token-bigram
    occurrences that are duplicates of an earlier bigram in the same
    document (`1 - distinct/total`) — high values flag the
    boilerplate/repetitive docs a training-data pipeline drops.
    Vectorized: explode tokens, group-shift to pair neighbors, one
    nunique/size pass per row index — no per-row Python."""
    toks = df[text_col].fillna("").str.split()
    ex = toks.explode()
    nxt = ex.groupby(level=0).shift(-1)
    big = (ex + "\x00" + nxt).dropna()
    total = big.groupby(level=0).size()
    distinct = big.groupby(level=0).nunique()
    out = df.copy()
    out["n_bigrams"] = total.reindex(df.index, fill_value=0).astype("int64")
    rep = 1.0 - (distinct / total)
    out["rep_ratio"] = rep.reindex(df.index, fill_value=0.0).astype("float64")
    return out


class LangId:
    """n-gram/stopword language heuristic over {en,de,fr,es,zh}.
    CJK codepoint ratio decides zh; otherwise argmax stopword hits with
    'en' fallback. Actor-pool class: tables built once per actor."""

    def __init__(self):
        self.stops = {k: frozenset(v) for k, v in STOPWORDS.items()}
        self.word_rx = re.compile(r"[^\W\d_]+", re.U)

    def classify(self, text: str) -> str:
        if not text:
            return "und"
        cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
        if cjk > 0.05 * min(len(text), 400):
            return "zh"
        words = [w.lower() for w in self.word_rx.findall(text[:2000])]
        if not words:
            return "und"
        best, best_hits = "en", -1
        for lang in ("en", "de", "fr", "es"):
            hits = sum(w in self.stops[lang] for w in words)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best if best_hits > 0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("pred_lang", pa.array(preds, type=pa.string()))


# worker-process LangId cache: the stopword tables + compiled regex live
# for the worker's lifetime and are shared across batches AND pipeline
# invocations — a per-invocation actor pool pays ~1.5 s of actor startup
# every call, which dominated the lang stage of small queries (same
# stateless-task reasoning as dedup.minhash_sig_batch)
_LANGID_CACHE: list = []


def lang_id_batch(batch: pa.Table) -> pa.Table:
    if not _LANGID_CACHE:
        _LANGID_CACHE.append(LangId())
    return _LANGID_CACHE[0](batch)


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003
_FP_CHUNK = 1 << 16

# B^j mod M for j in [0, _FP_CHUNK] (index c gives the per-chunk shift)
_FP_POW = np.empty(_FP_CHUNK + 1, dtype=np.uint64)
_p = 1
for _j in range(_FP_CHUNK + 1):
    _FP_POW[_j] = _p
    _p = (_p * _FP_BASE) % _FP_MOD

_MASK30 = np.uint64((1 << 30) - 1)
_MASK31 = np.uint64((1 << 31) - 1)
_MASK32 = np.uint64((1 << 32) - 1)


def _chunk_poly_mod(d: np.ndarray) -> int:
    """sum(d[i] * B^(c-1-i)) mod M, vectorized, for byte-ish values
    d < 2^9. Products of a 61-bit power by a 9-bit digit overflow
    uint64, so the power splits into 30/31-bit halves and the high
    half's *2^30 shift is folded through 2^61 ≡ 1 (mod M=2^61-1);
    every per-element intermediate stays < 2^62. The final reduction
    splits each term into 32-bit halves whose uint64 sums cannot
    overflow at chunk length <= 2^16 (2^16 * 2^32 = 2^48), recombined
    exactly in Python bigints for the one scalar mod."""
    c = len(d)
    P = _FP_POW[:c][::-1]  # B^(c-1) .. B^0
    lo = P & _MASK30
    hi = P >> np.uint64(30)
    t = d * hi  # < 2^9 * 2^31 = 2^40
    term = (t >> np.uint64(31)) + ((t & _MASK31) << np.uint64(30)) + d * lo
    return (int((term & _MASK32).sum())
            + (int((term >> np.uint64(32)).sum()) << 32)) % _FP_MOD


def fingerprint(text: str) -> int:
    """Deterministic 63-bit rolling polynomial hash of the
    whitespace-normalized text (document fingerprint). Horner over the
    UTF-8 bytes, vectorized: np.frombuffer + chunked polynomial
    reduction (one scalar combine per 512-byte chunk) — identical
    values to the per-byte recurrence h = (h*B + byte+1) mod 2^61-1."""
    norm = _WS.sub(" ", text.strip().lower())
    raw = norm.encode("utf-8")
    if not raw:
        return 0
    data = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64) + np.uint64(1)
    h = 0
    for start in range(0, len(data), _FP_CHUNK):
        chunk = data[start: start + _FP_CHUNK]
        s = _chunk_poly_mod(chunk)
        h = (h * int(_FP_POW[len(chunk)]) + s) % _FP_MOD
    return h


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fps = pa.array([fingerprint(t or "") for t in batch.column(text_col).to_pylist()],
                   type=pa.int64())
    return batch.append_column("fingerprint", fps)


def md5_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content hash columns: ``text_md5`` (lowercase hex — comparable
    to DuckDB's md5()) and ``text_md5_i64`` (the digest's first 8 bytes
    as a signed big-endian int64 — an integer join/partition key
    computed inside the same intrinsic per-row hash loop, so no second
    pass is ever needed to derive it)."""
    hexes = []
    i64s = np.empty(batch.num_rows, dtype=np.int64)
    for i, t in enumerate(batch.column(text_col).to_pylist()):
        d = hashlib.md5((t or "").encode("utf-8")).digest()
        hexes.append(d.hex())
        i64s[i] = int.from_bytes(d[:8], "big") - (1 << 63)
    return batch.append_column(
        "text_md5", pa.array(hexes, type=pa.string())
    ).append_column("text_md5_i64", pa.array(i64s))
