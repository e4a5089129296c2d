"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Shuffle discipline (the 100 TB design point):
- exact dedup: hash computed per batch (vectorized) -> PARTIAL
  aggregation inside map_batches (one row per hash per batch) -> one
  small groupby over partials. The full rows never shuffle.
- MinHash LSH: signatures per batch -> explode to (band, band_hash,
  doc) rows -> single groupby on the band key -> candidate pairs ->
  exact-Jaccard verify per group. Only (band, hash, id) triples — not
  documents — cross the wire.
- SimHash: 64-bit signature per doc; banding on 4x16-bit chunks gives
  candidates for hamming<=3-style thresholds; verified by popcount.
- embedding near-dup: random-hyperplane signatures bucket the vectors;
  exact cosine verifies within buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import md5_batch

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(ds, id_col: str = "doc_id", text_col: str = "text"):
    """-> Dataset(text_md5, keep_id, n_dups): one row per distinct text,
    keeping the minimum id. Partial-aggregates before the shuffle."""
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        b = md5_batch(batch, text_col)
        df = b.select([id_col, "text_md5"]).to_pandas()
        g = df.groupby("text_md5", sort=False)[id_col].agg(["min", "size"]).reset_index()
        return pa.table(
            {
                "text_md5": g["text_md5"],
                "pmin": g["min"].astype("int64"),
                "pcnt": g["size"].astype("int64"),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.groupby("text_md5")
        .aggregate(Min("pmin", alias_name="keep_id"), Sum("pcnt", alias_name="n_dups"))
    )


def distinct_rows(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup keeping whole rows: hash -> groupby -> first (min id)."""
    def add_hash(batch: pa.Table) -> pa.Table:
        return md5_batch(batch, text_col)

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, id_col)

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_md5")
        .map_groups(first, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Word-shingle MinHash signatures. Actor-pool class: the
    permutation table AND a token-hash cache live for the actor's
    lifetime — each distinct token is blake2b-hashed exactly once per
    actor; shingle hashes are then a vectorized rolling polynomial over
    the token-hash array (no per-shingle hashlib calls)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 1):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self._tok_cache: dict[str, int] = {}

    def _tok_hash(self, tok: str) -> int:
        h = self._tok_cache.get(tok)
        if h is None:
            if len(self._tok_cache) > 1_000_000:
                self._tok_cache.clear()
            h = int.from_bytes(
                hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little"
            )
            self._tok_cache[tok] = h
        return h

    def shingles(self, text: str) -> np.ndarray:
        toks = text.split()
        if not toks:
            return np.empty(0, dtype=np.uint64)
        th = np.array([self._tok_hash(t) for t in toks], dtype=np.uint64)
        k = min(self.k, len(th))
        # rolling polynomial combine over a sliding window of width k
        acc = th[: len(th) - k + 1].copy()
        for j in range(1, k):
            acc = acc * np.uint64(0x9E3779B97F4A7C15) + th[j: len(th) - k + 1 + j]
        return np.unique(acc)

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (num_perm, n_shingles) affine transform mod mersenne, min over shingles
        v = (self.a[:, None] * (sh[None, :] & np.uint64(0x1FFFFFFFFFFFFFFF))
             + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t or "") for t in batch.column("text").to_pylist()]
        arr = pa.array([s.astype(np.int64).tolist() for s in sigs],
                       type=pa.list_(pa.int64()))
        return batch.append_column("minhash", arr)


def lsh_band_rows(batch: pa.Table, num_bands: int = 16,
                  id_col: str = "doc_id") -> pa.Table:
    """Explode signatures to (band, band_hash, id) rows — the only data
    that reaches the LSH groupby."""
    ids = batch.column(id_col).to_pylist()
    sigs = batch.column("minhash").to_pylist()
    out_key, out_id = [], []
    for i, sig in zip(ids, sigs):
        sig = np.asarray(sig, dtype=np.uint64)
        rows_per_band = len(sig) // num_bands
        for b in range(num_bands):
            chunk = sig[b * rows_per_band: (b + 1) * rows_per_band]
            h = hashlib.blake2b(chunk.tobytes() + bytes([b]), digest_size=8).digest()
            out_key.append(int.from_bytes(h, "little") >> 1)
            out_id.append(i)
    return pa.table(
        {
            "bkey": pa.array(out_key, type=pa.int64()),
            id_col: pa.array(out_id, type=pa.int64()),
        }
    )


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


def collect_hot_groups(rows_ds, bkey_col: str, id_col: str,
                       extra_cols: list[str] | None = None) -> pd.DataFrame:
    """Two-pass hot-bucket detection for LSH-family candidate generation.

    Collision buckets (>= 2 members) are a tiny fraction of all buckets,
    so instead of a groupby+map_groups over millions of mostly-singleton
    groups (measured: dominated by per-group overhead), this does:
      pass 1: per-batch pandas value_counts -> driver combine -> the
              small set of hot bucket keys;
      pass 2: broadcast-set semi-join filter inside map_batches -> only
              hot-bucket member rows reach the driver.
    """
    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df[bkey_col].value_counts()
        return pd.DataFrame({bkey_col: c.index, "n": c.values})

    counts = rows_ds.map_batches(count_partial, batch_format="pandas").to_pandas()
    total = counts.groupby(bkey_col, sort=False)["n"].sum()
    hot = set(total[total >= 2].index)
    if not hot:
        cols = [bkey_col, id_col] + (extra_cols or [])
        return pd.DataFrame({c: [] for c in cols})

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[bkey_col].isin(hot)]

    return rows_ds.map_batches(pick, batch_format="pandas").to_pandas()


def minhash_lsh_dedup(ds, *, num_perm: int = 64, num_bands: int = 16,
                      shingle_k: int = 3, threshold: float = 0.8,
                      id_col: str = "doc_id", concurrency: int = 2):
    """Full near-dup pipeline -> Dataset(doc_id, dup_of) for docs whose
    verified Jaccard >= threshold with a lower-id doc.

    Candidate pairs come from band-bucket collisions; verification
    recomputes exact shingle Jaccard for the pair (textual truth, so an
    LSH false positive cannot create a false duplicate)."""
    import ray
    import ray.data as rd

    with_sig = ds.map_batches(
        MinHasher, fn_constructor_args=(num_perm, shingle_k),
        batch_format="pyarrow", concurrency=concurrency,
    ).materialize()

    bands = with_sig.map_batches(
        lambda b: lsh_band_rows(b, num_bands, id_col), batch_format="pyarrow"
    )
    hot = collect_hot_groups(bands, "bkey", id_col)
    if len(hot) == 0:
        return rd.from_items([]), with_sig
    # hot-bucket member rows are small: emit (bucket-min, other) pairs
    # in one vectorized pandas pass
    hot = hot.sort_values([id_col]).drop_duplicates(["bkey", id_col])
    gmin = hot.groupby("bkey", sort=False)[id_col].transform("min")
    pairs = hot[hot[id_col] != gmin].assign(id_a=gmin[hot[id_col] != gmin])
    pairs = pairs.rename(columns={id_col: "id_b"})[["id_a", "id_b"]]
    if len(pairs) == 0:
        return rd.from_items([]), with_sig
    pairs = pairs.drop_duplicates().astype({"id_a": "int64", "id_b": "int64"})

    # verify with exact shingle jaccard (texts fetched for the candidate
    # ids only — candidates are a tiny fraction of the corpus, so the
    # fetch is a broadcast-set semi-join filter inside map_batches)
    cand_ids = set(pairs["id_a"]) | set(pairs["id_b"])
    cand_arr = pa.array(sorted(cand_ids), type=pa.int64())

    def pick(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.select([id_col, "text"]).filter(pc.is_in(b[id_col], value_set=cand_arr))

    picked = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    texts = dict(zip(picked[id_col], picked["text"]))
    mh = MinHasher(num_perm, shingle_k)
    sh_cache = {i: set(mh.shingles(texts[i]).tolist()) for i in cand_ids}
    keep = []
    for ia, ib in zip(pairs["id_a"], pairs["id_b"]):
        if jaccard(sh_cache[ia], sh_cache[ib]) >= threshold:
            keep.append((min(ia, ib), max(ia, ib)))
    if not keep:
        return rd.from_items([]), with_sig
    # union-find on the (small) verified pair set -> dup_of = component min
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in keep:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    rows = sorted(
        {(b, find(b)) for a, b in keep} | {(a, find(a)) for a, b in keep}
    )
    dup = rd.from_items(
        [{"doc_id": d, "dup_of": r} for d, r in rows if d != r]
    )
    return dup, with_sig


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over word tokens (public Charikar construction).
    Actor-pool class: token-hash cache amortized across batches; the
    bit-vote accumulation is one vectorized (n_toks, 64) reduction."""

    _SHIFTS = np.arange(64, dtype=np.uint64)

    def __init__(self):
        self._tok_cache: dict[str, int] = {}

    def _tok_hash(self, tok: str) -> int:
        h = self._tok_cache.get(tok)
        if h is None:
            if len(self._tok_cache) > 1_000_000:
                self._tok_cache.clear()
            h = int.from_bytes(
                hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little"
            )
            self._tok_cache[tok] = h
        return h

    def simhash(self, text: str) -> int:
        toks = text.lower().split()
        if not toks:
            return 0
        th = np.array([self._tok_hash(t) for t in toks], dtype=np.uint64)
        bits = ((th[:, None] >> self._SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        out = 0
        for i in np.nonzero(acc > 0)[0]:
            out |= 1 << int(i)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash(t or "") for t in batch.column("text").to_pylist()]
        signed = [h - (1 << 64) if h >= (1 << 63) else h for h in hs]
        return batch.append_column("simhash", pa.array(signed, type=pa.int64()))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_near_dups(ds, *, max_hamming: int = 3, id_col: str = "doc_id",
                      concurrency: int = 2) -> pd.DataFrame:
    """Candidates via 4x16-bit chunk banding (any hamming<=3 pair shares
    at least one exact chunk by pigeonhole), verified by popcount."""
    with_sig = ds.map_batches(SimHasher, batch_format="pyarrow",
                              concurrency=concurrency).materialize()

    def chunk_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sigs = batch.column("simhash").to_pylist()
        rows = {"bkey": [], id_col: [], "sig": []}
        for i, s in zip(ids, sigs):
            u = s & ((1 << 64) - 1)
            for c in range(4):
                rows["bkey"].append((((u >> (16 * c)) & 0xFFFF) << 3) | c)
                rows[id_col].append(i)
                rows["sig"].append(s)
        return pa.table(rows)

    chunks = with_sig.map_batches(chunk_rows, batch_format="pyarrow")
    hot = collect_hot_groups(chunks, "bkey", id_col, ["sig"])
    if len(hot) == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    out_a, out_b, out_d = [], [], []
    for _, g in hot.groupby("bkey", sort=False):
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].tolist()
        sigs = g["sig"].tolist()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                d = hamming64(sigs[x], sigs[y])
                if d <= max_hamming:
                    out_a.append(ids[x]); out_b.append(ids[y]); out_d.append(d)
    pairs = pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_d})
    if len(pairs):
        pairs = pairs.drop_duplicates(subset=["id_a", "id_b"]).reset_index(drop=True)
    return pairs


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dups(ds, *, threshold: float = 0.95, id_col: str = "vec_id",
                        vec_col: str = "embedding", num_planes: int = 12,
                        seed: int = 5) -> pd.DataFrame:
    """Random-hyperplane LSH buckets + exact cosine verify within bucket.
    Returns (id_a, id_b, cosine) pairs with cosine >= threshold."""
    rng = np.random.default_rng(seed)

    def add_bucket(batch: pa.Table) -> pa.Table:
        import numpy as _np

        vecs = _np.asarray(batch.column(vec_col).to_pylist(), dtype=_np.float32)
        dim = vecs.shape[1] if len(vecs) else 0
        planes = _np.random.default_rng(seed).normal(size=(dim, num_planes)).astype(_np.float32)
        signs = (vecs @ planes) > 0
        bucket = signs.dot(1 << _np.arange(num_planes)).astype(_np.int64)
        return batch.append_column("bucket", pa.array(bucket))

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        vecs = np.asarray(g[vec_col].tolist(), dtype=np.float32)
        norm = np.linalg.norm(vecs, axis=1, keepdims=True)
        norm[norm == 0] = 1
        v = vecs / norm
        sims = v @ v.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {"id_a": ids[ia], "id_b": ids[ib],
             "cosine": sims[ia, ib].astype("float64")}
        )

    pairs = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit_pairs, batch_format="pandas")
        .to_pandas()
    )
    return pairs
