"""Similarity search over embedding columns (list<float>).

- :func:`brute_topk` — exact cosine top-k: every batch does one numpy
  matmul against the BROADCAST query matrix (ray.put once, resolved in
  each actor's __init__), emits its batch-local top-k, and a single
  small groupby(query_id) reduces to the global top-k. The full vector
  table never shuffles; only (query, candidate, score) triples do.
- :func:`ivf_topk` — the scale path: k-means-lite centroids (sampled,
  driver-side numpy), vectors assigned to their nearest centroid once
  (a partitioning key!), queries probe only ``nprobe`` nearest lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _as_matrix(col) -> np.ndarray:
    return np.asarray(col.to_pylist(), dtype=np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1
    return m / n


class BatchTopK:
    """Actor-pool stage: batch-local exact top-k vs broadcast queries."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float32))  # (nq, dim)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist(), dtype=np.int64)
        vecs = _normalize(_as_matrix(batch.column(self.vec_col)))
        sims = self.q @ vecs.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        nq = sims.shape[0]
        qid = np.repeat(np.arange(nq, dtype=np.int64), k)
        vid = ids[top.ravel()]
        score = sims[np.arange(nq)[:, None], top].ravel()
        return pa.table(
            {
                "query_id": pa.array(qid),
                "vec_id": pa.array(vid),
                "score": pa.array(score.astype(np.float64)),
            }
        )


def brute_topk(ds, queries: np.ndarray, k: int = 10, *, id_col: str = "vec_id",
               vec_col: str = "embedding", concurrency: int = 4) -> pd.DataFrame:
    """-> DataFrame(query_id, vec_id, score, rank), global exact top-k."""
    import ray

    q_ref = ray.put(np.asarray(queries, dtype=np.float32))
    partials = ds.map_batches(
        BatchTopK, fn_constructor_args=(q_ref, k, id_col, vec_col),
        batch_format="pyarrow", concurrency=concurrency,
    )

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        partials.groupby("query_id").map_groups(reduce_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 10,
                seed: int = 11) -> np.ndarray:
    """Plain numpy Lloyd's on a driver-side sample (centroids are tiny)."""
    rng = np.random.default_rng(seed)
    x = _normalize(sample.astype(np.float32))
    idx = rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)
    c = x[idx].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    c[j] = m / n
    return c


def ivf_topk(ds, queries: np.ndarray, k: int = 10, *, n_clusters: int = 16,
             nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
             sample_rows: int = 2048, concurrency: int = 4) -> pd.DataFrame:
    """IVF-flat ANN: assign each vector to its centroid (one pass), then
    search only the nprobe closest lists per query. The centroid id is
    the partitioning key a cluster deployment would co-locate on."""
    import ray

    sample = _as_matrix(
        ds.limit(sample_rows).select_columns([vec_col]).to_pandas()[vec_col]
    ) if False else np.asarray(
        ds.limit(sample_rows).to_pandas()[vec_col].tolist(), dtype=np.float32
    )
    centroids = kmeans_lite(sample, n_clusters)
    c_ref = ray.put(centroids)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_sets = [set(row.tolist()) for row in probe]

    class AssignAndSearch:
        def __init__(self):
            self.c = ray.get(c_ref)
            self.q = q
            self.probe_sets = probe_sets

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
            vecs = _normalize(_as_matrix(batch.column(vec_col)))
            assign = np.argmax(vecs @ self.c.T, axis=1)
            out_q, out_v, out_s = [], [], []
            for qi, pset in enumerate(self.probe_sets):
                mask = np.isin(assign, list(pset))
                if not mask.any():
                    continue
                sims = vecs[mask] @ self.q[qi]
                kk = min(k, len(sims))
                top = np.argpartition(-sims, kk - 1)[:kk]
                out_q.extend([qi] * kk)
                out_v.extend(ids[mask][top].tolist())
                out_s.extend(sims[top].astype(np.float64).tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "vec_id": pa.array(out_v, type=pa.int64()),
                    "score": pa.array(out_s, type=pa.float64()),
                }
            )

    partials = ds.map_batches(AssignAndSearch, batch_format="pyarrow",
                              concurrency=concurrency)

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        partials.groupby("query_id").map_groups(reduce_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
