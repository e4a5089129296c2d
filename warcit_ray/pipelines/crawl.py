"""The crawl frontier + fetch scheduler (north rule).

Dataflow per generation (driver loop over bounded generations — Ray
Data has no unbounded streams and none are needed, SURVEY §2.7):

    frontier Dataset (url, priority, seq, payload_key, depth)
      -> map_batches(SeenProbe)     # SURT -> hash64 -> sharded cuckoo
                                    #   add_if_absent; only NEW urls pass
      -> map_batches(OfferStage)    # route by hash(host) % H to the
                                    #   HostShard politeness actors
      [barrier: ray.get all offers]
      admitted = HostShard.admit()  # deterministic per-host pops
      -> Dataset -> map_batches(FetchStage)   # corpus lookup, WARC row,
                                              #   link discovery
      -> write_parquet(ckpt/gen=g/records)    # resumable partition
      next frontier = exploded links Dataset

State partitioning is explicit: the URL-seen set shards on
``hash64(surt(url)) % S`` (uniform), politeness shards on
``blake2(host) % H`` (politeness local to one actor per host). Skewed
hosts are handled by batch-level pre-dedup (np.unique per batch before
probing) and by the salt hook in :func:`host_shard_of` — a hot host's
probe traffic spreads across salts while its token bucket stays on one
shard. Every generation writes a lineage manifest (records partition,
seen-set deltas, host-shard snapshots) so a killed crawl resumes
bit-identically (tested in tests/test_crawl.py).

The "web" being crawled is the image+caption corpus itself
(BASELINE.json input_hint): each row is a page whose URL, host, robots
visibility, out-links and priority are pure functions of its index —
see :class:`WebGraph`. Corpus dispatch is size-gated: a small corpus
broadcasts once via ``ray.put`` (the prescribed small-side pattern);
above ``corpus_broadcast_threshold`` it is hash-partitioned on
``image_id`` (:func:`make_partitioned_corpus`) and fetch tasks resolve
only the buckets their admitted keys hash to — no worker ever holds
the whole corpus. Both paths are equivalence-tested
(tests/test_crawl.py::test_partitioned_corpus_equivalent).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codecs import MIME_BY_FMT
from ..functions.digests import record_id, sha1_b32
from ..functions.urls import (surt, surt_batch, surt_hash64_batch,
                              surt_host, surt_host_batch)
from ..state.shards import HostShardState, SeenShardState

FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("priority", pa.int64()),
        pa.field("seq", pa.int64()),
        pa.field("payload_key", pa.string()),
        pa.field("depth", pa.int64()),
    ]
)


# ---------------------------------------------------------------------------
# Deterministic web graph over the corpus
# ---------------------------------------------------------------------------

class WebGraph:
    """URLs, hosts, robots, links, priorities as pure functions of the
    image index — the synthetic 'web' whose pages are the corpus rows."""

    def __init__(self, n: int, n_hosts: int = 13, fanout: int = 4,
                 private_every: int = 17):
        self.n = n
        self.n_hosts = n_hosts
        self.fanout = fanout
        self.private_every = private_every

    def host(self, idx: int) -> str:
        return "h%02d.example" % (idx % self.n_hosts)

    def path(self, idx: int) -> str:
        prefix = "private" if (self.private_every and idx % self.private_every == 0
                               and idx > 0) else "img"
        return "/%s/img%08d" % (prefix, idx)

    def url(self, idx: int) -> str:
        return "http://%s%s" % (self.host(idx), self.path(idx))

    def idx_of(self, url: str) -> int:
        return int(url.rsplit("img", 1)[-1])

    def links(self, idx: int) -> list[str]:
        return [
            self.url((idx * 31 + 7 * (j + 1) + (j + 1) * (j + 1)) % self.n)
            for j in range(self.fanout)
        ]

    def priority(self, idx: int) -> int:
        return idx % 3

    def robots_map(self) -> dict[str, list[str]]:
        return {"h%02d.example" % i: ["/private/"] for i in range(self.n_hosts)}

    def seed_urls(self, n_seeds: int) -> list[str]:
        return [self.url(i * 7 % self.n) for i in range(n_seeds)]


def host_shard_of(host: str, num_shards: int) -> int:
    """Politeness routing: stable hash of the host. The authoritative
    token bucket for a host deliberately CANNOT be salted across shards
    — politeness must be a local decision on one actor. Hot-host skew is
    handled upstream instead: batch URL dedup before probing
    (seen_probe_batch), per-batch top-k offer trimming (offer_batch's
    ``top_per_host``), the per-host frontier cap
    (HostShardState.max_pending), and batched heapify offers."""
    h = hashlib.blake2b(host.encode(), digest_size=4).digest()
    return int.from_bytes(h, "little") % num_shards


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------

def seen_probe_batch(batch: pa.Table, seen_actors) -> pa.Table:
    """Stateless-task stage: canonicalize -> hash -> sharded
    add_if_absent. Batch-level pre-dedup (np.unique) runs before any
    actor round-trip (skew guard: a hot URL costs one probe); per-shard
    probes go out concurrently (one ray.get on the set). Plain tasks,
    not an actor pool: there is no per-batch state to amortize, and the
    generation loop would otherwise pay actor startup every tick."""
    import ray

    if batch.num_rows == 0:
        return batch
    n = len(seen_actors)
    # dedup raw URL strings FIRST via Arrow dictionary encoding (C
    # speed; only the DISTINCT urls cross into Python), so surt+hash
    # run once per distinct URL — link batches repeat heavily at
    # fanout>1
    col = batch.column("url")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dic = col.dictionary_encode()
    url_inverse = dic.indices.to_numpy(zero_copy_only=False)
    # vectorized SURT over the distinct URLs (Arrow kernels + per-
    # distinct-host reversal) — the scalar surt() loop was the largest
    # single cost inside the probe task
    uniq_hashes = surt_hash64_batch(surt_batch(dic.dictionary))
    hashes = uniq_hashes[url_inverse]
    # first_of[j] = index in `hashes` of the FIRST occurrence of uniq[j]
    uniq, first_of, inverse = np.unique(hashes, return_index=True,
                                        return_inverse=True)
    shard = (uniq % np.uint64(n)).astype(np.int64)
    refs, idxs = [], []
    for s in range(n):
        sel = np.nonzero(shard == s)[0]
        if len(sel):
            refs.append(seen_actors[s].add_if_absent.remote(uniq[sel]))
            idxs.append(sel)
    added_uniq = np.zeros(len(uniq), dtype=bool)
    for ref, sel in zip(ray.get(refs), idxs):
        added_uniq[sel] = ref
    # a row survives iff its hash is new AND it is the first
    # occurrence of that hash in this batch (pure mask arithmetic —
    # this stage dominates frontier wall time, no per-row Python)
    keep = added_uniq[inverse] & (np.arange(len(hashes)) == first_of[inverse])
    return batch.filter(pa.array(keep))


def offer_batch(batch: pa.Table, host_actors, top_per_host: int | None = None) -> pa.Table:
    """Stateless-task stage: route new URLs to their HostShard actors.

    ``top_per_host``: skew lever — keep only the best (priority, seq)
    entries per host WITHIN this batch before shipping. Safe whenever it
    is >= what politeness could admit for one host over the remaining
    crawl budget (entries beyond that are dead weight); a hot host that
    dominates a batch then costs O(top_per_host) instead of O(batch)."""
    import ray

    if batch.num_rows == 0:
        return pa.table({"offered": pa.array([], type=pa.int64())})
    n = len(host_actors)
    url_col = batch.column("url")
    if isinstance(url_col, pa.ChunkedArray):
        url_col = url_col.combine_chunks()
    urls = np.asarray(url_col.to_pylist(), dtype=object)
    # vectorized host extraction: Arrow kernels parse the whole column
    # (URLs here are already distinct post-probe, so the remaining
    # interpreter cost WAS the per-row surt_host calls — VERDICT r3 #5)
    hosts = surt_host_batch(url_col)
    pris = batch.column("priority").combine_chunks().to_numpy()
    seqs = batch.column("seq").combine_chunks().to_numpy()
    keys = np.asarray(batch.column("payload_key").to_pylist(), dtype=object)
    depths = batch.column("depth").combine_chunks().to_numpy()
    # hosts repeat heavily in link batches: hash each DISTINCT host once,
    # then all grouping is integer-code arithmetic (no per-row dicts)
    uniq_hosts, host_codes = np.unique(hosts, return_inverse=True)
    if top_per_host is not None and batch.num_rows > top_per_host:
        # per-host rank under the heap order (priority, seq, url);
        # lexsort keys are last-key-primary
        order = np.lexsort((urls, seqs, pris, host_codes))
        gc = host_codes[order]
        grp_first = np.concatenate(([0], 1 + np.nonzero(gc[1:] != gc[:-1])[0]))
        counts = np.diff(np.concatenate((grp_first, [len(gc)])))
        rank = np.arange(len(gc)) - np.repeat(grp_first, counts)
        keep_idx = np.sort(order[rank < top_per_host])
        urls, hosts, keys = urls[keep_idx], hosts[keep_idx], keys[keep_idx]
        pris, seqs, depths = pris[keep_idx], seqs[keep_idx], depths[keep_idx]
        host_codes = host_codes[keep_idx]
    shard_of_host = np.fromiter(
        (host_shard_of(h, n) for h in uniq_hosts),
        dtype=np.int64, count=len(uniq_hosts))
    shard_codes = shard_of_host[host_codes]
    order = np.argsort(shard_codes, kind="stable")  # rows stay in batch order per shard
    sc = shard_codes[order]
    bounds = np.concatenate(([0], 1 + np.nonzero(sc[1:] != sc[:-1])[0], [len(sc)]))
    refs = []
    for bi in range(len(bounds) - 1):
        rows = order[bounds[bi]: bounds[bi + 1]]
        refs.append(
            host_actors[int(sc[bounds[bi]])].offer.remote(
                hosts[rows].tolist(), urls[rows].tolist(),
                pris[rows].tolist(), seqs[rows].tolist(),
                keys[rows].tolist(), depths[rows].tolist(),
            )
        )
    offered = sum(ray.get(refs))
    return pa.table({"offered": pa.array([offered], type=pa.int64())})


def probe_and_offer_batch(batch: pa.Table, seen_actors, host_actors) -> int:
    """Fused seen-probe + offer for the ray-task dispatch tier: one task
    per frontier slice, no Dataset operators. Returns the offered count."""
    fresh = seen_probe_batch(batch, seen_actors)
    if fresh.num_rows == 0:
        return 0
    return int(offer_batch(fresh, host_actors)["offered"][0].as_py())


def fetch_and_explode(batch: pa.Table, fetch_fn, fetch_args,
                      explode_fn) -> tuple:
    """Fused fetch + link-explode for the plain-task tier: the explode
    runs inside the parallel fetch task instead of single-threaded on
    the driver (measured: driver-side explode + frontier deserialization
    was ~57%% of frontier wall time at 200k URLs). Returns
    (records, frontier_table, (frontier_rows, record_bytes)): the
    frontier table stays in the OBJECT STORE — the driver keeps only
    its ref + the small meta tuple, feeds the ref to the next
    generation's probe tasks, and uses record_bytes to decide whether
    the records may transit the driver or must checkpoint distributed."""
    rec = fetch_fn(batch, *fetch_args)
    front = explode_fn(rec)
    return rec, front, (front.num_rows, rec.nbytes)


CRAWL_RECORD_FIELDS = [
    "generation", "seq", "record_type", "target_uri", "host", "warc_date",
    "content_type", "payload", "content_length", "payload_digest",
    "record_id", "image_id", "fmt", "caption", "links",
]


def light_fetch_batch(batch: pa.Table, graph: WebGraph, clock_iso: str) -> pa.Table:
    """Payload-light fetch for frontier-throughput benchmarking: the
    record payload is the URL itself (no image corpus lookup), but the
    full record/digest/link bookkeeping is identical. Used to measure
    sustained frontier URLs/sec with the seen/offer/admit machinery at
    full tilt. Column-wise iteration: per-row hashing (sha1/uuid5) is
    intrinsic, but no per-row dicts are built."""
    urls = batch.column("url").to_pylist()
    gens = batch.column("generation").to_pylist()
    seqs = batch.column("seq").to_pylist()
    hosts = batch.column("host").to_pylist()
    n = len(urls)
    payloads = [u.encode("utf-8") for u in urls]
    digests = [sha1_b32(p) for p in payloads]
    out = {
        "generation": gens,
        "seq": seqs,
        "record_type": ["resource"] * n,
        "target_uri": urls,
        "host": hosts,
        "warc_date": [clock_iso] * n,
        "content_type": ["text/plain"] * n,
        "payload": payloads,
        "content_length": [len(p) for p in payloads],
        "payload_digest": digests,
        "record_id": [record_id(u, clock_iso, d, "resource", s)
                      for u, d, s in zip(urls, digests, seqs)],
        "image_id": [""] * n,
        "fmt": [""] * n,
        "caption": [""] * n,
        "links": [graph.links(graph.idx_of(u)) for u in urls],
    }
    schema = pa.schema(
        [
            pa.field("generation", pa.int64()), pa.field("seq", pa.int64()),
            pa.field("record_type", pa.string()), pa.field("target_uri", pa.string()),
            pa.field("host", pa.string()), pa.field("warc_date", pa.string()),
            pa.field("content_type", pa.string()), pa.field("payload", pa.binary()),
            pa.field("content_length", pa.int64()), pa.field("payload_digest", pa.string()),
            pa.field("record_id", pa.string()), pa.field("image_id", pa.string()),
            pa.field("fmt", pa.string()), pa.field("caption", pa.string()),
            pa.field("links", pa.list_(pa.string())),
        ]
    )
    return pa.table(out, schema=schema)


# worker-process cache: broadcast corpora / corpus partitions are
# deserialized once per worker process, not once per task (bounded by
# entry count; partition granularity keeps each entry ~one bucket)
_CORPUS_CACHE: dict = {}
_CORPUS_CACHE_MAX = 64


def _cache_get(key: str, build):
    """LRU: a hit moves the entry to MRU position; a miss evicts only
    the single least-recently-used entry (never the whole cache — a
    worker touching >_CORPUS_CACHE_MAX buckets would otherwise thrash
    and rebuild every bucket dict per fetch task, including evicting
    the broadcast entry)."""
    got = _CORPUS_CACHE.pop(key, None)
    if got is None:
        while len(_CORPUS_CACHE) >= _CORPUS_CACHE_MAX:
            _CORPUS_CACHE.pop(next(iter(_CORPUS_CACHE)))
        got = build()
    _CORPUS_CACHE[key] = got
    return got


def corpus_bucket_of(key: str, num_buckets: int) -> int:
    h = hashlib.blake2b(key.encode(), digest_size=4).digest()
    return int.from_bytes(h, "little") % num_buckets


def corpus_affinity_fn(graph: WebGraph, num_buckets: int):
    """Admitted-table -> per-row corpus bucket ids (the same image_id
    hash the partitioned/fragment lookups use). Passed to crawl() as
    ``fetch_affinity_fn`` so fetch dispatch becomes the map side of a
    co-partitioned join: one task per bucket, not every task faulting
    every bucket. This runs on the DRIVER once per generation, so it is
    vectorized: idx extraction is one Arrow regex kernel over the url
    column (8x the per-URL Python loop it replaces) and the
    idx -> bucket map precomputes once per crawl; graphs too large to
    precompute hash only the generation's touched keys."""
    import pyarrow.compute as pc

    table = None
    if graph.n <= (1 << 24):
        table = np.fromiter(
            (corpus_bucket_of("img%08d" % i, num_buckets)
             for i in range(graph.n)), dtype=np.int64, count=graph.n)

    def affinity(t: pa.Table) -> np.ndarray:
        col = t.column("url")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ex = pc.extract_regex(col, r"(?P<idx>\d+)$")
        idx = pc.cast(pc.struct_field(ex, "idx"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        if table is not None:
            return table[idx]
        return np.fromiter(
            (corpus_bucket_of("img%08d" % i, num_buckets) for i in idx),
            dtype=np.int64, count=len(idx))

    return affinity


def make_partitioned_corpus(table: pa.Table, num_buckets: int) -> dict:
    """The 100 TB corpus path: hash-partition the corpus on
    ``image_id`` into ``num_buckets`` object-store tables. A fetch task
    resolves ONLY the buckets its admitted keys hash to (worker-cached),
    so no worker ever holds the whole corpus — the broadcast dict is
    kept only under the size threshold (crawl() dispatch). At real
    scale the refs become co-partitioned Parquet/Lance fragments read
    by the same bucket arithmetic."""
    import ray

    keys = table.column("image_id").to_pylist()
    buckets = np.asarray([corpus_bucket_of(k, num_buckets) for k in keys])
    refs = []
    sub = table.select(["image_id", "bytes", "fmt", "caption"])
    for b in range(num_buckets):
        idx = np.nonzero(buckets == b)[0]
        refs.append(ray.put(sub.take(idx)))
    return {"kind": "parts", "refs": refs, "P": num_buckets}


class _BucketLookup:
    """dict-like .get over a partitioned corpus: bucket tables resolve
    lazily from the object store and build their key->row dict once per
    worker process."""

    def __init__(self, refs, num_buckets: int):
        self.refs = refs
        self.P = num_buckets

    def get(self, key: str, default):
        import ray

        b = corpus_bucket_of(key, self.P)
        ref = self.refs[b]

        def build():
            # lazy rows over the plasma-resident table: ray.get of an
            # Arrow table is zero-copy shared memory, and _ArrowRows
            # adds only the key index on top — no payload duplication
            return _ArrowRows(ray.get(ref))

        return _cache_get("part:" + ref.hex(), build).get(key, default)


def write_corpus_fragments(corpus, out_dir: str, num_buckets: int) -> dict:
    """Pre-bucket the corpus to on-disk Parquet fragments — the true
    100 TB corpus path: the driver never holds the corpus, fetch tasks
    ``read_table`` only the bucket files their admitted keys hash to
    (worker-LRU-cached). Accepts a ``ray.data.Dataset`` (scale path:
    one groupby shuffle writes each bucket from a worker) or a
    ``pa.Table`` (test/small path: buckets written from the caller).
    Idempotent: an existing layout with a matching ``_corpus.json``
    manifest is reused as-is. At multi-node scale ``out_dir`` is shared
    storage (the same assumption as the checkpoint dir)."""
    import json

    out_dir = os.path.abspath(out_dir)
    meta_path = os.path.join(out_dir, "_corpus.json")
    # identity pin: num_buckets AND the corpus shape — a fragments dir
    # populated from a DIFFERENT corpus must not be silently reused
    # (stale payload bytes with no error). Row count is cheap for both
    # input kinds; the id-span tightens the check for tables.
    if isinstance(corpus, pa.Table):
        num_rows = corpus.num_rows
        ids = corpus.column("image_id")
        id_span = [str(pa.compute.min(ids).as_py()),
                   str(pa.compute.max(ids).as_py())] if num_rows else ["", ""]
    else:
        num_rows = corpus.count()
        id_span = None  # Dataset path: row count only (span needs a scan)
    meta = {"num_buckets": int(num_buckets), "num_rows": int(num_rows),
            "id_span": id_span}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            old = json.load(fh)
        comparable = dict(meta)
        if old.get("id_span") is None or meta["id_span"] is None:
            comparable["id_span"] = old.get("id_span")
        if "num_rows" not in old:
            # legacy layout (bucket-count-only pin): accept on matching
            # bucket count rather than forcing a repopulation of a
            # still-valid dir; new writes always pin the full identity
            comparable = {"num_buckets": comparable["num_buckets"]}
        if old != comparable:
            raise ValueError(
                "existing corpus fragment layout %r does not match the "
                "offered corpus %r — refusing to reuse stale fragments; "
                "point corpus_fragments_dir at a fresh directory" % (old, meta))
        return {"kind": "frags", "dir": out_dir, "P": num_buckets,
            "reg": _frag_registry()}
    os.makedirs(out_dir, exist_ok=True)
    # no manifest: any bucket files are a CRASHED prior population
    # (possibly of a different corpus) — clear them so stale buckets
    # cannot survive next to the fresh ones
    import glob as _glob

    for f in _glob.glob(os.path.join(out_dir, "bucket-*.parquet")):
        os.remove(f)

    def bucket_path(b: int) -> str:
        return os.path.join(out_dir, "bucket-%05d.parquet" % b)

    if isinstance(corpus, pa.Table):
        keys = corpus.column("image_id").to_pylist()
        buckets = np.asarray([corpus_bucket_of(k, num_buckets) for k in keys])
        sub = corpus.select(["image_id", "bytes", "fmt", "caption"])
        for b in range(num_buckets):
            idx = np.nonzero(buckets == b)[0]
            if len(idx):
                pq.write_table(sub.take(idx), bucket_path(b))
    else:  # ray.data.Dataset
        def tag(t: pa.Table) -> pa.Table:
            t = t.select(["image_id", "bytes", "fmt", "caption"])
            ids = t.column("image_id").to_pylist()
            bk = np.asarray([corpus_bucket_of(k, num_buckets) for k in ids],
                            dtype=np.int64)
            return t.append_column("__bucket", pa.array(bk))

        def write_bucket(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return pa.table({"bucket": pa.array([], type=pa.int64()),
                                 "rows": pa.array([], type=pa.int64())})
            b = int(g.column("__bucket")[0].as_py())
            path = bucket_path(b)
            tmp = path + ".tmp"
            pq.write_table(g.drop_columns(["__bucket"]).sort_by("image_id"), tmp)
            os.replace(tmp, path)
            return pa.table({"bucket": [b], "rows": [g.num_rows]})

        (corpus.map_batches(tag, batch_format="pyarrow")
         .groupby("__bucket")
         .map_groups(write_bucket, batch_format="pyarrow")
         .materialize())
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    return {"kind": "frags", "dir": out_dir, "P": num_buckets,
            "reg": _frag_registry()}


class _ArrowRows:
    """dict-like ``.get`` over an Arrow corpus table, lazily: building
    the lookup costs only the key column (a str -> row-index dict);
    payload bytes stay in the table's Arrow buffers until the row is
    actually fetched. A bucket build is therefore ~the parquet decode
    alone — the eager ``corpus_dict`` copied every payload into Python
    bytes up front, which at 32 concurrently-cold workers turned one
    generation's fetch into tens of GB of duplicate dict builds."""

    __slots__ = ("_bytes", "_fmt", "_cap", "_idx")

    def __init__(self, table: pa.Table):
        t = table.combine_chunks()
        self._bytes = t.column("bytes")
        self._fmt = t.column("fmt")
        self._cap = t.column("caption")
        self._idx = {k: i for i, k in
                     enumerate(t.column("image_id").to_pylist())}

    def get(self, key: str, default=None):
        i = self._idx.get(key)
        if i is None:
            return default
        return (self._bytes[i].as_py(), self._fmt[i].as_py(),
                self._cap[i].as_py())


_FRAG_COLUMNS = ["image_id", "bytes", "fmt", "caption"]


def _read_fragment_table(path: str) -> pa.Table:
    if not os.path.exists(path):
        return pa.table({"image_id": pa.array([], type=pa.string()),
                         "bytes": pa.array([], type=pa.binary()),
                         "fmt": pa.array([], type=pa.string()),
                         "caption": pa.array([], type=pa.string())})
    return pq.read_table(path, columns=_FRAG_COLUMNS)


class _FragmentRegistry:
    """Cluster-shared index: fragment path -> plasma ObjectRef of the
    decoded bucket table. The FIRST demand for a bucket launches one
    read task (parallel across buckets, num_cpus=0 so blocked fetch
    tasks can't starve it); every later demand — from any worker, any
    generation — gets the same ref and maps the table ZERO-COPY from
    the node's object store. Without this, every worker process decoded
    every bucket it touched into private memory (measured at 100k urls
    / 17 fragments: 32 concurrently-cold workers -> minutes of
    duplicate decodes for a fetch whose warm cost is under a second).
    Cold buckets spill to disk under plasma pressure and fault back on
    demand — exactly the per-node hot-bucket cache the 100 TB corpus
    needs. Decorated at use site (``_frag_registry()``) so importing
    this module never requires an initialized Ray."""

    def __init__(self):
        self._refs: dict = {}
        import ray

        self._read = ray.remote(num_cpus=0)(_read_fragment_table)

    def get_or_build(self, path: str):
        ref = self._refs.get(path)
        if ref is None:
            ref = self._read.remote(path)
            self._refs[path] = ref
        return ref

    def invalidate(self, path: str, ref) -> None:
        """Drop a cached ref that resolved to an error (transient
        storage blip on the one read task) so the next demand launches
        a fresh read — without this, one failed read poisons the bucket
        for the whole crawl. Compared by identity so a racing caller
        can't evict a newer, healthy ref."""
        if self._refs.get(path) == ref:
            del self._refs[path]


def _frag_registry():
    import ray

    return ray.remote(num_cpus=0)(_FragmentRegistry).remote()


class _FragmentLookup:
    """dict-like .get over on-disk corpus fragments: a bucket resolves
    through the :class:`_FragmentRegistry` (one decode per cluster,
    zero-copy plasma table per worker) into a lazy :class:`_ArrowRows`
    whose per-worker footprint is just the key index. Registry-less
    refs (no ``reg`` handle) fall back to a direct per-worker read."""

    def __init__(self, frag_dir: str, num_buckets: int, reg=None):
        self.dir = frag_dir
        self.P = num_buckets
        self.reg = reg

    def get(self, key: str, default):
        b = corpus_bucket_of(key, self.P)
        path = os.path.join(self.dir, "bucket-%05d.parquet" % b)

        def build():
            if self.reg is not None:
                import ray

                for attempt in range(2):
                    ref = ray.get(self.reg.get_or_build.remote(path))
                    try:
                        return _ArrowRows(ray.get(ref))
                    except Exception:
                        if attempt:
                            raise
                        # failed read task: invalidate so the registry
                        # launches a fresh read, then retry once
                        ray.get(self.reg.invalidate.remote(path, ref))
            return _ArrowRows(_read_fragment_table(path))

        return _cache_get("frag:" + path, build).get(key, default)


def _resolve_corpus(corpus_ref):
    if isinstance(corpus_ref, dict):
        if corpus_ref.get("kind") == "parts":
            return _BucketLookup(corpus_ref["refs"], corpus_ref["P"])
        if corpus_ref.get("kind") == "frags":
            return _FragmentLookup(corpus_ref["dir"], corpus_ref["P"],
                                   corpus_ref.get("reg"))
        return corpus_ref
    import ray

    return _cache_get("bcast:" + corpus_ref.hex(), lambda: ray.get(corpus_ref))


def fetch_batch(batch: pa.Table, corpus_ref, graph: WebGraph,
                clock_iso: str) -> pa.Table:
    """Stateless-task fetch/convert: admitted URL -> corpus row -> WARC
    resource row + discovered links."""
    corpus = _resolve_corpus(corpus_ref)
    urls = batch.column("url").to_pylist()
    seqs = batch.column("seq").to_pylist()
    idxs = [graph.idx_of(u) for u in urls]
    image_ids = ["img%08d" % i for i in idxs]
    rows = [corpus.get(im, (b"", "", "")) for im in image_ids]
    payloads = [r[0] for r in rows]
    fmts = [r[1] for r in rows]
    digests = [sha1_b32(p) for p in payloads]
    out = {
        "generation": batch.column("generation").to_pylist(),
        "seq": seqs,
        "record_type": ["resource"] * len(urls),
        "target_uri": urls,
        "host": batch.column("host").to_pylist(),
        "warc_date": [clock_iso] * len(urls),
        "content_type": [MIME_BY_FMT.get(f, "application/octet-stream")
                         for f in fmts],
        "payload": payloads,
        "content_length": [len(p) for p in payloads],
        "payload_digest": digests,
        "record_id": [record_id(u, clock_iso, d, "resource", s)
                      for u, d, s in zip(urls, digests, seqs)],
        "image_id": image_ids,
        "fmt": fmts,
        "caption": [r[2] for r in rows],
        "links": [graph.links(i) for i in idxs],
    }
    schema = pa.schema(
        [
            pa.field("generation", pa.int64()), pa.field("seq", pa.int64()),
            pa.field("record_type", pa.string()), pa.field("target_uri", pa.string()),
            pa.field("host", pa.string()), pa.field("warc_date", pa.string()),
            pa.field("content_type", pa.string()), pa.field("payload", pa.binary()),
            pa.field("content_length", pa.int64()), pa.field("payload_digest", pa.string()),
            pa.field("record_id", pa.string()), pa.field("image_id", pa.string()),
            pa.field("fmt", pa.string()), pa.field("caption", pa.string()),
            pa.field("links", pa.list_(pa.string())),
        ]
    )
    return pa.table(out, schema=schema)


def explode_links(batch: pa.Table, graph: WebGraph) -> pa.Table:
    """Vectorized 1->N link expansion to next-generation frontier rows:
    pyarrow list-flatten for the explode, slice+cast kernels for the
    index (WebGraph URLs end in the 8-digit index), arithmetic for
    priority — no per-row Python."""
    import pyarrow.compute as pc

    links = batch.column("links")
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    flat = links.flatten()
    if len(flat) == 0:
        return pa.table({n: [] for n in FRONTIER_SCHEMA.names},
                        schema=FRONTIER_SCHEMA)
    tail = pc.utf8_slice_codeunits(flat, start=-8)
    idxs = pc.cast(tail, pa.int64())
    pri = pc.subtract(idxs, pc.multiply(pc.divide(idxs, 3), pa.scalar(3, type=pa.int64())))
    key = pc.binary_join_element_wise(pa.scalar("img"), tail, "")
    return pa.table(
        {
            "url": flat,
            "priority": pri,
            "seq": idxs,  # stable discovery key
            "payload_key": key,
            "depth": pa.array(np.zeros(len(flat), dtype=np.int64)),
        },
        schema=FRONTIER_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Driver loop + checkpoint lineage
# ---------------------------------------------------------------------------

def seeds_table(graph: WebGraph, n_seeds: int) -> pa.Table:
    urls = graph.seed_urls(n_seeds)
    idxs = [graph.idx_of(u) for u in urls]
    return pa.table(
        {
            "url": urls,
            "priority": pa.array([graph.priority(i) for i in idxs], type=pa.int64()),
            "seq": pa.array(idxs, type=pa.int64()),
            "payload_key": ["img%08d" % i for i in idxs],
            "depth": pa.array(np.zeros(len(urls), dtype=np.int64)),
        },
        schema=FRONTIER_SCHEMA,
    )


def corpus_dict(table: pa.Table) -> dict[str, tuple]:
    return {
        r["image_id"]: (r["bytes"], r["fmt"], r["caption"])
        for r in table.select(["image_id", "bytes", "fmt", "caption"]).to_pylist()
    }


class CrawlCheckpoint:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def gen_dir(self, g: int) -> str:
        return os.path.join(self.root, "gen=%05d" % g)

    def complete_generations(self) -> list[int]:
        out = []
        if not os.path.isdir(self.root):
            return out
        for name in sorted(os.listdir(self.root)):
            if name.startswith("gen=") and os.path.exists(
                os.path.join(self.root, name, "manifest.json")
            ):
                out.append(int(name.split("=")[1]))
        return out

    def _write_frontier(self, d: str, frontier) -> None:
        """Persist the next-generation frontier DISTRIBUTED — the
        frontier never transits the driver on the checkpoint path
        (checkpointing at the largest generations is exactly when that
        would hurt). Carriers: pa.Table (small tier — written directly),
        list[(ObjectRef, rows)] (task tier — one remote write task per
        ref, each dumps its own part straight from the object store),
        Dataset (backpressure tier — ``write_parquet``, blocks written
        by workers). Atomic via tmp-dir + rename; at multi-node scale
        the checkpoint root is shared storage."""
        import shutil

        fdir = os.path.join(d, "next_frontier")
        tmp = fdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        # clear any prior attempt's carrier FIRST: a crashed or rerun
        # generation may have left a stale next_frontier/ dir (or a
        # legacy single file, which load_next_frontier prefers) — an
        # empty new frontier must not resurrect the abandoned lineage
        shutil.rmtree(fdir, ignore_errors=True)
        legacy = os.path.join(d, "next_frontier.parquet")
        if os.path.exists(legacy):
            os.remove(legacy)
        if frontier is None:
            return
        if isinstance(frontier, pa.Table):
            if frontier.num_rows == 0:
                return
            os.makedirs(tmp, exist_ok=True)
            pq.write_table(frontier, os.path.join(tmp, "part-000000.parquet"))
        elif isinstance(frontier, list):
            import ray

            os.makedirs(tmp, exist_ok=True)
            total = sum(c for _, c in frontier)
            if total <= 65536:
                # small generation: one driver-side part beats a task
                # barrier per ref (the scale hazard was only ever the
                # LARGE-generation materialization)
                tables = [t for t in ray.get([r for r, c in frontier if c])
                          if t.num_rows]
                if tables:
                    pq.write_table(pa.concat_tables(tables),
                                   os.path.join(tmp, "part-000000.parquet"))
            else:

                def _dump(table: pa.Table, path: str) -> int:
                    pq.write_table(table, path)
                    return table.num_rows

                dump = ray.remote(num_cpus=0.5)(_dump)
                ray.get([
                    dump.remote(r, os.path.join(tmp, "part-%06d.parquet" % i))
                    for i, (r, c) in enumerate(frontier) if c
                ])
        else:  # materialized Dataset
            frontier.write_parquet(tmp)
        os.rename(tmp, fdir)

    def write_generation(self, g: int, *, records_ds, admitted: pa.Table,
                         next_frontier,
                         seen_deltas: list[np.ndarray], host_states: list[dict],
                         stats: dict) -> None:
        d = self.gen_dir(g)
        os.makedirs(d, exist_ok=True)
        if records_ds is not None:
            # write-to-tmp + atomic rename (manifest-last protocol): a
            # crashed attempt (manifest absent) leaves partial part
            # files; rerunning the generation must not merge new
            # uniquely-named parts with stale ones.
            import shutil

            rec_dir = os.path.join(d, "records")
            tmp_dir = rec_dir + ".tmp"
            shutil.rmtree(tmp_dir, ignore_errors=True)
            # records are payload-dominated (already-encoded image
            # bytes): snappy costs 3.6x the write time for a 1% size
            # win (measured on a 339 MB generation) — store them raw
            if isinstance(records_ds, pa.Table):
                os.makedirs(tmp_dir, exist_ok=True)
                pq.write_table(records_ds, os.path.join(tmp_dir, "part-0.parquet"),
                               compression="NONE")
            else:
                records_ds.write_parquet(tmp_dir, compression="NONE")
            shutil.rmtree(rec_dir, ignore_errors=True)
            os.rename(tmp_dir, rec_dir)
        pq.write_table(admitted, os.path.join(d, "admitted.parquet"))
        # links discovered this generation but not yet offered — they
        # are NOT in the host-shard snapshots, so resume needs them
        self._write_frontier(d, next_frontier)
        for i, delta in enumerate(seen_deltas):
            pq.write_table(
                pa.table({"hash": pa.array(delta, type=pa.uint64())}),
                os.path.join(d, "seen_delta_%04d.parquet" % i),
            )
        with open(os.path.join(d, "host_state.json"), "w") as fh:
            json.dump(host_states, fh)
        # manifest written LAST: its presence marks the generation durable
        tmp = os.path.join(d, "manifest.json.tmp")
        with open(tmp, "w") as fh:
            json.dump({"generation": g, **stats}, fh)
        os.rename(tmp, os.path.join(d, "manifest.json"))

    def load_seen_deltas(self, upto_gen: int, num_shards: int) -> list[np.ndarray]:
        parts: list[list[np.ndarray]] = [[] for _ in range(num_shards)]
        for g in self.complete_generations():
            if g > upto_gen:
                continue
            d = self.gen_dir(g)
            for i in range(num_shards):
                p = os.path.join(d, "seen_delta_%04d.parquet" % i)
                if os.path.exists(p):
                    parts[i].append(pq.read_table(p).column("hash").to_numpy())
        return [
            np.concatenate(p) if p else np.empty(0, dtype=np.uint64) for p in parts
        ]

    def load_host_states(self, g: int) -> list[dict]:
        with open(os.path.join(self.gen_dir(g), "host_state.json")) as fh:
            return json.load(fh)

    def load_next_frontier(self, g: int):
        """Resume carrier: the frontier parts load via remote read tasks
        into the OBJECT STORE — the driver gets back (ref, rows) pairs
        (row counts from the parquet footers, no data read driver-side),
        the same task-tier carrier crawl() feeds straight into probe
        tasks. Single-file legacy checkpoints load as a plain table."""
        d = self.gen_dir(g)
        legacy = os.path.join(d, "next_frontier.parquet")
        if os.path.exists(legacy):
            return pq.read_table(legacy)
        fdir = os.path.join(d, "next_frontier")
        if not os.path.isdir(fdir):
            return None
        import glob

        import ray

        def _load(path: str) -> pa.Table:
            return pq.read_table(path)

        load = ray.remote(num_cpus=0.5)(_load)
        out = []
        for p in sorted(glob.glob(os.path.join(fdir, "*.parquet"))):
            rows = pq.ParquetFile(p).metadata.num_rows
            if rows:
                out.append((load.remote(p), rows))
        return out or None


def crawl(
    corpus_table: pa.Table | None = None,
    *,
    graph: WebGraph | None = None,
    fetch_fn=None,
    fetch_args: tuple = (),
    explode_fn=None,
    seeds: pa.Table | None = None,
    robots_map: dict | None = None,
    n_seeds: int = 8,
    max_generations: int = 10,
    num_seen_shards: int = 4,
    num_host_shards: int = 4,
    rate: float = 1.0,
    capacity: float = 2.0,
    clock_iso: str = "2026-01-01T00:00:00Z",
    checkpoint_dir: str | None = None,
    resume: bool = False,
    stop_after_generation: int | None = None,
    batch_size: int = 4096,
    fetch_concurrency: int = 4,
    small_frontier_threshold: int = 32768,
    small_admit_threshold: int = 8192,
    track_visits: bool = False,
    seen_fp_bits: int = 16,
    corpus_partitions: int | None = None,
    corpus_broadcast_threshold: int = 256 << 20,
    corpus_fragments_dir: str | None = None,
    task_frontier_threshold: int | None = None,
    seen_capacity: int | None = None,
    fetch_affinity_fn=None,
    max_pending_per_host: int = 100_000,
) -> dict:
    """Run the crawl; returns stats + (if checkpointing) the output layout.

    ``resume=True`` restores seen/host state from the last complete
    generation in ``checkpoint_dir`` and continues; finished
    generations are never recomputed (their records partitions stay).

    ``track_visits`` defaults to FALSE: the in-memory visit log grows
    with total crawl size (a driver OOM at 10^10 URLs). The durable
    visit record at scale is the per-generation ``admitted.parquet``
    in the checkpoint; opt in to the in-memory log only for
    test-scale equivalence checks."""
    import ray
    import ray.data as rd

    from ..state.shards import make_actors

    # fetcher plumbing: default = the corpus/WebGraph fetcher; callers
    # may pass any (fetch_fn(batch, *fetch_args) -> records-with-links,
    # explode_fn(records) -> frontier, seeds, robots_map) — e.g. the
    # zip-archive crawler in pipelines/zipcrawl.py (file://and zip://
    # pseudo-URLs are first-class frontier entries per the north rule).
    if fetch_fn is None:
        if corpus_table is None:
            raise ValueError("need corpus_table or an explicit fetch_fn")
        n = corpus_table.num_rows
        graph = graph or WebGraph(n)
        # corpus dispatch: broadcast the whole dict only while it is
        # genuinely small-side; above the threshold (or when forced),
        # hash-partition on image_id so fetch tasks resolve only the
        # buckets they touch (see make_partitioned_corpus)
        if corpus_fragments_dir is not None:
            # fragment mode (the 100 TB path): corpus pre-bucketed to
            # on-disk parquet; the driver never ray.puts it and fetch
            # tasks read only the buckets they touch
            num_parts = corpus_partitions or max(
                8, int(corpus_table.nbytes // (64 << 20)))
            corpus_ref = write_corpus_fragments(
                corpus_table, corpus_fragments_dir, num_parts)
        elif corpus_partitions or corpus_table.nbytes > corpus_broadcast_threshold:
            num_parts = corpus_partitions or max(
                8, int(corpus_table.nbytes // (64 << 20)))
            corpus_ref = make_partitioned_corpus(corpus_table, num_parts)
        else:
            corpus_ref = ray.put(corpus_dict(corpus_table))
        fetch_fn = fetch_batch
        fetch_args = (corpus_ref, graph, clock_iso)
        if (fetch_affinity_fn is None and isinstance(corpus_ref, dict)
                and corpus_ref.get("kind") in ("parts", "frags")):
            # bucketed corpus -> bucket-affine fetch dispatch (see the
            # dispatch site): group each generation's admitted rows by
            # the corpus bucket their key hashes to
            fetch_affinity_fn = corpus_affinity_fn(graph, corpus_ref["P"])
        explode_fn = lambda t: explode_links(t, graph)  # noqa: E731
        seeds = seeds_table(graph, n_seeds)
        robots_map = graph.robots_map()
        if seen_capacity is None:
            seen_capacity = max(4096, 4 * n)
    else:
        if seeds is None or explode_fn is None:
            raise ValueError("custom fetch_fn needs seeds and explode_fn")
        if seen_capacity is None:
            seen_capacity = 1 << 20

    ckpt = CrawlCheckpoint(checkpoint_dir) if checkpoint_dir else None

    seen_actors, host_actors = make_actors(
        num_seen_shards, num_host_shards,
        seen_capacity=seen_capacity,
        rate=rate, capacity=capacity, robots_map=robots_map,
        seen_fp_bits=seen_fp_bits,
        max_pending_per_host=max_pending_per_host,
    )

    start_gen = 0
    frontier: pa.Table | None = seeds
    if resume:
        if ckpt is None:
            raise ValueError("resume requires checkpoint_dir")
        done = ckpt.complete_generations()
        if done:
            last = done[-1]
            deltas = ckpt.load_seen_deltas(last, num_seen_shards)
            ray.get([a.replay.remote(d) for a, d in zip(seen_actors, deltas)])
            states = ckpt.load_host_states(last)
            ray.get([a.restore_state.remote(s) for a, s in zip(host_actors, states)])
            start_gen = last + 1
            # pending URLs live in the restored host shards; links found in
            # the last generation but never offered resume as the frontier
            frontier = ckpt.load_next_frontier(last)

    totals = {"admitted": 0, "offered": 0, "generations": 0,
              "gen_admits": []}
    visit_log: list[tuple] = []
    phase_times = {"probe_offer": 0.0, "admit": 0.0, "fetch": 0.0,
                   "explode": 0.0, "checkpoint": 0.0}
    _now = __import__("time").monotonic

    # Hybrid dispatch: a generation whose frontier/admit set is small is
    # processed with direct calls (same stage functions, same sharded
    # actors — just without per-generation Ray Data job overhead); large
    # generations stream through Dataset pipelines. The crossover is
    # sized so the 10^10-frontier path is always the Dataset one.
    small_frontier = small_frontier_threshold
    small_admit = small_admit_threshold
    # frontier generations up to this size dispatch as plain parallel ray
    # tasks (fused probe+offer, no Dataset operator overhead); beyond it
    # the streaming Dataset pipeline takes over (backpressure + spilling)
    # frontier rows above this promote the ref/task tiers to the
    # streaming Dataset tier (backpressure + spilling); injectable so
    # the promotion path is testable at small scale
    task_frontier = task_frontier_threshold if task_frontier_threshold is not None \
        else max(small_frontier, 4_000_000 // max(1, batch_size) * batch_size)
    fetch_explode_task = ray.remote(num_cpus=1, num_returns=3)(fetch_and_explode)
    probe_offer_task = ray.remote(num_cpus=1)(probe_and_offer_batch)
    count_rows_task = ray.remote(num_cpus=0.25)(lambda t: t.num_rows)

    def frontier_rows(f) -> int:
        # frontier carriers: pa.Table (seeds/resume/small),
        # list[(ObjectRef, nrows)] (task tier — tables stay in the
        # object store, the driver holds refs + counts only), or a
        # materialized Dataset (large tier — blocks stay distributed)
        if f is None:
            return 0
        if isinstance(f, list):
            return sum(c for _, c in f)
        if isinstance(f, pa.Table):
            return f.num_rows
        return f.count()

    def table_as_blocks(table: pa.Table, rows_per_block: int):
        """pa.Table -> multi-block Dataset. ``rd.from_arrow(table)``
        makes ONE block, and a one-block Dataset runs its whole
        map_batches as ONE task — a 586k-row generation entering the
        Dataset tier through it serialized the entire fetch onto one
        core (measured 28.7s vs 3.3s for the sliced version)."""
        if table.num_rows <= rows_per_block:
            return rd.from_arrow(table)
        return rd.from_arrow([
            table.slice(lo, rows_per_block)
            for lo in range(0, table.num_rows, rows_per_block)
        ])

    def dataset_to_refs(ds) -> list | None:
        # demote Dataset tier -> ref tier WITHOUT driver transit: block
        # refs + footer row counts from the ref bundles (no ray.get)
        out = []
        for bundle in ds.iter_internal_ref_bundles():
            for block_ref, meta in bundle.blocks:
                rows = meta.num_rows
                if rows is None:  # metadata gap: count remotely, keep the ref
                    rows = ray.get(count_rows_task.remote(block_ref))
                if rows:
                    out.append((block_ref, rows))
        return out or None

    for g in range(start_gen, max_generations):
        # --- 1. dedup + offer the current frontier (if any) -------------
        _t0 = _now()
        n_front = frontier_rows(frontier)
        if isinstance(frontier, rd.Dataset) and n_front <= task_frontier:
            frontier = dataset_to_refs(frontier)  # small again: leave Dataset tier
        elif isinstance(frontier, list) and n_front > task_frontier:
            # promote ref tier -> Dataset tier without driver transit
            frontier = rd.from_arrow_refs([r for r, _ in frontier])
        if frontier is not None and n_front:
            if isinstance(frontier, list):
                # ref tier: frontier tables never touched the driver —
                # each probe task reads its slice straight from the
                # object store (refs auto-deref as task args)
                refs = [
                    probe_offer_task.remote(r, seen_actors, host_actors)
                    for r, c in frontier if c
                ]
                totals["offered"] += sum(ray.get(refs))
            elif isinstance(frontier, rd.Dataset) or frontier.num_rows > task_frontier:
                fds = frontier if isinstance(frontier, rd.Dataset) \
                    else table_as_blocks(frontier, batch_size)
                offered = (
                    fds.map_batches(seen_probe_batch, fn_args=(seen_actors,),
                                    batch_size=batch_size, batch_format="pyarrow")
                    .map_batches(offer_batch, fn_args=(host_actors,),
                                 batch_size=batch_size, batch_format="pyarrow")
                    .to_pandas()
                )
                totals["offered"] += int(offered["offered"].sum()) if len(offered) else 0
            elif frontier.num_rows <= small_frontier:
                off = 0
                for lo in range(0, frontier.num_rows, batch_size):
                    chunk = frontier.slice(lo, batch_size)
                    fresh = seen_probe_batch(chunk, seen_actors)
                    off += int(offer_batch(fresh, host_actors)["offered"][0].as_py()) \
                        if fresh.num_rows else 0
                totals["offered"] += off
            else:
                refs = [
                    probe_offer_task.remote(frontier.slice(lo, batch_size),
                                            seen_actors, host_actors)
                    for lo in range(0, frontier.num_rows, batch_size)
                ]
                totals["offered"] += sum(ray.get(refs))
        phase_times["probe_offer"] += _now() - _t0
        frontier = None

        # --- 2. politeness tick: admit per host --------------------------
        _t0 = _now()
        # per-shard admits arrive as Arrow tables built ON the actors
        # (fixed shard order -> deterministic concat): the driver's
        # ray.get maps plasma-backed tables and never materializes
        # python string lists. One generation's admit set is bounded by
        # rate x hosts, the only driver-held state.
        admits = ray.get([a.admit_table.remote() for a in host_actors])
        shard_tables = []
        for ad in admits:
            if ad is None:
                continue
            if isinstance(ad, dict):  # small tick arrived inline
                ad = pa.table({
                    "host": pa.array(ad["host"], type=pa.string()),
                    "url": pa.array(ad["url"], type=pa.string()),
                    "priority": pa.array(ad["priority"], type=pa.int64()),
                    "seq": pa.array(ad["seq"], type=pa.int64()),
                    "payload_key": pa.array(ad["payload_key"], type=pa.string()),
                    "depth": pa.array(ad["depth"], type=pa.int64()),
                })
            shard_tables.append(ad)
        n_admitted = sum(t.num_rows for t in shard_tables)
        if n_admitted == 0:
            pending = sum(ray.get([a.pending.remote() for a in host_actors]))
            if pending == 0:
                break
            # buckets empty this tick but URLs remain: next tick refills
        if shard_tables:
            body = pa.concat_tables(shard_tables)
        else:
            body = pa.table({
                "host": pa.array([], type=pa.string()),
                "url": pa.array([], type=pa.string()),
                "priority": pa.array([], type=pa.int64()),
                "seq": pa.array([], type=pa.int64()),
                "payload_key": pa.array([], type=pa.string()),
                "depth": pa.array([], type=pa.int64()),
            })
        admitted = body.add_column(
            0, "generation", pa.array([g] * n_admitted, type=pa.int64()))
        totals["admitted"] += n_admitted
        totals["gen_admits"].append(n_admitted)
        totals["generations"] = g + 1
        if track_visits:
            for h, u in zip(body.column("host").to_pylist(),
                            body.column("url").to_pylist()):
                visit_log.append((g, h, u))

        phase_times["admit"] += _now() - _t0

        # --- 3. fetch + link discovery -----------------------------------
        _t0 = _now()
        records = None  # pa.Table (small path) or Dataset (large path)
        next_frontier = None
        if n_admitted:
            # bucket-affine dispatch (the map side of a co-partitioned
            # join): with a partitioned/fragment corpus, sort this
            # generation's rows by corpus bucket and cut task slices at
            # bucket boundaries so a fetch task touches ONE bucket.
            # Without this, every task faults every bucket into its
            # worker's cache (measured at 100k urls / 17 fragments: 32
            # concurrently-cold workers spent 108 s on duplicate bucket
            # builds for a generation whose warm fetch is 0.6 s). The
            # checkpointed `admitted` table keeps its original order —
            # only dispatch order changes, and records are seq-keyed
            # (physical emission sorts once on seq).
            dispatch = admitted
            seg_bounds = [(0, n_admitted)]
            if fetch_affinity_fn is not None:
                bk = np.asarray(fetch_affinity_fn(admitted))
                order = np.argsort(bk, kind="stable")
                dispatch = admitted.take(pa.array(order))
                sb = bk[order]
                cuts = (np.flatnonzero(sb[1:] != sb[:-1]) + 1).tolist()
                edges = [0] + cuts + [n_admitted]
                # coalesce adjacent sub-task-size segments: with many
                # corpus buckets and a sparse generation, one task per
                # non-empty bucket would degenerate to thousands of
                # few-row tasks — a merged task touches a FEW adjacent
                # buckets instead (still far from all of them)
                min_rows = 1024 if n_admitted > 4096 else 256
                seg_bounds = []
                cur_lo = 0
                for hi in edges[1:]:
                    if hi - cur_lo >= min_rows or hi == n_admitted:
                        seg_bounds.append((cur_lo, hi))
                        cur_lo = hi
            if n_admitted <= small_admit:
                # parallel plain tasks over ~256-row slices; explode is
                # fused into the task (fetch_and_explode) and the
                # frontier tables STAY in the object store — the driver
                # gets back only refs + row counts
                slice_rows = 1024 if n_admitted > 4096 else 256
                rec_refs, front_refs, cnt_refs = [], [], []
                for seg_lo, seg_hi in seg_bounds:
                    for lo in range(seg_lo, seg_hi, slice_rows):
                        r, f, c = fetch_explode_task.remote(
                            dispatch.slice(lo, min(slice_rows, seg_hi - lo)),
                            fetch_fn, fetch_args, explode_fn)
                        rec_refs.append(r)
                        front_refs.append(f)
                        cnt_refs.append(c)
                meta = ray.get(cnt_refs)  # (front_rows, rec_bytes) per slice
                if ckpt is None:
                    # records are consumed only by the checkpoint:
                    # without one, don't ship them to the driver at all
                    records = None
                elif sum(m[1] for m in meta) > (64 << 20):
                    # heavy-payload generation (image records): never
                    # ship the record tables to the driver — the slice
                    # refs become Dataset blocks in place and the
                    # checkpoint writes its parts DISTRIBUTED. The
                    # driver concat + single-threaded parquet write was
                    # 5.5 s of the 9.4 s 100k image crawl; row-light
                    # generations (the frontier shape) keep the cheap
                    # concat — a per-generation Ray Data job costs more
                    # than it saves there.
                    records = rd.from_arrow_refs(rec_refs)
                else:
                    records = pa.concat_tables(ray.get(rec_refs))
                phase_times["fetch"] += _now() - _t0
                _t0 = _now()
                next_frontier = [(r, m[0])
                                 for r, m in zip(front_refs, meta) if m[0]]
                if not next_frontier:
                    next_frontier = None
            else:
                # block-sliced entry: one task per ~4k-row block (each
                # looping 256-row fetch batches), not one task for the
                # whole generation; with affinity set, `dispatch` is
                # bucket-sorted so blocks are (mostly) bucket-local
                records = table_as_blocks(dispatch, 4096).map_batches(
                    fetch_fn,
                    fn_args=fetch_args,
                    batch_size=256, batch_format="pyarrow",
                ).materialize()
                # explode distributed inside map_batches; the frontier
                # stays a materialized Dataset (blocks never transit
                # the driver — step 1's Dataset tier consumes it)
                front_ds = (
                    records.select_columns(["links"])
                    .map_batches(explode_fn, batch_size=batch_size,
                                 batch_format="pyarrow")
                    .materialize()
                )
                next_frontier = front_ds if front_ds.count() else None
        phase_times["explode"] += _now() - _t0

        # --- 4. checkpoint lineage ---------------------------------------
        _t0 = _now()
        if ckpt is not None:
            deltas = ray.get([a.flush_delta.remote() for a in seen_actors])
            states = ray.get([a.checkpoint_state.remote() for a in host_actors])
            ckpt.write_generation(
                g,
                records_ds=records.drop_columns(["links"]) if records is not None else None,
                admitted=admitted,
                next_frontier=next_frontier,  # carrier passed as-is:
                # ref/Dataset tiers write their parts distributed
                seen_deltas=deltas,
                host_states=states,
                stats={"admitted": n_admitted},
            )

        phase_times["checkpoint"] += _now() - _t0
        frontier = next_frontier
        if stop_after_generation is not None and g >= stop_after_generation:
            break

    stats = [s for s in ray.get([a.get_stats.remote() for a in host_actors])]
    seen_count = sum(ray.get([a.count.remote() for a in seen_actors]))
    totals["seen"] = seen_count
    totals["robots_blocked"] = sum(s.get("robots_blocked", 0) for s in stats)
    totals["evicted"] = sum(s.get("evicted", 0) for s in stats)
    totals["visit_log"] = visit_log
    totals["phase_times"] = {k: round(v, 3) for k, v in phase_times.items()}
    for a in seen_actors + host_actors:
        ray.kill(a)
    return totals
