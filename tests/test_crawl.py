"""Crawl-layer tests (north rule): cuckoo seen-set, politeness,
robots, crawl-order equivalence vs an INDEPENDENT serial oracle,
per-row decode invariants, and bit-identical resume from checkpoint."""

import heapq
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from warcit_ray.codecs import decode, psnr
from warcit_ray.functions.urls import surt, surt_host
from warcit_ray.pipelines.crawl import CrawlCheckpoint, WebGraph, crawl
from warcit_ray.sources.synth import make_caption, make_image, make_image_table
from warcit_ray.state.cuckoo import CuckooFilter
from warcit_ray.state.robots import allowed, parse_robots
from warcit_ray.state.shards import HostShardState

N = 120
CLOCK = "2026-01-01T00:00:00Z"


@pytest.fixture(scope="module")
def corpus():
    return make_image_table(N)


# --- unit: state structures --------------------------------------------------

def test_cuckoo_filter():
    f = CuckooFilter(10000)
    rng = np.random.default_rng(3)
    keys = rng.integers(1, 2**63, 5000, dtype=np.uint64)
    added = f.add_if_absent_batch(keys)
    uniq = np.unique(keys)
    assert added.sum() == len(uniq)
    # no false negatives
    assert f.contains_batch(uniq).all()
    # re-add -> nothing new
    assert f.add_if_absent_batch(keys).sum() == 0
    # duplicate within one batch counts once
    dup = np.array([7, 7, 7], dtype=np.uint64)
    a = f.add_if_absent_batch(dup)
    assert list(a) == [True, False, False]
    # false-positive rate sane on fresh keys
    fresh = rng.integers(2**63, 2**64 - 1, 20000, dtype=np.uint64)
    fp = f.contains_batch(fresh).mean()
    assert fp < 0.01


def test_robots():
    txt = """
# comment
User-agent: *
Disallow: /private/
Disallow: /tmp

User-agent: evilbot
Disallow: /
"""
    dis = parse_robots(txt)
    assert dis == ["/private/", "/tmp"]
    assert not allowed("http://h/private/x", dis)
    assert allowed("http://h/public/x", dis)


def test_hostshard_politeness_order():
    hs = HostShardState(0, rate=1.0, capacity=2.0, robots_map={"a": ["/private/"]})
    hs.offer(
        ["a", "a", "a", "b", "a"],
        ["http://a/x", "http://a/private/y", "http://a/z", "http://b/q", "http://a/w"],
        [1, 0, 0, 0, 2],
        [10, 11, 12, 13, 14],
        ["", "", "", "", ""],
        [0, 0, 0, 0, 0],
    )
    assert hs.get_stats()["robots_blocked"] == 1
    # tick 1: host a has capacity 2 -> pops 2 best-priority; host b pops 1
    out = hs.admit()
    assert out["url"][:2] == ["http://a/z", "http://a/x"]  # (pri, seq) order
    assert "http://b/q" in out["url"]
    # tick 2: refill 1 token -> the remaining a URL
    out2 = hs.admit()
    assert out2["url"] == ["http://a/w"]
    assert hs.pending() == 0


# --- serial oracle (independent implementation) ------------------------------

def serial_oracle(graph: WebGraph, n_seeds: int, max_generations: int,
                  rate: float, capacity: float):
    robots = graph.robots_map()
    seen: set[str] = set()
    heaps: dict[str, list] = {}
    tokens: dict[str, float] = {}
    frontier = [(u, graph.priority(graph.idx_of(u)), graph.idx_of(u))
                for u in graph.seed_urls(n_seeds)]
    visit_log = []
    blocked = 0
    for g in range(max_generations):
        for url, pri, seq in frontier:
            s = surt(url)
            if s in seen:
                continue
            seen.add(s)
            host = surt_host(url)
            if not allowed(url, robots.get(host, ())):
                blocked += 1
                continue
            heapq.heappush(heaps.setdefault(host, []), (pri, seq, url))
        frontier = []
        admitted = []
        for host in sorted(heaps):
            heap = heaps[host]
            if not heap:
                continue
            tokens[host] = min(capacity, tokens.get(host, capacity) + rate)
            k = int(tokens[host])
            for _ in range(min(k, len(heap))):
                pri, seq, url = heapq.heappop(heap)
                admitted.append((host, url))
                tokens[host] -= 1.0
        if not admitted and not any(heaps.values()):
            break
        for host, url in admitted:
            visit_log.append((g, host, url))
            idx = graph.idx_of(url)
            for lnk in graph.links(idx):
                frontier.append((lnk, graph.priority(graph.idx_of(lnk)),
                                 graph.idx_of(lnk)))
    return {"visit_log": visit_log, "seen": seen, "robots_blocked": blocked}


def test_crawl_matches_serial_oracle(corpus):
    graph = WebGraph(N)
    kw = dict(n_seeds=6, max_generations=30, rate=1.0, capacity=2.0,
              track_visits=True)
    oracle = serial_oracle(graph, kw["n_seeds"], kw["max_generations"],
                           kw["rate"], kw["capacity"])
    res = crawl(corpus, graph=graph, num_seen_shards=3, num_host_shards=3,
                clock_iso=CLOCK, seen_fp_bits=32, **kw)

    # per-host visit sequences identical (the politeness contract)
    def per_host(log):
        out: dict[str, list] = {}
        for g, h, u in log:
            out.setdefault(h, []).append(u)
        return out

    assert per_host(res["visit_log"]) == per_host(oracle["visit_log"])
    # per-generation admitted SETS identical (global order may interleave
    # differently across shards; the set per tick is the contract)
    def per_gen(log):
        out: dict[int, set] = {}
        for g, h, u in log:
            out.setdefault(g, set()).add(u)
        return out

    assert per_gen(res["visit_log"]) == per_gen(oracle["visit_log"])
    # URL-seen set identical
    visited_engine = {u for _, _, u in res["visit_log"]}
    visited_oracle = {u for _, _, u in oracle["visit_log"]}
    assert visited_engine == visited_oracle
    assert res["robots_blocked"] == oracle["robots_blocked"]
    assert res["seen"] == len(oracle["seen"])


def test_crawl_records_invariants(corpus, tmp_path):
    graph = WebGraph(N)
    ck = str(tmp_path / "ck")
    crawl(corpus, graph=graph, n_seeds=6, max_generations=8,
          num_seen_shards=2, num_host_shards=2, clock_iso=CLOCK,
          checkpoint_dir=ck)
    # read all records partitions; verify decode + caption invariants
    rows = []
    for g in sorted(os.listdir(ck)):
        rec_dir = os.path.join(ck, g, "records")
        if os.path.isdir(rec_dir):
            for f in sorted(os.listdir(rec_dir)):
                rows.extend(pq.read_table(os.path.join(rec_dir, f)).to_pylist())
    assert rows
    for row in rows[:40]:
        idx = int(row["image_id"][3:])
        src = make_image(idx)
        dec = decode(row["payload"], row["fmt"])
        if row["fmt"] == "dctq":
            assert psnr(dec, src) >= 40.0
        else:
            assert np.array_equal(dec, src)
        assert row["caption"] == make_caption(idx)
        from warcit_ray.functions.digests import sha1_b32
        assert row["payload_digest"] == sha1_b32(row["payload"])


def test_crawl_resume_bit_identical(corpus, tmp_path):
    graph = WebGraph(N)
    kw = dict(n_seeds=6, max_generations=12, num_seen_shards=2,
              num_host_shards=2, clock_iso=CLOCK, seen_fp_bits=32,
              track_visits=True)
    ck_full = str(tmp_path / "full")
    full = crawl(corpus, graph=graph, checkpoint_dir=ck_full, **kw)

    ck_part = str(tmp_path / "part")
    crawl(corpus, graph=graph, checkpoint_dir=ck_part,
          stop_after_generation=3, **kw)
    resumed = crawl(corpus, graph=graph, checkpoint_dir=ck_part, resume=True, **kw)

    # same complete generations on disk
    assert CrawlCheckpoint(ck_full).complete_generations() == \
           CrawlCheckpoint(ck_part).complete_generations()

    # record partitions identical (modulo row order within a generation)
    def load_all(root):
        out = []
        for g in CrawlCheckpoint(root).complete_generations():
            d = os.path.join(root, "gen=%05d" % g, "records")
            if os.path.isdir(d):
                for f in sorted(os.listdir(d)):
                    out.extend(pq.read_table(os.path.join(d, f)).to_pylist())
        return sorted(out, key=lambda r: (r["generation"], r["host"], r["seq"]))

    a, b = load_all(ck_full), load_all(ck_part)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra == rb
    # the resumed run continued, not restarted: its visit log only covers
    # generations after the stop point
    assert all(g > 3 for g, _, _ in resumed["visit_log"])


def test_hot_host_cap():
    # skew guard: a hot host's frontier is capped; best-(priority,seq)
    # entries are retained, eviction counted
    hs = HostShardState(0, rate=1.0, capacity=2.0, max_pending_per_host=4)
    n = 20
    hs.offer(["hot"] * n, ["http://hot/p%02d" % i for i in range(n)],
             [i % 3 for i in range(n)], list(range(n)), [""] * n, [0] * n)
    assert hs.pending() <= 5  # cap 4 with 1.2x amortization slack
    assert hs.get_stats()["evicted"] > 0
    out = hs.admit()
    # the best-priority entries survived the trim
    assert out["url"][0] == "http://hot/p00"


def test_dataset_path_equivalent_to_direct_path(corpus):
    """Forcing the large-frontier Dataset branches (thresholds=0) must
    produce the same crawl as the small/direct branches."""
    graph = WebGraph(N)
    kw = dict(n_seeds=6, max_generations=10, num_seen_shards=2,
              num_host_shards=2, clock_iso=CLOCK, seen_fp_bits=32,
              track_visits=True)
    small = crawl(corpus, graph=graph, **kw)
    large = crawl(corpus, graph=graph, small_frontier_threshold=0,
                  small_admit_threshold=0, **kw)

    def per_host(log):
        out = {}
        for g, h, u in log:
            out.setdefault(h, []).append(u)
        return out

    assert per_host(small["visit_log"]) == per_host(large["visit_log"])
    assert small["admitted"] == large["admitted"]
    assert small["seen"] == large["seen"]


def test_offer_batch_top_per_host_trim():
    """Skew lever: a batch dominated by one host ships only its best
    top_per_host entries; other hosts are untouched."""
    import pyarrow as pa
    import ray

    from warcit_ray.pipelines.crawl import offer_batch
    from warcit_ray.state.shards import make_actors

    _, host_actors = make_actors(0, 1, rate=100.0, capacity=100.0)
    n = 50
    batch = pa.table({
        "url": (["http://hot.example/p%02d" % i for i in range(n)]
                + ["http://cold.example/x"]),
        "priority": pa.array([i % 3 for i in range(n)] + [0], type=pa.int64()),
        "seq": pa.array(list(range(n)) + [999], type=pa.int64()),
        "payload_key": pa.array([""] * (n + 1), type=pa.string()),
        "depth": pa.array([0] * (n + 1), type=pa.int64()),
    })
    out = offer_batch(batch, host_actors, top_per_host=5)
    assert out["offered"][0].as_py() == 6  # 5 hot + 1 cold
    admitted = ray.get(host_actors[0].admit.remote())
    hot = [u for u in admitted["url"] if "hot" in u]
    # the kept 5 are the best (priority, seq): priorities 0 come first
    assert len(hot) == 5
    assert hot[0] == "http://hot.example/p00"
    assert "http://cold.example/x" in admitted["url"]
    for a in host_actors:
        ray.kill(a)


def test_partitioned_corpus_equivalent(corpus):
    """The hash-partitioned corpus fetch (forced via corpus_partitions)
    must produce the identical crawl as the broadcast-dict path."""
    graph = WebGraph(N)
    kw = dict(n_seeds=6, max_generations=10, num_seen_shards=2,
              num_host_shards=2, clock_iso=CLOCK, seen_fp_bits=32,
              track_visits=True)
    bcast = crawl(corpus, graph=graph, **kw)
    parts = crawl(corpus, graph=graph, corpus_partitions=5, **kw)
    assert sorted(bcast["visit_log"]) == sorted(parts["visit_log"])
    assert bcast["admitted"] == parts["admitted"]
    assert bcast["seen"] == parts["seen"]


def test_bucket_lookup_matches_dict(corpus, ray_session):
    from warcit_ray.pipelines.crawl import (
        _resolve_corpus,
        corpus_dict,
        make_partitioned_corpus,
    )

    full = corpus_dict(corpus)
    lookup = _resolve_corpus(make_partitioned_corpus(corpus, 7))
    for key in list(full)[:40]:
        assert lookup.get(key, None) == full[key]
    assert lookup.get("img-nonexistent", ("", "", "")) == ("", "", "")


def test_checkpointed_resume_dataset_tier(corpus, tmp_path):
    """VERDICT r2 #1: with the Dataset frontier tier FORCED
    (task_frontier_threshold=0), the checkpointed next-frontier is
    written distributed (next_frontier/ part files, never concatenated
    on the driver) and resume from it is bit-identical."""
    graph = WebGraph(N)
    kw = dict(n_seeds=6, max_generations=12, num_seen_shards=2,
              num_host_shards=2, clock_iso=CLOCK, seen_fp_bits=32,
              track_visits=True, task_frontier_threshold=0)
    ck_full = str(tmp_path / "full")
    crawl(corpus, graph=graph, checkpoint_dir=ck_full, **kw)

    ck_part = str(tmp_path / "part")
    crawl(corpus, graph=graph, checkpoint_dir=ck_part,
          stop_after_generation=3, **kw)
    # the interrupted checkpoint wrote the frontier as a distributed
    # part-file directory (not a driver-concatenated single file)
    fdirs = [os.path.join(ck_part, g, "next_frontier")
             for g in sorted(os.listdir(ck_part))]
    assert any(os.path.isdir(d) and os.listdir(d) for d in fdirs)
    resumed = crawl(corpus, graph=graph, checkpoint_dir=ck_part,
                    resume=True, **kw)

    def load_all(root):
        out = []
        for g in CrawlCheckpoint(root).complete_generations():
            d = os.path.join(root, "gen=%05d" % g, "records")
            if os.path.isdir(d):
                for f in sorted(os.listdir(d)):
                    out.extend(pq.read_table(os.path.join(d, f)).to_pylist())
        return sorted(out, key=lambda r: (r["generation"], r["host"], r["seq"]))

    a, b = load_all(ck_full), load_all(ck_part)
    assert len(a) == len(b) and a == b
    assert all(g > 3 for g, _, _ in resumed["visit_log"])


def test_fragment_corpus_equivalent(corpus, tmp_path):
    """Fragment-backed corpus (on-disk parquet buckets, no driver-held
    table, no ray.put) must produce the identical crawl."""
    graph = WebGraph(N)
    kw = dict(n_seeds=6, max_generations=10, num_seen_shards=2,
              num_host_shards=2, clock_iso=CLOCK, seen_fp_bits=32,
              track_visits=True)
    bcast = crawl(corpus, graph=graph, **kw)
    frag = crawl(corpus, graph=graph,
                 corpus_fragments_dir=str(tmp_path / "frags"),
                 corpus_partitions=5, **kw)
    assert sorted(bcast["visit_log"]) == sorted(frag["visit_log"])
    assert bcast["admitted"] == frag["admitted"]
    assert bcast["seen"] == frag["seen"]


def test_fragment_lookup_matches_dict(corpus, tmp_path, ray_session):
    import ray.data as rd

    from warcit_ray.pipelines.crawl import (
        _resolve_corpus,
        corpus_dict,
        write_corpus_fragments,
    )

    full = corpus_dict(corpus)
    # table write path
    ref = write_corpus_fragments(corpus, str(tmp_path / "t"), 7)
    lookup = _resolve_corpus(ref)
    for key in list(full)[:40]:
        assert lookup.get(key, None) == full[key]
    assert lookup.get("img-nonexistent", ("", "", "")) == ("", "", "")
    # Dataset write path (distributed bucket write) -> same layout
    ref2 = write_corpus_fragments(rd.from_arrow(corpus), str(tmp_path / "d"), 7)
    lookup2 = _resolve_corpus(ref2)
    for key in list(full)[:40]:
        assert lookup2.get(key, None) == full[key]
    # idempotent reuse of an existing layout (each call carries its own
    # fresh registry actor; the layout identity is dir + P)
    ref3 = write_corpus_fragments(corpus, str(tmp_path / "t"), 7)
    assert {k: v for k, v in ref3.items() if k != "reg"} == \
        {k: v for k, v in ref.items() if k != "reg"}
    assert ref3.get("reg") is not None
    with pytest.raises(ValueError):
        write_corpus_fragments(corpus, str(tmp_path / "t"), 9)
    # a DIFFERENT corpus must not silently reuse the stale fragments
    with pytest.raises(ValueError, match="stale"):
        write_corpus_fragments(make_image_table(N + 5), str(tmp_path / "t"), 7)


def test_corpus_cache_lru():
    """ADVICE r2: eviction removes only the LRU entry, never the whole
    cache — a recently-touched (e.g. broadcast) entry survives misses."""
    from warcit_ray.pipelines import crawl as c

    saved, saved_max = dict(c._CORPUS_CACHE), c._CORPUS_CACHE_MAX
    try:
        c._CORPUS_CACHE.clear()
        c._CORPUS_CACHE_MAX = 3
        builds = []
        for k in "abc":
            c._cache_get(k, lambda k=k: builds.append(k) or k.upper())
        assert c._cache_get("a", lambda: "REBUILT") == "A"  # hit -> MRU
        c._cache_get("d", lambda: "D")  # evicts only LRU ('b')
        assert set(c._CORPUS_CACHE) == {"c", "a", "d"}
        assert c._cache_get("a", lambda: "REBUILT") == "A"
        assert c._cache_get("b", lambda: "B2") == "B2"  # b was evicted
    finally:
        c._CORPUS_CACHE.clear()
        c._CORPUS_CACHE.update(saved)
        c._CORPUS_CACHE_MAX = saved_max


def test_ref_tier_promotion_to_dataset_equivalent(corpus):
    """A frontier bigger than task_frontier promotes the ref tier to
    the streaming Dataset tier via from_arrow_refs (no driver transit);
    forcing a tiny threshold must not change the crawl."""
    graph = WebGraph(N)
    kw = dict(n_seeds=6, max_generations=10, num_seen_shards=2,
              num_host_shards=2, clock_iso=CLOCK, seen_fp_bits=32,
              track_visits=True)
    base = crawl(corpus, graph=graph, **kw)
    promoted = crawl(corpus, graph=graph, task_frontier_threshold=50, **kw)
    assert sorted(base["visit_log"]) == sorted(promoted["visit_log"])
    assert base["admitted"] == promoted["admitted"]
    assert base["seen"] == promoted["seen"]


def test_surt_host_batch_parity():
    """Vectorized host extraction (offer_batch hot path) is semantically
    identical to the scalar surt_host on every URL shape."""
    import pyarrow as pa

    from warcit_ray.functions.urls import surt_host, surt_host_batch

    urls = [
        "http://h01.example/page/1",
        "https://WWW.Example.COM/a/b",
        "http://host.example",                 # no path
        "http://host.example:8080/x",          # port -> fallback
        "http://user:pw@host.example/x",       # userinfo -> fallback
        "http://[2001:db8::1]/x",              # IPv6 -> fallback
        "http://host_name.example/x",          # underscore -> fallback
        "http://host.example./x",              # trailing dot
        "file:///tmp/some/file.txt",
        "zip://arch.zip!member/path",
        "ftp://odd.example/x",
        "not a url at all",
        "",
    ]
    got = surt_host_batch(pa.array(urls, type=pa.string()))
    want = [surt_host(u) for u in urls]
    assert list(got) == want


def test_resume_bit_identical_under_eviction_pressure(corpus, tmp_path):
    """VERDICT r4 #9: an entry evicted by max_pending is gone from the
    checkpointed frontier too — the invariant is that a stopped+resumed
    crawl evicts EXACTLY as an uninterrupted one (max_pending now rides
    in the host-shard checkpoint), so the record sets are bit-identical
    even when eviction is actively firing."""
    graph = WebGraph(N)
    kw = dict(n_seeds=6, max_generations=12, num_seen_shards=2,
              num_host_shards=2, clock_iso=CLOCK, seen_fp_bits=32,
              max_pending_per_host=2)  # tiny cap -> constant eviction
    ck_full = str(tmp_path / "full")
    full = crawl(corpus, graph=graph, checkpoint_dir=ck_full, **kw)
    assert full["evicted"] > 0  # the pressure is real

    ck_part = str(tmp_path / "part")
    crawl(corpus, graph=graph, checkpoint_dir=ck_part,
          stop_after_generation=3, **kw)
    resumed = crawl(corpus, graph=graph, checkpoint_dir=ck_part,
                    resume=True, **kw)
    assert resumed["evicted"] >= 0

    def load_all(root):
        out = []
        for g in CrawlCheckpoint(root).complete_generations():
            d = os.path.join(root, "gen=%05d" % g, "records")
            if os.path.isdir(d):
                for f in sorted(os.listdir(d)):
                    out.extend(pq.read_table(os.path.join(d, f)).to_pylist())
        return sorted(out, key=lambda r: (r["generation"], r["host"], r["seq"]))

    a, b = load_all(ck_full), load_all(ck_part)
    assert len(a) == len(b) and len(a) > 0
    for ra, rb in zip(a, b):
        assert ra == rb


def test_fragment_registry_single_decode(corpus, tmp_path, ray_session):
    """The registry hands every caller the SAME plasma ref per bucket:
    one decode per cluster, zero per-worker duplicate builds."""
    import ray

    from warcit_ray.pipelines.crawl import (_ArrowRows, corpus_dict,
                                            write_corpus_fragments)

    ref = write_corpus_fragments(corpus, str(tmp_path / "t"), 5)
    reg = ref["reg"]
    path = os.path.join(str(tmp_path / "t"), "bucket-00002.parquet")
    r1 = ray.get(reg.get_or_build.remote(path))
    r2 = ray.get(reg.get_or_build.remote(path))
    assert r1 == r2  # same ObjectRef -> the decode ran once
    tbl = ray.get(r1)
    rows = _ArrowRows(tbl)
    want = corpus_dict(pq.read_table(path))
    for k, v in list(want.items())[:10]:
        assert rows.get(k, None) == v
    # registry-less fallback still resolves
    missing = ray.get(ray.get(reg.get_or_build.remote(
        os.path.join(str(tmp_path / "t"), "bucket-99999.parquet"))))
    assert missing.num_rows == 0


def test_fetch_affinity_dispatch_equivalent(corpus):
    """Bucket-affine dispatch (sorted + segment-sliced fetch tasks) must
    not change WHAT is crawled — only which task fetches which row."""
    graph = WebGraph(N)
    kw = dict(n_seeds=6, max_generations=10, num_seen_shards=2,
              num_host_shards=2, clock_iso=CLOCK, seen_fp_bits=32,
              track_visits=True)
    base = crawl(corpus, graph=graph, **kw)
    # corpus_partitions forces the 'parts' mode, which auto-wires
    # fetch_affinity_fn (bucket-sorted dispatch)
    aff = crawl(corpus, graph=graph, corpus_partitions=5, **kw)
    assert sorted(base["visit_log"]) == sorted(aff["visit_log"])
    assert base["admitted"] == aff["admitted"]
    assert base["seen"] == aff["seen"]
