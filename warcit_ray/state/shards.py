"""The sharded crawl-state actors (north rule):

- :class:`SeenShard` — a cuckoo-filter shard of the URL-seen set keyed
  on SURT-form 64-bit hashes; batch ``add_if_absent`` API; records
  per-generation insert deltas for checkpoint lineage.
- :class:`HostShard` — per-host politeness token buckets, robots
  gating, and a deterministic priority min-heap frontier for every
  host whose hash lands on this shard.

Shard routing is ``hash % num_shards`` on the *host* for HostShard
(politeness must be local to one actor per host) and on the *URL hash*
for SeenShard (uniform load). Hot hosts are handled above this layer
by salting (pipelines/crawl.py): a salted host ``h#k`` still routes all
its salt buckets to the same HostShard so the token bucket stays
authoritative, but batch-level pre-dedup spreads.

Both actors are plain classes decorated at creation time so the module
imports without Ray (unit-testable serially — the serial oracle in the
equivalence test drives the same classes without actors).
"""

from __future__ import annotations

import heapq
from collections import Counter

import numpy as np

from .cuckoo import CuckooFilter
from .robots import allowed


class SeenShardState:
    def __init__(self, shard_id: int, capacity: int = 1 << 20, fp_bits: int = 16):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity, fp_bits=fp_bits)
        self._delta: list[np.ndarray] = []

    def add_if_absent(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes, dtype=np.uint64)
        added = self.filter.add_if_absent_batch(hashes)
        if added.any():
            self._delta.append(hashes[added])
        return added

    def flush_delta(self) -> np.ndarray:
        """Hashes inserted since the last flush — the checkpoint's
        per-partition lineage record (replayed on resume)."""
        if not self._delta:
            return np.empty(0, dtype=np.uint64)
        out = np.concatenate(self._delta)
        self._delta = []
        return out

    def replay(self, hashes: np.ndarray) -> int:
        """Resume path: re-insert checkpointed hashes WITHOUT recording
        a new delta."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        added = self.filter.add_if_absent_batch(hashes)
        return int(added.sum())

    def count(self) -> int:
        return self.filter.count


class HostShardState:
    """Token-bucket politeness + robots + priority frontier for the
    hosts on this shard.

    Determinism contract (tested against the serial oracle): for a
    given (seed set, robots map, rate, capacity), every host emits the
    same visit sequence — the heap orders by (priority, seq, url) and
    ``admit`` walks hosts in sorted order."""

    def __init__(self, shard_id: int, rate: float = 1.0, capacity: float = 2.0,
                 robots_map: dict[str, list[str]] | None = None,
                 max_pending_per_host: int = 100_000):
        self.shard_id = shard_id
        self.rate = rate
        self.capacity = capacity
        self.robots = robots_map or {}
        self.hosts: dict[str, dict] = {}
        self.stats: Counter = Counter()
        # Skew guard: politeness bounds how fast any one host can ever be
        # crawled, so frontier entries beyond this cap can never be
        # visited before the crawl budget runs out — a hot host (one that
        # dominates the link graph) would otherwise blow up this shard's
        # heap memory. Eviction is deterministic: the WORST (priority,
        # seq, url) entry goes, so the kept set is order-independent.
        self.max_pending = max_pending_per_host

    def _host(self, host: str) -> dict:
        st = self.hosts.get(host)
        if st is None:
            st = {"tokens": self.capacity, "heap": []}
            self.hosts[host] = st
        return st

    def offer(self, hosts: list[str], urls: list[str], priorities: list[int],
              seqs: list[int], payload_keys: list[str], depths: list[int]) -> int:
        """Enqueue candidate URLs (already seen-filtered). Robots-gated
        here so a disallowed URL never occupies frontier memory."""
        accepted = 0
        # batch per host: collect entries, then one extend+heapify per
        # host (O(n) C heapify beats n pushes for large offers)
        pending: dict[str, list] = {}
        for host, url, pri, seq, key, depth in zip(
            hosts, urls, priorities, seqs, payload_keys, depths
        ):
            if not allowed(url, self.robots.get(host, ())):
                self.stats["robots_blocked"] += 1
                continue
            pending.setdefault(host, []).append((pri, seq, url, key, depth))
            accepted += 1
        for host, entries in pending.items():
            st = self._host(host)
            st["heap"].extend(entries)
            # exact trim on every overflow: the heap is always the best
            # max_pending entries seen so far, which makes the kept set
            # independent of batch arrival order (an amortized/slack
            # trim would let an early eviction outrank a late survivor)
            if len(st["heap"]) > self.max_pending:
                n_evict = len(st["heap"]) - self.max_pending
                st["heap"] = heapq.nsmallest(self.max_pending, st["heap"])
                self.stats["evicted"] += n_evict
            heapq.heapify(st["heap"])
        self.stats["offered"] += accepted
        return accepted

    def admit(self) -> dict[str, list]:
        """One politeness tick: refill each bucket by ``rate`` (capped),
        pop floor(tokens) URLs per host in priority order."""
        out: dict[str, list] = {"host": [], "url": [], "priority": [],
                                "seq": [], "payload_key": [], "depth": []}
        for host in sorted(self.hosts):
            st = self.hosts[host]
            if not st["heap"]:
                continue
            st["tokens"] = min(self.capacity, st["tokens"] + self.rate)
            k = int(st["tokens"])
            for _ in range(min(k, len(st["heap"]))):
                pri, seq, url, key, depth = heapq.heappop(st["heap"])
                out["host"].append(host)
                out["url"].append(url)
                out["priority"].append(pri)
                out["seq"].append(seq)
                out["payload_key"].append(key)
                out["depth"].append(depth)
                st["tokens"] -= 1.0
        self.stats["admitted"] += len(out["url"])
        return out

    def admit_table(self, inline_threshold: int = 4096):
        """One politeness tick -> None (empty), the plain dict (small
        tick — inline serialization beats a plasma round trip), or an
        Arrow table built ON the actor (large tick — the driver's
        ray.get maps a plasma-backed table instead of materializing
        hundreds of thousands of transient Python strings; the admit
        transfer was the largest driver-side allocation at 400k-URL
        scale)."""
        out = self.admit()
        if not out["url"]:
            return None
        if len(out["url"]) <= inline_threshold:
            return out
        import pyarrow as pa

        return pa.table({
            "host": pa.array(out["host"], type=pa.string()),
            "url": pa.array(out["url"], type=pa.string()),
            "priority": pa.array(out["priority"], type=pa.int64()),
            "seq": pa.array(out["seq"], type=pa.int64()),
            "payload_key": pa.array(out["payload_key"], type=pa.string()),
            "depth": pa.array(out["depth"], type=pa.int64()),
        })

    def pending(self) -> int:
        return sum(len(st["heap"]) for st in self.hosts.values())

    def get_stats(self) -> dict:
        return dict(self.stats)

    # -- checkpoint lineage -------------------------------------------------

    def checkpoint_state(self) -> dict:
        return {
            "rate": self.rate,
            "capacity": self.capacity,
            # eviction policy is part of the crawl's identity: a resume
            # must evict exactly as the original would have, or the
            # continued run diverges from an uninterrupted one
            "max_pending": self.max_pending,
            "hosts": {
                h: {"tokens": st["tokens"], "heap": sorted(st["heap"])}
                for h, st in self.hosts.items()
            },
            "stats": dict(self.stats),
        }

    def restore_state(self, state: dict) -> None:
        self.rate = state["rate"]
        self.capacity = state["capacity"]
        self.max_pending = state.get("max_pending", self.max_pending)
        self.hosts = {
            h: {"tokens": s["tokens"], "heap": [tuple(e) for e in s["heap"]]}
            for h, s in state["hosts"].items()
        }
        for st in self.hosts.values():
            heapq.heapify(st["heap"])
        self.stats = Counter(state["stats"])


def make_actors(num_seen: int, num_host: int, *, seen_capacity: int = 1 << 20,
                rate: float = 1.0, capacity: float = 2.0,
                robots_map: dict | None = None,
                max_pending_per_host: int = 100_000,
                seen_fp_bits: int = 16):
    """Create the actor fleets. Seen shards get a fraction of a CPU so
    a large fleet doesn't starve the data plane."""
    import ray

    Seen = ray.remote(num_cpus=0.25)(SeenShardState)
    Host = ray.remote(num_cpus=0.25)(HostShardState)
    seen = [Seen.remote(i, seen_capacity, seen_fp_bits) for i in range(num_seen)]
    host = [Host.remote(i, rate, capacity, robots_map, max_pending_per_host)
            for i in range(num_host)]
    return seen, host
