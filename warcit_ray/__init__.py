"""warcit_ray — a Ray-Data-native crawl/convert engine.

A from-scratch re-expression of webrecorder/warcit's file/ZIP -> WARC
conversion semantics (reference: /root/reference/warcit, v0.4.0) as a
Ray Data dataflow, extended with the crawl-frontier machinery required
by the north rule: a sharded cuckoo-filter URL-seen set over SURT-form
URL hashes, per-host politeness token buckets with robots gating, a
priority frontier, and checkpoint/lineage for bit-identical resume.

Nothing here is a port: the reference is a single-threaded generator
loop (warcit/warcit.py:426-442); every operator is re-designed as a
vectorized batch transform over Arrow blocks (`Dataset.map_batches`),
a broadcast side-table lookup, or a sharded stateful actor.
"""

__version__ = "0.1.0"
