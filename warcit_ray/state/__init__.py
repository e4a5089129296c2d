"""Sharded crawl state: cuckoo-filter URL-seen shards, per-host
politeness/robots/priority shards. All state lives in Ray actors,
hash-partitioned by SURT host so politeness stays local (north rule).
"""
