"""PySpark-native URL-frontier crawl engine (BASELINE.json north_rule).

Modules:
- codec      — deterministic image codec + phash (input_hint payload)
- fixtures   — seed=42 synthetic Lianjia-shaped site + image store
- urlnorm    — RFC 3986 canonicalization + murmur3/xxhash64 columns
- bloom      — sharded bloom URL-seen + cuckoo fallback
- frontier   — dequeue/enqueue ops + versioned store + checkpoint manifest
- fetch      — mapInPandas fetch batches (politeness in-batch)
- parse      — Catalyst-only page/card parsing
- cdc        — J1-J3 upsert + change diffs
- items      — image+caption payload join-back
- scheduler  — the driver round loop
"""
