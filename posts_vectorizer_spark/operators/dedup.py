"""Deduplication operators (Tier C, BASELINE.json north star).

Filled in incrementally: exact dedup, n-gram Jaccard, SimHash, MinHash+LSH,
embedding-cosine near-dup. Portable-hash based so the [Q] variants
oracle-match DuckDB; MLlib MinHashLSH is the [R] scale path.
"""

from __future__ import annotations
