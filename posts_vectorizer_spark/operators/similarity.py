"""Similarity search over embedding columns (Tier C).

Brute-force cosine top-k as the exactness baseline; LSH-bucketed candidate
generation as the 100 TB scale path.
"""

from __future__ import annotations
