from . import dedup, similarity, textstats, tfidf  # noqa: F401

__all__ = ["dedup", "similarity", "textstats", "tfidf"]
