from . import dedup, mllib_alt, multimodal, similarity, textstats, tfidf  # noqa: F401

__all__ = ["dedup", "mllib_alt", "multimodal", "similarity", "textstats", "tfidf"]
