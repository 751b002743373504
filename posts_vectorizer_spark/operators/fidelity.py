"""spaCy-fidelity tokenizer mode (F4/UD1 — SURVEY.md §7.4-2).

The reference's production tokenizer is a spaCy pipeline over the lowercased
text (``nlp(text.lower())``, /root/reference/worker.py:35,
tfidf-calculator/calculate_idf_scores.py:47): unlike the engine's default
regex whitespace split (quirk Q5, the oracle-checkable mode), spaCy emits
punctuation as separate tokens. Anyone diffing engine output against the
production system needs this mode.

Spark shape: ``mapInPandas`` with ITERATOR-LEVEL INIT (UD1) — the tokenizer
pipeline is constructed once per partition, not per row, exactly how a
per-partition spaCy/fastText model load works on a cluster. spaCy isn't
installed in this image, so construction falls back to a deterministic
pure-Python rule tokenizer replicating spaCy's outer loop (whitespace split,
then peel prefix/suffix punctuation as standalone tokens); the Spark
plumbing — Arrow batches, schema, partition init — is identical either way.
Not oracle-expressible (the whole point is library parity), so registered
rows-only; the differential test pins fidelity == default on
punctuation-free text.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..sources import spread

# Characters spaCy's English punct rules peel off token edges (ASCII set).
_PUNCT = set(".,;:!?\"'()[]{}<>/\\|@#$%^&*~`+-=_")


def _rule_tokenize(text: str) -> list[str]:
    """Pure-Python stand-in for spacy.blank('en') on ASCII text: whitespace
    split, then peel leading/trailing punctuation chars as their own tokens
    (spaCy's prefix/suffix loop without the exception tables)."""
    out: list[str] = []
    for chunk in text.split():
        prefix: list[str] = []
        suffix: list[str] = []
        while chunk and chunk[0] in _PUNCT:
            prefix.append(chunk[0])
            chunk = chunk[1:]
        while chunk and chunk[-1] in _PUNCT:
            suffix.append(chunk[-1])
            chunk = chunk[:-1]
        out.extend(prefix)
        if chunk:
            out.append(chunk)
        out.extend(reversed(suffix))
    return out


def _make_tokenizer():
    """Partition-init: one pipeline per executor task (UD1). Returns
    batch-tokenize fn: list[str] -> list[list[str]]."""
    try:
        import spacy  # not in this image; real path on a full deployment

        nlp = spacy.blank("en")
        return lambda texts: [
            [t.text for t in doc] for doc in nlp.pipe(texts, batch_size=256)
        ]
    except ImportError:
        return lambda texts: [_rule_tokenize(t) for t in texts]


def fidelity_tokens(documents: DataFrame) -> DataFrame:
    """(doc_id, word) — one row per token occurrence under the fidelity
    tokenizer, lowercased first like the reference (worker.py:35)."""

    def gen(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tokenize = _make_tokenizer()  # once per partition
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            toks = tokenize([t.lower() for t in pdf["text"]])
            counts = [len(ts) for ts in toks]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(counts).to_numpy(),
                    "word": [w for ts in toks for w in ts],
                }
            )

    return spread(documents.select("doc_id", "text")).mapInPandas(
        gen, "doc_id long, word string"
    )


def fidelity_token_profile(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens) under the fidelity tokenizer —
    the registered rows-only surface (stable, small)."""
    return (
        fidelity_tokens(documents)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_distinct("word").alias("n_distinct_tokens"),
        )
    )
