"""Multimodal columns (Tier C, BASELINE.json): opaque binary payloads with
typed metadata, plus feature-extraction plumbing over ``mapInPandas``.

Design (SURVEY.md §2.12-4): media rows are
``(doc_id, media_type, payload: binary, meta: struct)``. The engine treats
payloads as opaque bytes end-to-end — schema, partitioning, Arrow batch
shapes, and UDF signatures are real and tested; only the *codec* step is
stubbed, because no image/audio libraries exist in this container. The stub
is a clearly-marked NotImplementedError behind ``use_real_codecs=True``,
with a deterministic byte-level fake as the default so the distributed
plumbing is exercised honestly (prompt-mandated stub pattern).

At 100 TB: payload columns dominate bytes — keep them OUT of shuffles
(extract features first, then join features; never groupBy a payload), and
read real assets via ``spark.read.format("binaryFile")`` or manifest tables
of object-store URLs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, LongType, StructField, StructType,
)

N_FAKE_FEATURES = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_payload(documents: DataFrame) -> DataFrame:
    """Wrap each document as a media row: utf-8 payload bytes + typed meta.
    Pure built-ins (encode/length/struct) — no UDF at the storage boundary."""
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for image/audio decode: mean of each of
    N_FAKE_FEATURES equal byte-slices, scaled to [0, 1]."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(N_FAKE_FEATURES, dtype=np.float32)
    chunks = np.array_split(arr.astype(np.float64), N_FAKE_FEATURES)
    return np.array(
        [c.mean() / 255.0 if c.size else 0.0 for c in chunks], dtype=np.float32
    )


def extract_features(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """(doc_id, n_bytes, features) via mapInPandas — the UD1 pattern: any
    expensive per-worker init (a model, a decoder) belongs in the iterator
    prologue, paid once per partition, not per row
    (/root/reference/worker.py:18 spaCy-load analog)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_real_codecs:
            # Real decode would init PIL/libav HERE (once per partition).
            raise NotImplementedError(
                "real media codecs are not available in this image; "
                "run with use_real_codecs=False for the deterministic fake"
            )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": pdf["payload"].map(
                        lambda b: _fake_decode(b).tolist()
                    ),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)
