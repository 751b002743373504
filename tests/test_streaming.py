"""Streaming worker smoke ([R] — SURVEY.md §2.10 ST1/ST3/ST4): drain a
parquet source with availableNow, verify the merged sink equals the batch
flagship on the same input, verify idempotent re-delivery, and that the
heartbeat listener emitted progress."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from posts_vectorizer_spark.operators import tfidf
from posts_vectorizer_spark.sources import load_table
from posts_vectorizer_spark.streaming import vectorize_stream
from tests.conftest import SF_SMOKE


def test_worker_stream_matches_batch(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    emb = load_table(spark, SF_SMOKE, "embeddings")

    source = str(tmp_path / "incoming")
    target = str(tmp_path / "doc_vectors")
    ckpt = str(tmp_path / "ckpt")
    heartbeat = str(tmp_path / "heartbeat.jsonl")

    # arriving micro-batch = the flag-filtered candidates (worker.py:99)
    incoming = docs.where(tfidf.needs_vector("doc_id"))
    incoming.write.mode("overwrite").parquet(source)

    q = vectorize_stream(
        spark, source, docs, emb, target, ckpt,
        lang="en", heartbeat_path=heartbeat, available_now=True,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(target)
    expected = tfidf.doc_vectors(docs, emb, "en")
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0

    # ST3: re-running over the same checkpoint re-delivers nothing; the
    # keyed merge keeps the sink identical (at-least-once + idempotent).
    q2 = vectorize_stream(
        spark, source, docs, emb, target, ckpt,
        lang="en", available_now=True,
    )
    q2.awaitTermination(120)
    again = spark.read.parquet(target)
    assert again.count() == expected.count()
    assert again.exceptAll(expected).count() == 0

    # ST4: heartbeat wrote at least one progress line with durations.
    assert os.path.exists(heartbeat)
    beats = [json.loads(line) for line in open(heartbeat)]
    assert any(b["num_input_rows"] > 0 for b in beats)


def test_stateful_stream_dedup_across_batches(spark, tmp_path):
    """ST7: dropDuplicates state survives micro-batch boundaries — the same
    doc_ids delivered in two separate files (forced into separate batches
    via maxFilesPerTrigger=1) land exactly once in the sink."""
    from posts_vectorizer_spark.streaming import dedup_stream

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    source = str(tmp_path / "in")
    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs.write.mode("overwrite").parquet(source)
    docs.write.mode("append").parquet(source)  # full re-delivery, new files

    q = dedup_stream(
        spark, source, docs.schema, target, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(120)

    out = spark.read.parquet(target)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    from posts_vectorizer_spark.sources.sinks import merge_upsert_parquet

    target = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    merge_upsert_parquet(spark, base, target, ["k"])
    upd = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    merge_upsert_parquet(spark, upd, target, ["k"])
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
