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
from posts_vectorizer_spark.sources.sinks import merge_upsert_parquet, read_merged
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

    got = read_merged(spark, target)
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
    again = read_merged(spark, target)
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
    target = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    merge_upsert_parquet(spark, base, target, ["k"])
    upd = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    merge_upsert_parquet(spark, upd, target, ["k"])
    got = {r.k: r.v for r in read_merged(spark, target).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The O(batch)-not-O(table) property: a merge must leave the files of
    buckets containing no update keys physically untouched (same paths,
    same mtimes) — the bucket-pruned MERGE contract."""
    import os

    from posts_vectorizer_spark.sources.sinks import _read_manifest

    target = str(tmp_path / "t")
    base = spark.createDataFrame([(k, "v") for k in range(200)], "k long, v string")
    merge_upsert_parquet(spark, base, target, ["k"], n_buckets=8)
    before = _read_manifest(target)["buckets"]
    assert len(before) > 1  # keys spread over multiple buckets

    upd = spark.createDataFrame([(5, "V")], "k long, v string")
    merge_upsert_parquet(spark, upd, target, ["k"])
    after = _read_manifest(target)["buckets"]

    changed = {b for b in after if after[b] != before.get(b)}
    assert len(changed) == 1  # exactly the bucket key 5 hashes into
    for b, d in after.items():
        if b not in changed:
            assert d == before[b]
            assert os.path.isdir(os.path.join(target, d))  # untouched on disk
    got = {r.k: r.v for r in read_merged(spark, target).collect()}
    assert got[5] == "V" and got[6] == "v" and len(got) == 200


def test_merge_crash_between_write_and_commit_recovers(spark, tmp_path):
    """ADVICE r1 (medium): a crash must never lose committed data. The only
    commit point is the atomic manifest replace — simulate dying after the
    new bucket dirs are written but before the manifest commit: the table
    must still read as the previous state, and the next merge must sweep
    the orphans and converge."""
    import os
    import shutil

    target = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    merge_upsert_parquet(spark, base, target, ["k"])
    manifest_file = os.path.join(target, "_MANIFEST.json")
    committed = open(manifest_file).read()

    # simulate the un-committed half of a crashed merge: orphan version
    # dirs + a stale manifest temp, with the OLD manifest still in place
    orphan = os.path.join(target, "b0_vdeadbeef")
    os.makedirs(orphan)
    live_dirs = [d for d in os.listdir(target) if d.startswith("b") and d != "b0_vdeadbeef"]
    shutil.copy(
        os.path.join(target, live_dirs[0], os.listdir(os.path.join(target, live_dirs[0]))[0]),
        os.path.join(orphan, "part-0.parquet"),
    )
    with open(manifest_file + ".tmp_dead", "w") as f:
        f.write("{}")

    # committed state is intact
    got = {r.k: r.v for r in read_merged(spark, target).collect()}
    assert got == {1: "a", 2: "b"}

    # next merge sweeps the orphans and applies cleanly
    upd = spark.createDataFrame([(2, "B")], "k long, v string")
    merge_upsert_parquet(spark, upd, target, ["k"])
    assert not os.path.isdir(orphan)
    assert not os.path.exists(manifest_file + ".tmp_dead")
    got = {r.k: r.v for r in read_merged(spark, target).collect()}
    assert got == {1: "a", 2: "B"}
