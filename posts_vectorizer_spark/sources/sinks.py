"""Sinks: idempotent merge-upsert (the reference's unordered bulk
UpdateOne/$set writes — /root/reference/worker.py:87-94,124,
tfidf-calculator/enter_wordvecs.py:40-53 — as a keyed MERGE).

Parquet has no transactional MERGE, so this emulates Delta's
``MERGE INTO t USING u ON keys WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT``
with anti-join + union + atomic directory swap. On a real deployment the
same call site is one ``DeltaTable.merge`` (or Iceberg MERGE INTO) — the
emulation keeps the engine dependency-free in this image while preserving
the contract that matters for streaming: **idempotent on keys**, so
at-least-once delivery from foreachBatch converges (ST3 — the reference's
flag-overwrite gives the same at-least-once + idempotent contract).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def merge_upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    target_dir: str,
    keys: list[str],
) -> None:
    """Upsert ``updates`` into the parquet table at ``target_dir`` keyed on
    ``keys``: matched rows are replaced, new rows inserted. Updates must be
    unique per key (caller aggregates first), mirroring the per-_id $set.

    The write is write-new-dir + atomic rename — crash-safe on a local/POSIX
    filesystem; swap in Delta/Iceberg MERGE for object storage.
    """
    if _exists(target_dir):
        current = spark.read.parquet(target_dir)
        kept = current.join(updates.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates

    tmp_dir = f"{target_dir}__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp_dir)
    if os.path.isdir(target_dir):
        old = f"{target_dir}__old_{uuid.uuid4().hex[:8]}"
        os.rename(target_dir, old)
        os.rename(tmp_dir, target_dir)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(tmp_dir, target_dir)
