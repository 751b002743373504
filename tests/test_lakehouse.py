"""Tests for the lakehouse & ML-eval wave 9 (plans/queries_lakehouse.py):
hand-counted snapshot diff, Morton-order bounding-box bound, the
zero-missed-rows skipping safety proof, and silhouette on separable
labels. The value-exactness check is the DuckDB oracle
(tools/oracle_check.py); these pin semantics the hash can't express."""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as E
from tests.conftest import SF_SMOKE, make_docs


def test_snapshot_diff_counts_planted_changes(spark, tmp_path):
    docs = make_docs(
        spark, [(i, f"text number {i}", "en") for i in range(10)]
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["status"]: r["n"]
        for r in E.queries()["rel_snapshot_diff"](
            spark, str(tmp_path)
        ).collect()
    }
    # prev drops doc 0 (added in curr), mutates doc 7 (changed), and has
    # an extra row 1000001 (removed); docs 1-6, 8, 9 are unchanged.
    assert out == {"added": 1, "removed": 1, "changed": 1, "unchanged": 8}


def test_zorder_buckets_are_aligned_squares(spark):
    rows = E.queries()["rel_zorder_keys"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # a 1024-aligned z-range covers exactly one 32x32 aligned square:
        # both bounding-box sides must fit in 32, never a full-width stripe
        assert r["x_max"] - r["x_min"] <= 31, r
        assert r["y_max"] - r["y_min"] <= 31, r
        # and the box is inside its aligned square
        assert r["x_min"] // 32 == r["x_max"] // 32, r
        assert r["y_min"] // 32 == r["y_max"] // 32, r


def test_zorder_interleave_hand_value(spark, tmp_path):
    # x=3 (bits 11), y=1 (bit 1): z = 1 + 4 (x bits) + 2 (y bit 0) = 7
    pd.DataFrame({"l_partkey": [3], "l_suppkey": [1]}).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    r = E.queries()["rel_zorder_keys"](spark, str(tmp_path)).collect()
    assert len(r) == 1
    assert r[0]["z_bucket"] == 0  # z = 7 < 1024
    assert (r[0]["x_min"], r[0]["y_min"]) == (3, 1)


def test_minmax_skipping_is_sound_and_effective(spark):
    r = E.queries()["rel_minmax_skipping"](spark, SF_SMOKE).collect()[0]
    # safety: skipped files contain zero matching rows
    assert r["n_missed_by_skipping"] == 0
    # accounting: the pruned scan still covers every matching row
    assert r["n_rows_scanned"] >= r["n_rows_matching"]
    assert r["n_files"] > 0
    assert r["n_skipped"] >= 0


def test_silhouette_separable_labels_score_high(spark, tmp_path):
    from pyspark.sql import types as ST

    schema = ST.StructType(
        [
            ST.StructField("vec_id", ST.LongType()),
            ST.StructField("embedding", ST.ArrayType(ST.FloatType())),
            ST.StructField("label", ST.IntegerType()),
        ]
    )
    # label 0 clusters near e_0, label 1 near e_1 — far apart, tight
    rows = []
    for i in range(4):
        v0 = [10.0 + i * 0.1] + [0.0] * 63
        v1 = [0.0, 10.0 + i * 0.1] + [0.0] * 62
        rows.append((i, v0, 0))
        rows.append((100 + i, v1, 1))
    spark.createDataFrame(rows, schema=schema).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = {
        r["label"]: r
        for r in E.queries()["sim_silhouette_labels"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {0, 1}
    for r in out.values():
        assert r["n"] == 4
        assert r["avg_silhouette"] > 0.9


def test_partition_checksums_perturbation_and_merge(spark, tmp_path):
    """rel_partition_checksums (staged r10): (a) identical data =>
    identical fingerprints; (b) perturbing ONE row changes exactly that
    row's bucket checksum and nothing else; (c) the additive checksum
    merges — fingerprints computed over two disjoint halves combine
    (sum mod p, count-sum, min/min, max/max) into exactly the
    whole-table fingerprint, the property a file-level audit relies
    on."""
    from pyspark.sql import functions as F

    from posts_vectorizer_spark.functions.text import HASH_MOD
    from posts_vectorizer_spark.plans.registry import resolve_query
    from posts_vectorizer_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    q = resolve_query("rel_partition_checksums")

    def fp(sf):
        return {
            r["bucket"]: (r["n_rows"], r["checksum"], r["min_key"],
                          r["max_key"])
            for r in q(spark, sf).collect()
        }

    base = fp(SF_SMOKE)
    orders = load_table(spark, SF_SMOKE, "orders")

    # (a) byte-identical copy
    d1 = tmp_path / "copy"
    d1.mkdir()
    orders.write.parquet(str(d1 / "orders.parquet"))
    assert fp(str(d1)) == base

    # (b) perturb one row's status
    d2 = tmp_path / "tampered"
    d2.mkdir()
    victim = orders.limit(1).collect()[0]["o_orderkey"]
    orders.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == victim, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    ).write.parquet(str(d2 / "orders.parquet"))
    tampered = fp(str(d2))
    vb = victim % 32
    assert tampered[vb][1] != base[vb][1]
    assert {b: v for b, v in tampered.items() if b != vb} == {
        b: v for b, v in base.items() if b != vb
    }

    # (c) merge two halves into the whole
    d3, d4 = tmp_path / "h0", tmp_path / "h1"
    for dd, pred in ((d3, 0), (d4, 1)):
        dd.mkdir()
        orders.where(F.col("o_custkey") % 2 == pred).write.parquet(
            str(dd / "orders.parquet")
        )
    h0, h1 = fp(str(d3)), fp(str(d4))
    merged = {}
    for b in set(h0) | set(h1):
        parts = [h for h in (h0.get(b), h1.get(b)) if h]
        merged[b] = (
            sum(p[0] for p in parts),
            sum(p[1] for p in parts) % HASH_MOD,
            min(p[2] for p in parts),
            max(p[3] for p in parts),
        )
    assert merged == base


def test_zorder_layout_interleave_and_span_invariant(spark, tmp_path):
    """rel_zorder_layout: the Morton interleave matches a Python bit
    replica on planted keys, and EVERY bucket's zone map is tight in
    BOTH dimensions (span <= 15 with 4 bucket bits per dim) — the
    multi-dim skipping property a linear layout cannot give."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    def morton(a: int, b: int) -> int:
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    rows = []
    keys = [(0, 0), (255, 255), (1, 0), (0, 1), (170, 85), (85, 170),
            (16, 16), (17, 31)]
    for i, (a, b) in enumerate(keys):
        # l_orderkey % 256 == a, l_partkey % 256 == b
        rows.append((a + 256, b + 512 * 256, 1.0))
    d = tmp_path / "zo"
    d.mkdir()
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double"
    ).write.parquet(str(d / "lineitem.parquet"))

    out = {r["bucket"]: r for r in
           resolve_query("rel_zorder_layout")(spark, str(d)).collect()}
    for a, b in keys:
        bucket = morton(a % 256, b % 256) >> 8
        assert bucket in out, (a, b, bucket)
        r = out[bucket]
        assert r["a_min"] <= a <= r["a_max"]
        assert r["b_min"] <= b <= r["b_max"]
    for r in out.values():
        assert 0 <= r["a_span"] <= 15 and 0 <= r["b_span"] <= 15

    # distinct corners land in distinct buckets (curve locality)
    assert morton(0, 0) >> 8 != morton(255, 255) >> 8
