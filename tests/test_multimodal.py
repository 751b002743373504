"""Multimodal plumbing ([R]): binary payload schema, Arrow batch flow
through mapInPandas, deterministic fake features, stubbed real codecs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from posts_vectorizer_spark.operators import multimodal
from posts_vectorizer_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_payload_schema_and_meta(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = multimodal.attach_payload(docs)
    assert [f.name for f in media.schema.fields] == [
        "doc_id", "media_type", "payload", "meta",
    ]
    assert media.schema["payload"].dataType.simpleString() == "binary"
    row = media.where(F.col("doc_id") == 0).collect()[0]
    assert row.media_type == "text/plain"
    assert row.meta.n_bytes == len(row.payload)


def test_feature_extraction_fake_decode(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    media = multimodal.attach_payload(docs)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 50
    by_id = {r.doc_id: r for r in feats}
    raw = {r.doc_id: r for r in media.collect()}
    for doc_id, r in by_id.items():
        assert len(r.features) == multimodal.N_FAKE_FEATURES
        assert r.n_bytes == len(raw[doc_id].payload)
        expected = multimodal._fake_decode(bytes(raw[doc_id].payload))
        assert np.allclose(r.features, expected, atol=1e-6)


def test_real_codecs_are_stubbed(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(5)
    media = multimodal.attach_payload(docs)
    with pytest.raises(Exception) as exc_info:
        multimodal.extract_features(media, use_real_codecs=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_codec_roundtrip(spark):
    """F8/F9 storage-boundary codecs: array<float> -> binary -> array."""
    from posts_vectorizer_spark.functions.vectors import decode_f32, encode_f32

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(10)
    round_tripped = (
        emb.select("vec_id", decode_f32(encode_f32("embedding")).alias("back"),
                   "embedding")
        .select(
            "vec_id",
            F.zip_with(
                "embedding", "back", lambda a, b: F.abs(a - b)
            ).alias("diffs"),
        )
        .select("vec_id", F.array_max("diffs").alias("max_diff"))
        .collect()
    )
    assert all(r.max_diff == 0.0 for r in round_tripped)


def test_resize_media_exact_target_and_deterministic(spark):
    from posts_vectorizer_spark.operators import multimodal
    from posts_vectorizer_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = multimodal.attach_payload(docs)
    out1 = {r["doc_id"]: r["payload"] for r in multimodal.resize_media(media, 32).collect()}
    out2 = {r["doc_id"]: r["payload"] for r in multimodal.resize_media(media, 32).collect()}
    assert out1 == out2  # deterministic fake codec
    assert all(len(p) == 32 for p in out1.values())


def test_sample_frames_fanout_and_coverage(spark):
    from posts_vectorizer_spark.operators import multimodal
    from posts_vectorizer_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(10)
    media = multimodal.attach_payload(docs)
    rows = multimodal.sample_frames(media, n_frames=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(rows) == 10 * 4  # exact 1 -> n_frames fan-out
    for doc, rs in by_doc.items():
        assert sorted(r["frame_id"] for r in rs) == [0, 1, 2, 3]
        assert all(len(r["frame"]) > 0 for r in rs)


def test_frame_sample_query_runs(spark):
    import __spark_entry__ as E
    from tests.conftest import SF_SMOKE

    df = E.queries()["multimodal_frame_sample"](spark, SF_SMOKE)
    rows = df.collect()
    assert rows and all(r["n_bytes"] == 16 for r in rows)
