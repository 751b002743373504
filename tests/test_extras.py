"""Checks for the [R] rows-only registry entries (plans/queries_extras.py):
each one's correctness claim is asserted here since the driver only
row-counts them."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

import __spark_entry__ as E
from posts_vectorizer_spark.sources import load_table
from posts_vectorizer_spark.sources.http_enrich import fake_lang_detector
from tests.conftest import SF_ORACLE, SF_SMOKE

_Q = E.queries()


def test_approx_distinct_within_hll_error_bound(spark):
    got = {
        r["l_returnflag"]: r
        for r in _Q["rel_approx_distinct"](spark, SF_ORACLE).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in load_table(spark, SF_ORACLE, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_orderkey").alias("orders"),
            F.count_distinct("l_partkey").alias("parts"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, row in got.items():
        # HLL++ default rsd = 5%; allow 3 sigma.
        assert abs(row["approx_orders"] - exact[flag]["orders"]) <= 0.15 * exact[flag]["orders"]
        assert abs(row["approx_parts"] - exact[flag]["parts"]) <= 0.15 * exact[flag]["parts"]


def test_sample_is_seeded_deterministic(spark):
    a = _Q["rel_sample"](spark, SF_ORACLE)
    b = _Q["rel_sample"](spark, SF_ORACLE)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    n_total = load_table(spark, SF_ORACLE, "lineitem").count()
    assert 0.05 * n_total < a.count() < 0.15 * n_total


def test_http_enrich_one_row_per_doc_fake_envelope(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = _Q["source_http_enrich"](spark, SF_SMOKE)
    assert out.count() == docs.count()
    row = out.where(F.col("doc_id") == 10).first()
    expected = " ".join(json.loads(fake_lang_detector(None, 10))["text"])
    assert row["fetched_text"] == expected


def test_multimodal_features_query_shape(spark):
    out = _Q["multimodal_features"](spark, SF_SMOKE)
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert out.count() == n_docs * 8  # N_FAKE_FEATURES dims per doc
    assert out.columns == ["doc_id", "n_bytes", "dim", "feature"]


def test_mllib_wide_vectors_match_flagship_rowcount(spark):
    wide = _Q["mllib_doc_vectors_wide"](spark, SF_SMOKE)
    long = _Q["tfidf_doc_vectors"](spark, SF_SMOKE)
    assert wide.count() * 64 == long.count()


def test_ivf_ann_recall_vs_brute_force(spark):
    """IVF with n_probe=2 of 16 lists must recover a solid fraction of the
    true top-3 (random near-orthogonal fixtures are the hard case; real
    clustered embeddings do far better)."""
    ivf = _Q["sim_ivf_ann"](spark, SF_SMOKE).select("query_id", "neighbor_id")
    exact = (
        _Q["sim_cosine_topk"](spark, SF_SMOKE)
        .where(F.col("rk") <= 3)
        .select("query_id", "neighbor_id")
    )
    n_exact = exact.count()
    hits = ivf.intersect(exact).count()
    assert n_exact > 0
    assert hits / n_exact >= 0.10
    # every query produced rows and at most k of them
    per_q = ivf.groupBy("query_id").count().agg(F.max("count")).first()[0]
    assert per_q <= 3


def test_topk_tiled_build_side_matches_untiled(spark):
    """Brute-force top-k must be tile-count-invariant: per-tile candidate
    top-k's merged under the global (null-last, score desc, id asc) order
    equal the single-broadcast result — the driver-memory wall fix."""
    from posts_vectorizer_spark.operators import similarity

    emb = load_table(spark, SF_SMOKE, "embeddings")
    one = similarity.topk(emb, 5, n_tiles=1)
    tiled = similarity.topk(emb, 5, n_tiles=3)
    assert one.exceptAll(tiled).count() == 0
    assert tiled.exceptAll(one).count() == 0


def test_neighbors_above_tiled_matches_untiled(spark):
    from posts_vectorizer_spark.operators import similarity

    emb = load_table(spark, SF_SMOKE, "embeddings")
    one = similarity.neighbors_above(emb, 0.3, n_tiles=1)
    tiled = similarity.neighbors_above(emb, 0.3, n_tiles=2)
    assert one.exceptAll(tiled).count() == 0
    assert tiled.exceptAll(one).count() == 0


def test_probe_blocks_arrow_zero_copy_matches_tolist():
    """The r5 zero-copy Arrow ingestion (flat values buffer reshaped) must
    produce the exact float64 matrix of the old per-row tolist() path,
    honor batch slices (list offsets not starting at 0), and fail loudly —
    never mis-reshape — on null/ragged rows the kernel can't represent."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from posts_vectorizer_spark.operators.similarity import _probe_blocks_arrow

    def run(batch):
        out = list(_probe_blocks_arrow([batch]))
        assert len(out) == 1
        return out[0]

    def batch_of(ids, embs, emb_type=pa.list_(pa.float32())):
        return pa.RecordBatch.from_arrays(
            [pa.array(ids, type=pa.int64()), pa.array(embs, type=emb_type)],
            names=["vec_id", "embedding"],
        )

    # fast path: uniform float32 lists -> row-major reshape
    embs = [[1.5, -2.25, 3.0], [0.0, 4.5, -1.0], [7.0, 8.0, 9.5]]
    qids, Q, _ = run(batch_of([10, 11, 12], embs))
    assert Q.dtype == np.float64 and Q.shape == (3, 3)
    assert (Q == np.array([np.array(e, dtype=np.float32) for e in embs],
                          dtype=np.float64)).all()
    assert list(qids) == [10, 11, 12]

    # sliced batch: offsets start mid-buffer; values must follow the slice
    sliced = batch_of([10, 11, 12], embs).slice(1, 2)
    qids_s, Q_s, _ = run(sliced)
    assert list(qids_s) == [11, 12]
    assert (Q_s == Q[1:]).all()

    # ragged or null rows -> loud error, never a silent mis-reshape
    with pytest.raises(ValueError, match="fixed-length"):
        run(batch_of([1, 2], [[1.0, 2.0], [3.0]]))
    with pytest.raises(ValueError, match="non-null"):
        run(batch_of([5, 6], [[1.0, 2.0], None]))

    # null vec_id -> loud error too: to_numpy would coerce it to NaN and
    # astype(int64) to a garbage id (the r5 advisory's silent-corruption
    # path — the old pandas ingestion raised here)
    with pytest.raises(ValueError, match="vec_id"):
        run(batch_of([5, None], [[1.0, 2.0], [3.0, 4.0]]))

    # empty batch is skipped entirely
    assert list(_probe_blocks_arrow([batch_of([], [])])) == []


def test_multiprobe_lsh_recall_at_least_single_probe(spark):
    """Hamming-1 multiprobe candidates are a superset of exact-bucket
    candidates, so recall vs the brute-force top-3 may only go up."""
    exact = (
        _Q["sim_cosine_topk"](spark, SF_SMOKE)
        .where(F.col("rk") <= 3)
        .select("query_id", "neighbor_id")
    )
    single = _Q["sim_lsh_ann"](spark, SF_SMOKE).select("query_id", "neighbor_id")
    multi = _Q["sim_lsh_ann_multiprobe"](spark, SF_SMOKE).select(
        "query_id", "neighbor_id"
    )
    n_exact = exact.count()
    r_single = single.intersect(exact).count() / n_exact
    r_multi = multi.intersect(exact).count() / n_exact
    print(f"LSH recall: single-probe={r_single:.3f} multiprobe={r_multi:.3f}")
    assert r_multi >= r_single
    assert r_multi > 0


def test_vec_model_roundtrip_parses_exactly(spark, tmp_path):
    """S3: .vec write -> distributed parse returns exactly the written
    vectors (6-decimal text precision) with the header line dropped."""
    from posts_vectorizer_spark.sources.model_table import (
        load_vec_model,
        write_vec_file,
    )

    rows = [("alpha", [1.5, -2.25]), ("beta", [0.0, 3.125]), ("g", [7.0, -0.5])]
    path = str(tmp_path / "m.vec")
    assert write_vec_file(path, rows, dims=2) == 3
    got = {
        r["word"]: [float(x) for x in r["embedding"]]
        for r in load_vec_model(spark, path).collect()
    }
    assert got == {w: v for w, v in rows}


def test_vec_model_query_matches_fixture_checksums(spark):
    out = {r["word"]: r for r in _Q["source_vec_model_table"](spark, SF_SMOKE).collect()}
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    assert len(out) == len(emb)
    for r in emb:
        row = out[f"w{r['vec_id']}"]
        assert row["n_dims"] == 64
        assert abs(row["checksum"] - round(sum(float(x) for x in r["embedding"]), 4)) < 1e-3


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's core guarantee (Schleimer et al.): two docs sharing a
    substring of length >= K+W-1 chars share at least one fingerprint."""
    from posts_vectorizer_spark.plans.queries_advanced import (
        WINNOW_K,
        WINNOW_W,
        text_winnowing_fingerprints,
    )

    shared = "x" * 0 + "the quick brown fox jumps"  # >> K+W-1 = 8 chars
    docs = spark.createDataFrame(
        [(1, f"AAA {shared} BBB"), (2, f"zzz 123 {shared} qqq")],
        "doc_id long, text string",
    )
    import posts_vectorizer_spark.sources as S

    orig = S.load_table
    try:
        S.load_table = lambda spark, sf_dir, name: docs  # noqa: ARG005
        import posts_vectorizer_spark.plans.queries_advanced as QA

        QA.load_table = S.load_table
        fps = text_winnowing_fingerprints(spark, "unused")
        a = {r["fp"] for r in fps.where(F.col("doc_id") == 1).collect()}
        b = {r["fp"] for r in fps.where(F.col("doc_id") == 2).collect()}
    finally:
        S.load_table = orig
        import posts_vectorizer_spark.plans.queries_advanced as QA

        QA.load_table = orig
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    assert a & b  # at least one shared fingerprint


def test_binary_vec_ingest_matches_array_native_path(spark):
    """F8/F9: the packed-f32 round-trip (encode_f32 -> decode_f32) must be
    bit-exact — the centroid aggregation over round-tripped embeddings
    equals the array-native oracle-checked query on every row."""
    via_binary = _Q["source_binary_vec_ingest"](spark, SF_SMOKE)
    native = _Q["sim_label_centroids"](spark, SF_SMOKE)
    assert via_binary.count() == native.count()
    assert via_binary.exceptAll(native).count() == 0
    assert native.exceptAll(via_binary).count() == 0


def test_fidelity_tokenizer_matches_default_on_clean_text(spark):
    """On punctuation-free ASCII text the spaCy-style tokenizer and the
    regex-split default must agree exactly (both = lowercase whitespace
    split); divergence is confined to punctuation handling."""
    from posts_vectorizer_spark.functions import text as T
    from posts_vectorizer_spark.operators import fidelity

    docs = load_table(spark, SF_SMOKE, "documents").withColumn(
        "text", F.regexp_replace("text", r"[^A-Za-z0-9\s]", "")
    )
    fid = fidelity.fidelity_tokens(docs)
    default = docs.select("doc_id", F.explode(T.tokens("text")).alias("word"))
    assert fid.exceptAll(default).count() == 0
    assert default.exceptAll(fid).count() == 0


def test_fidelity_tokenizer_splits_punctuation(spark):
    """The fidelity mode's reason to exist: punctuation becomes standalone
    tokens (spaCy behavior), unlike the default which keeps it attached."""
    from posts_vectorizer_spark.operators import fidelity

    docs = spark.createDataFrame(
        [(1, 'Hello, world! ("quoted")')], "doc_id long, text string"
    )
    words = [r["word"] for r in fidelity.fidelity_tokens(docs).collect()]
    assert words == ["hello", ",", "world", "!", "(", '"', "quoted", '"', ")"]


def test_fidelity_profile_query_runs(spark):
    out = _Q["text_tokens_fidelity"](spark, SF_SMOKE)
    n_docs = load_table(spark, SF_SMOKE, "documents").where(
        F.length("text") > 0
    ).count()
    assert out.count() > 0
    assert out.count() <= n_docs
    assert out.columns == ["doc_id", "n_tokens", "n_distinct_tokens"]


def test_session_window_exact_gap_boundary_matches_oracle(spark):
    """Golden boundary case the fixture corpus never hits: an event landing
    EXACTLY gap after its predecessor is MERGED into the session by Spark
    (sessions extend through a touching [ts, ts+gap) window), so the oracle's
    lag-based sessionizer must use strictly-> on the gap comparison.
    Empirically pinned here against both engines."""
    import duckdb
    import pandas as pd

    rows = [
        (1, 100, "2024-01-01 00:00:00", 1.0),
        (1, 101, "2024-01-01 06:00:00", 2.0),  # exactly gap later: MERGED
        (1, 102, "2024-01-01 12:00:01", 3.0),  # 1s past gap: new session
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    events = spark.createDataFrame(pdf)
    got = (
        events.groupBy(F.session_window("ts", "6 hours").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        .orderBy("session_start")
        .collect()
    )
    expected = [("2024-01-01T00:00:00", 2), ("2024-01-01T12:00:01", 1)]
    assert [(r["session_start"].isoformat(), r["n_events"]) for r in got] == expected

    from posts_vectorizer_spark.plans.registry import REGISTRY

    con = duckdb.connect()
    con.register("events", pdf)
    oracle = con.execute(REGISTRY["events_session_window"].oracle).fetchall()
    assert sorted((r[1].isoformat(), r[3]) for r in oracle) == expected


def test_debounce_keeps_earliest_event_not_smallest_id(spark):
    """Non-monotonic event ids: the burst's FIRST event by (ts, event_id)
    must win even when a LATER event has a smaller id. The fixture corpus
    assigns ids monotonically in ts, so a plain min(event_id) oracle would
    pass by accident — this pins the contract (and the oracle's
    first(... ORDER BY ts, event_id) form) against both engines."""
    import duckdb
    import pandas as pd

    rows = [
        # burst 1: earliest ts has the LARGEST id -> kept_event_id = 900
        (1, 900, "2024-01-01 00:00:00"),
        (1, 5, "2024-01-01 01:00:00"),
        (1, 7, "2024-01-01 02:00:00"),
        # burst 2 (after >6h gap): tie on ts -> smaller id wins
        (1, 42, "2024-01-02 00:00:00"),
        (1, 41, "2024-01-02 00:00:00"),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    events = spark.createDataFrame(pdf)
    first = F.min(F.struct("ts", "event_id")).alias("first")
    got = sorted(
        (r["kept_event_id"], r["n_suppressed"])
        for r in (
            events.groupBy(
                F.session_window("ts", "6 hours").alias("w"), "user_id"
            )
            .agg(first, F.count("*").alias("n"))
            .select(
                F.col("first.event_id").cast("bigint").alias("kept_event_id"),
                (F.col("n") - 1).cast("bigint").alias("n_suppressed"),
            )
            .collect()
        )
    )
    expected = [(41, 1), (900, 2)]
    assert got == expected

    from posts_vectorizer_spark.plans.registry import REGISTRY

    con = duckdb.connect()
    con.register("events", pdf)
    oracle = con.execute(REGISTRY["events_debounce_bursts"].oracle).fetchall()
    assert sorted((r[2], r[3]) for r in oracle) == expected


def test_bloom_runtime_filter_prunes_without_false_negatives(spark):
    """The Bloom runtime filter must (a) never drop a true match — the
    exact-join oracle equality depends on it — and (b) actually prune:
    with a selective dim side, most non-matching fact rows die before the
    join. Checked directly on the pruned relation, not just end-to-end."""
    from posts_vectorizer_spark.operators import runtime_filter as RT

    fact = spark.range(0, 10_000).select(F.col("id").alias("k"))
    dim = spark.range(0, 10_000, 100).select(F.col("id").alias("d"))  # 100 keys
    bloom = RT.build_bloom(dim, "d")
    pruned = (
        fact.crossJoin(F.broadcast(bloom))
        .where(RT.might_contain(F.col("bloom"), F.col("k")))
        .drop("bloom")
    )
    kept = {r.k for r in pruned.collect()}
    true_keys = {r.d for r in dim.collect()}
    assert true_keys <= kept  # no false negatives, ever
    # 100 keys in 4096*64 bits -> fp rate well under 1%; allow generous slack
    assert len(kept) < 100 + 500
    # and the exact join of the pruned side equals the plain join
    got = pruned.join(dim, pruned.k == dim.d).count()
    assert got == 100


def test_connected_components_transitive_chain(spark):
    """A~B and B~C (but no direct A~C pair) must land in ONE component, and
    unrelated docs stay singletons — the transitivity the pair list alone
    doesn't give."""
    from posts_vectorizer_spark.operators.dedup import connected_components

    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(docs, pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_simhash_near_dups_full_recall_vs_brute_force(spark):
    """Pigeonhole blocking (max_hamming+1 blocks) must find EVERY pair with
    Hamming <= max_hamming — identical to the all-pairs cross join."""
    from posts_vectorizer_spark.operators import dedup
    from posts_vectorizer_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    blocked = dedup.simhash_near_dups(docs, max_hamming=3)
    sh = dedup.simhash(docs)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    brute = (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .where(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )
    assert brute.exceptAll(blocked).count() == 0  # 100% recall
    assert blocked.exceptAll(brute).count() == 0  # no false positives


def test_stream_drain_query_matches_flagship(spark):
    drained = _Q["stream_vectorize_drain"](spark, SF_SMOKE)
    batch = _Q["tfidf_doc_vectors"](spark, SF_SMOKE)
    assert drained.count() == batch.count()
    assert drained.exceptAll(batch).count() == 0


def test_grouped_zscore_matches_native_window(spark):
    """applyInPandas grouped-map vs the native window-function form: same
    z-scores within float tolerance (pandas accumulates in a different
    order, so exact-hash equality is not the contract here)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import __spark_entry__ as E
    from posts_vectorizer_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    got = {
        r["doc_id"]: r["z"]
        for r in E.queries()["grouped_zscore_normalize"](
            spark, SF_SMOKE
        ).collect()
    }
    w = Window.partitionBy("lang")
    native = {
        r["doc_id"]: r["z"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "lang", F.col("n_chars").cast("double").alias("x"))
        .select(
            "doc_id",
            (
                (F.col("x") - F.avg("x").over(w)) / F.stddev_samp("x").over(w)
            ).alias("z"),
        )
        .collect()
    }
    assert set(got) == set(native)
    # the kernel emits on the round-6 grid (r4 [Q] upgrade), so the
    # native-window comparison allows half a grid step
    for k in got:
        assert abs(got[k] - native[k]) <= 5.01e-7, k


def test_lsh_rerank_grouped_equals_pairs(spark):
    """The grouped applyInPandas rerank and the pair-expression rerank must
    produce IDENTICAL rows (same fold order, same rounding) — the scale
    path is a drop-in for the reference plan, not an approximation."""
    from posts_vectorizer_spark.operators import similarity
    from posts_vectorizer_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    for mp in (False, True):
        got = {
            (r["query_id"], r["rk"]): (r["neighbor_id"], r["cosine"])
            for r in similarity.lsh_ann(
                emb, 64, multiprobe=mp, rerank="grouped"
            ).collect()
        }
        ref = {
            (r["query_id"], r["rk"]): (r["neighbor_id"], r["cosine"])
            for r in similarity.lsh_ann(
                emb, 64, multiprobe=mp, rerank="pairs"
            ).collect()
        }
        assert got == ref, f"multiprobe={mp}"


def test_lsh_hot_bucket_salt_split_is_exact(spark):
    """The viral-bucket guard: plant one pathologically hot bucket (60
    vectors sharing a direction all hash to the SAME LSH bucket) and force
    splitting with a tiny max_bucket_build. The salted plan must (a)
    actually bound every rerank group's build side and (b) produce rows
    IDENTICAL to the unsplit plan — the split is physical, not semantic."""
    from pyspark.sql import functions as F

    from posts_vectorizer_spark.operators import similarity

    dims = 8
    base = [float((d % 3) + 1) for d in range(dims)]
    rows = [
        # 60 copies of one direction (scaled: same projection signs ->
        # same bucket), plus a spread of distinct directions
        *[(i, [c * (1.0 + i / 100.0) for c in base]) for i in range(60)],
        *[
            (100 + j, [((j + d) % 5) - 2.0 for d in range(dims)])
            for j in range(20)
        ],
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    unsplit = similarity.lsh_ann(emb, dims, k=3, max_bucket_build=None)
    split = similarity.lsh_ann(emb, dims, k=3, max_bucket_build=8)
    key = lambda r: (r["query_id"], r["rk"])  # noqa: E731
    got = {key(r): (r["neighbor_id"], r["cosine"]) for r in split.collect()}
    ref = {key(r): (r["neighbor_id"], r["cosine"]) for r in unsplit.collect()}
    assert got == ref
    assert len(ref) > 0

    # the guard itself: no salted group's build side exceeds the cap
    bucketed = emb.select(
        "vec_id",
        "embedding",
        similarity.lsh_bucket("embedding", dims).alias("bucket"),
        F.lit(1.0).alias("nrm"),
    )
    build = bucketed.select(
        "bucket", "vec_id", "embedding", "nrm", F.lit(False).alias("is_probe")
    )
    probe = build.withColumn("is_probe", F.lit(True))
    salted, keys = similarity._salt_split(build, probe, "bucket", 8)
    sizes = (
        salted.where(~F.col("is_probe"))
        .groupBy(*keys)
        .count()
        .agg(F.max("count").alias("mx"), F.countDistinct(*keys).alias("groups"))
        .collect()[0]
    )
    # hash salting bounds group size statistically (cap ± O(sqrt(cap))):
    # the 60-row bucket must split into ~8 salted groups, none anywhere
    # near the original size
    assert sizes["mx"] <= 2 * 8
    assert sizes["groups"] >= 60 // 8  # the hot bucket really did split


def test_arrow_vector_stats_handles_empty_embeddings(spark, tmp_path):
    # Empty lists are reduceat's trap (it returns the next segment's head,
    # or raises on a trailing empty); the kernel must emit the DuckDB
    # parity values instead: 0 positives, NULL max/l1.
    df = spark.createDataFrame(
        [(1, [0.5, -0.25]), (2, []), (3, [1.0])],
        "vec_id long, embedding array<float>",
    )
    df = df.withColumn("label", F.lit(0))
    df.coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))
    import __spark_entry__ as E

    rows = {
        r["vec_id"]: (r["n_dims"], r["n_positive"], r["max_dim"], r["l1_norm"])
        for r in E.queries()["grouped_arrow_vector_stats"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows[1] == (2, 1, 0.5, 0.75)
    assert rows[2] == (0, 0, None, None)
    assert rows[3] == (1, 1, 1.0, 1.0)


def test_fasttext_bin_parses_and_matches_vec_loader(spark, tmp_path):
    """parse_fasttext_bin (staged r13, gap-list item 2 closure): a
    50-word integer-valued synthetic model written as BOTH formats
    must ingest identically — the .bin walk (magic/args/dict/quant
    gate/matrix cross-checks) vs the standing distributed .vec text
    loader — plus the loud-reject battery (magic, version, quantized
    flag, truncation, matrix-width mismatch)."""
    import struct

    import pytest

    from posts_vectorizer_spark.sources.model_table import (
        FASTTEXT_MAGIC,
        load_vec_model,
        parse_fasttext_bin,
        write_fasttext_bin,
        write_vec_file,
    )

    dim = 6
    rows = [
        (
            f"word{j}",
            j + 1,
            [float((j * 5 + i * 3) % 41 - 20) for i in range(dim)],
        )
        for j in range(50)
    ]
    raw = write_fasttext_bin(rows, dim)
    p = parse_fasttext_bin(raw)
    assert p["dim"] == dim and p["n_words"] == 50
    assert p["ntokens"] == sum(c for _, c, _ in rows)
    assert p["tail_bytes"] == 0
    assert p["words"] == rows  # exact: integer-valued float32

    vec_path = str(tmp_path / "model.vec")
    write_vec_file(vec_path, [(w, v) for w, _, v in rows], dim)
    from_vec = {
        r["word"]: [float(x) for x in r["embedding"]]
        for r in load_vec_model(spark, vec_path).collect()
    }
    from_bin = {w: v for w, _, v in p["words"]}
    assert from_vec == from_bin

    with pytest.raises(ValueError):
        parse_fasttext_bin(b"xxxx" + raw[4:])            # magic
    with pytest.raises(ValueError):
        parse_fasttext_bin(
            struct.pack("<ii", FASTTEXT_MAGIC, 99) + raw[8:]
        )                                                # version
    with pytest.raises(ValueError):
        parse_fasttext_bin(raw[:-7])                     # truncation
    i = raw.find(b"word49\x00") + 7 + 9                  # quant flag
    mut = bytearray(raw)
    mut[i] ^= 1
    with pytest.raises(ValueError):
        parse_fasttext_bin(bytes(mut))
    mut = bytearray(raw)                                 # width mismatch
    mut[i + 1 + 8] = dim + 1                             # n int64 lsb
    with pytest.raises(ValueError):
        parse_fasttext_bin(bytes(mut))
