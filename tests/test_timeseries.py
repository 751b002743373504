"""Tests for the time-series & LM wave 7 (plans/queries_timeseries.py):
forward-fill across planted gaps, spike flagging with out-of-sample
history, full-outer unmatched rows on both sides, and bigram-LM ordering
sensitivity. The value-exactness check is the DuckDB oracle
(tools/oracle_check.py); these pin semantics the hash can't express."""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as E
from tests.conftest import make_docs


def _write_events(tmp_path, rows):
    # rows: (event_id, ts_str, user_id, value)
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [r[2] for r in rows],
            "event_type": ["x"] * len(rows),
            "value": [float(r[3]) for r in rows],
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")


def test_gap_fill_carries_last_value_across_gap(spark, tmp_path):
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 00:10:00", 5, 10.0),
            (2, "2024-01-01 00:40:00", 5, 20.0),  # later in same hour wins
            (3, "2024-01-01 03:30:00", 5, 99.0),
        ],
    )
    rows = sorted(
        E.queries()["events_gap_fill"](spark, str(tmp_path)).collect(),
        key=lambda r: r["hour"],
    )
    assert len(rows) == 4  # hours 00..03
    assert [r["is_observed"] for r in rows] == [True, False, False, True]
    assert [r["filled_value"] for r in rows] == [20.0, 20.0, 20.0, 99.0]


def test_rolling_zscore_flags_planted_spike(spark, tmp_path):
    base = [
        (i, f"2024-01-01 0{i}:00:00", 9, 10.0 + (i % 2) * 0.5)
        for i in range(6)
    ]
    spike = [(6, "2024-01-01 06:00:00", 9, 1000.0)]
    _write_events(tmp_path, base + spike)
    rows = {
        r["event_id"]: r
        for r in E.queries()["events_rolling_zscore"](
            spark, str(tmp_path)
        ).collect()
    }
    # too little history -> no score
    assert rows[0]["zscore"] is None and not rows[0]["is_anomaly"]
    assert rows[1]["zscore"] is None
    # the spike is scored against PRIOR events only and flagged
    assert rows[6]["is_anomaly"]
    assert rows[6]["zscore"] > 2
    # stable values are not anomalous
    assert not any(rows[i]["is_anomaly"] for i in range(6))


def test_full_outer_keeps_both_unmatched_sides(spark, tmp_path):
    pd.DataFrame(
        {"c_custkey": [1, 2]}  # customer 2 has no orders
    ).to_parquet(tmp_path / "customer.parquet")
    pd.DataFrame(
        {
            "o_custkey": [1, 99],  # order custkey 99 has no customer row
            "o_orderkey": [10, 11],
            "o_totalprice": [100.50, 7.25],
        }
    ).to_parquet(tmp_path / "orders.parquet")
    rows = {
        r["custkey"]: r
        for r in E.queries()["rel_join_full_outer"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {1, 2, 99}
    assert rows[1]["n_orders"] == 1 and rows[1]["has_customer"]
    assert rows[1]["total_spend"] == pytest.approx(100.50)
    assert rows[2]["n_orders"] == 0 and rows[2]["has_customer"]
    assert rows[2]["total_spend"] == 0.0
    assert rows[99]["n_orders"] == 1 and not rows[99]["has_customer"]


def test_bigram_logprob_prefers_dominant_transitions(spark, tmp_path):
    # corpus transition mass is on "a b"; doc 7 uses a one-off transition
    # "b a" plus unique words, so its mean transition logprob is lower.
    common = [(i, "a b a b a b", "en") for i in range(4)]
    odd = [(7, "qq zz", "en")]
    docs = make_docs(spark, common + odd)
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in E.queries()["text_bigram_logprob"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[0]["n_transitions"] == 5
    assert out[7]["n_transitions"] == 1
    assert all(r["avg_logprob"] < 0 for r in out.values())
    assert out[0]["avg_logprob"] > out[7]["avg_logprob"]


def test_asof_tie_takes_same_timestamp_purchase(spark, tmp_path):
    # The >= bound: a click at EXACTLY the purchase's timestamp matches
    # that purchase (purchase sorts first via the side tag); one second
    # earlier it must fall back to the prior purchase or null.
    import pandas as pd

    ts = pd.to_datetime(
        [
            "2024-01-01 01:00:00",  # purchase P1
            "2024-01-01 02:00:00",  # purchase P2
            "2024-01-01 02:00:00",  # click exactly at P2
            "2024-01-01 01:59:59",  # click one second before P2
            "2024-01-01 00:30:00",  # click before any purchase
        ]
    )
    pd.DataFrame(
        {
            "event_id": [1, 2, 10, 11, 12],
            "ts": ts,
            "user_id": [7] * 5,
            "event_type": ["purchase", "purchase", "click", "click", "click"],
            "value": [100.0, 200.0, 0.0, 0.0, 0.0],
            "props": ["{}"] * 5,
        }
    ).to_parquet(tmp_path / "events.parquet")
    import __spark_entry__ as E

    got = {
        r["event_id"]: r["last_purchase_value"]
        for r in E.queries()["events_asof_last_purchase"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[10] == 200.0  # tie: the same-instant purchase wins
    assert got[11] == 100.0  # one second earlier: the prior purchase
    assert got[12] is None   # nothing at or before: null fill


def test_interval_coverage_merges_overlap_abut_and_nested(spark, tmp_path):
    """Crafted intervals pin the union semantics the oracle hash can't
    localize: overlap merges, ABUTTING (s == prev end) merges, a nested
    interval adds nothing, durations that round below one whole second
    are dropped (no phantom zero-coverage islands), and a disjoint
    interval opens a new island."""
    rows = [
        # user 1: [0,60) + [30,90) overlap; [90,120) abuts -> one island
        (1, "2024-01-01 00:00:00", 1, 1.0),
        (2, "2024-01-01 00:00:30", 1, 1.0),
        (3, "2024-01-01 00:01:30", 1, 0.5),
        # nested inside [30,90): adds nothing
        (4, "2024-01-01 00:00:40", 1, 1 / 6),
        # disjoint second island [300,360)
        (5, "2024-01-01 00:05:00", 1, 1.0),
        # zero-duration row: filtered out entirely
        (6, "2024-01-01 00:10:00", 1, 0.0),
        # sub-half-second duration (0.24s rounds to 0): also filtered —
        # would otherwise count as a disjoint zero-coverage island
        (8, "2024-01-01 00:20:00", 1, 0.004),
        # user 2: one interval
        (7, "2024-01-01 00:00:00", 2, 1.0),
    ]
    _write_events(tmp_path, rows)
    q = E.queries()["events_interval_coverage"]
    got = {
        r.user_id: (r.n_islands, r.covered_seconds)
        for r in q(spark, str(tmp_path)).collect()
    }
    assert got == {1: (2, 180), 2: (1, 60)}


def test_cusum_finds_planted_level_shift(spark, tmp_path):
    # 10 days, one event/day: 10.0 for days 1-5, 20.0 after. The CUSUM
    # |S_i| of deviations from the series mean (15) peaks at the shift
    # boundary, day 5, with |S_5| = 5*5 = 25.
    import datetime

    import pandas as pd

    days = [f"2024-01-{d:02d}" for d in range(1, 11)]
    pd.DataFrame(
        {
            "event_id": list(range(10)),
            "ts": pd.to_datetime(days),
            "user_id": [1] * 10,
            "event_type": ["click"] * 10,
            "value": [10.0] * 5 + [20.0] * 5,
            "props": ["{}"] * 10,
        }
    ).to_parquet(tmp_path / "events.parquet")
    r = E.queries()["events_cusum_changepoint"](
        spark, str(tmp_path)
    ).collect()
    assert len(r) == 1
    assert r[0]["n_days"] == 10
    assert r[0]["change_day"] == datetime.date(2024, 1, 5)
    assert r[0]["cusum_stat"] == 25.0


def test_seasonal_decompose_planted(spark, tmp_path):
    """events_seasonal_decompose (introduced r7) on a PLANTED series:
    constant level + pure weekly pattern, one event per day. Every
    centered 7-day window then contains each weekday exactly once, so the
    decomposition is EXACT: trend == level + mean(amplitude), seasonal ==
    amplitude - mean(amplitude) per weekday, residual == 0 — recovered to
    the 6-decimal output rounding."""
    import datetime

    amps = [0.0, 0.7, 1.4, -0.7, 2.1, -1.4, 0.35]  # by epoch-day mod 7
    level = 100.0
    start = datetime.date(2024, 1, 7)
    rows = []
    for i in range(35):
        day = start + datetime.timedelta(days=i)
        dow = (day - datetime.date(1970, 1, 1)).days % 7
        rows.append(
            (
                datetime.datetime.combine(day, datetime.time(12, 0)),
                level + amps[dow],
            )
        )
    spark.createDataFrame(rows, "ts timestamp, value double").repartition(
        4
    ).write.parquet(str(tmp_path / "events.parquet"))

    out = {
        r["day"]: r
        for r in E.queries()["events_seasonal_decompose"](
            spark, str(tmp_path)
        ).collect()
    }
    # full-window guard: first and last 3 days excluded
    assert len(out) == 35 - 6
    mean_amp = sum(amps) / 7
    for day, r in out.items():
        dow = (day - datetime.date(1970, 1, 1)).days % 7
        assert abs(r["trend"] - (level + mean_amp)) < 2e-6, (day, r)
        assert abs(r["seasonal"] - (amps[dow] - mean_amp)) < 2e-6, (day, r)
        assert abs(r["residual"]) < 4e-6, (day, r)
        assert abs(r["observed"] - (level + amps[dow])) < 1e-6, (day, r)


def test_acf_lags_planted_weekly_cycle(spark, tmp_path):
    """events_acf_lags against the textbook sample ACF computed
    independently in Python on a planted weekly cycle: peak at lag 7,
    trough near lag 3/4, and the calendar-gap pair-count semantics."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    # 21 days, counts follow a weekly pattern with a planted hole at
    # day 10 (missing day -> lag pairs touching it vanish)
    weekly = [5, 9, 13, 9, 5, 2, 1]
    counts = {d: weekly[d % 7] for d in range(21) if d != 10}
    rows, eid = [], 0
    for d, c in counts.items():
        for _ in range(c):
            rows.append((eid, f"2024-01-{d + 1:02d} 03:00:00", eid % 7, 1.0))
            eid += 1
    t = tmp_path / "acf"
    t.mkdir()
    _write_events(t, rows)

    got = {
        r["lag"]: r
        for r in resolve_query("events_acf_lags")(spark, str(t)).collect()
    }

    n = len(counts)
    s = sum(counts.values())
    den = sum((n * x - s) ** 2 for x in counts.values())
    for k in range(1, 8):
        pairs = [
            (counts[d], counts[d + k])
            for d in counts
            if d + k in counts
        ]
        num = sum((n * a - s) * (n * b - s) for a, b in pairs)
        assert got[k]["pairs"] == len(pairs)
        assert abs(got[k]["acf"] - num / den) < 1e-12, k
    assert got[7]["acf"] > 0.5          # weekly cycle peaks at lag 7
    assert got[7]["acf"] == max(got[k]["acf"] for k in range(1, 8))
    assert got[3]["acf"] < 0            # anti-phase mid-week


def test_acf_lags_constant_series_null(spark, tmp_path):
    """An all-constant daily series has zero variance -> NULL acf at
    every lag (den = 0), never a div-by-zero."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = [
        (d * 2 + i, f"2024-02-{d + 1:02d} 0{i}:00:00", i, 1.0)
        for d in range(10)
        for i in range(2)
    ]
    t = tmp_path / "acfc"
    t.mkdir()
    _write_events(t, rows)
    out = resolve_query("events_acf_lags")(spark, str(t)).collect()
    assert len(out) == 7 and all(r["acf"] is None for r in out)


def test_mann_kendall_planted_trend_and_theil_sen(spark, tmp_path):
    """events_mann_kendall_trend on a planted rising series with ties:
    hand-compute S, the tie-corrected variance, the continuity-
    corrected z, and the lower-median pairwise slope."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    counts = {0: 2, 1: 4, 2: 4, 3: 7, 4: 9, 5: 9, 6: 12, 7: 15}
    rows, eid = [], 0
    for d, c in counts.items():
        for _ in range(c):
            rows.append((eid, f"2024-01-{d + 1:02d} 05:00:00", eid % 3, 1.0))
            eid += 1
    t = tmp_path / "mk"
    t.mkdir()
    _write_events(t, rows)

    [r] = resolve_query("events_mann_kendall_trend")(
        spark, str(t)
    ).collect()

    days = sorted(counts)
    import math
    s_stat = sum(
        (counts[j] > counts[i]) - (counts[j] < counts[i])
        for a_, i in enumerate(days) for j in days[a_ + 1:]
    )
    n = len(days)
    from collections import Counter
    tie_mass = sum(
        c * (c - 1) * (2 * c + 5)
        for c in Counter(counts.values()).values() if c > 1
    )
    v18 = n * (n - 1) * (2 * n + 5) - tie_mass
    z = (s_stat - 1) / math.sqrt(v18 / 18.0)
    slopes = sorted(
        (
            (counts[j] - counts[i]) / (j - i),
            i, j,
        )
        for a_, i in enumerate(days) for j in days[a_ + 1:]
        if counts[j] != counts[i]
    )
    med = slopes[(len(slopes) + 1) // 2 - 1][0]
    assert (r["n_days"], r["s"]) == (n, s_stat)
    assert abs(r["z"] - z) < 1e-12
    assert r["significant"]
    assert r["theil_sen_slope"] == med
    assert med > 0


def test_mann_kendall_all_tied_null(spark, tmp_path):
    """A constant daily series: S=0, variance reduces to 0 when every
    day ties in one group -> NULL z, NULL slope, single readout row."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = [
        (d * 3 + i, f"2024-03-{d + 1:02d} 0{i}:00:00", i, 1.0)
        for d in range(6)
        for i in range(3)
    ]
    t = tmp_path / "mkt"
    t.mkdir()
    _write_events(t, rows)
    [r] = resolve_query("events_mann_kendall_trend")(
        spark, str(t)
    ).collect()
    assert r["n_days"] == 6 and r["s"] == 0
    assert r["theil_sen_slope"] is None
    # n=6 all in one tie group: tie_mass == n(n-1)(2n+5) -> v18 = 0
    assert r["z"] is None and r["significant"] is None


def test_holt_winters_planted_vs_decimal_reference(spark, tmp_path):
    """events_holt_winters against an independent exact-decimal
    reference fold on a planted weekly series with trend; the fit
    must track the cycle (fit error << seasonal amplitude)."""
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    weekly = [5, 9, 13, 9, 6, 3, 1]
    counts = {d: weekly[d % 7] + d // 7 for d in range(23)}  # trend +1/wk
    rows, eid = [], 0
    for d, c in counts.items():
        for _ in range(c):
            rows.append((eid, f"2024-01-{d + 1:02d} 04:00:00", eid % 5, 1.0))
            eid += 1
    t = tmp_path / "hw"
    t.mkdir()
    _write_events(t, rows)

    got = {
        str(r["day"]): r
        for r in resolve_query("events_holt_winters")(
            spark, str(t)
        ).collect()
    }

    m, q = 7, Decimal("0.000001")
    r6 = lambda v: v.quantize(q, rounding=ROUND_HALF_UP)
    xs = [Decimal(counts[d]) for d in range(23)]
    a1, a2 = r6(sum(xs[:m]) / m), r6(sum(xs[m : 2 * m]) / m)
    lv, b = a1, r6((a2 - a1) / m)
    s = [r6(x - a1) for x in xs[:m]]
    al, be, ga = Decimal("0.3"), Decimal("0.1"), Decimal("0.2")
    assert len(got) == 23 - m
    for t_ in range(m, 23):
        fitted = r6(lv + b + s[0])
        lvp = r6(al * (xs[t_] - s[0]) + (1 - al) * (lv + b))
        bp = r6(be * (lvp - lv) + (1 - be) * b)
        st = r6(ga * (xs[t_] - lvp) + (1 - ga) * s[0])
        s = s[1:] + [st]
        lv, b = lvp, bp
        r = got[f"2024-01-{t_ + 1:02d}"]
        assert r["x"] == int(xs[t_])
        assert r["fitted"] == float(fitted)
        assert r["residual"] == float(r6(xs[t_] - fitted))
    # the weekly cycle + linear trend is exactly the model's shape:
    # every one-step-ahead residual stays well inside the amplitude
    assert max(abs(r["residual"]) for r in got.values()) < 4.0


def test_holt_winters_short_series_empty(spark, tmp_path):
    """Under two full seasons there is nothing to initialize from:
    the readout is empty, matching the oracle's n >= 2m guard."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = [
        (d * 2 + i, f"2024-02-{d + 1:02d} 0{i}:00:00", i, 1.0)
        for d in range(13)
        for i in range(2)
    ]
    t = tmp_path / "hws"
    t.mkdir()
    _write_events(t, rows)
    assert resolve_query("events_holt_winters")(spark, str(t)).count() == 0


def _events_typed(tmp_path, rows):
    # rows: (event_id, ts_str, user_id, event_type, value)
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [float(r[4]) for r in rows],
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")


def test_kaplan_meier_planted_textbook_curve(spark, tmp_path):
    """events_kaplan_meier on a hand-built cohort: 6 users enter on day
    1; conversions on days 2,2,4; censoring at the observation end.
    Textbook KM: S(1)=., S(3)=(1-2/6), S(3 after day-3 event)..."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    rows, eid = [], 0
    # all users' first event on 2024-01-01; observation ends 2024-01-11
    convs = {0: 3, 1: 3, 2: 5}          # users 0,1 convert day idx 2; u2 day 4
    for u in range(6):
        rows.append((eid, "2024-01-01 08:00:00", u, "view", 1.0)); eid += 1
        if u in convs:
            rows.append(
                (eid, f"2024-01-{convs[u]:02d} 09:00:00", u, "purchase", 1.0)
            )
            eid += 1
    rows.append((eid, "2024-01-11 10:00:00", 0, "view", 1.0))  # obs end

    t = tmp_path / "km"
    t.mkdir()
    _events_typed(t, rows)

    out = {r["t_days"]: r for r in
           resolve_query("events_kaplan_meier")(spark, str(t)).collect()}
    # durations: u0,u1 -> 2 (event); u2 -> 4 (event); u3,u4,u5 -> 10 (censored)
    assert set(out) == {2, 4}
    r2 = out[2]
    assert (r2["n_at_risk"], r2["d_events"]) == (6, 2)
    assert r2["survival"] == round((6 - 2) / 6, 9)
    r4 = out[4]
    assert (r4["n_at_risk"], r4["d_events"]) == (4, 1)
    # S(4) = round(round(4/6,9) * round(3/4,9), 9)
    import decimal
    f1 = decimal.Decimal(str(round(4 / 6, 9)))
    f2 = decimal.Decimal(str(round(3 / 4, 9)))
    exp_s = float((f1 * f2).quantize(decimal.Decimal("1e-9")))
    assert r4["survival"] == exp_s


def test_kaplan_meier_full_conversion_pins_zero(spark, tmp_path):
    """When the entire remaining risk set converts at one time, S drops
    to exactly 0.0 (the zeroed flag, not a float underflow)."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    rows, eid = [], 0
    for u in range(3):
        rows.append((eid, "2024-02-01 08:00:00", u, "view", 1.0)); eid += 1
        rows.append((eid, "2024-02-03 09:00:00", u, "purchase", 1.0)); eid += 1
    t = tmp_path / "kmz"
    t.mkdir()
    _events_typed(t, rows)
    out = {r["t_days"]: r for r in
           resolve_query("events_kaplan_meier")(spark, str(t)).collect()}
    assert out[2]["survival"] == 0.0 and out[2]["d_events"] == 3


def test_page_hinkley_planted_level_shift(spark, tmp_path):
    """events_page_hinkley on a planted upward level shift: flat
    ~10/day for 12 days then ~40/day; drift_up must fire after the
    shift and never before; trajectory cross-checked against an
    independent pinned-decimal replica."""
    from decimal import Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    vals = [10.0] * 12 + [40.0] * 8
    rows, eid = [], 0
    for d, v in enumerate(vals):
        for i in range(3):
            rows.append((eid, f"2024-05-{d + 1:02d} 0{i}:00:00", i, v))
            eid += 1
    t = tmp_path / "ph"
    t.mkdir()
    _write_events(t, rows)

    out = {str(r["day"]): r for r in
           resolve_query("events_page_hinkley")(spark, str(t)).collect()}
    assert len(out) == 20

    # replica: x_t exact (constant per day), xbar pinned to 6dp
    q6 = Decimal("0.000001")
    sx, m_pos, min_pos = Decimal(0), Decimal(0), Decimal(0)
    delta = Decimal("0.5")
    fired_at = None
    for d, v in enumerate(vals):
        x = Decimal(str(v))
        sx += x
        xbar = (sx / (d + 1)).quantize(q6)  # exact here (terminating)
        m_pos += x - xbar - delta
        min_pos = min(min_pos, m_pos)
        r = out[f"2024-05-{d + 1:02d}"]
        assert r["daily_mean"] == float(x)
        assert r["running_mean"] == float(xbar)
        assert r["ph_up"] == float(m_pos - min_pos)
        if r["drift_up"] and fired_at is None:
            fired_at = d
    assert fired_at is not None and fired_at >= 12  # fires after the shift
    assert not out["2024-05-12"]["drift_up"]        # never before
    assert not any(out[k]["drift_down"] for k in out)


def test_seasonality_strength_separates_planted_series(spark, tmp_path):
    """events_seasonality_strength: a strongly weekly series scores
    f_seasonal near 1; scrambling the weekly pattern away drops it far
    down, while both stay in [0, 1] and n_days matches the full-window
    day count."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    def write(d, amplitudes):
        rows = []
        eid = 0
        for day in range(28):
            # one event per day whose value encodes the series
            eid += 1
            rows.append(
                (eid, f"2024-01-{day + 1:02d} 12:00:00", 1, "view",
                 float(amplitudes[day]), "{}")
            )
        d.mkdir()
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id",
            "event_type", "value", "props"
        ).write.parquet(str(d / "events.parquet"))

    weekly = [100.0 + [0, 50, 10, 80, 20, 60, 30][d % 7] for d in range(28)]
    write(tmp_path / "seasonal", weekly)
    r1 = resolve_query("events_seasonality_strength")(
        spark, str(tmp_path / "seasonal")
    ).collect()[0]
    # 28 days -> 22 full 7-day windows
    assert r1["n_days"] == 22
    assert r1["f_seasonal"] is not None and r1["f_seasonal"] > 0.95
    assert 0.0 <= r1["f_seasonal"] <= 1.0

    # same values, weekly phase destroyed (period-5 pattern on a
    # period-7 seasonal extractor)
    scrambled = [100.0 + [0, 50, 10, 80, 20][d % 5] for d in range(28)]
    write(tmp_path / "flat", scrambled)
    r2 = resolve_query("events_seasonality_strength")(
        spark, str(tmp_path / "flat")
    ).collect()[0]
    assert r2["f_seasonal"] is None or r2["f_seasonal"] < 0.5


def test_kleinberg_bursts_planted_burst_and_penalty(spark, tmp_path):
    """events_kleinberg_bursts: a planted contiguous high-rate window is
    labeled burst while an equal-magnitude SINGLE-day spike is not (the
    entry penalty working — the property separating Kleinberg from a
    threshold flag); Viterbi output equals an independent Python
    replica with the same decimal pinning."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    # 40 days at ~10/day; days 15-22 at 40/day (8-day burst); day 30 a
    # single 25-event spike
    per_day = [10] * 40
    for dd in range(14, 22):
        per_day[dd] = 40
    per_day[29] = 25
    rows = []
    eid = 0
    for d, k in enumerate(per_day):
        for j in range(k):
            eid += 1
            rows.append(
                (eid,
                 f"2024-0{3 + d // 30}-{(d % 30) + 1:02d} 12:{j % 60:02d}:"
                 f"{j // 60:02d}",
                 1, "view", 1.0, "{}")
            )
    d = tmp_path / "kb"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props"
    ).write.parquet(str(d / "events.parquet"))

    out = sorted(
        resolve_query("events_kleinberg_bursts")(spark, str(d)).collect(),
        key=lambda r: r["day"],
    )
    assert len(out) == 40
    got = [r["burst"] for r in out]

    # independent replica
    Q6, Q9 = Decimal("0.000001"), Decimal("0.000000001")

    def pin(v, q):
        return Decimal(repr(v)).quantize(q, ROUND_HALF_UP)

    xs = [r["x"] for r in out]
    n, tot = len(xs), sum(xs)
    mean = tot / n
    lr0, lr1 = pin(math.log(mean), Q9), pin(math.log(2 * mean), Q9)
    r0, r1 = pin(mean, Q6), pin(2 * mean, Q6)
    g = pin(2 * math.log(n), Q6)
    c0 = [(r0 - x * lr0).quantize(Q6, ROUND_HALF_UP) for x in xs]
    c1 = [(r1 - x * lr1).quantize(Q6, ROUND_HALF_UP) for x in xs]
    d0, d1 = c0[0], g + c1[0]
    dec = [(0, 0)]
    for t in range(1, n):
        b0 = 0 if d0 <= d1 else 1
        b1 = 1 if d1 <= d0 + g else 0
        d0, d1 = (
            min(d0, d1) + c0[t],
            min(d1, d0 + g) + c1[t],
        )
        dec.append((b0, b1))
    # NOTE: the replica must compute the NEW d0/d1 from the OLD pair
    # simultaneously (as above) — mirror of the fold's acc semantics
    s = 1 if d1 < d0 else 0
    labels = []
    for t in range(n, 0, -1):
        labels.append(s)
        if t > 1:
            s = dec[t - 1][s]
    labels.reverse()
    assert got == [bool(v) for v in labels]

    # the planted window is burst, the lone spike is not
    assert all(got[14:22])
    assert not got[29]
    assert not any(got[:14]) and not any(got[22:29]) and not any(got[30:])


def test_ewma_control_planted_shift(spark, tmp_path):
    """events_ewma_control: a level shift (10/day -> 30/day) drives the
    smoothed level through the upper control limit within two days of
    the jump; every row matches a pinned-decimal replica of the
    z/w recursions and the fixed-shape limit expression."""
    import math
    from datetime import datetime as D
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    counts = [10] * 20 + [30] * 5
    rows = []
    eid = 0
    for day, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, eid % 7, D(2024, 1, 1 + day, 12), "click", 1.0))
            eid += 1
    d = tmp_path / "ewma"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp,"
        " event_type string, value double",
    ).write.parquet(str(d / "events.parquet"))

    got = sorted(
        resolve_query("events_ewma_control")(spark, str(d)).collect(),
        key=lambda r: r["day"],
    )
    assert len(got) == len(counts) - 1  # day 0 is start-up state

    # pinned-decimal replica
    q = Decimal("0.000001")

    def r6(v):
        return v.quantize(q, rounding=ROUND_HALF_UP)

    n = len(counts)
    xs = [Decimal(c) for c in counts]
    mu = r6(sum(xs) / n)
    mrbar = r6(sum(abs(xs[i + 1] - xs[i]) for i in range(n - 1)) / (n - 1))
    sigma = r6(Decimal(repr(float(mrbar) / 1.128)))
    z, w = xs[0], Decimal("1.0")
    flagged_days = []
    for t in range(1, n):
        z = r6(Decimal("0.2") * xs[t] + Decimal("0.8") * z)
        w = r6(Decimal("0.64") * w)
        half = 3.0 * float(sigma) * math.sqrt(0.2 / 1.8 * (1.0 - float(w)))
        row = got[t - 1]
        assert row["x"] == int(xs[t])
        assert row["z"] == float(z)
        assert abs(row["ucl"] - (float(mu) + half)) < 1e-12
        assert row["out_of_control"] == (
            float(z) > float(mu) + half or float(z) < float(mu) - half
        )
        if row["out_of_control"]:
            flagged_days.append(t)
    # the jump at day 20 is caught within two days
    assert any(t in (20, 21) for t in flagged_days)
    # the steady pre-jump segment is NOT flagged high (z stays at 10,
    # below mu=14: it may flag LOW, which a retrospective chart should)
    assert all(got[t - 1]["z"] <= got[t - 1]["ucl"] for t in range(2, 19))


def test_croston_hand_computed(spark, tmp_path):
    """events_croston_intermittent: purchases on days 0/2/6 with sizes
    4/2/8 follow the hand-stepped decimal recursion exactly; non-
    purchase events extend the span without touching the state."""
    from datetime import datetime as D
    from decimal import Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = []
    eid = 0
    for day, n in ((0, 4), (2, 2), (6, 8)):
        for _ in range(n):
            rows.append((eid, 1, D(2024, 1, 1 + day, 10), "purchase", 1.0))
            eid += 1
    # clicks pad the calendar span to 10 days
    for day in range(10):
        rows.append((eid, 2, D(2024, 1, 1 + day, 8), "click", 1.0))
        eid += 1
    d = tmp_path / "cro"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp,"
        " event_type string, value double",
    ).write.parquet(str(d / "events.parquet"))

    r = resolve_query("events_croston_intermittent")(
        spark, str(d)
    ).collect()[0]
    assert (r["n_days"], r["n_demands"]) == (10, 3)
    # hand recursion: z0=4, p0=1 (first demand day 0, 0-based + 1)
    # day 2: z=.2*2+.8*4=3.6,  p=.2*2+.8*1=1.2
    # day 6: z=.2*8+.8*3.6=4.48, p=.2*4+.8*1.2=1.76
    assert r["z_size"] == 4.48
    assert r["p_interval"] == 1.76
    assert abs(r["croston_forecast"] - 4.48 / 1.76) < 1e-12
    assert abs(r["sba_forecast"] - 0.9 * (4.48 / 1.76)) < 1e-12
    assert Decimal("1") == Decimal("1")  # decimal import used above


def test_mase_eval_planted(spark, tmp_path):
    """events_forecast_mase_eval: on a clean weekly-periodic series
    both the HW model and the seasonal naive are near-perfect, with
    MASE well under 1 only when the model genuinely tracks a trend
    the naive misses; counts match hand-aligned windows."""
    from datetime import datetime as D

    from posts_vectorizer_spark.plans.registry import resolve_query

    # 4 weeks: weekly pattern + linear trend (HW tracks trend, the
    # seasonal naive is systematically off by the 7-day trend step)
    rows = []
    eid = 0
    pattern = [10, 12, 14, 12, 10, 5, 4]
    for day in range(28):
        n = pattern[day % 7] + day  # +1/day trend
        for _ in range(n):
            rows.append((eid, eid % 5, D(2024, 1, 1 + day, 12), "click", 1.0))
            eid += 1
    d = tmp_path / "mase"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp,"
        " event_type string, value double",
    ).write.parquet(str(d / "events.parquet"))

    r = resolve_query("events_forecast_mase_eval")(
        spark, str(d)
    ).collect()[0]
    assert r["n_fitted"] == 21          # HW fits days 7..27
    assert r["mae_naive"] == 7.0        # lag-7 error = the 7-day trend
    assert r["mase"] < 1.0              # the model beats persistence
    assert abs(r["mae_model"] - r["mase"] * r["mae_naive"]) < 1e-12


def test_nelson_aalen_planted_hazard(spark, tmp_path):
    """events_nelson_aalen on a planted censoring design: 4 users —
    two convert at day 2, one at day 5, one censored at the
    observation end — give hazard steps 2/4 and 1/2 and an exact
    cumulative of 1.0; every value is exact on the 9dp decimal grid
    (the KM factor device) and the censored user never emits a row."""
    from decimal import Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = []

    def ev(uid, day, typ):
        rows.append(
            (
                len(rows) + 1,
                f"2024-01-{day:02d} 12:00:00",
                uid,
                typ,
                1.0,
                "{}",
            )
        )

    for uid in (1, 2, 3, 4):
        ev(uid, 1, "view")          # entry day 1
    ev(1, 3, "purchase")            # t = 2
    ev(2, 3, "purchase")            # t = 2
    ev(3, 6, "purchase")            # t = 5
    ev(4, 8, "view")                # censored at obs end (day 8): t = 7
    d = tmp_path / "na"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props"
    ).write.parquet(str(d / "events.parquet"))

    out = {
        r["t_days"]: r
        for r in resolve_query("events_nelson_aalen")(
            spark, str(d)
        ).collect()
    }
    assert set(out) == {2, 5}
    assert (out[2]["n_at_risk"], out[2]["d_events"]) == (4, 2)
    assert (out[5]["n_at_risk"], out[5]["d_events"]) == (2, 1)
    assert out[2]["hazard"] == Decimal("0.500000000")
    assert out[2]["cum_hazard"] == Decimal("0.500000000")
    assert out[5]["hazard"] == Decimal("0.500000000")
    assert out[5]["cum_hazard"] == Decimal("1.000000000")


def test_logrank_planted_two_cohort_design(spark, tmp_path):
    """events_logrank_test on a hand-built 6-user design (3 per even/odd
    cohort, all entering day 1): cohort A (even uids) converts at t=2
    and t=5, cohort B (odd) converts at t=2 only, the rest censor at
    the day-8 observation end. Hand arithmetic: at t=2 (d=2, n_a=n_b=3)
    E=1.0, V=2*(3/6)*(3/6)*(4/5)=0.4; at t=5 (d=1, n_a=n_b=2) E=0.5,
    V=0.25 — O_a=2, E_a=1.5, V=0.65, z=0.5/sqrt(0.65), all exact on the
    9dp decimal grid."""
    import math
    from decimal import Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = []

    def ev(uid, day, typ):
        rows.append(
            (
                len(rows) + 1,
                f"2024-02-{day:02d} 09:00:00",
                uid,
                typ,
                1.0,
                "{}",
            )
        )

    for uid in (1, 2, 3, 4, 5, 6):
        ev(uid, 1, "view")          # all enter day 1
    ev(2, 3, "purchase")            # A converts, t = 2
    ev(1, 3, "purchase")            # B converts, t = 2
    ev(4, 6, "purchase")            # A converts, t = 5
    ev(6, 8, "view")                # obs end day 8; uids 3,5,6 censor t=7
    d = tmp_path / "lr"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props"
    ).write.parquet(str(d / "events.parquet"))

    out = resolve_query("events_logrank_test")(spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_users_a"], r["n_users_b"]) == (3, 3)
    assert r["observed_a"] == 2
    assert r["expected_a"] == Decimal("1.500000000")
    assert r["variance_sum"] == Decimal("0.650000000")
    assert r["z"] == 0.5 / math.sqrt(0.65)
    assert r["significant"] is False


def test_logrank_one_sided_cohort_yields_null_z(spark, tmp_path):
    """A degenerate design where every user lands in one cohort (all
    even uids): variance_sum pins to 0 (n_b=0 makes every V term 0)
    and z/significant are NULL, never a div-by-zero."""
    from decimal import Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = []
    for i, uid in enumerate((2, 4, 6)):
        rows.append(
            (i * 2 + 1, "2024-02-01 09:00:00", uid, "view", 1.0, "{}")
        )
        rows.append(
            (i * 2 + 2, "2024-02-03 09:00:00", uid, "purchase", 1.0, "{}")
        )
    d = tmp_path / "lr1"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props"
    ).write.parquet(str(d / "events.parquet"))

    out = resolve_query("events_logrank_test")(spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_users_a"], r["n_users_b"]) == (3, 0)
    assert r["observed_a"] == 3
    assert r["expected_a"] == Decimal("3.000000000")
    assert r["variance_sum"] == Decimal("0E-9")
    assert r["z"] is None and r["significant"] is None


def test_rmst_planted_textbook_area(spark, tmp_path):
    """events_rmst on the SAME hand-built cohort as the KM textbook
    test (6 users enter day 1; conversions at durations 2,2 and 4;
    3 censored at 10): the area under the KM step curve is exact on
    the decimal grid — rmst(2) = 1x2 = 2, rmst(4) = 2 + S(2)x2 =
    2 + 0.666666667x2 = 3.333333334, both as exact DECIMAL(28,9)."""
    from decimal import Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    rows, eid = [], 0
    convs = {0: 3, 1: 3, 2: 5}
    for u in range(6):
        rows.append((eid, "2024-01-01 08:00:00", u, "view", 1.0)); eid += 1
        if u in convs:
            rows.append(
                (eid, f"2024-01-{convs[u]:02d} 09:00:00", u, "purchase", 1.0)
            )
            eid += 1
    rows.append((eid, "2024-01-11 10:00:00", 0, "view", 1.0))  # obs end

    t = tmp_path / "rmst"
    t.mkdir()
    _events_typed(t, rows)

    out = {r["t_days"]: r for r in
           resolve_query("events_rmst")(spark, str(t)).collect()}
    assert set(out) == {2, 4}
    r2 = out[2]
    assert (r2["n_at_risk"], r2["d_events"]) == (6, 2)
    assert r2["survival"] == round(4 / 6, 9)
    # area 0..2 under S=1
    assert r2["rmst"] == Decimal("2.000000000")
    r4 = out[4]
    assert (r4["n_at_risk"], r4["d_events"]) == (4, 1)
    # S(4) = round(round(4/6,9) * 0.75, 9) = exactly 0.5 on the grid
    assert r4["survival"] == 0.5
    # area 0..4 = 2 + 0.666666667 * 2 (exact decimal segment)
    assert r4["rmst"] == Decimal("2.000000000") + Decimal(
        str(round(4 / 6, 9))
    ) * 2
    # monotone, and bounded by tau (the no-censor-before-tau sanity)
    assert Decimal("0") < r2["rmst"] < r4["rmst"] <= Decimal("4")


def test_theil_sen_outlier_immune_exact(spark, tmp_path):
    """events_theil_sen on a planted +2.5/day linear daily series with
    one wildly corrupted day: the median pairwise slope recovers the
    true trend EXACTLY on the decimal grid (an OLS fit would be pulled
    far off), and the even/odd median finalization is exact."""
    from decimal import Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    rows, eid = [], 0
    for day in range(1, 22):  # 21 days
        v = 10.0 + 2.5 * day
        if day == 11:
            v = 500.0  # the outlier day
        eid += 1
        rows.append((eid, f"2024-01-{day:02d} 12:00:00", 1, "view", v, "{}"))
    d = tmp_path / "ts"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props"
    ).write.parquet(str(d / "events.parquet"))

    r = resolve_query("events_theil_sen")(spark, str(d)).collect()[0]
    assert (r["n_days"], r["n_pairs"]) == (21, 210)
    # 20 of 21 days lie exactly on the +2.5 line, so >half of all pair
    # slopes equal 2.5 exactly -> the median is exactly 2.5
    assert r["slope_per_day"] == Decimal("2.500000000000")

    # exact replica incl. the sign-split 9dp lattice and median pick
    daily = {
        day: round((10.0 + 2.5 * day if day != 11 else 500.0) * 100)
        for day in range(1, 22)
    }
    days = sorted(daily)

    def s9(dy, dx):
        return (
            -((2 * -dy * 10**9 + dx) // (2 * dx))
            if dy < 0
            else (2 * dy * 10**9 + dx) // (2 * dx)
        )

    slopes = sorted(
        s9(daily[b] - daily[a], b - a)
        for i, a in enumerate(days)
        for b in days[i + 1:]
    )
    m = len(slopes)
    picks = sorted({(m + 1) // 2, (m + 2) // 2})
    msum = sum(slopes[p - 1] for p in picks)
    med10 = msum * (10 // len(picks))
    assert r["slope_per_day"] == Decimal(med10) / Decimal(10**12)


def test_binseg_locates_planted_level_shift(spark, tmp_path):
    """events_binseg_changepoint on a planted level shift: 10 days at
    100, then 10 days at 300 — the argmax split lands exactly on the
    boundary, segment means are exact 6dp grid points, and the gain
    ratio matches the closed form X²/(k(n−k)(nQ−S²)) on the lattice."""
    from decimal import Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    rows, eid = [], 0
    for day in range(1, 21):
        v = 100.0 if day <= 10 else 300.0
        eid += 1
        rows.append((eid, f"2024-01-{day:02d} 12:00:00", 1, "view", v, "{}"))
    d = tmp_path / "bs"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props"
    ).write.parquet(str(d / "events.parquet"))

    r = resolve_query("events_binseg_changepoint")(
        spark, str(d)
    ).collect()[0]
    assert (r["n_days"], r["split_idx"]) == (20, 10)
    # the pure two-level series: the split explains ALL variance
    assert r["gain_ratio"] == Decimal("1.000000000")
    assert r["mean_left"] == Decimal("100.000000")
    assert r["mean_right"] == Decimal("300.000000")

    # replica of the pinned lattice at the winning split
    yc = [10000] * 10 + [30000] * 10
    n, s, q = 20, sum(yc), sum(v * v for v in yc)
    p10 = sum(yc[:10])
    x = n * p10 - 10 * s
    den = 10 * (n - 10) * (n * q - s * s)
    r9 = (2 * x * x * 10**9 + den) // (2 * den)
    assert r["gain_ratio"] == Decimal(r9) / Decimal(10**9)


def test_runs_test_momentum_vs_alternation(spark, tmp_path):
    """events_runs_test: a momentum series (10 ups then 10 downs, 2
    runs) gives z far below 0; a strict alternation gives the maximum
    run count and z above 0; both match the closed-form mu/sigma/z on
    the exact counts."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    def write(d, deltas):
        rows, eid, v = [], 0, 1000.0
        rows.append((1, "2024-01-01 12:00:00", 1, "view", v, "{}"))
        for i, dv in enumerate(deltas, 2):
            v += dv
            rows.append(
                (i, f"2024-01-{i:02d} 12:00:00", 1, "view", v, "{}")
            )
        d.mkdir()
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id",
            "event_type", "value", "props"
        ).write.parquet(str(d / "events.parquet"))

    def z_ref(n_up, n_down, r):
        n = n_up + n_down
        mu = 1.0 + 2.0 * n_up * n_down / n
        sig = (
            2.0 * n_up * n_down * (2.0 * n_up * n_down - n)
            / (float(n) * n * (n - 1))
        ) ** 0.5
        return mu, sig, (r - mu) / sig

    write(tmp_path / "mom", [10.0] * 10 + [-10.0] * 10)
    r = resolve_query("events_runs_test")(
        spark, str(tmp_path / "mom")
    ).collect()[0]
    assert (r["n"], r["n_up"], r["n_down"], r["n_runs"]) == (20, 10, 10, 2)
    mu, sig, z = z_ref(10, 10, 2)
    assert (r["mu_runs"], r["sigma_runs"], r["z"]) == (mu, sig, z)
    assert r["z"] < -3

    write(tmp_path / "alt", [10.0, -10.0] * 10)
    r = resolve_query("events_runs_test")(
        spark, str(tmp_path / "alt")
    ).collect()[0]
    assert (r["n"], r["n_runs"]) == (20, 20)
    assert r["z"] > 3


def test_stream_theil_sen_drain_equals_batch(spark, tmp_path):
    """stream_theil_sen_drain's merged daily-cents state yields EXACTLY
    the batch Theil-Sen slope — day sums are additive, so the forced
    split cannot move a pairwise slope."""
    from decimal import Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    rows, eid = [], 0
    for day in range(1, 16):
        for k in range(3):  # several events per day, split across
            eid += 1        # batches by event_id parity
            rows.append(
                (eid, f"2024-01-{day:02d} {8 + k}:00:00", 1, "view",
                 float(day * 2 + k), "{}")
            )
    d = tmp_path / "tsd"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props"
    ).write.parquet(str(d / "events.parquet"))

    got = resolve_query("stream_theil_sen_drain")(spark, str(d)).collect()
    want = resolve_query("events_theil_sen")(spark, str(d)).collect()
    assert len(got) == len(want) == 1
    assert got[0].asDict() == want[0].asDict()
    # every day total rises by exactly 6.0 -> slope exactly 6
    assert got[0]["slope_per_day"] == Decimal("6.000000000000")


def test_cumulative_incidence_planted_competing_risks(spark, tmp_path):
    """events_cumulative_incidence on a hand-built 6-user cohort with
    both causes and a same-day tie (purchase wins): grid t=2
    (d_p=2, d_s=1, n=6) and t=4 (d_s=1, n=3); S, per-cause hazards,
    and both Aalen-Johansen CIFs verified exactly on the 9dp grid,
    and S + CIF_p + CIF_s telescopes to 1 within the term rounding."""
    from decimal import Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    rows, eid = [], 0
    for u in range(6):
        rows.append((eid, "2024-01-01 08:00:00", u, "view", 1.0)); eid += 1
    rows += [
        (90, "2024-01-03 09:00:00", 0, "purchase", 1.0),
        (91, "2024-01-03 09:00:00", 1, "signup", 1.0),
        (92, "2024-01-03 09:00:00", 2, "purchase", 1.0),
        (93, "2024-01-03 10:00:00", 2, "signup", 1.0),   # same-day tie
        (94, "2024-01-05 09:00:00", 3, "signup", 1.0),
        (95, "2024-01-11 10:00:00", 0, "view", 1.0),     # obs end
    ]
    t = tmp_path / "cif"
    t.mkdir()
    _events_typed(t, rows)

    out = {r["t_days"]: r for r in
           resolve_query("events_cumulative_incidence")(
               spark, str(t)
           ).collect()}
    assert set(out) == {2, 4}
    r2 = out[2]
    assert (r2["n_at_risk"], r2["d_purchase"], r2["d_signup"]) == (6, 2, 1)
    assert r2["survival"] == 0.5
    assert r2["cif_purchase"] == Decimal("0.333333333")
    assert r2["cif_signup"] == Decimal("0.166666667")
    r4 = out[4]
    assert (r4["n_at_risk"], r4["d_purchase"], r4["d_signup"]) == (3, 0, 1)
    # S(4) = round9(0.5 * round9(2/3)); CIF_s adds round9(0.5*round9(1/3))
    assert r4["survival"] == 0.333333334
    assert r4["cif_purchase"] == Decimal("0.333333333")
    assert r4["cif_signup"] == Decimal("0.333333334")
    # Aalen-Johansen telescoping: S + CIF_p + CIF_s = 1 (term rounding)
    total = (
        Decimal(repr(r4["survival"]))
        + r4["cif_purchase"]
        + r4["cif_signup"]
    )
    assert abs(total - 1) < Decimal("0.000001")
