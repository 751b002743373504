"""Event-analytics wave tests that don't fit an earlier module: crafted
semantic scenarios for the staged attribution operator (r7)."""

from __future__ import annotations

def test_funnel_attribution_crafted(spark, tmp_path):
    """events_funnel_attribution (staged r7) hand-checkable scenario: two
    purchases share a click+view history inside the 3-day lookback (the
    view is latest both times -> all last-touch credit; linear splits
    1/2 each), a boundary touch exactly at conv_ts - 3d is INCLUDED
    (closed window), a conversion with no touches takes no credit, and a
    stale touch outside the lookback attributes nothing."""
    import datetime as dt

    from posts_vectorizer_spark.plans.registry import resolve_query

    D = dt.datetime
    rows = [
        # user 1: click e1, view e2, purchases c1/c2
        (1, 1, D(2024, 1, 10, 12), "click", 1.0),
        (2, 1, D(2024, 1, 11, 12), "view", 1.0),
        (100, 1, D(2024, 1, 12, 12), "purchase", 9.0),
        (101, 1, D(2024, 1, 13, 12), "purchase", 9.0),  # e1 on the boundary
        # user 2: naked purchase
        (102, 2, D(2024, 1, 12, 12), "purchase", 9.0),
        # user 3: touch far outside any lookback
        (5, 3, D(2024, 1, 1, 12), "click", 1.0),
        (103, 3, D(2024, 1, 20, 12), "purchase", 9.0),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp,"
        " event_type string, value double",
    ).write.parquet(str(tmp_path / "events.parquet"))

    out = {
        r["event_type"]: r
        for r in resolve_query("events_funnel_attribution")(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {"click", "view"}
    c, v = out["click"], out["view"]
    assert c["n_touch_assignments"] == 2 and v["n_touch_assignments"] == 2
    assert c["n_conversions_reached"] == 2 and v["n_conversions_reached"] == 2
    assert c["last_touch_conversions"] == 0
    assert v["last_touch_conversions"] == 2
    assert c["linear_credit"] == 1.0 and v["linear_credit"] == 1.0


def test_funnel_attribution_credit_conservation(spark):
    """Attribution models must CONSERVE credit: each touched conversion
    hands out exactly 1.0 under last-touch (one rk==1 row) and exactly
    1.0 under linear (n * 1/n). So across all touch types, the two
    models' totals must agree with each other (within the 1e-8-grid
    rounding of 1/n) — the invariant that catches double-counting or
    dropped conversions in either window."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import SF_ORACLE

    rows = resolve_query("events_funnel_attribution")(
        spark, SF_ORACLE
    ).collect()
    assert rows, "fixture has purchases with preceding touches"
    last_total = sum(r["last_touch_conversions"] for r in rows)
    linear_total = sum(r["linear_credit"] for r in rows)
    assert last_total > 0
    assert abs(linear_total - last_total) < 1e-4 * last_total
