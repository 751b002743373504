"""Boundary-semantics golden test for the binned range join
(plans/queries_advanced.py::events_range_join_clicks). The oracle check
proves value parity on the fixture; this pins the exact window edges —
[ts - 10min, ts) — and the cross-bucket probe, on a corpus built to hit
them."""

from __future__ import annotations

import datetime as dt

import __spark_entry__ as E


def _ev(eid, ts, uid, etype):
    return (eid, ts, uid, etype, 1.0, "{}")


def test_range_join_window_edges(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        _ev(100, t0, 1, "error"),
        # exactly ts - 10min: inclusive lower edge, and lives in the
        # PREVIOUS 10-min bucket — only reachable via the second probe bin
        _ev(1, t0 - 10 * m, 1, "click"),
        _ev(2, t0 - 5 * m, 1, "click"),          # interior hit
        _ev(3, t0, 1, "click"),                  # exactly ts: excluded
        _ev(4, t0 - 10 * m - m / 60, 1, "click"),  # 10m01s before: excluded
        _ev(5, t0 - 5 * m, 2, "click"),          # other user: excluded
        _ev(200, t0 + 30 * m, 2, "error"),       # error with zero clicks
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r["event_id"]: r["clicks_10m"]
        for r in E.queries()["events_range_join_clicks"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {100: 2, 200: 0}
