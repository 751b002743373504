"""Tests for the transformWithState (v2) timer-debounce operator.

The pure burst-fold is tested directly against the BATCH
events_debounce_bursts result — the processor's only nontrivial logic,
exercised with no cluster and no protobuf. The end-to-end drain
importorskips protobuf (absent in this container — documented env gate).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from posts_vectorizer_spark.streaming.stateful_v2 import (
    GAP_MS_DEFAULT,
    _burst_fold,
    _require_protobuf,
)
from tests.conftest import SF_SMOKE


def test_burst_fold_matches_batch_debounce(spark):
    """Folding each user's full event list through _burst_fold must yield
    exactly the batch query's bursts (closed + the final open one)."""
    from posts_vectorizer_spark.sources import load_table

    events = {}
    for r in (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    ):
        events.setdefault(r["user_id"], []).append(
            (int(r["ts"].timestamp() * 1e9), r["event_id"])
        )
    folded = {}
    for uid, evs in events.items():
        st, closed = _burst_fold(None, evs, GAP_MS_DEFAULT)
        for c in closed + [st]:
            folded[(uid, c[1])] = c[3] - 1  # kept_event_id -> n_suppressed
    batch = {
        (r["user_id"], r["kept_event_id"]): r["n_suppressed"]
        for r in E.queries()["events_debounce_bursts"](
            spark, SF_SMOKE
        ).collect()
    }
    assert folded == batch


def test_burst_fold_exact_gap_extends():
    """The session_window boundary rule: diff == gap extends, > gap splits;
    and incremental folds (micro-batches) equal one whole fold."""
    gap_ms = 1000
    gap_ns = gap_ms * 1_000_000
    evs = [(0, 10), (gap_ns, 11), (2 * gap_ns + 1, 12)]
    st, closed = _burst_fold(None, evs, gap_ms)
    assert closed == [(0, 10, gap_ns, 2)]
    assert st == (2 * gap_ns + 1, 12, 2 * gap_ns + 1, 1)
    st1, c1 = _burst_fold(None, evs[:1], gap_ms)
    st2, c2 = _burst_fold(st1, evs[1:], gap_ms)
    assert (st2, c1 + c2) == (st, closed)


def test_gate_raises_clearly_without_protobuf():
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="protobuf"):
            _require_protobuf()
    else:
        _require_protobuf()


def test_debounce_drain_end_to_end(spark, tmp_path):
    """Full drain (only where protobuf exists): emitted bursts equal the
    batch bursts restricted to the watermark horizon."""
    pytest.importorskip("google.protobuf")
    import datetime

    from posts_vectorizer_spark.sources import load_table
    from posts_vectorizer_spark.streaming.stateful_v2 import (
        debounce_stream_v2,
    )

    e = load_table(spark, SF_SMOKE, "events").select(
        "ts", "user_id", "event_id"
    )
    src = str(tmp_path / "in")
    e.coalesce(1).write.parquet(src)
    q = debounce_stream_v2(
        spark,
        src,
        e.schema,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["kept_event_id"]): r["n_suppressed"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    max_ts = e.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=7)
    batch = E.queries()["events_debounce_bursts"](spark, SF_SMOKE)
    last = batch.join(
        batch.groupBy("user_id").agg(
            F.max("burst_start").alias("burst_start")
        ),
        ["user_id", "burst_start"],
    )
    # every non-final burst must be emitted; final bursts only if closed
    for r in batch.collect():
        key = (r["user_id"], r["kept_event_id"])
        is_final = (r["user_id"], r["burst_start"]) in {
            (x["user_id"], x["burst_start"]) for x in last.collect()
        }
        if not is_final or r["burst_start"] <= horizon:
            assert key in got and got[key] == r["n_suppressed"]
