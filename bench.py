#!/usr/bin/env python
"""Headline benchmark: run representative engine queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {"q": sec, ...}, "sf": ...}

Each query is forced end-to-end with the `noop` sink (full execution, no
driver-side collect bottleneck), timed wall-clock. `value` is the sum of all
query times — lower is better. Queries cover every operator family from
SURVEY.md §2: scan/filter, join+agg, windows, TF-IDF flagship, dedup,
similarity search, text analysis, event-time windows.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from posts_vectorizer_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

HEADLINE = [
    # flagship TF-IDF pipeline (scan -> tokenize -> TF -> join -> weighted sum)
    "tfidf_doc_vectors",
    "tfidf_idf_table",
    # relational core
    "rel_scan_filter_project",
    "rel_groupby_agg",
    "rel_join_broadcast_agg",
    "rel_window_topk_per_group",
    "rel_cube",
    # event-time windows
    "events_tumbling_window",
    "events_session_window",
    # LLM-pipeline extensions
    "dedup_exact_keep_first",
    "dedup_minhash_near_dups",
    "sim_cosine_topk",
    "text_quality_profile",
    # r8 widening (VERDICT r7 item 5): one query per newest operator
    # family so the contract tracks them — committed numbers from
    # tools/solo_floor.py converged floors + ~10%
    "rel_ddsketch_quantiles",      # sketch family
    "dedup_sorted_neighborhood",   # blocking family
    "events_funnel_attribution",   # attribution / range-join family
    # r9 widening (VERDICT r8 item 5): one query per newest family of
    # the r9 introduction wave, same solo-floor methodology
    "sim_dim_covariance",          # vector-stats family
    "text_kneser_ney_bigram",      # LM-scoring family
    "multimodal_png_ingest",       # real-codec family (compressed)
    # r10 widening (VERDICT r9 item 5): the heaviest r10-introduced
    # codec and one streaming sketch-maintenance drain, so the contract
    # tracks the ledgered-sink family; committed = solo_floor + ~10%
    "multimodal_gif_ingest",       # adaptive-dictionary LZW codec
    "stream_cms_drain",            # streaming sketch maintenance
    # r13 widening (VERDICT r12 item 4): the two heaviest r12-optimized
    # non-headline families move under driver measurement so their
    # claimed wins carry a driver artifact — the shingle prefix-filter
    # join (dedup family, r12: 29.8 -> 5.0 s) and the LSH-edge HITS
    # iteration (graph family, r12: 46.8 -> 14.5 s; r13 lineage-cut and
    # literal work brought both to ~3.5 s in-series). Additions only;
    # all 21 prior queries and bands kept.
    "dedup_prefix_filter_join",    # shingle prefix-filter join family
    "sim_hits_ann",                # iterative graph (LSH edge producer)
]


def force(df) -> int:
    """Fully execute a DataFrame without materializing rows on the driver."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def _stage_snapshot(spark) -> dict:
    """Completed-stage metrics keyed by (stageId, attemptId), read from the
    Spark UI REST API (the public face of the app status store). Lets the
    bench attribute wall-clock to executor task time / shuffle volume, so a
    regression caused by machine contention (task time flat, wall up) is
    distinguishable from a plan change (shuffle bytes or task time moved) —
    r2's +28% total was unexplainable without this."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return {}
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    try:
        with urllib.request.urlopen(url, timeout=5) as r:
            stages = json.load(r)
    except Exception:
        return {}
    return {(s["stageId"], s["attemptId"]): s for s in stages}


def _settled_snapshot(spark) -> dict:
    """Snapshot after the status store catches up (its listener queue is
    async w.r.t. job completion): poll until the key set is unchanged for
    TWO consecutive polls — one agreeing poll can race a still-draining
    listener queue and misattribute late stages to the next query."""
    snap = _stage_snapshot(spark)
    stable = 0
    for _ in range(20):
        time.sleep(0.05)
        nxt = _stage_snapshot(spark)
        if set(nxt) == set(snap):
            stable += 1
            if stable >= 2:
                return nxt
        else:
            stable = 0
        snap = nxt
    return snap


def _diff_metrics(before: dict, after: dict) -> dict:
    new = [s for k, s in after.items() if k not in before]
    return {
        "stages": len(new),
        "task_time_ms": sum(s.get("executorRunTime", 0) for s in new),
        # run time includes time blocked on broadcast/subquery futures —
        # CPU time is the actual-work signal when the two diverge
        "cpu_time_ms": sum(s.get("executorCpuTime", 0) for s in new) // 1_000_000,
        "input_bytes": sum(s.get("inputBytes", 0) for s in new),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in new),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in new),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Warm one-time session machinery (JIT/codegen compile, shuffle + writer
    # init, parquet footer reads) so the first timed query measures the
    # query, not session startup.
    force(spark.range(100_000).selectExpr("id % 97 AS k").groupBy("k").count())
    # pre-spawn the Python/Arrow workers the mapInPandas queries reuse
    force(
        spark.range(1024, numPartitions=32).mapInPandas(
            lambda it: it, "id long"
        )
    )
    # Full-scan (not limit-N) warmup: loads the OS page cache and decodes
    # every row group once, so the first timed query measures the query,
    # not a cold VM's first read of the files. The tables total a few
    # hundred MB at sf0.1 — cheap relative to one mistimed query.
    from posts_vectorizer_spark.sources import load_table
    for t in ("documents", "embeddings", "lineitem", "orders", "events"):
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            force(load_table(spark, sf_dir, t))

    from posts_vectorizer_spark.cache import release_caches

    timings: dict[str, float] = {}
    metrics: dict[str, dict] = {}
    snap = _settled_snapshot(spark)
    for name in HEADLINE:
        fn = queries[name]
        # best-of-3: the first run pays per-query whole-stage-codegen JIT
        # compile (a per-process cost, amortized away on any long-lived
        # deployment) plus scheduler noise, and on a freshly booted VM the
        # C2 compiler can still be busy during the SECOND run (observed:
        # 9.2s / 6.7s / 2.6s for the same flagship query back-to-back);
        # the min is the stable signal. Stage metrics recorded for the
        # best run.
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            elapsed = time.perf_counter() - t0
            release_caches()  # per-query caches don't outlive their run
            after = _settled_snapshot(spark)
            if elapsed < best:
                best = elapsed
                metrics[name] = _diff_metrics(snap, after)
            snap = after
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    emit(timings, metrics, total, sf)


def headline_line(timings: dict[str, float], total: float, sf: float) -> str:
    """The ONE stdout line the driver tail-parses. Kept as a function so
    tests can pin the <1 KB contract (r3's BENCH artifact was lost to a
    2.6 KB line overflowing the driver's ~2000-byte tail capture)."""
    return json.dumps({
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    })


def emit(timings: dict, metrics: dict, total: float, sf: float) -> None:
    # Stage metrics go to stderr + a sidecar file, NEVER into the stdout
    # headline line: the driver's tail capture is ~2000 bytes, and r3's
    # inlined metrics pushed the line to 2.6 KB, making BENCH_r03 unparseable.
    # The final stdout line must stay compact (<1 KB) and be the LAST line.
    sidecar = os.path.join(REPO, "BENCH_STAGES.json")
    try:
        with open(sidecar, "w") as f:
            json.dump({str(k): v for k, v in metrics.items()}, f, indent=1)
    except OSError:
        pass
    print(json.dumps({"stage_metrics": metrics}), file=sys.stderr)
    print(headline_line(timings, total, sf))


if __name__ == "__main__":
    main()
