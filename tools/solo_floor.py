"""Solo converged-floor profile of one or more bench queries.

The SCALE.md r6 sub-second post-mortem methodology, packaged: run each
named query N times back-to-back in an otherwise idle session (same
warmups as bench.py), print every iteration's wall + stage-delta metrics
(task/cpu/shuffle), and report the CONVERGED FLOOR (min of the last
`floor_k` iterations, after tiered-JIT has finished compiling the
codegen'd paths). Distinguishes the three regression classes:

  - JIT-position artifact: early iterations slow, floor <= committed,
    stage metrics flat across iterations;
  - machine contention: wall up, task_time ~ flat, cpu_time ~ flat;
  - real plan/code regression: floor > committed, cpu_time or shuffle
    bytes moved vs the committed profile.

Usage:
    python tools/solo_floor.py tfidf_doc_vectors tfidf_idf_table
    SPARK_GRAFT_SOLO_N=20 python tools/solo_floor.py tfidf_doc_vectors
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _diff_metrics, _settled_snapshot, force  # noqa: E402


def main(argv: list[str]) -> int:
    names = argv or ["tfidf_doc_vectors", "tfidf_idf_table"]
    n_iter = int(os.environ.get("SPARK_GRAFT_SOLO_N", "15"))
    floor_k = max(3, n_iter // 3)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from posts_vectorizer_spark.cache import release_caches
    from posts_vectorizer_spark.session import get_spark
    from posts_vectorizer_spark.sources import load_table

    spark = get_spark("solo-floor", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # bench.py's session warmups, so iteration 1 starts where the bench does
    force(spark.range(100_000).selectExpr("id % 97 AS k").groupBy("k").count())
    force(spark.range(1024, numPartitions=32).mapInPandas(lambda it: it, "id long"))
    for t in ("documents", "embeddings", "lineitem", "orders", "events"):
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            force(load_table(spark, sf_dir, t))

    committed = {}
    base_path = os.path.join(REPO, "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            committed = json.load(f).get("queries", {})

    report = {}
    for name in names:
        fn = queries[name]
        walls, cpus, tasks, shuf = [], [], [], []
        snap = _settled_snapshot(spark)
        for i in range(n_iter):
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            wall = time.perf_counter() - t0
            release_caches()
            after = _settled_snapshot(spark)
            d = _diff_metrics(snap, after)
            snap = after
            walls.append(round(wall, 3))
            cpus.append(d["cpu_time_ms"])
            tasks.append(d["task_time_ms"])
            shuf.append(d["shuffle_write_bytes"])
            print(
                f"{name} iter {i + 1:2d}: wall={wall:6.3f}s "
                f"task={d['task_time_ms']:7d}ms cpu={d['cpu_time_ms']:7d}ms "
                f"shufW={d['shuffle_write_bytes']:10d}",
                file=sys.stderr,
            )
        floor = min(walls[-floor_k:])
        report[name] = {
            "walls": walls,
            "floor_sec": floor,
            "committed_sec": committed.get(name),
            "floor_vs_committed": (
                round(floor / committed[name], 3) if name in committed else None
            ),
            "cpu_ms_last": cpus[-1],
            "cpu_ms_first": cpus[0],
            "shuffle_write_bytes_last": shuf[-1],
        }
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
