#!/usr/bin/env python
"""Per-stage wall-clock profile of one query: run it once (after bench-style
warmups), then print each completed stage's duration, task count, task time,
CPU time, and shuffle bytes in submission order — shows where the critical
path actually goes (scheduling gaps show up as submit[i+1] - complete[i]).

    python tools/stage_profile.py tfidf_doc_vectors
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import force  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(argv: list[str]) -> int:
    import __spark_entry__ as entrymod
    from posts_vectorizer_spark.cache import release_caches
    from posts_vectorizer_spark.session import get_spark

    spark = get_spark("stage-profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    force(spark.range(100_000).selectExpr("id % 97 AS k").groupBy("k").count())
    force(spark.range(1024, numPartitions=32).mapInPandas(lambda it: it, "id long"))

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=5) as r:
            return json.load(r)

    for name in argv:
        fn = queries[name]
        # two warm runs, then the profiled run
        for _ in range(2):
            force(fn(spark, SF_DIR))
            release_caches()
        before = {(s["stageId"], s["attemptId"]) for s in stages()}
        t0 = time.perf_counter()
        force(fn(spark, SF_DIR))
        wall = time.perf_counter() - t0
        release_caches()
        time.sleep(0.4)
        new = [
            s for s in stages() if (s["stageId"], s["attemptId"]) not in before
        ]
        new.sort(key=lambda s: s["submissionTime"])
        print(f"== {name}: wall {wall:.3f}s, {len(new)} stages ==")
        prev_complete = None
        for s in new:
            sub = s["submissionTime"]
            comp = s["completionTime"]
            gap = ""
            if prev_complete is not None:
                # ISO strings sort/compare fine; show raw for eyeballing
                gap = f" gap_after_prev={sub > prev_complete}"
            prev_complete = comp
            print(
                f"  stage {s['stageId']:>4} dur={s.get('executorRunTime',0):>6}ms"
                f" cpu={s.get('executorCpuTime',0)//1_000_000:>6}ms"
                f" tasks={s.get('numCompleteTasks'):>3}"
                f" in={s.get('inputBytes',0):>9}"
                f" sw={s.get('shuffleWriteBytes',0):>8}"
                f" sub={sub[17:]} comp={comp[17:]}"
                f"{gap}"
                f" [{(s.get('name') or '')[:60]}]"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:] or ["tfidf_doc_vectors"]))
