#!/usr/bin/env python
"""Wall-clock sweep of EVERY registered query (noop-sink forced, one timed
run after one warm run) — the r12 optimization round's coverage instrument:
rank every operator path by cost so optimization effort follows measurement
(guide §1), and document the long tail honestly.

    python tools/time_all.py [out.json]        # default /tmp/time_all.json
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_TIME_ALL_WARM=0 python tools/time_all.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import force  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(argv: list[str]) -> int:
    out_path = argv[0] if argv else "/tmp/time_all.json"
    warm = os.environ.get("SPARK_GRAFT_TIME_ALL_WARM", "1") != "0"

    import __spark_entry__ as entrymod
    from posts_vectorizer_spark.cache import release_caches
    from posts_vectorizer_spark.session import get_spark

    spark = get_spark("time-all")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    force(spark.range(100_000).selectExpr("id % 97 AS k").groupBy("k").count())
    force(spark.range(1024, numPartitions=32).mapInPandas(lambda it: it, "id long"))

    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    for i, (name, fn) in enumerate(queries.items()):
        try:
            if warm:
                force(fn(spark, SF_DIR))
                release_caches()
            t0 = time.perf_counter()
            force(fn(spark, SF_DIR))
            results[name] = round(time.perf_counter() - t0, 3)
            release_caches()
        except Exception:
            errors[name] = traceback.format_exc(limit=1)
            release_caches()
        if (i + 1) % 25 == 0:
            print(f"...{i + 1}/{len(queries)}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump({"sf_dir": SF_DIR, "timings": results, "errors": errors}, f, indent=1)
    for name, sec in sorted(results.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{sec:8.3f}  {name}")
    print(f"total {sum(results.values()):.1f}s over {len(results)} queries; "
          f"{len(errors)} errors -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
