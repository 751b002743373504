"""SparkSession construction tuned for this engine.

Local mode is a single JVM (`local[N]`); on a real cluster the same settings
hold except memory sizing moves to executor configs. AQE is kept on so joins
re-plan to broadcast at runtime and skewed shuffle partitions get split
(the token->embedding join is Zipfian — SURVEY.md §7.4-5).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "posts-vectorizer-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Notes on choices:
    - ``spark.sql.adaptive.enabled``: runtime re-planning (broadcast joins,
      partition coalescing, skew-join splitting) — our substitute for the
      reference's hand-tuned batching (SURVEY.md §4 O4/O5).
    - shuffle partitions default to the core count: at local scale 200 is pure
      overhead; at cluster scale callers pass an explicit value sized so each
      partition holds ~128MB of shuffle data.
    - session timezone pinned UTC so timestamp semantics match the DuckDB
      oracle and are stable across environments.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "32"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate re-derives `size(e) > 0 AND isnotnull(e)`
        # for every explode and then predicate pushdown INLINES the
        # generator's child expression into that filter below any exchange.
        # For this engine's explodes — computed arrays of portable-hash
        # folds (shingles, n-grams, bigrams) — that re-evaluates the most
        # expensive expression in the plan up to twice more, single-task
        # when pushed below a spread rebalance (r12 profile:
        # dedup_decontaminate spent 18.6 s of 19.9 s in one pushed-down
        # filter). The inferred filters are semantically redundant (the
        # explode itself drops empty/null arrays), so excluding the rule
        # never changes results. Runtime-settable; prep_session repins it
        # for driver-owned sessions.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # local[N] hosts driver AND all executor threads in ONE JVM, so this
        # is the whole-engine heap. 8g forced concurrent full GCs mid-query
        # under 32 threads (observed: identical bench queries swinging 2-3x
        # run-to-run; 24g removed the swings entirely — 8.7s vs 24.4s
        # headline total on the same warm machine). On a real cluster this
        # moves to spark.executor.memory.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def prep_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf the engine relies on to an EXISTING session.

    The correctness driver hands us its own SparkSession; these are the only
    settings our queries depend on that can be flipped at runtime. Everything
    else in the engine is written to be ANSI-safe (guarded divisions, no
    failing casts) so it runs identically under ANSI on or off.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # See get_spark: stops redundant inferred explode filters from
    # re-evaluating expensive computed arrays below exchanges. Purely an
    # optimizer exclusion — results are unchanged by construction. MERGED
    # into any exclusions the session owner already set (r12 ADVICE: a
    # plain overwrite would silently drop the driver's own exclusions).
    _rule = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    try:
        existing = spark.conf.get("spark.sql.optimizer.excludedRules")
    except Exception:
        existing = None
    rules = [r.strip() for r in (existing or "").split(",") if r.strip()]
    if _rule not in rules:
        rules.append(_rule)
    spark.conf.set("spark.sql.optimizer.excludedRules", ",".join(rules))
    return spark
