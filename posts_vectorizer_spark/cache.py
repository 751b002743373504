"""Tracked persists — fix for the leaked-cache anti-pattern (VERDICT r1 #5).

Plan builders persist mid-plan relations (token_base, shingle sets, band
frames) because several branches of ONE query reuse them; that cache must
stay alive until the query's action runs, so builders can't unpersist it
themselves. Instead every engine persist registers here and the caller that
drove the action releases it: bench.py after each timed query,
tools/oracle_check.py after each comparison, tests via the
``release_caches`` helper. A long-lived session therefore holds cached data
only for queries in flight, not for every query ever built.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# entries: (DataFrame, checkpointed JavaRDD or None). The JavaRDD is
# captured for localCheckpoint'ed frames because DataFrame.unpersist()
# cannot release them (see checkpoint_tracked).
_TRACKED: list[tuple[DataFrame, object]] = []

# Throwaway scratch directories (drain state/checkpoints, roundtrip
# copies) registered by sources.catalog.scratch_dir — deleted by the
# same release_caches() sweep that frees the query's caches, so a full
# bench/test session no longer accumulates tmpfs directories (r12
# ADVICE). Like checkpointed frames, a released scratch dir must not be
# read again: callers rebuild their query (and its scratch) per run.
_SCRATCH: list[str] = []


def scratch_tracked(path: str) -> str:
    """Register a scratch directory for deletion at release_caches()."""
    _SCRATCH.append(path)
    return path


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register for later release."""
    df.persist()
    _TRACKED.append((df, None))
    return df


def checkpoint_tracked(df: DataFrame, eager: bool = False) -> DataFrame:
    """localCheckpoint() + register the checkpointed frame for release.

    Use instead of :func:`persist_tracked` when downstream consumers are
    MANY and the producer's lineage is LARGE: a persist caches the data
    but every consumer still carries (and re-plans) the full analyzed
    tree — for an unrolled iteration over an expensive producer the
    driver-side optimizer/AQE cost of those re-plans dominated wall clock
    (r12: sim_hits_ann spent ~85 of 90 s OFF-task in planning; guide §5
    names localCheckpoint as the lineage cut). localCheckpoint
    materializes the rows once and replaces the subtree with a leaf —
    results are unchanged; fault tolerance of the intermediate is
    irrelevant for these self-contained analytic queries. Lazy by
    default (eager is paid at the first action, like persist);
    ``eager=True`` is for driver-looped fixpoints that consume the
    frame immediately (connected_components) — same release contract.

    Release (r13, the r12 ADVICE fix): ``DataFrame.unpersist()`` is a
    no-op on a checkpointed frame — its LogicalRDD leaf is not in the
    CacheManager, so the MEMORY_AND_DISK blocks of the checkpointed RDD
    previously lived until JVM GC + ContextCleaner collected them,
    accumulating executor storage across a long session. The underlying
    RDD is a field of the LogicalRDD leaf; we capture it here and
    release_caches() unpersists it explicitly."""
    out = df.localCheckpoint(eager=eager)
    try:
        # analyzed plan of a checkpointed Dataset IS the LogicalRDD leaf;
        # its .rdd() field is the exact RDD localCheckpoint persisted
        jrdd = out._jdf.queryExecution().analyzed().rdd()
    except Exception:  # internals moved — degrade to the GC-eventual path
        jrdd = None
    _TRACKED.append((out, jrdd))
    return out


def release_caches() -> int:
    """Unpersist every tracked cache (safe mid-query for persists: Spark
    falls back to recompute; checkpointed RDDs are only ever released
    between queries by the bench/oracle/test drivers). Returns the number
    released."""
    n = 0
    while _TRACKED:
        df, jrdd = _TRACKED.pop()
        try:
            df.unpersist()
            if jrdd is not None:
                jrdd.unpersist(False)
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    import shutil

    while _SCRATCH:
        shutil.rmtree(_SCRATCH.pop(), ignore_errors=True)
    return n
