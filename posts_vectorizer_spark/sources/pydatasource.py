"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource`) — the
engine-native way to add a NEW connector without JVM code, used here to
model the reference's "posts arriving from an external system" ingest
(`/root/reference/worker.py:96-108` polls MongoDB; the batch loader
`/root/reference/tfidf-calculator/enter_wordvecs.py:28-44` iterates an
in-memory model): a planned, partitioned, filter-pushdown-capable source
instead of a driver-side loop.

The source is SYNTHETIC and fully deterministic: row ``i`` is a pure
integer function of ``i``, so (a) every partition generates independently
— true parallel planning, no shared cursor; and (b) the exact same table
is expressible in DuckDB via ``generate_series`` — which makes a custom
*connector* oracle-checkable, something a real network source can never
be (compare `source_python_datasource` in plans/queries_pipeline.py).

Scale notes: `partitions()` splits the id range evenly — the planner sees
one InputPartition per slice, so a 1000-executor cluster reads 1000
slices concurrently. `pushFilters` consumes ``post_id`` range predicates
(GreaterThan[OrEqual] / LessThan[OrEqual] / EqualTo) by narrowing the
generated range BEFORE planning — the Python-source equivalent of
parquet row-group pruning: filtered scans generate fewer rows, not the
same rows later discarded (asserted by tests/test_pydatasource.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,  # noqa: F401  (re-export for discoverability)
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    pass

SOURCE_NAME = "synthetic_posts"
SCHEMA_DDL = "post_id bigint, author string, body string, score double"

# mixing constants for the score column (Knuth multiplicative hash mod a
# prime) — exact in int64 on both engines
_SCORE_MULT = 2654435761
_SCORE_MOD = 1000003


def row_of(i: int) -> tuple[int, str, str, float]:
    """The pure generator formula. Kept in ONE place so the reader, the
    stream reader, and the tests share it; the DuckDB oracle re-states it
    in SQL (see ORACLE_ROW_SQL)."""
    return (
        i,
        f"user_{i % 97}",
        "x" * ((i * 37) % 280 + 1),
        ((i * _SCORE_MULT) % _SCORE_MOD) / 1000.0,
    )


# the same formula in DuckDB SQL over a generate_series alias `i`
ORACLE_ROW_SQL = f"""
  SELECT i AS post_id,
         'user_' || CAST(i % 97 AS VARCHAR) AS author,
         repeat('x', CAST((i * 37) % 280 + 1 AS INT)) AS body,
         CAST((i * {_SCORE_MULT}) % {_SCORE_MOD} AS DOUBLE) / 1000.0 AS score
"""


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int  # exclusive


class SyntheticPostsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.lo = 0
        self.hi = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume post_id range predicates by narrowing [lo, hi); yield
        everything else back to Spark to evaluate post-scan."""
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if col == "post_id" and isinstance(getattr(f, "value", None), int):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                    continue
            yield f

    def partitions(self) -> list[_RangePartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, min(self.n_partitions, hi - lo or 1))
        step = (hi - lo + n - 1) // n if hi > lo else 1
        return [
            _RangePartition(s, min(s + step, hi))
            for s in range(lo, hi, step)
        ] or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield row_of(i)


class SyntheticPostsStreamReader(SimpleDataSourceStreamReader):
    """Finite micro-batch twin: each trigger emits the next
    ``batch_size`` ids until ``n_rows`` is exhausted, then empty batches.
    Offsets are plain id watermarks, so `readBetweenOffsets` replays any
    batch exactly (the formula is pure) — at-least-once redelivery is
    byte-identical, which is what makes the drain deterministic."""

    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 1000))
        self.batch_size = int(options.get("batch_size", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch_size, self.n_rows)
        return iter([row_of(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([row_of(i) for i in range(start["next"], end["next"])])


class SyntheticPostsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> SyntheticPostsReader:
        return SyntheticPostsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SyntheticPostsStreamReader:
        return SyntheticPostsStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "PostsLedgerWriter":
        return PostsLedgerWriter(self.options, overwrite)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> "PostsLedgerStreamWriter":
        return PostsLedgerStreamWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent session registration."""
    spark.dataSource.register(SyntheticPostsDataSource)


# ---------------------------------------------------------------------------
# Writer half (S4 as a custom PYTHON sink): manifest-commit parquet ledger
# ---------------------------------------------------------------------------

@dataclass
class LedgerCommit(WriterCommitMessage):
    file: str
    rows: int
    # per-numeric-column [min, max] over the file's rows; None when the
    # file is empty or stats weren't collected (absent stats = no pruning)
    stats: dict | None = None
    # dead-letter half: rows failing the writer's expectations land in a
    # separate quarantine file instead of poisoning the table or failing
    # the job (empty string / 0 when everything passed)
    quarantine_file: str = ""
    quarantine_rows: int = 0


def _quarantine_of(messages) -> dict:
    return {
        "files": [
            m.quarantine_file
            for m in messages
            if m is not None and getattr(m, "quarantine_file", "")
        ],
        "rows": sum(
            getattr(m, "quarantine_rows", 0)
            for m in messages
            if m is not None
        ),
    }


def _merge_quarantine(prev: dict, new: dict) -> dict:
    old = prev.get("quarantine", {"files": [], "rows": 0})
    return {
        "files": old["files"] + new["files"],
        "rows": old["rows"] + new["rows"],
    }


def _swap_manifest(path: str, manifest: dict) -> None:
    """Atomic manifest swap via a writer-unique temp name (a shared .tmp
    name would let two concurrent swappers truncate each other's
    half-written temp; the final os.replace stays last-writer-wins).

    Every swap also bumps ``version`` and leaves the superseded state
    behind as ``_LEDGER_MANIFEST.v{N}.json`` — the snapshot history that
    makes time travel (``read_ledger(version=N)``) a pure manifest
    lookup. Old-version FILES live until vacuum's retention window
    passes, exactly Delta's model: travel beyond retention may 404."""
    import json
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    manifest = dict(manifest)
    manifest["version"] = int(manifest.get("version", 0)) + 1
    head = os.path.join(path, PostsLedgerWriter.MANIFEST)
    snap = os.path.join(
        path, f"{PostsLedgerWriter.MANIFEST}.v{manifest['version']}.json"
    )
    for target in (snap, head):
        tmp = os.path.join(
            path, f"{PostsLedgerWriter.MANIFEST}.{uuid.uuid4().hex}.tmp"
        )
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, target)


def _merge_minmax(acc: dict, batch) -> None:
    """Fold one Arrow batch's numeric min/max into ``acc`` in place.

    Float columns containing NaN are POISONED (``acc[name] = None``,
    never resurrected): pc.min_max ignores NaN while Spark orders NaN
    above every number, so a NaN-blind range could prune a file whose
    NaN rows satisfy the predicate. No stats = never pruned = safe."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for field in batch.schema:
        if not (pa.types.is_integer(field.type) or pa.types.is_floating(field.type)):
            continue
        name = field.name
        if name in acc and acc[name] is None:
            continue  # poisoned by an earlier NaN batch
        col = batch.column(name)
        if pa.types.is_floating(field.type) and pc.any(
            pc.is_nan(col)
        ).as_py():
            acc[name] = None
            continue
        mm = pc.min_max(col)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is None:  # all-null column in this batch
            continue
        prev = acc.get(name)
        if prev is None:
            acc[name] = [lo, hi]
        else:
            acc[name] = [min(prev[0], lo), max(prev[1], hi)]


class PostsLedgerWriter(DataSourceArrowWriter):
    """Two-phase-commit parquet sink in pure Python (Spark 4
    DataSourceArrowWriter — tasks hand the sink Arrow RecordBatches, no
    Row objects): each task writes ONE parquet file under a name unique
    to its task ATTEMPT, and the driver-side commit() makes the winning
    attempts visible by writing the manifest. THE MANIFEST IS THE COMMIT:
    readers resolve files through it, so uncommitted/failed/speculative
    attempt files are invisible without any rename or delete — the
    object-store-safe committer pattern (renames aren't atomic on S3-like
    stores; a manifest pointer swap is). abort() best-effort deletes; a
    leaked orphan is garbage, never data corruption.

    Mirrors the reference's bulk upsert sink contract (worker.py:123-124
    `bulk_write(ordered=False)` + at-least-once batches): task retries
    re-write under a new attempt name and the commit picks exactly one."""

    MANIFEST = "_LEDGER_MANIFEST.json"

    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("posts ledger sink requires a path")
        self.path = path
        self.overwrite = overwrite
        # dead-letter expectations: rows with a NULL in any listed column
        # are quarantined instead of committed (or failing the job) —
        # the ingest keeps flowing, the bad rows stay inspectable
        req = options.get("require_not_null", "")
        self.require_not_null = [c for c in req.split(",") if c]

    def _split_valid(self, batch):
        """(valid, invalid) halves of a batch under the expectations."""
        import pyarrow.compute as pc

        if not self.require_not_null:
            return batch, None
        bad = None
        for col in self.require_not_null:
            isnull = pc.is_null(batch.column(col))
            bad = isnull if bad is None else pc.or_(bad, isnull)
        if not pc.any(bad).as_py():
            return batch, None
        return batch.filter(pc.invert(bad)), batch.filter(bad)

    def write(self, iterator) -> LedgerCommit:
        import contextlib
        import os

        import pyarrow.parquet as pq
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        stem = f"{ctx.partitionId():05d}-a{ctx.taskAttemptId()}"
        fname = f"part-{stem}.parquet"
        qname = f"quarantine-{stem}.parquet"
        # stream batches straight into one parquet file — memory stays
        # bounded by a batch, never the partition (the committer claim
        # is only honest if a multi-GB partition can't OOM the worker)
        writer, rows, stats = None, 0, {}
        qwriter, qrows = None, 0
        try:
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                good, bad = self._split_valid(batch)
                if bad is not None and bad.num_rows > 0:
                    if qwriter is None:
                        qwriter = pq.ParquetWriter(
                            os.path.join(self.path, qname), bad.schema
                        )
                    qwriter.write_batch(bad)
                    qrows += bad.num_rows
                if good.num_rows == 0:
                    continue
                if writer is None:
                    writer = pq.ParquetWriter(
                        os.path.join(self.path, fname), good.schema
                    )
                writer.write_batch(good)
                rows += good.num_rows
                _merge_minmax(stats, good)  # file-level skipping stats
        finally:
            if writer is not None:
                writer.close()
            if qwriter is not None:
                qwriter.close()
        if rows == 0:
            with contextlib.suppress(OSError):  # nothing written
                os.remove(os.path.join(self.path, fname))
            fname = ""
        usable = {k: v for k, v in stats.items() if v is not None}
        return LedgerCommit(
            file=fname,
            rows=rows,
            stats=usable or None,
            quarantine_file=qname if qrows else "",
            quarantine_rows=qrows,
        )

    def _read_manifest(self) -> dict:
        import json
        import os

        p = os.path.join(self.path, self.MANIFEST)
        if not os.path.exists(p):
            return {"files": [], "rows": 0, "file_stats": {}}
        with open(p) as f:
            m = json.load(f)
        m.setdefault("file_stats", {})
        return m

    def commit(self, messages) -> None:
        files = [m.file for m in messages if m is not None and m.file]
        rows = sum(m.rows for m in messages if m is not None)
        file_stats = {
            m.file: m.stats
            for m in messages
            if m is not None and m.file and m.stats
        }
        quarantine = _quarantine_of(messages)
        prev = self._read_manifest()
        if not self.overwrite:
            files = prev["files"] + files
            rows = prev["rows"] + rows
            file_stats = {**prev["file_stats"], **file_stats}
            quarantine = _merge_quarantine(prev, quarantine)
        # start from the previous manifest so keys owned by the OTHER
        # halves of the lifecycle survive a batch commit: dropping
        # "compactions" would reset the generation namespace (a later
        # compact would os.replace LIVE compact-gN files), and dropping
        # the stream sink's "batches" would erase its replay protection.
        out = dict(prev)
        out.update(
            files=files, rows=rows, file_stats=file_stats,
            quarantine=quarantine,
        )
        _swap_manifest(self.path, out)

    def abort(self, messages) -> None:
        import contextlib
        import os

        for m in messages or []:
            if m is None:
                continue
            for name in (m.file, getattr(m, "quarantine_file", "")):
                if name:
                    with contextlib.suppress(OSError):
                        os.remove(os.path.join(self.path, name))


_PRUNE_OPS = {
    ">=": lambda lo, hi, v: hi >= v,
    ">": lambda lo, hi, v: hi > v,
    "<=": lambda lo, hi, v: lo <= v,
    "<": lambda lo, hi, v: lo < v,
    "==": lambda lo, hi, v: lo <= v <= hi,
}


def _load_manifest(path: str, version: int | None = None) -> dict:
    import json
    import os

    name = (
        PostsLedgerWriter.MANIFEST
        if version is None
        else f"{PostsLedgerWriter.MANIFEST}.v{version}.json"
    )
    with open(os.path.join(path, name)) as f:
        return json.load(f)


def _kept_files(manifest: dict, prune: tuple | None) -> list[str]:
    """The ONE pruning rule (shared by read_ledger and pruned_file_count
    so a fix to either can't drift): keep a file unless its recorded
    [min, max] range for the predicate column provably excludes it;
    files without stats are always kept — absent stats can only cost
    I/O, never correctness."""
    names = manifest["files"]
    if prune is None:
        return names
    col, op, value = prune
    keep = _PRUNE_OPS[op]
    stats = manifest.get("file_stats", {})
    return [
        n for n in names
        if (s := stats.get(n, {}).get(col)) is None or keep(s[0], s[1], value)
    ]


def read_ledger(
    spark, path: str, prune: tuple | None = None, version: int | None = None
):
    """Resolve committed files through the manifest (the whole point: a
    stray .parquet in the directory is NOT data until committed).

    ``prune=(col, op, value)`` with op in {>=, >, <=, <, ==} applies
    FILE-LEVEL data skipping from the manifest's per-file min/max stats
    — the Delta/Iceberg pattern: a file whose [min, max] range cannot
    satisfy the predicate is never opened, so a selective query touches
    O(matching files), not O(table). The pruning is a superset
    pre-filter — the caller still applies the exact predicate to the
    rows. A predicate excluding EVERY file returns an empty DataFrame
    with the table's schema (an empty result is an answer, not an
    error); only a never-committed ledger raises.

    ``version=N`` time-travels: resolve through the N-th manifest
    snapshot instead of the head — committed-but-later-compacted or
    later-appended states stay readable until vacuum's retention passes
    (reading past retention raises on the missing files, Delta-style)."""
    import os

    manifest = _load_manifest(path, version)
    if not manifest["files"]:
        raise ValueError("empty ledger — nothing committed")
    names = _kept_files(manifest, prune)
    if not names:
        schema_donor = os.path.join(path, manifest["files"][0])
        return spark.read.parquet(schema_donor).limit(0)
    return spark.read.parquet(*(os.path.join(path, n) for n in names))


def pruned_file_count(path: str, prune: tuple) -> tuple[int, int]:
    """(kept, total) under the same skipping rule — for tests/telemetry."""
    manifest = _load_manifest(path)
    return len(_kept_files(manifest, prune)), len(manifest["files"])


def read_quarantine(spark, path: str):
    """The dead-letter side of the ledger: rows the writer's expectations
    rejected, readable for inspection/repair exactly like data (they ARE
    data — just not table data). Returns None when nothing was ever
    quarantined."""
    import os

    manifest = _load_manifest(path)
    names = manifest.get("quarantine", {}).get("files", [])
    if not names:
        return None
    return spark.read.parquet(*(os.path.join(path, n) for n in names))


def vacuum_ledger(path: str, min_age_seconds: float = 24 * 3600) -> list[str]:
    """Delete orphaned parquet files — anything on disk the CURRENT
    manifest doesn't reference (failed attempts, replayed epochs,
    pre-compaction generations) AND older than ``min_age_seconds``.

    The retention window is load-bearing, not politeness (the same
    contract as Delta's VACUUM retention hours): a CONCURRENT in-flight
    write's task files are on disk before its driver commit publishes
    them — without the age gate they'd look like orphans, and deleting
    them would let the subsequent commit publish a manifest pointing at
    missing files. Age-gating makes vacuum safe against any writer whose
    write-to-commit latency is below the window; referenced files are
    never touched regardless. Returns the deleted names."""
    import contextlib
    import os
    import time as _time

    manifest = _load_manifest(path)
    live = set(manifest["files"]) | set(
        manifest.get("quarantine", {}).get("files", [])
    )  # dead-letter rows are data too — only the manifest forgets them
    cutoff = _time.time() - min_age_seconds
    deleted = []
    for name in os.listdir(path):
        if not name.endswith(".parquet") or name in live:
            continue
        full = os.path.join(path, name)
        with contextlib.suppress(OSError):
            if os.path.getmtime(full) <= cutoff:
                os.remove(full)
                deleted.append(name)
    return sorted(deleted)


class PostsLedgerStreamWriter(DataSourceStreamArrowWriter):
    """Streaming half of the ledger sink (completes the connector's 2×2:
    batch/stream × read/write): per micro-batch, tasks write
    attempt-unique parquet files and the driver's commit(messages,
    batchId) publishes them — with the batchId recorded in the manifest
    as an EPOCH LEDGER. A replayed micro-batch (foreachBatch-style
    at-least-once redelivery after a crash between sink commit and
    checkpoint advance) hits an already-recorded batchId and is dropped
    whole: its files stay orphaned, the manifest doesn't change, and the
    sink converges to exactly-once — the same batch-id-ledger contract
    as the engine's incremental-IDF merge sink, here at the connector
    API layer."""

    MANIFEST = PostsLedgerWriter.MANIFEST  # one constant, one reader

    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("posts ledger stream sink requires a path")
        self.path = path
        # truncate-per-epoch modes (outputMode("complete") re-emits the
        # whole result every epoch) hand overwrite=True: each committed
        # epoch REPLACES the manifest's files instead of appending
        self.overwrite = overwrite
        req = options.get("require_not_null", "")
        self.require_not_null = [c for c in req.split(",") if c]

    # task-side: identical file protocol to the batch writer
    write = PostsLedgerWriter.write
    _split_valid = PostsLedgerWriter._split_valid
    _read_manifest = PostsLedgerWriter._read_manifest

    def commit(self, messages, batchId: int) -> None:
        prev = self._read_manifest()
        done = set(prev.get("batches", []))
        if batchId in done:
            return  # replayed epoch: files stay orphaned, manifest unchanged
        files = [m.file for m in messages if m is not None and m.file]
        rows = sum(m.rows for m in messages if m is not None)
        file_stats = {
            m.file: m.stats
            for m in messages
            if m is not None and m.file and m.stats
        }
        quarantine = _quarantine_of(messages)
        if not self.overwrite:
            files = prev["files"] + files
            rows = prev["rows"] + rows
            file_stats = {**prev["file_stats"], **file_stats}
            quarantine = _merge_quarantine(prev, quarantine)
        out = dict(prev)  # preserve keys owned by other lifecycle halves
        out.update(
            files=files,
            rows=rows,
            file_stats=file_stats,
            quarantine=quarantine,
            batches=sorted(done | {batchId}),
        )
        _swap_manifest(self.path, out)

    def abort(self, messages, batchId: int) -> None:
        PostsLedgerWriter.abort(self, messages)


def _footer_minmax(file_path: str) -> dict:
    """Numeric min/max per column from the parquet footer's row-group
    stats — compaction regains skipping stats without re-reading data."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    meta = pq.read_metadata(file_path)
    schema = pq.read_schema(file_path)
    numeric = {
        f.name
        for f in schema
        if pa.types.is_integer(f.type) or pa.types.is_floating(f.type)
    }
    acc: dict = {}
    for rg in range(meta.num_row_groups):
        group = meta.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            st = col.statistics
            if name not in numeric or st is None or not st.has_min_max:
                continue
            prev = acc.get(name)
            if prev is None:
                acc[name] = [st.min, st.max]
            else:
                acc[name] = [min(prev[0], st.min), max(prev[1], st.max)]
    return acc


def compact_ledger(spark, path: str, target_files: int) -> dict:
    """Small-file compaction for the ledger sink (the OPTIMIZE half of a
    lakehouse table's lifecycle): read the committed files, rewrite them
    as ``target_files`` parquet files, and atomically swap the manifest
    to the new generation. Old files are left ON DISK — a reader that
    resolved the previous manifest keeps working mid-compaction (readers
    pin a snapshot, compaction never deletes under them); orphan GC is a
    separate step (vacuum_ledger, age-gated). Appends COMMITTED DURING
    the rewrite survive: the final swap re-reads the manifest and carries
    forward any file the snapshot didn't contain (shrinking the
    lost-append window from table-rewrite minutes to the microseconds
    between re-read and swap; run one maintenance writer at a time — the
    swap itself is last-writer-wins, not OCC). Returns the new manifest."""
    import os
    import shutil

    manifest = _load_manifest(path)
    if not manifest["files"]:
        raise ValueError("empty ledger — nothing to compact")
    snapshot_files = set(manifest["files"])
    gen = int(manifest.get("compactions", 0)) + 1
    df = read_ledger(spark, path)
    tmp = os.path.join(path, f"_compact_g{gen}_tmp")
    df.repartition(target_files).write.mode("overwrite").parquet(tmp)
    parts = sorted(
        name for name in os.listdir(tmp) if name.endswith(".parquet")
    )
    new_files, new_stats = [], {}
    for i, name in enumerate(parts):
        new = f"compact-g{gen}-{i:05d}.parquet"
        os.replace(os.path.join(tmp, name), os.path.join(path, new))
        new_files.append(new)
        stats = _footer_minmax(os.path.join(path, new))
        if stats:
            new_stats[new] = stats
    shutil.rmtree(tmp, ignore_errors=True)
    # carry forward anything committed while we were rewriting
    current = _load_manifest(path)
    late = [n for n in current["files"] if n not in snapshot_files]
    late_rows = current["rows"] - manifest["rows"]
    late_stats = {
        n: s for n, s in current.get("file_stats", {}).items() if n in late
    }
    out = dict(current)
    out.update(
        files=new_files + late,
        rows=manifest["rows"] + max(late_rows, 0),
        compactions=gen,
        file_stats={**new_stats, **late_stats},
    )
    _swap_manifest(path, out)
    return out
