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


def _merge_minmax(acc: dict, batch) -> None:
    """Fold one Arrow batch's numeric min/max into ``acc`` in place."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for field in batch.schema:
        if not (pa.types.is_integer(field.type) or pa.types.is_floating(field.type)):
            continue
        mm = pc.min_max(batch.column(field.name))
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is None:  # all-null column in this batch
            continue
        prev = acc.get(field.name)
        if prev is None:
            acc[field.name] = [lo, hi]
        else:
            acc[field.name] = [min(prev[0], lo), max(prev[1], hi)]


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

    def write(self, iterator) -> LedgerCommit:
        import contextlib
        import os

        import pyarrow.parquet as pq
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        fname = (
            f"part-{ctx.partitionId():05d}-a{ctx.taskAttemptId()}.parquet"
        )
        # stream batches straight into one parquet file — memory stays
        # bounded by a batch, never the partition (the committer claim
        # is only honest if a multi-GB partition can't OOM the worker)
        writer, rows, stats = None, 0, {}
        try:
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                if writer is None:
                    writer = pq.ParquetWriter(
                        os.path.join(self.path, fname), batch.schema
                    )
                writer.write_batch(batch)
                rows += batch.num_rows
                _merge_minmax(stats, batch)  # file-level skipping stats
        finally:
            if writer is not None:
                writer.close()
        if rows == 0:
            with contextlib.suppress(OSError):  # nothing written
                os.remove(os.path.join(self.path, fname))
            return LedgerCommit(file="", rows=0)
        return LedgerCommit(file=fname, rows=rows, stats=stats or None)

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
        import json
        import os

        files = [m.file for m in messages if m is not None and m.file]
        rows = sum(m.rows for m in messages if m is not None)
        file_stats = {
            m.file: m.stats
            for m in messages
            if m is not None and m.file and m.stats
        }
        if not self.overwrite:
            prev = self._read_manifest()
            files = prev["files"] + files
            rows = prev["rows"] + rows
            file_stats = {**prev["file_stats"], **file_stats}
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, self.MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(
                {"files": files, "rows": rows, "file_stats": file_stats}, f
            )
        os.replace(tmp, os.path.join(self.path, self.MANIFEST))

    def abort(self, messages) -> None:
        import contextlib
        import os

        for m in messages or []:
            if m is not None and m.file:
                with contextlib.suppress(OSError):
                    os.remove(os.path.join(self.path, m.file))


_PRUNE_OPS = {
    ">=": lambda lo, hi, v: hi >= v,
    ">": lambda lo, hi, v: hi > v,
    "<=": lambda lo, hi, v: lo <= v,
    "<": lambda lo, hi, v: lo < v,
    "==": lambda lo, hi, v: lo <= v <= hi,
}


def read_ledger(spark, path: str, prune: tuple | None = None):
    """Resolve committed files through the manifest (the whole point: a
    stray .parquet in the directory is NOT data until committed).

    ``prune=(col, op, value)`` with op in {>=, >, <=, <, ==} applies
    FILE-LEVEL data skipping from the manifest's per-file min/max stats
    — the Delta/Iceberg pattern: a file whose [min, max] range cannot
    satisfy the predicate is never opened, so a selective query touches
    O(matching files), not O(table). Files without stats are kept
    (absence of stats can only cost I/O, never correctness). The pruning
    is a superset pre-filter — the caller still applies the exact
    predicate to the rows."""
    import json
    import os

    with open(os.path.join(path, PostsLedgerWriter.MANIFEST)) as f:
        manifest = json.load(f)
    names = manifest["files"]
    if prune is not None:
        col, op, value = prune
        keep = _PRUNE_OPS[op]
        stats = manifest.get("file_stats", {})
        names = [
            n for n in names
            if (s := stats.get(n, {}).get(col)) is None
            or keep(s[0], s[1], value)
        ]
    files = [os.path.join(path, name) for name in names]
    if not files:
        raise ValueError("empty ledger — nothing committed (or all pruned)")
    return spark.read.parquet(*files)


def pruned_file_count(path: str, prune: tuple) -> tuple[int, int]:
    """(kept, total) under the same skipping rule — for tests/telemetry."""
    import json
    import os

    with open(os.path.join(path, PostsLedgerWriter.MANIFEST)) as f:
        manifest = json.load(f)
    col, op, value = prune
    keep = _PRUNE_OPS[op]
    stats = manifest.get("file_stats", {})
    kept = [
        n for n in manifest["files"]
        if (s := stats.get(n, {}).get(col)) is None or keep(s[0], s[1], value)
    ]
    return len(kept), len(manifest["files"])


def vacuum_ledger(path: str) -> list[str]:
    """Delete orphaned parquet files — anything on disk the CURRENT
    manifest doesn't reference (failed attempts, replayed epochs,
    pre-compaction generations). Safe by construction: the manifest is
    the commit, so nothing referenced is ever touched; run it only after
    in-flight readers of older generations have drained (the same
    retention contract as Delta's VACUUM). Returns the deleted names."""
    import contextlib
    import json
    import os

    with open(os.path.join(path, PostsLedgerWriter.MANIFEST)) as f:
        manifest = json.load(f)
    live = set(manifest["files"])
    deleted = []
    for name in os.listdir(path):
        if name.endswith(".parquet") and name not in live:
            with contextlib.suppress(OSError):
                os.remove(os.path.join(path, name))
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

    # task-side: identical file protocol to the batch writer
    write = PostsLedgerWriter.write
    _read_manifest = PostsLedgerWriter._read_manifest

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

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
        if not self.overwrite:
            files = prev["files"] + files
            rows = prev["rows"] + rows
            file_stats = {**prev["file_stats"], **file_stats}
        out = {
            "files": files,
            "rows": rows,
            "file_stats": file_stats,
            "batches": sorted(done | {batchId}),
        }
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, self.MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(out, f)
        os.replace(tmp, os.path.join(self.path, self.MANIFEST))

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
    separate, safe-by-construction step. Returns the new manifest."""
    import json
    import os
    import shutil

    manifest_path = os.path.join(path, PostsLedgerWriter.MANIFEST)
    with open(manifest_path) as f:
        manifest = json.load(f)
    if not manifest["files"]:
        raise ValueError("empty ledger — nothing to compact")
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
    out = dict(manifest)
    out.update(files=new_files, compactions=gen, file_stats=new_stats)
    tmp_manifest = manifest_path + ".tmp"
    with open(tmp_manifest, "w") as f:
        json.dump(out, f)
    os.replace(tmp_manifest, manifest_path)
    return out
