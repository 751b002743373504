"""Streaming vectorize worker — the reference's main loop
(/root/reference/worker.py:139-150) as Structured Streaming.

Mapping (SURVEY.md §2.10):
  ST1 micro-batch poll loop  -> readStream(parquet) + foreachBatch; drain-
                                then-stop via trigger(availableNow=True),
                                continuous via processingTime trigger.
  ST2 idle backoff (sleep 5) -> micro-batch scheduler; no code.
  ST3 progress marker        -> checkpointLocation + idempotent MERGE keyed
                                on doc_id (at-least-once + idempotent ==
                                the reference's flag-overwrite contract,
                                worker.py:92,99).
  ST4 heartbeat              -> StreamingQueryListener over
                                progress.durationMs (worker.py:128-137);
                                errors swallowed like the reference's
                                bare-except heartbeat.
  ST5 thread pool            -> partition parallelism; no code.

The per-batch computation is the SAME declarative plan as the batch
flagship (operators/tfidf.py): candidates are whatever arrives in the
micro-batch; the word-vector dimension table (vocab + idf + embedding) is
computed once up front from the static corpus — exactly the reference's
architecture, where the IDF job runs separately and the worker only joins
stored (vector, idf) (worker.py:57).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQueryListener
from pyspark.sql.types import TimestampNTZType
from pyspark.sql.window import Window

from ..operators import tfidf
from ..sources.sinks import merge_upsert_parquet


from contextlib import contextmanager


@contextmanager
def state_scoped_partitions(spark: SparkSession):
    """Scope ``spark.sql.shuffle.partitions`` for a STATEFUL stream's
    lifetime (start .. awaitTermination) to a state-sized value.

    Stateful operators (stream-stream joins, window aggregates,
    applyInPandasWithState) pin one state-store instance PER shuffle
    partition PER trigger, and streaming plans get no AQE coalescing —
    at the default core-count partitions each trigger paid ~32 tasks of
    store open/commit wait for KB-sized state (r13 profile of
    stream_interval_join: 58 s task time, 1.2 s CPU; wall 5.4 s at 32
    partitions vs 2.0 s at 8, identical output). Like the CMS state
    buckets and the components fixpoint, the partition count follows
    STATE size, not corpus size: max(4, cores // 4), derived from
    defaultParallelism — never a constant. The conf is restored in
    `finally`; it is read once at stream start and pinned in the
    checkpoint, so the scope covers exactly the one drained query. Real
    deployments with large state size their partitions explicitly."""
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(
        key, str(max(4, spark.sparkContext.defaultParallelism // 4))
    )
    try:
        yield
    finally:
        spark.conf.set(key, prev)


class HeartbeatListener(StreamingQueryListener):
    """ST4: per-batch heartbeat with elapsed ms (worker.py:128-137,141-144).
    Writes JSON lines to a local file instead of an HTTP GET; failures are
    swallowed exactly like the reference's bare ``except: print``."""

    def __init__(self, path: str) -> None:
        self.path = path

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        try:
            p = event.progress
            beat = {
                "ts": time.time(),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "duration_ms": dict(p.durationMs or {}),
            }
            with open(self.path, "a") as f:
                f.write(json.dumps(beat) + "\n")
        except Exception as e:  # noqa: BLE001  (reference worker.py:136-137)
            print(f"heartbeat failed: {e}")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def _micro_batch_vectors(
    batch_docs: DataFrame, word_vectors: DataFrame, lang: str
) -> DataFrame:
    """The worker's per-batch pipeline (worker.py:110-126): tokenize -> TF ->
    join stored word vectors -> weighted sum, long form. Same shapes as
    operators/tfidf.doc_vectors but against the PRE-BUILT dimension table."""
    docs = batch_docs.where(F.col("lang") == lang)
    tf = tfidf.term_frequency(docs)
    weights = (
        tf.join(F.broadcast(word_vectors.select("word", "idf", "vec_id")), "word")
        .groupBy("doc_id", "vec_id")
        .agg(F.sum(F.col("tf") * F.col("idf")).alias("weight"))
    )
    exploded = weights.join(
        F.broadcast(word_vectors.select("vec_id", "embedding").distinct()), "vec_id"
    ).select("doc_id", "weight", F.posexplode("embedding").alias("dim", "val"))
    return exploded.groupBy("doc_id", "dim").agg(
        F.round(F.sum(F.col("weight") * F.col("val").cast("double")), 6).alias(
            "component"
        )
    )


def _event_time_ltz(df: DataFrame, col: str) -> DataFrame:
    """``withWatermark`` requires TIMESTAMP (LTZ), but parquet fixtures with
    micros/NTZ physical type read back as TIMESTAMP_NTZ. The NTZ->LTZ cast is
    instant-preserving ONLY when the session timezone is UTC (session.py pins
    it, but these functions accept any caller session) — under any other zone
    the cast would silently shift event times, skewing watermarks and window
    boundaries, so a misconfigured session fails loudly here instead."""
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":
            raise ValueError(
                f"event-time NTZ->LTZ cast requires session timezone UTC "
                f"(got {tz!r}); call posts_vectorizer_spark.session."
                f"prep_session(spark) first"
            )
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def dedup_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    target_dir: str,
    checkpoint_dir: str,
    keys: tuple[str, ...] = ("doc_id",),
    max_files_per_trigger: int | None = None,
    event_time_col: str | None = None,
    watermark: str = "1 hour",
):
    """ST7 — stateful dedup at ingest: ``dropDuplicates(keys)`` over a
    stream keeps per-key state in the state store, so re-deliveries are
    dropped ACROSS micro-batches, not just within one (the
    `maxFilesPerTrigger` option lets tests force multiple batches to prove
    it).

    With ``event_time_col`` set, state is BOUNDED (the 100 TB form): the
    stream is watermarked on that column and uses
    ``dropDuplicatesWithinWatermark``, so per-key state ages out after the
    late-data horizon instead of accumulating forever. Re-deliveries inside
    the horizon — the at-least-once delivery window — are still dropped."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    if event_time_col is not None:
        src_type = stream.schema[event_time_col].dataType
        stream = _event_time_ltz(stream, event_time_col)
        deduped = stream.withWatermark(event_time_col, watermark)
        deduped = deduped.dropDuplicatesWithinWatermark(list(keys))
        if isinstance(src_type, TimestampNTZType):
            # the LTZ cast was only for watermarking — restore the source's
            # declared NTZ type so sink output unions cleanly with the source
            deduped = deduped.withColumn(
                event_time_col, F.col(event_time_col).cast("timestamp_ntz")
            )
    else:
        deduped = stream.dropDuplicates(list(keys))
    return (
        deduped.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def tumbling_window_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    target_dir: str,
    checkpoint_dir: str,
    time_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
):
    """ST6 in streaming mode: the SAME window expression as the batch
    events_tumbling_window query, under a watermark. Append output mode
    emits each window exactly once — when the watermark (max event time
    seen minus the delay) passes the window end — and drops events arriving
    later than the horizon. Per-window state is bounded by the watermark."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    agg = (
        _event_time_ltz(reader.parquet(source_dir), time_col)
        .withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    return (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def enriched_window_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    static_dim: DataFrame,
    join_keys: tuple[str, str],
    dim_col: str,
    target_dir: str,
    checkpoint_dir: str,
    time_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
):
    """Stream-STATIC broadcast enrichment feeding a watermarked window
    aggregate: each micro-batch hash-joins against the broadcast static
    dimension (stateless — no join state store, unlike stream-stream),
    then aggregates per (window, dim attribute) under the same append
    semantics as tumbling_window_stream. This is the canonical streaming
    star-join: the fact stream never shuffles for the join (broadcast),
    and state is bounded by open windows x dim cardinality.

    The watermark is declared on the stream BEFORE the join so event-time
    semantics are unaffected by the enrichment."""
    stream_key, dim_key = join_keys
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = (
        _event_time_ltz(reader.parquet(source_dir), time_col)
        .withWatermark(time_col, watermark)
    )
    dim = F.broadcast(
        static_dim.select(
            F.col(dim_key).alias(stream_key), F.col(dim_col)
        )
    )
    agg = (
        src.join(dim, stream_key)
        .groupBy(F.window(time_col, window).alias("w"), dim_col)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), dim_col, "n", "total_value"
        )
    )
    return (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def lsh_index_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    index_dir: str,
    checkpoint_dir: str,
    dims: int,
    n_buckets: int = 16,
    max_files_per_trigger: int | None = None,
):
    """Streaming ANN index maintenance: consume a stream of embedding rows
    and maintain the MATERIALIZED LSH index table — per row the hyperplane
    bucket code and norm are computed in-stream (the expensive planes×dims
    projection runs ONCE per vector, at ingest), then keyed-MERGE'd into
    the bucketed parquet index on vec_id. Re-delivered vectors idempotently
    replace themselves (ST3 contract); a changed embedding updates its
    bucket row in place.

    At 100 TB this is how the ANN surface stays queryable without
    re-bucketing the corpus per query: the index table IS the standing
    build side, and each probe only pays its own bucket join —
    sim_lsh_ann's plan with the bucketed relation read instead of
    recomputed (operators/similarity.py::lsh_ann(index=...))."""
    from ..operators.similarity import lsh_bucket
    from ..functions import vectors as V
    from ..sources.sinks import merge_upsert_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir).select(
        "vec_id",
        "embedding",
        lsh_bucket("embedding", dims).alias("bucket"),
        V.norm("embedding").alias("nrm"),
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert_parquet(
            spark, batch_df, index_dir, ["vec_id"], n_buckets
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def minhash_index_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    index_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 16,
    max_files_per_trigger: int | None = None,
):
    """Streaming dedup-index maintenance: consume a stream of documents
    and maintain the MATERIALIZED MinHash band index — per row the
    shingle set, signature, and band codes are computed in-stream (the
    tokenize+hash+min-fold cost is paid once, at ingest), then the
    (doc_id, band_id, band_value) rows keyed-MERGE into the bucketed
    index on (doc_id, band_id). Re-delivered docs idempotently replace
    their own band rows; an edited doc re-bands in place.

    This is the standing index dedup_incremental_minhash probes: each
    newly ingested batch joins its own band rows against the table and
    never re-bands the corpus (operators/dedup.py::
    incremental_minhash_near_dups is the in-plan twin)."""
    from ..operators.dedup import _banded, minhash_signatures
    from ..sources.sinks import merge_upsert_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = _banded(minhash_signatures(reader.parquet(source_dir)))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert_parquet(
            spark, batch_df, index_dir, ["doc_id", "band_id"], n_buckets
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def session_window_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    target_dir: str,
    checkpoint_dir: str,
    time_col: str = "ts",
    gap: str = "6 hours",
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
):
    """ST6 session windows in streaming mode: the SAME ``session_window``
    expression as the batch events_session_window query, under a
    watermark. Sessions are the hard case for streaming state — a window's
    extent isn't known until the inactivity gap closes — so Spark keeps
    per-(user, open-session) state and only emits (append mode) once the
    watermark passes session end; state is bounded by watermark + gap,
    not stream length. Late events inside the horizon still merge/extend
    their session exactly as in batch."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    agg = (
        _event_time_ltz(reader.parquet(source_dir), time_col)
        .withWatermark(time_col, watermark)
        .groupBy(F.session_window(time_col, gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def interval_join_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    target_dir: str,
    checkpoint_dir: str,
    lookback: str = "10 minutes",
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
    how: str = "inner",
):
    """ST9: watermarked stream-stream interval join — the streaming form of
    the batch binned range join (plans/queries_advanced.py
    ::events_range_join_clicks): for each error event, the same user's
    clicks in the preceding ``lookback``.

    Both sides carry a watermark and the join condition bounds click_ts to a
    closed-open range ending at err_ts, so Spark can size the join state:
    buffered clicks are evicted once the error-side watermark passes
    click_ts + lookback, and vice versa — state stays proportional to the
    lookback window, not the stream length. Inner join in append mode emits
    each matched pair exactly once.

    ``how="left_outer"`` adds the null-emission half of the operator:
    an error with NO click in its lookback is emitted once — with null
    click_ts — only when the global watermark passes the point where a
    matching click is provably impossible (clicks arrive with
    click_ts >= watermark; a click can still match while
    watermark < err_ts). Matched pairs still emit as they join; the
    unmatched row is produced by state eviction, so it appears in the
    extra finalize batch availableNow runs after the data batches.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = _event_time_ltz(reader.parquet(source_dir), "ts")
    errors = (
        src.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("err_user"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", watermark)
    )
    clicks = (
        src.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    joined = errors.join(
        clicks,
        F.expr(
            f"err_user = click_user"
            f" AND click_ts >= err_ts - INTERVAL {lookback}"
            f" AND click_ts < err_ts"
        ),
        how,
    ).select("err_id", F.col("err_user").alias("user_id"), "click_ts")
    return (
        joined.writeStream.format("parquet")
        .outputMode("append")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _compact_last_per_key(
    batch: DataFrame, keys: list[str], order_col: str, keep_order: bool = False
) -> DataFrame:
    """Last-wins changelog compaction: keep the row with max ``order_col``
    per key. Ties on order_col break on every remaining column, name-sorted
    descending (nulls last), so the winner is a pure function of the
    batch's row set — a foreachBatch retry of the same batch picks the
    same winner (at-least-once + idempotent merge = convergent).
    ``keep_order`` retains the order column for an ordered sink merge."""
    tiebreak = [
        F.col(c).desc_nulls_last()
        for c in sorted(batch.columns)
        if c not in keys and c != order_col
    ]
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc(), *tiebreak)
    out = (
        batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return out if keep_order else out.drop(order_col)


def upsert_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    target_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    order_col: str | None = None,
    available_now: bool = True,
    n_buckets: int = 16,
    max_files_per_trigger: int | None = None,
    ordered_sink: bool = False,
):
    """ST1/ST3 in its generic form: consume a stream of keyed records and
    maintain a last-write-wins materialized table — readStream ->
    per-batch last-wins compaction (``order_col`` set) -> idempotent keyed
    MERGE into the bucketed parquet target. The upsert twin of
    ``cdc_apply_stream`` for sources without explicit I/U/D ops (the
    common "entity snapshots on a bus" ingest shape). foreachBatch is
    at-least-once and merge_upsert_parquet is idempotent on keys, so
    crash/retry converges (ST3 contract).

    ``ordered_sink=True`` (requires order_col) stores the order column in
    the table and merges conditionally — a stored row is replaced only by
    a >=-ordered incoming row — so convergence holds even when WHOLE
    BATCHES replay or arrive out of order (a replayed old file can no
    longer clobber newer state). Plain mode converges only under
    in-order batch delivery, the default file-source behavior."""
    from ..sources.sinks import merge_upsert_parquet

    if ordered_sink and order_col is None:
        raise ValueError("ordered_sink requires order_col")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df
        if order_col is not None:
            batch = _compact_last_per_key(
                batch, keys, order_col, keep_order=ordered_sink
            )
        merge_upsert_parquet(
            spark, batch, target_dir, keys, n_buckets,
            order_col=order_col if ordered_sink else None,
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="0 seconds")
    return writer.start()


def cdc_apply_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    target_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    op_col: str = "_op",
    order_col: str | None = None,
    available_now: bool = True,
    n_buckets: int = 16,
    max_files_per_trigger: int | None = None,
):
    """CDC ingestion: consume a changelog stream (rows tagged ``op_col`` =
    'I'/'U'/'D') and apply each micro-batch to the bucketed merge target —
    the standard Debezium/changefeed-to-lakehouse consumer, with the
    sink's bucket-pruned rewrite + atomic commit per batch.

    Each batch is COMPACTED to last-op-per-key before applying: with
    ``order_col`` set (a monotonic changelog sequence), the row with the
    max order_col wins; EQUAL order_col values are broken by every
    remaining column in name order (desc, nulls last), so the winner is a
    deterministic function of the batch contents. Without order_col, the
    batch must already be unique per key. foreachBatch is at-least-once,
    and apply_cdc_parquet is idempotent on keys, so crash/retry converges
    (ST3 contract).
    """
    from ..sources.sinks import apply_cdc_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df
        if order_col is not None:
            batch = _compact_last_per_key(batch, keys, order_col)
        apply_cdc_parquet(spark, batch, target_dir, keys, op_col, n_buckets)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="0 seconds")
    return writer.start()


def vectorize_stream(
    spark: SparkSession,
    source_dir: str,
    corpus_docs: DataFrame,
    embeddings: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    lang: str = "en",
    heartbeat_path: str | None = None,
    available_now: bool = True,
    n_buckets: int = 16,
):
    """Start the streaming worker over parquet files landing in source_dir.

    Returns the StreamingQuery. With available_now=True it drains existing
    input and stops (the testable mode); False runs continuously with a
    0-second processing trigger like the reference's tight poll loop.

    ``n_buckets`` sizes the merge target's hash-bucketing (first write only):
    per-batch merge cost is O(touched buckets), so size it so one bucket ≈
    one comfortable rewrite (e.g. 64k buckets for a 100 TB target -> ~1.5 GB
    per bucket).
    """
    word_vectors = tfidf.word_vectors(corpus_docs, embeddings, lang)
    # The dimension table is small (vocab-sized) and reused every batch.
    word_vectors = word_vectors.cache()
    word_vectors.count()  # materialize once before the stream starts

    if heartbeat_path:
        spark.streams.addListener(HeartbeatListener(heartbeat_path))

    schema = corpus_docs.schema
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = _micro_batch_vectors(batch_df, word_vectors, lang)
        merge_upsert_parquet(spark, out, target_dir, ["doc_id", "dim"], n_buckets)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="0 seconds")
    return writer.start()


def idf_count_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    counts_dir: str,
    docs_dir: str,
    checkpoint_dir: str,
    lang: str = "en",
    max_files_per_trigger: int | None = None,
):
    """Incremental IDF maintenance: each micro-batch of documents merges
    its (word, occurrences) delta and its document-count delta ADDITIVELY
    into two bucketed state tables (sinks.merge_add_parquet) — the
    reference's full-corpus IDF recount (calculate_idf_scores.py:52-66)
    as O(batch) maintenance instead of O(corpus) recomputation. The
    foreachBatch batch_id rides into the sink's ledger, so a replayed
    batch cannot double-count: addition + ledger = exactly-once.

    At 100 TB: per-batch cost is the batch's own token count plus
    O(touched buckets) of the word-count table; the IDF read side derives
    log10(n_docs/occurrences) from the two states at query time."""
    from ..functions import text as T
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        docs = batch_df.where(F.col("lang") == lang)
        word_delta = (
            docs.select(F.explode(T.tokens("text")).alias("word"))
            .groupBy("word")
            .agg(F.count("*").cast("bigint").alias("occurrences"))
        )
        merge_add_parquet(
            spark, word_delta, counts_dir, ["word"], batch_id=batch_id
        )
        doc_delta = docs.agg(
            F.count("*").cast("bigint").alias("n_docs")
        ).select(F.lit("corpus").alias("scope"), "n_docs")
        merge_add_parquet(
            spark, doc_delta, docs_dir, ["scope"], n_buckets=1,
            batch_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ddsketch_count_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    sketch_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Incremental quantile-sketch maintenance: each micro-batch of
    lineitem rows merges its (d, f2) bucket-count delta ADDITIVELY into
    the standing sketch state table (sinks.merge_add_parquet) — the
    DDSketch merge property (counts add) exercised in the real streaming
    path, with the sink's batch-id ledger making the addition
    exactly-once. The quantile READOUT stays a pure function of the
    state (plans/queries_sketch.py::ddsketch_readout), so any reader
    gets monotone-fresher quantiles without ever rescanning history.

    At 100 TB: per-batch cost is one map-side-combinable groupBy over
    the batch plus O(touched buckets) of a few-hundred-row state table —
    quantiles over an unbounded stream for the price of the batch."""
    from ..plans.queries_sketch import ddsketch_buckets
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        cents = batch_df.select(
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("cents")
        )
        delta = (
            ddsketch_buckets(cents)
            .groupBy("d", "f2")
            .agg(F.count("*").cast("bigint").alias("cnt"))
        )
        merge_add_parquet(
            spark, delta, sketch_dir, ["d", "f2"], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def psi_current_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    mn: int,
    mx: int,
    n_buckets: int,
    max_files_per_trigger: int | None = None,
):
    """Incremental PSI drift maintenance, current-window side: the
    reference-window stats (``mn``/``mx`` integer micro-units) are
    PINNED at stream start — exactly how production drift monitors work
    (training-time bucket bounds are frozen; serving traffic streams) —
    so each micro-batch's bucket counts are a pure additive delta merged
    exactly-once into the standing per-bucket state
    (sinks.merge_add_parquet batch-id ledger). The PSI READOUT stays a
    pure function of (ref counts, streamed cur counts)
    (plans/queries_stats.py::psi_readout), so any reader gets a
    monotone-fresher drift statistic without rescanning history.

    At 100 TB: per-batch cost is one map-side-combinable {n_buckets}-key
    groupBy over the batch plus O(touched buckets) of a 10-row state
    table — continuous drift monitoring for the price of the batch."""
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0),
                F.expr(f"((v - {mn}) * {n_buckets}) div ({mx} - {mn} + 1)"),
            ),
        )
        delta = (
            batch_df.select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").cast("bigint").alias("n_cur"))
        )
        merge_add_parquet(
            spark, delta, state_dir, ["bucket"], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cms_count_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    sketch_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Incremental count-min-sketch maintenance: each micro-batch of
    documents tokenizes, hashes, and merges its (d, bucket) counter
    delta ADDITIVELY into the standing sketch state
    (sinks.merge_add_parquet, exactly-once via the batch-id ledger).
    Counter addition is commutative — the CMS merge property — so any
    batch split yields the same sketch as one pass, and per-word
    frequency estimates read out from the state as a pure function
    (plans/queries_sketch.py::cms_estimates).

    At 100 TB: per-batch cost is one map-side-combinable groupBy into
    d*w cells plus O(touched cells) of a constant-size state table —
    stream-wide token frequencies for the price of the batch."""
    from ..functions import text as T
    from ..plans.queries_sketch import cms_delta_counts
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        # r12: count per word first, hash each DISTINCT word once —
        # bit-identical (d, bucket) counter deltas (cms_delta_counts),
        # ~1/10th the per-char hash folds on a Zipfian batch.
        counts = (
            batch_df.select(F.explode(T.tokens("text")).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("n"))
            .select(T.char_hash("word").alias("h"), "n")
        )
        delta = cms_delta_counts(counts)
        # n_buckets=4: CMS state is a CONSTANT-SIZE d x w counter grid
        # (corpus-independent), so its bucket count follows the state
        # size, not the corpus — 16 buckets just meant 16 tiny parquet
        # files per micro-batch commit (r12 stage profile: the staged
        # write's per-file creation cost dominated the merge job).
        merge_add_parquet(
            spark, delta, sketch_dir, ["d", "bucket"],
            n_buckets=4, batch_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def hll_register_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Incremental HyperLogLog maintenance: each micro-batch of lineitem
    rows computes its sparse (bucket, rho) registers and MAX-merges them
    into the standing register table (sinks.merge_max_parquet — the
    r9 dominance-combine sink mode). Register max is commutative,
    associative, AND idempotent, so any batch split — or replay — yields
    the same registers as one pass; the cardinality readout stays a pure
    function of the state (plans/queries_sketch.py::
    hll_estimate_readout).

    At 100 TB: per-batch cost is one map-side-combinable 64-key max
    plus O(touched registers) of a 64-row state table — running
    distinct-count over an unbounded stream for the price of the batch,
    the rollup shape HLL exists for."""
    from ..plans.queries_sketch import hll_sparse_registers
    from ..sources.sinks import merge_max_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        delta = hll_sparse_registers(batch_df, "l_orderkey")
        merge_max_parquet(
            spark, delta, state_dir, ["bucket"], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def quality_gate_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    lm: DataFrame,
    norm: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming curation gate with a PINNED language model (the
    production model-as-state shape, like psi_current_stream's pinned
    reference): the LM statistics are fit ONCE on the static training
    corpus and broadcast into every micro-batch; each batch of incoming
    documents is scored + gated and its per-doc decision rows upsert
    into the standing verdicts table keyed by doc_id (idempotent — a
    replayed batch rewrites identical rows).

    At 100 TB: per-batch cost is the batch's tokenize + one broadcast
    join against the vocab-sized LM + O(touched buckets) of the verdict
    table — admission control over an unbounded ingest stream without
    ever refitting or rescanning the corpus."""
    from ..plans.queries_curation import (
        quality_gate_rows,
        unigram_score_against,
    )
    from ..sources.sinks import merge_upsert_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        scored = unigram_score_against(batch_df, lm, norm)
        rows = quality_gate_rows(batch_df, scored)
        merge_upsert_parquet(spark, rows, state_dir, ["doc_id"])

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def zscore_moment_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Incremental per-dimension moment maintenance for the diagonal-
    Mahalanobis OOD sweep: each micro-batch of embeddings additively
    merges its (dim, s1, s2, n) sufficient-statistic deltas into the
    standing state (sinks.merge_add_parquet — DECIMAL sums and counts
    all merge by +, exactly-once via the batch-id ledger). Extends the
    additive-state family beyond bucket counts to real-valued exact
    statistics; the outlier readout stays a pure function of the state
    (plans/queries_similarity.py::zscore_readout).

    At 100 TB: per-batch cost is one map-side-combinable 64-key moment
    aggregate plus O(64) state rows — corpus-wide distribution tracking
    for the price of the batch."""
    from ..plans.queries_similarity import zscore_moment_deltas
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        delta = zscore_moment_deltas(batch_df)
        merge_add_parquet(
            spark, delta, state_dir, ["dim"], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def kmv_bottomk_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Incremental KMV (bottom-k) sketch maintenance: each micro-batch
    of events computes its side-tagged distinct hashes, unions them
    with the standing bottom-k state, and re-takes the bottom-k —
    state re-keyed (s, rank) and REPLACE-merged (the rank set only
    ever grows toward k, so no deletes arise). bottomk(state ∪ delta)
    is monotone and idempotent: a replayed batch's values are already
    at-or-above the standing kth minimum, so replay is a structural
    no-op even before the sink ledger — the same split-invariance
    argument as HLL's register max, for an order-statistic sketch.

    At 100 TB: per-batch cost is the batch's salted two-level top-k
    plus a union with a <= 2k-row state table; the standing state
    never exceeds k rows per side no matter how many events streamed."""
    from ..plans.queries_sketch import (
        kmv_bottomk,
        kmv_event_hashes,
    )
    from ..sources.sinks import merge_upsert_parquet, read_merged

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = kmv_event_hashes(batch_df).select("s", "h")
        state = read_merged(spark, state_dir)
        pool = (
            delta
            if state is None
            else delta.unionByName(state.select("s", "h")).distinct()
        )
        new_state = kmv_bottomk(pool)
        merge_upsert_parquet(spark, new_state, state_dir, ["s", "r"])

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def reliability_bins_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Incremental calibration monitoring: each micro-batch of
    documents scores, bins, and ADDITIVELY merges its (bin, n, s_sum,
    y_sum) sufficient statistics into the standing reliability state
    (sinks.merge_add_parquet, exactly-once via the batch-id ledger).
    The decimal score sums and integer counts are commutative
    additive state — the stream_zscore_drain precedent — so any batch
    split yields exactly the one-pass bins, and the diagram + ECE
    read out as a pure function of the state
    (plans/queries_curation.py::reliability_readout).

    At 100 TB: per-batch cost is one map-side-combinable 10-key
    aggregate plus O(touched bins) of a 10-row state table — live
    calibration drift monitoring for the price of the batch."""
    from ..plans.queries_curation import reliability_bin_counts
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        delta = reliability_bin_counts(batch_df)
        merge_add_parquet(
            spark, delta, state_dir, ["bin"], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def benford_digit_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming Benford conformance maintenance: each micro-batch of
    lineitem rows extracts first digits and merges its 9-key (d, o)
    count delta ADDITIVELY into the standing digit table
    (sinks.merge_add_parquet, exactly-once via the batch-id ledger).
    Digit counts are the test's complete sufficient statistic and
    addition is commutative, so any batch split yields the batch
    result; the chi-square conformance readout
    (plans/queries_stats.py::benford_readout) runs from state as a
    pure function.

    At 100 TB: per-batch cost is one map-side-combinable 9-key count
    plus O(9) state rows — a continuously fresh fraud/unit-mixup
    monitor for the price of the batch."""
    from ..plans.queries_stats import benford_digit_counts
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        delta = benford_digit_counts(batch_df).withColumnRenamed("o", "c")
        merge_add_parquet(spark, delta, state_dir, ["d"], batch_id=batch_id)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def zipf_wordcount_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming vocabulary-count maintenance: each micro-batch of
    documents tokenizes and merges its (word, n) delta ADDITIVELY into
    the standing word-count table — the UNBOUNDED-key member of the
    additive-state family (the CMS drain's keys are fixed d*w cells;
    here state is vocab-sized and the sink's hash-bucketed MERGE
    rewrites only touched buckets). The Zipf rank-frequency fit
    (plans/queries_text.py::zipf_fit_readout) reads out from state as
    a pure function of the merged counts.

    At 100 TB: per-batch cost is the batch's tokenize + one map-side-
    combinable word count + O(touched buckets) of the standing vocab
    table — a continuously fresh corpus-health monitor."""
    from ..functions import text as T
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        delta = (
            batch_df.select(F.explode(T.tokens("text")).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("c"))
        )
        merge_add_parquet(
            spark, delta, state_dir, ["word"], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def novelty_firsts_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming first-occurrence maintenance: each micro-batch of
    documents MIN-merges its (gram, min doc_id) delta into the standing
    first-seen table (sinks.merge_min_parquet — the fourth sink
    combiner, r10). min is commutative/idempotent, so any batch split
    or replay yields the one-pass table, and per-doc novelty reads out
    from state as a pure function
    (plans/queries_text.py::novelty_readout).

    At 100 TB: per-batch cost is the batch's gram fan-out + one
    map-side-combinable gram min + O(touched buckets) of the standing
    gram table — a continuously fresh redundancy monitor that never
    re-scans the corpus."""
    from ..plans.queries_text import novelty_doc_grams
    from ..sources.sinks import merge_min_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        delta = (
            novelty_doc_grams(batch_df)
            .groupBy("g")
            .agg(F.min("doc_id").alias("first_doc"))
        )
        merge_min_parquet(
            spark, delta, state_dir, ["g"], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def mi_cell_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming dependence-profile maintenance: each micro-batch of
    events merges its (xv, yv, nxy) cell-count delta ADDITIVELY into
    the standing contingency table (sinks.merge_add_parquet,
    exactly-once via the batch-id ledger). Cell counts are the MI
    profile's complete sufficient statistic and addition is
    commutative, so any batch split yields the one-pass table; the
    MI/NMI readout (plans/queries_governance.py::mi_readout) runs from
    state as a pure function.

    At 100 TB: per-batch cost is one map-side-combinable |X|·|Y|-cell
    count plus O(cells) state rows — a continuously fresh
    column-dependence monitor for physical-design decisions."""
    from ..plans.queries_governance import mi_pair_counts
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        delta = mi_pair_counts(batch_df).withColumnRenamed("nxy", "c")
        merge_add_parquet(
            spark, delta, state_dir, ["xv", "yv"], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def transition_count_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming journey-transition maintenance: each micro-batch of
    events forms its per-user (i, j) transition pairs and merges the
    count delta ADDITIVELY into the standing transition matrix. The
    statistic is additive across USER-disjoint batches (pairs form
    inside one user's journey only), which is how the drain splits its
    input — the entropy/predictability readout
    (plans/queries_events.py::transition_entropy_readout) runs from
    state as a pure function.

    At 100 TB: per-batch cost is the sessionization exchange on
    user_id plus a |types|²-bounded count — a continuously fresh
    sequence-predictability monitor."""
    from ..plans.queries_events import transition_counts
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        delta = transition_counts(batch_df).withColumnRenamed("nij", "c")
        merge_add_parquet(
            spark, delta, state_dir, ["i", "j"], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def anova_moment_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming variance-decomposition maintenance: each micro-batch
    of lineitem rows merges its (grp, n, s, q) integer moment delta
    ADDITIVELY into the standing group-moment table; the ANOVA F
    readout (plans/queries_stats.py::anova_readout) runs from state as
    a pure function. Counts, sums, and sums of squares are the test's
    complete sufficient statistic and addition is commutative, so any
    batch split yields the one-pass result.

    At 100 TB: per-batch cost is one map-side-combinable k-group
    moment aggregate plus O(k) state rows — a continuously fresh
    does-this-category-explain-this-metric monitor."""
    from ..plans.queries_stats import anova_group_moments
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        delta = anova_group_moments(batch_df)
        # the add sink merges every non-key numeric column; moments are
        # (n_g, s_g, q_g) under the grp key
        merge_add_parquet(
            spark, delta, state_dir, ["grp"], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def jsd_count_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming source-drift maintenance: each micro-batch of
    documents merges its (source, word, a) count delta ADDITIVELY into
    the standing table (the UNBOUNDED-key additive family — the Zipf
    drain's state widened by the source key); the per-source JSD
    readout (plans/queries_text.py::jsd_readout) runs from state as a
    pure function.

    At 100 TB: per-batch cost is the batch's tokenize + one map-side-
    combinable (source, word) count + O(touched buckets) of the
    standing table — a continuously fresh which-source-drifted
    monitor."""
    from ..plans.queries_text import jsd_source_word_counts
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        delta = jsd_source_word_counts(batch_df).withColumnRenamed(
            "a", "c"
        )
        merge_add_parquet(
            spark, delta, state_dir, ["source", "word"], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def daily_cents_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming daily-total maintenance: each micro-batch of events
    ADD-merges its (epoch-day, cents) delta into the standing daily
    table — the CALENDAR-bounded member of the additive-state family
    (state is ~30 rows however much data flows). The Theil-Sen robust
    trend readout (plans/queries_timeseries.py::theil_sen_readout)
    runs from merged state as a pure function — a continuously fresh
    trend monitor whose pair/median work never touches raw events.

    At 100 TB: per-batch cost is one day-keyed map-side-combinable
    sum + O(touched buckets) of a calendar-sized table."""
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        delta = batch_df.groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("d")
        ).agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("c")
        )
        merge_add_parquet(
            spark, delta, state_dir, ["d"], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def utf8_metric_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming encoding-health maintenance: each micro-batch of
    documents runs the UTF-8 DFA audit and ADD-merges its 11-key
    (metric, c) delta into the standing class-count table — the
    FIXED-key extreme of the additive-state family (state is 11 rows
    at any volume). The corpus rollup reads out via
    operators/multimodal.py::utf8_corpus_readout as a pure function.

    At 100 TB: per-batch cost is the batch's scan-stage DFA work +
    an 11-row merge — a continuously fresh mojibake monitor."""
    from ..operators.multimodal import utf8_metric_counts
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        merge_add_parquet(
            spark, utf8_metric_counts(batch_df), state_dir, ["metric"],
            batch_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def score_grid_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming ranking-quality maintenance: each micro-batch of
    documents scores the calibration signal (round-6 distinct-token
    ratio) and ADD-merges its (s, pos, neg) value-grid delta into the
    standing table — state bounded by distinct round-6 scores, both
    count columns additive. ROC AUC / Gini read out from merged state
    via plans/queries_curation.py::auc_readout as a pure function — a
    live discrimination monitor for the quality gate's score.

    At 100 TB: per-batch cost is one scan-stage score + an
    s-keyed map-side-combinable count + O(touched scores) of a
    grid-sized merge."""
    from ..plans.queries_curation import _score_label_grid
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        merge_add_parquet(
            spark, _score_label_grid(batch_df), state_dir, ["s"],
            batch_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def kw_gcnt_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming rank-test maintenance: each micro-batch of lineitem
    rows ADD-merges its (grp, x) value-grid count delta into the
    standing table — state bounded by groups x distinct values (the
    quantity grid is 50 values, so ~200 rows at any volume). The
    tie-corrected Kruskal-Wallis H reads out from merged state via
    plans/queries_stats.py::kw_readout as a pure function — a live
    distribution-shift monitor that needs no normality assumption.

    At 100 TB: per-batch cost is one (grp, x)-keyed map-side-
    combinable count + O(touched buckets) of a grid-sized table."""
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        delta = (
            batch_df.select(
                F.col("l_returnflag").alias("grp"),
                F.col("l_quantity").cast("bigint").alias("x"),
            )
            .groupBy("grp", "x")
            .agg(F.count("*").cast("bigint").alias("c"))
        )
        merge_add_parquet(
            spark, delta, state_dir, ["grp", "x"], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def bigram_count_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming bigram-count maintenance: each micro-batch of
    documents tokenizes and ADD-merges its per-(w1, w2) adjacent-pair
    count delta into the standing bigram table — the second
    unbounded-key member of the additive-state family beside the
    vocab table (state is bigram-relation-sized; the sink's
    hash-bucketed MERGE rewrites only touched buckets). Collocation
    significance (plans/queries_corpus.py::llr_readout) reads out
    from merged state as a pure function of the counts.

    At 100 TB: per-batch cost is the batch's tokenize + one
    map-side-combinable (w1, w2) count + O(touched buckets) of the
    standing table — a continuously fresh phrase-induction monitor."""
    from ..functions import text as T
    from ..sources.sinks import merge_add_parquet

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        toks = batch_df.select(T.tokens("text").alias("t"))
        pairs = F.expr(
            "transform(sequence(1, size(t) - 1), k -> "
            "struct(element_at(t, k) AS w1, element_at(t, k + 1) AS w2))"
        )
        delta = (
            toks.where(F.size("t") >= 2)
            .select(F.explode(pairs).alias("p"))
            .select("p.w1", "p.w2")
            .groupBy("w1", "w2")
            .agg(F.count("*").cast("bigint").alias("k11"))
        )
        merge_add_parquet(
            spark, delta, state_dir, ["w1", "w2"], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
