"""Dedup queries (Tier C — SURVEY.md §2.12-1/2, BASELINE.json)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup
from ..sources import load_table
from .registry import register


@register("dedup_exact_keep_first", oracle=dedup.EXACT_KEEP_FIRST_SQL)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the 16-byte md5 text digest; canonical = lowest doc_id
    per group (deterministic keep-first)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_keep_first(docs)


@register("dedup_minhash_signatures", oracle=dedup.minhash_signatures_sql())
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-function MinHash signatures over distinct word sets (portable
    hashes — every stage oracle-checkable, unlike murmur-based MLlib)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_signatures(docs)


@register("dedup_minhash_near_dups", oracle=dedup.minhash_near_dups_sql())
def dedup_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH end-to-end: banded candidate join (shuffle ∝ docs×bands,
    not docs²) -> exact Jaccard verify -> threshold."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_near_dups(docs)


@register("dedup_shingle_jaccard", oracle=dedup.shingle_near_dups_sql())
def dedup_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram shingle Jaccard near-dup (shingle-sharing candidate
    blocking)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.shingle_near_dups(docs)


@register("dedup_simhash", oracle=dedup.simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-bit SimHash signatures (count-weighted bit votes)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs)


@register("dedup_simhash_near_dups", oracle=dedup.simhash_near_dups_sql())
def dedup_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3, high-bits blocking)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_near_dups(docs)


@register("dedup_components", oracle=dedup.minhash_dedup_components_sql())
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization: connected components over the MinHash near-dup
    pairs — every doc labeled with the min doc_id of its duplicate cluster
    (keep one per component = the dedup'd corpus). Iterative min-label
    propagation on Spark; recursive-CTE closure in the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_dups(docs)
    return dedup.connected_components(docs, pairs)


@register(
    "dedup_keep_longest",
    oracle=f"""
WITH comp AS ({dedup.minhash_dedup_components_sql()})
SELECT c.doc_id, c.component,
       row_number() OVER (PARTITION BY c.component
                          ORDER BY d.n_chars DESC, c.doc_id) = 1 AS is_kept
FROM comp c JOIN documents d USING (doc_id)
""",
)
def dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based canonical selection: within each near-dup cluster keep
    the LONGEST document (n_chars desc, doc_id tie-break) instead of the
    min-id one — the curation policy that preserves the most complete
    variant of a duplicated page (truncated scrapes and snippets drop).

    Scale shape: everything up to the component labels is the bounded
    MinHash pipeline; the selection itself is one window over
    (component) — dup clusters are small by construction (post-dedup), so
    the partition key is never skewed, and the payload carried through the
    shuffle is (doc_id, component, n_chars), never text."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_dups(docs)
    comp = dedup.connected_components(docs, pairs)
    joined = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return joined.select(
        "doc_id", "component", (F.row_number().over(w) == 1).alias("is_kept")
    )


@register(
    "dedup_incremental_minhash",
    oracle=dedup.incremental_minhash_sql(),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time near-dup dedup: probe a new batch (doc_id % 5 == 0)
    against the existing corpus through the LSH band index — candidate
    volume scales with the BATCH, never the corpus pair count; the exact
    Jaccard verify is the same in-row array_intersect as
    dedup_minhash_near_dups (operators/dedup.py::
    incremental_minhash_near_dups)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.incremental_minhash_near_dups(docs)


@register(
    "stream_minhash_index_drain",
    oracle=dedup.incremental_minhash_sql(),
)
def stream_minhash_index_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standing dedup index, maintained BY A STREAM and probed from
    the table: drain the existing corpus (doc_id % 5 != 0) through
    streaming/worker.py::minhash_index_stream (bands computed at ingest,
    keyed MERGE on (doc_id, band_id)), then probe the newly ingested
    batch's band rows against the materialized index and Jaccard-verify.
    The oracle is dedup_incremental_minhash's SQL — the table-served
    probe must answer identically to in-plan banding of the base corpus."""
    import tempfile as _tf

    from pyspark.sql import functions as F

    from ..cache import persist_tracked
    from ..operators.dedup import (
        INCR_MOD,
        _banded,
        _doc_shingle_arrays,
        minhash_signatures,
        probe_bands,
    )
    from ..sources.sinks import read_merged
    from ..streaming import minhash_index_stream

    docs = load_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % INCR_MOD != 0)
    work = _tf.mkdtemp(prefix="pv_mhix_")
    source, index_dir, ckpt = f"{work}/in", f"{work}/ix", f"{work}/ckpt"
    base.coalesce(1).write.mode("append").parquet(source)
    q = minhash_index_stream(spark, source, base.schema, index_dir, ckpt)
    q.awaitTermination(300)
    base_bands = read_merged(spark, index_dir).select(
        F.col("doc_id").alias("doc_b"), "band_id", "band_value"
    )
    arrays = persist_tracked(_doc_shingle_arrays(docs))
    # the delta side's shingle arrays are a narrow id-split of the shared
    # relation -- no join against the document rows needed
    delta_bands = _banded(
        minhash_signatures(docs, arrays=arrays.where(F.col("doc_id") % INCR_MOD == 0))
    ).select(F.col("doc_id").alias("doc_a"), "band_id", "band_value")
    return probe_bands(docs, delta_bands, base_bands, arrays)
