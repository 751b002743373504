"""Lakehouse-layout & ML-eval wave 9 (SURVEY.md §2.20 extensions):
snapshot diffing, Z-order clustering keys, zone-map (min/max) data
skipping, and centroid-silhouette label separation — the
table-maintenance and model-eval operations around the core engine.

All [Q]: exact DuckDB twins. The "previous snapshot" in the diff and the
"file" granularity in the zone maps are deterministic derivations of the
fixture tables (no second dataset exists in the harness), so both engines
construct identical inputs and the oracle checks real diff/skip results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import text as T
from ..sources import load_table
from ..sources.catalog import spread
from .registry import register


# ---------------------------------------------------------------------------
# snapshot diff (added / removed / changed / unchanged)
# ---------------------------------------------------------------------------

_DIFF_NEW_MOD = 10      # doc_id % 10 == 0 -> rows new in the current snapshot
_DIFF_CHG_MOD = 7       # doc_id % 7 == 0 -> rows whose text changed
_DIFF_REMOVED_OFFSET = 1_000_000  # synthetic prev-only rows


@register(
    "rel_snapshot_diff",
    oracle=f"""
WITH curr AS (
  SELECT doc_id, {T.char_hash_sql('text')} AS fp FROM documents
),
prev AS (
  SELECT doc_id,
         CASE WHEN doc_id % {_DIFF_CHG_MOD} = 0
              THEN {T.char_hash_sql("text || ' [stale]'")}
              ELSE {T.char_hash_sql('text')} END AS fp
  FROM documents WHERE doc_id % {_DIFF_NEW_MOD} <> 0
  UNION ALL
  SELECT doc_id + {_DIFF_REMOVED_OFFSET},
         {T.char_hash_sql('text')}
  FROM documents WHERE doc_id % {_DIFF_NEW_MOD} = 1
)
SELECT CASE WHEN p.doc_id IS NULL THEN 'added'
            WHEN c.doc_id IS NULL THEN 'removed'
            WHEN c.fp <> p.fp THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(count(*) AS BIGINT) AS n
FROM curr c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id
GROUP BY 1
""",
)
def rel_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff: classify every row across two table versions as
    added / removed / changed / unchanged by full-outer-joining row
    fingerprints — the version-comparison pass behind incremental
    publishing, CDC backfill audits, and "what did this rebuild touch"
    reviews. The previous snapshot is derived deterministically (a slice
    dropped, a slice's text mutated, a slice of extra rows), so the
    oracle diffs the same pair of versions.

    Scale shape: rows reduce to (key, fingerprint) BEFORE the join — the
    full outer shuffles 16-byte pairs, never row payloads; the classify +
    count is a 4-group aggregate. At 100 TB this is two scans + one
    key-partitioned shuffle, and version-pruned storage (only changed
    partitions re-fingerprinted) drops the left scan too.
    """
    docs = load_table(spark, sf_dir, "documents")
    curr = spread(docs).select(
        "doc_id", T.char_hash("text").alias("fp")
    )
    prev_kept = (
        docs.where(F.col("doc_id") % _DIFF_NEW_MOD != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % _DIFF_CHG_MOD == 0,
                T.char_hash(F.concat(F.col("text"), F.lit(" [stale]"))),
            )
            .otherwise(T.char_hash("text"))
            .alias("fp"),
        )
    )
    prev_only = (
        docs.where(F.col("doc_id") % _DIFF_NEW_MOD == 1)
        .select(
            (F.col("doc_id") + _DIFF_REMOVED_OFFSET).alias("doc_id"),
            T.char_hash("text").alias("fp"),
        )
    )
    prev = prev_kept.unionByName(prev_only)
    joined = curr.alias("c").join(
        prev.alias("p"),
        F.col("c.doc_id") == F.col("p.doc_id"),
        "full_outer",
    )
    status = (
        F.when(F.col("p.doc_id").isNull(), "added")
        .when(F.col("c.doc_id").isNull(), "removed")
        .when(F.col("c.fp") != F.col("p.fp"), "changed")
        .otherwise("unchanged")
    )
    return joined.groupBy(status.alias("status")).agg(
        F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# Z-order clustering keys
# ---------------------------------------------------------------------------

_Z_BITS = 8          # 8-bit coords -> 16-bit z-values
_Z_BUCKET = 1 << 10  # 64 z-range buckets


@register(
    "rel_zorder_keys",
    oracle=f"""
WITH xy AS (
  SELECT l_partkey % {1 << _Z_BITS} AS x,
         l_suppkey % {1 << _Z_BITS} AS y
  FROM lineitem
),
z AS (
  SELECT x, y,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(0, {_Z_BITS - 1}), i ->
               (CAST(floor(x / power(2, i)) AS BIGINT) % 2)
                 * CAST(power(4, i) AS BIGINT)
               + (CAST(floor(y / power(2, i)) AS BIGINT) % 2)
                 * 2 * CAST(power(4, i) AS BIGINT))),
           (acc, v) -> acc + v) AS zval
  FROM xy
)
SELECT CAST(zval // {_Z_BUCKET} AS BIGINT) AS z_bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
       CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
FROM z GROUP BY 1
""",
)
def rel_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys: interleave the bits of two join
    columns into one sort key and bucket rows by z-range, reporting each
    bucket's (x, y) bounding box — the multi-dimensional layout trick
    (Delta OPTIMIZE ZORDER, Iceberg sort orders) that makes min/max
    skipping effective on BOTH columns at once: each z-bucket covers a
    small square, not a full-width stripe.

    The bit interleave is pure arithmetic (divide / mod / power — no
    engine bit intrinsics), identical in both engines.

    Scale shape: computing z is row-local; the bucket aggregate is one
    map-side-combinable shuffle. At 100 TB the z-value is the
    repartitionByRange + sortWithinPartitions key at write time and this
    query IS the layout audit: bounding boxes near sqrt(bucket_size) on
    each side mean skipping works; full-range boxes mean the layout
    degraded to single-column order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = (F.col("l_partkey") % (1 << _Z_BITS)).alias("x")
    y = (F.col("l_suppkey") % (1 << _Z_BITS)).alias("y")
    xy = li.select(x, y)
    zval = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(_Z_BITS - 1)),
            lambda i: (
                (F.floor(F.col("x") / F.pow(F.lit(2.0), i)).cast("long") % 2)
                * F.pow(F.lit(4.0), i).cast("long")
                + (F.floor(F.col("y") / F.pow(F.lit(2.0), i)).cast("long") % 2)
                * 2
                * F.pow(F.lit(4.0), i).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        xy.select("x", "y", zval.alias("zval"))
        .groupBy(
            F.floor(F.col("zval") / _Z_BUCKET).cast("long").alias("z_bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("x").cast("long").alias("x_min"),
            F.max("x").cast("long").alias("x_max"),
            F.min("y").cast("long").alias("y_min"),
            F.max("y").cast("long").alias("y_max"),
        )
    )


# ---------------------------------------------------------------------------
# zone-map (min/max) data skipping
# ---------------------------------------------------------------------------

_SKIP_FILE_ROWS = 1_000  # rows per simulated file (l_orderkey ranges)
_SKIP_LO = "1994-01-01 00:00:00"   # half-open [LO, HI) timestamp range
_SKIP_HI = "1994-07-01 00:00:00"


@register(
    "rel_minmax_skipping",
    oracle=f"""
WITH filed AS (
  SELECT l_orderkey // {_SKIP_FILE_ROWS} AS file_id, l_shipdate
  FROM lineitem
),
zones AS (
  SELECT file_id,
         min(l_shipdate) AS d_min,
         max(l_shipdate) AS d_max,
         count(*) AS n_rows,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '{_SKIP_LO}'
                   AND l_shipdate < TIMESTAMP '{_SKIP_HI}'
                  THEN 1 ELSE 0 END) AS n_match
  FROM filed GROUP BY file_id
)
SELECT CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN d_max < TIMESTAMP '{_SKIP_LO}'
                       OR d_min >= TIMESTAMP '{_SKIP_HI}'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
       CAST(sum(CASE WHEN d_max < TIMESTAMP '{_SKIP_LO}'
                       OR d_min >= TIMESTAMP '{_SKIP_HI}'
                     THEN 0 ELSE n_rows END) AS BIGINT) AS n_rows_scanned,
       CAST(sum(n_match) AS BIGINT) AS n_rows_matching,
       CAST(sum(CASE WHEN d_max < TIMESTAMP '{_SKIP_LO}'
                       OR d_min >= TIMESTAMP '{_SKIP_HI}'
                     THEN n_match ELSE 0 END) AS BIGINT)
         AS n_missed_by_skipping
FROM zones
""",
)
def rel_minmax_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data skipping audit: bucket rows into simulated files
    (l_orderkey ranges — the natural insert order), build per-file
    min/max statistics on l_shipdate, and evaluate a date-range predicate
    against the zone maps — reporting how many files skip, how many rows
    the pruned scan reads, and (the safety proof) that skipped files
    contain ZERO matching rows. This is parquet row-group / Delta file
    statistics pruning, made explicit and value-checked.

    Scale shape: the zone-map build is one map-side-combinable aggregate
    (#files rows out); evaluation is arithmetic over that tiny table.
    The n_missed_by_skipping == 0 invariant is what makes skipping sound;
    its value here is nonzero only if the zone logic is wrong — the test
    asserts it and the oracle re-derives it. Date-clustered insert order
    is why it works; the z-order audit covers the multi-column case.
    """
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit(_SKIP_LO).cast("timestamp")
    hi = F.lit(_SKIP_HI).cast("timestamp")
    in_range = (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    zones = (
        li.select(
            F.floor(F.col("l_orderkey") / _SKIP_FILE_ROWS).alias("file_id"),
            "l_shipdate",
        )
        .groupBy("file_id")
        .agg(
            F.min("l_shipdate").alias("d_min"),
            F.max("l_shipdate").alias("d_max"),
            F.count("*").alias("n_rows"),
            F.sum(F.when(in_range, 1).otherwise(0)).alias("n_match"),
        )
    )
    skipped = (F.col("d_max") < lo) | (F.col("d_min") >= hi)
    return zones.agg(
        F.count("*").alias("n_files"),
        F.sum(F.when(skipped, 1).otherwise(0))
        .cast("bigint")
        .alias("n_skipped"),
        F.sum(F.when(skipped, 0).otherwise(F.col("n_rows")))
        .cast("bigint")
        .alias("n_rows_scanned"),
        F.sum("n_match").cast("bigint").alias("n_rows_matching"),
        F.sum(F.when(skipped, F.col("n_match")).otherwise(0))
        .cast("bigint")
        .alias("n_missed_by_skipping"),
    )


# ---------------------------------------------------------------------------
# centroid-silhouette label separation
# ---------------------------------------------------------------------------

@register(
    "sim_silhouette_labels",
    oracle="""
WITH ed AS (
  SELECT vec_id, label,
         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
  FROM embeddings
),
comp AS (
  SELECT label, d.i AS dim,
         CAST(sum(CAST(round(e[d.i], 10) AS DECIMAL(28,10))) AS DOUBLE)
           / count(*) AS c
  FROM ed CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) d
  GROUP BY label, d.i
),
cent AS (
  SELECT label,
         list_transform(list_sort(list([CAST(dim AS DOUBLE), c])),
                        r -> r[2]) AS cvec
  FROM comp GROUP BY label
),
dists AS (
  SELECT ed.vec_id, ed.label AS own_label, cent.label AS cand_label,
         sqrt(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(generate_series(1, 64),
               i -> (ed.e[i] - cent.cvec[i]) * (ed.e[i] - cent.cvec[i]))),
           (a, v) -> a + v)) AS dist
  FROM ed CROSS JOIN cent
),
ab AS (
  SELECT vec_id, own_label,
         min(CASE WHEN cand_label = own_label THEN dist END) AS a,
         min(CASE WHEN cand_label <> own_label THEN dist END) AS b
  FROM dists GROUP BY vec_id, own_label
),
s AS (
  SELECT vec_id, own_label AS label,
         CAST(round((b - a) / greatest(a, b), 6) AS DECIMAL(18,6)) AS sil
  FROM ab
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n,
       -- raw quotient, not rounded (portability: quotients of a decimal
       -- grid sum by small n land on rounding boundaries — sf0.1 lesson)
       CAST(sum(sil) AS DOUBLE) / count(*) AS avg_silhouette
FROM s GROUP BY label
""",
)
def sim_silhouette_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-silhouette label separation: score how well the embedding
    labels cluster by the simplified (centroid-based) silhouette —
    s = (b - a) / max(a, b) with a = distance to the own-label centroid
    and b = distance to the nearest other centroid — the standard
    clustering-quality readout an embedding-training loop tracks per
    epoch. Positive means labels separate; near zero means overlap.

    Determinism: centroid components divide DECIMAL-exact sums (order-
    free) and every distance is a fixed-order array fold, so both engines
    compute identical doubles; per-label silhouette sums add round-6
    decimals.

    Scale shape: centroids reduce the corpus to #labels x 64 rows
    (map-side combinable) and broadcast back as arrays; distances are
    array-local folds against the broadcast centroids (#labels per row,
    no pair blowup); the a/b reduction and label aggregate share one
    vec-keyed shuffle. The same plan at 100 TB is exactly k-means'
    assignment step.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ed = spread(emb).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    comp = (
        ed.select(
            "label", F.posexplode("e").alias("dim", "v")
        )
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(F.round("v", 10).cast("decimal(28,10)")).cast("double")
                / F.count("*")
            ).alias("c")
        )
    )
    cent = comp.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "c"))),
            lambda r: r["c"],
        ).alias("cvec")
    )
    dists = ed.crossJoin(
        F.broadcast(
            cent.select(
                F.col("label").alias("cand_label"), "cvec"
            )
        )
    ).select(
        "vec_id",
        F.col("label").alias("own_label"),
        "cand_label",
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    "e", "cvec", lambda v, c: (v - c) * (v - c)
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            )
        ).alias("dist"),
    )
    ab = dists.groupBy("vec_id", "own_label").agg(
        F.min(
            F.when(F.col("cand_label") == F.col("own_label"), F.col("dist"))
        ).alias("a"),
        F.min(
            F.when(F.col("cand_label") != F.col("own_label"), F.col("dist"))
        ).alias("b"),
    )
    sil = F.round(
        (F.col("b") - F.col("a")) / F.greatest("a", "b"), 6
    ).cast("decimal(18,6)")
    return (
        ab.select(F.col("own_label").alias("label"), sil.alias("sil"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            (F.sum("sil").cast("double") / F.count("*"))
            .cast("double")
            .alias("avg_silhouette"),
        )
    )


# ---------------------------------------------------------------------------
# partition integrity checksums (Merkle-style audit, built r9, staged r10)
# ---------------------------------------------------------------------------

_CHK_BUCKETS = 32


_PARTITION_CHECKSUMS_SQL = f"""
WITH rows_c AS (
  SELECT o_orderkey % {_CHK_BUCKETS} AS bucket, o_orderkey,
         {T.char_hash_sql(
             "concat_ws('|', o_orderkey, o_custkey, o_orderstatus,"
             " CAST(o_orderdate AS VARCHAR))"
         )} AS h
  FROM orders
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(CAST(sum(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0))
            % {T.HASH_MOD} AS BIGINT) AS checksum,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM rows_c GROUP BY bucket
"""


@register(
    "rel_partition_checksums", oracle=_PARTITION_CHECKSUMS_SQL
)
def rel_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level integrity fingerprints (built r9, staged r10):
    every row folds to a portable content hash over its canonical
    pipe-joined representation; per hash-bucket the audit emits row
    count, an ORDER-INDEPENDENT additive checksum (DECIMAL(38) exact sum
    mod the hash prime — replay/copy/migration verification can compare
    fingerprints without ever comparing rows), and the zone-map min/max
    key. Every aggregate is mergeable (sum/count/min/max), so partial
    fingerprints from 10k files combine into table fingerprints without
    a rescan — the Merkle-tree leaf level of a 100 TB table audit, and
    the check a lakehouse runs after every compaction/migration
    (COPYCHECK-style dataset equality at warehouse scale).

    Scale shape: one scan, one {_CHK_BUCKETS}-key map-side-combinable
    aggregate; the only data-sized work is the in-row hash fold."""
    orders = load_table(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.col("o_orderdate").cast("string"),
    )
    return (
        orders.select(
            (F.col("o_orderkey") % _CHK_BUCKETS).alias("bucket"),
            F.col("o_orderkey"),
            T.char_hash(row_str).alias("h"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.expr(
                f"CAST(CAST(sum(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0))"
                f" % {T.HASH_MOD} AS BIGINT)"
            ).alias("checksum"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.max("o_orderkey").cast("bigint").alias("max_key"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering layout audit — multi-dimensional skipping
# ---------------------------------------------------------------------------

_Z_BITS = 8        # bits per dimension (256 x 256 key grid)
_Z_BUCKET_SHIFT = 8  # keep the top 8 interleaved bits -> 256 buckets


def _interleave_sql(a: str, b: str) -> str:
    """Morton interleave of two {bits}-bit ints (a even bits, b odd) —
    integer bit algebra, identical in both engines."""
    parts = []
    for i in range(_Z_BITS):
        parts.append(f"((({a} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(parts)


_ZORDER_SQL = f"""
WITH keys AS (
  SELECT l_orderkey % 256 AS a, l_partkey % 256 AS b FROM lineitem
),
z AS (
  SELECT a, b,
         ({_interleave_sql('a', 'b')}) >> {_Z_BUCKET_SHIFT} AS bucket
  FROM keys
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(a) AS BIGINT) AS a_min, CAST(max(a) AS BIGINT) AS a_max,
       CAST(min(b) AS BIGINT) AS b_min, CAST(max(b) AS BIGINT) AS b_max,
       CAST(max(a) - min(a) AS BIGINT) AS a_span,
       CAST(max(b) - min(b) AS BIGINT) AS b_span
FROM z GROUP BY bucket
"""


@register("rel_zorder_layout", oracle=_ZORDER_SQL)
def rel_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering layout audit (built r10,
    staged r11) — the multi-dimensional extension of
    source_ledger_skipping's single-column range layout: interleaving
    the bits of two 8-bit key projections (l_orderkey, l_partkey)
    assigns each row a position on the Morton curve, and bucketing by
    the top interleaved bits yields files whose zone maps are TIGHT IN
    BOTH dimensions at once (every bucket's a_span and b_span are
    bounded by 2^{_Z_BITS} / 2^({_Z_BUCKET_SHIFT}//2) = 16 here —
    the audit's checkable invariant), so a predicate on EITHER key
    prunes ~15/16 of the files. A linear layout bounds one span and
    leaves the other at full range. This query emits the per-bucket
    zone maps (count, min/max/span per dimension) that a writer would
    persist as skipping metadata; the oracle restates the full bit
    interleave in integer algebra.

    Scale shape: the Morton key is pure in-row bit arithmetic in the
    scan stage (whole-stage codegen, no UDF); the only exchange is the
    256-key map-side-combinable zone-map aggregate. At a real 100 TB
    layout job the same expression becomes the repartitionByRange key;
    the audit here is the metadata readout, which is bucket-sized."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 256).alias("a"),
        (F.col("l_partkey") % 256).alias("b"),
    )
    z = F.expr(_interleave_sql("a", "b"))
    byb = li.select(
        "a", "b", F.shiftright(z, _Z_BUCKET_SHIFT).alias("bucket")
    )
    return byb.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("a").cast("bigint").alias("a_min"),
        F.max("a").cast("bigint").alias("a_max"),
        F.min("b").cast("bigint").alias("b_min"),
        F.max("b").cast("bigint").alias("b_max"),
        (F.max("a") - F.min("a")).cast("bigint").alias("a_span"),
        (F.max("b") - F.min("b")).cast("bigint").alias("b_span"),
    ).select(
        F.col("bucket").cast("bigint").alias("bucket"),
        "n_rows", "a_min", "a_max", "b_min", "b_max", "a_span", "b_span",
    )
