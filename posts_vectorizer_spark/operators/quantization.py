"""Scalar (int8) and binary (sign-bit) quantization serving scans —
the two remaining members of the compressed-vector family beside the
codebook forms (PQ/RQ/ADC in clustering.py, LSH in similarity.py).
Both are EXACT-integer reformulations, so the Spark result and the
DuckDB oracle are structurally identical (no float anywhere past the
one blessed round-9 decimal ingestion cast):

- SQ8: per-dimension min/max define 256 uniform levels on the round-9
  integer lattice (1e-9 units); code = ((x9-mn9)*255) div span9 and
  the midpoint reconstruction r9 = mn9 + ((2c+1)*span9) div 512 are
  pure trunc-divisions (Spark ``div`` == DuckDB ``//`` on BIGINT);
  query/reconstruction values re-pin to 1e-6 units (sign-split trunc)
  so the 64-dim dot product stays far inside int64.
- Binary: one sign bit per dimension packed into 32-bit words
  (1::BIGINT << (i-1) sums are exact), distance = sum of
  bit_count(xor(word_a, word_b)) — the Hamming serving scan.

Scale shape (both): quantize/pack is one embarrassingly parallel pass
producing a FIXED-WIDTH row (2 BIGINT words, or a 64-byte code array)
— 8-32x smaller than the float vectors, which is the operational point
of quantized serving; the scan against the eval query set is a
broadcast join + per-row integer fold, and at corpus scale the
candidate source swaps to the LSH/IVF lists exactly like
sim_pq_adc_scan. The brute-force witnesses here stay eval-sized by the
repo convention (query side = vec_id % EVERY == 0).

Reference: the engine's own embedding columns (reference worker.py:78);
SQ8/binary quantization per Faiss's ScalarQuantizer / binary index
public design (no reference code consulted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SQ8_EVERY = 50   # query subset: vec_id % EVERY == 0 (eval-sized witness)
SQ8_K = 10
BIN_EVERY = 10
BIN_K = 10
_WORD = 32       # sign bits per packed word (BIGINT-safe shifts)


def _x9(col):
    """The blessed ingestion device: float -> round-9 decimal -> exact
    1e-9-unit BIGINT lattice point."""
    return (
        (F.round(col.cast("double"), 9).cast("decimal(18,9)") * 1000000000)
        .cast("bigint")
    )


def _tdiv1000(col: str) -> str:
    """SQL: trunc-toward-zero divide by 1000 (sign-split so Spark div
    and DuckDB // agree on negatives too)."""
    return (
        f"CASE WHEN {col} >= 0 THEN {col} div 1000"
        f" ELSE -((-{col}) div 1000) END"
    )


def sq8_scan(
    emb: DataFrame, every: int = SQ8_EVERY, k: int = SQ8_K
) -> DataFrame:
    """(query_id, neighbor_id, adc, rnk): inner-product top-k of raw
    queries against SQ8 midpoint reconstructions.

    Plan shape (r12 rework): the ONLY exploded pass is the per-dim
    min/max grid (map-side combinable, 64 result rows); the grid then
    broadcasts as two index-ordered ARRAYS and quantize / reconstruct
    / dot-product all run IN-ROW over the vector arrays — the first
    draft exploded every vector to 64 rows and re-collected it twice
    (two corpus-sized exchanges this form deletes)."""
    x9v = F.expr(
        "transform(embedding, v ->"
        " CAST(CAST(round(CAST(v AS DOUBLE), 9) AS DECIMAL(18,9))"
        " * 1000000000 AS BIGINT))"
    )
    vecs = emb.select("vec_id", x9v.alias("x9v"))
    from ..cache import persist_tracked

    vecs = persist_tracked(vecs)
    grid = (
        vecs.select(F.posexplode("x9v").alias("pos", "x9"))
        .groupBy("pos")
        .agg(F.min("x9").alias("mn9"), F.max("x9").alias("mx9"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mn9"))),
                lambda s: s.mn9,
            ).alias("mns"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mx9"))),
                lambda s: s.mx9,
            ).alias("mxs"),
        )
    )
    # r9 = mn + ((2*code + 1)*(mx - mn)) div 512 with
    # code = ((x - mn)*255) div (mx - mn); then re-pin to 1e-6 units
    r9 = (
        "(mns[i-1] + ((2 * (CASE WHEN mxs[i-1] > mns[i-1]"
        " THEN ((x9v[i-1] - mns[i-1]) * 255) div (mxs[i-1] - mns[i-1])"
        " ELSE 0 END) + 1) * (mxs[i-1] - mns[i-1])) div 512)"
    )
    recon = vecs.crossJoin(F.broadcast(grid)).selectExpr(
        "vec_id",
        f"transform(sequence(1, size(x9v)), i ->"
        f" CASE WHEN {r9} >= 0 THEN {r9} div 1000"
        f" ELSE -((-({r9})) div 1000) END) AS rv",
    )
    qv = (
        vecs.where(F.col("vec_id") % every == 0)
        .selectExpr(
            "vec_id AS query_id",
            "transform(x9v, x -> CASE WHEN x >= 0 THEN x div 1000"
            " ELSE -((-x) div 1000) END) AS qv",
        )
    )
    scores = (
        F.broadcast(qv)
        .crossJoin(recon)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.aggregate(
                F.zip_with("qv", "rv", lambda a, b: a * b),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("adc"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    return (
        scores.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "query_id", "neighbor_id", "adc",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def sq8_scan_sql(every: int = SQ8_EVERY, k: int = SQ8_K) -> str:
    d1000 = _tdiv1000("x9").replace("div", "//")
    r1000 = _tdiv1000("r9").replace("div", "//")
    return f"""
WITH dims AS (
  SELECT e.vec_id, u.pos,
         CAST(CAST(round(CAST(u.val AS DOUBLE), 9) AS DECIMAL(18,9))
              * 1000000000 AS BIGINT) AS x9
  FROM embeddings e,
  LATERAL (SELECT unnest(list_transform(e.embedding,
                  (v, i) -> {{'pos': i, 'val': v}})) AS u)
),
grid AS (SELECT pos, min(x9) AS mn9, max(x9) AS mx9 FROM dims GROUP BY pos),
r6d AS (
  SELECT vec_id, pos, {r1000} AS r6
  FROM (SELECT d.vec_id, d.pos,
               g.mn9 + ((2 * (CASE WHEN g.mx9 > g.mn9
                              THEN ((d.x9 - g.mn9) * 255) // (g.mx9 - g.mn9)
                              ELSE 0 END) + 1) * (g.mx9 - g.mn9)) // 512 AS r9
        FROM dims d JOIN grid g USING (pos))
),
recon AS (SELECT vec_id, list(r6 ORDER BY pos) AS rv FROM r6d GROUP BY vec_id),
qv AS (
  SELECT vec_id AS query_id, list({d1000} ORDER BY pos) AS qv
  FROM dims WHERE vec_id % {every} = 0 GROUP BY vec_id
),
scores AS (
  SELECT q.query_id, r.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(generate_series(1, len(q.qv)),
              i -> q.qv[i] * r.rv[i])) AS BIGINT) AS adc
  FROM qv q JOIN recon r ON r.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, adc, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY adc DESC, neighbor_id) AS rnk
  FROM scores) WHERE rnk <= {k}
"""


def _pack_words(dims: int) -> list:
    """One Column per 32-dim word: sum of 1<<i over positive dims
    (SQL-lambda form — shiftleft by a lambda index is expression-only)."""
    return [
        F.expr(
            f"aggregate(transform(slice(embedding, {w + 1}, {_WORD}),"
            " (x, i) -> IF(x > 0, shiftleft(1L, i), 0L)),"
            " 0L, (acc, v) -> acc + v)"
        ).alias(f"w{w // _WORD}")
        for w in range(0, dims, _WORD)
    ]


def binary_hamming_scan(
    emb: DataFrame, dims: int, every: int = BIN_EVERY, k: int = BIN_K
) -> DataFrame:
    """(query_id, neighbor_id, hamming, rnk): sign-bit-packed Hamming
    top-k (smallest distance first, neighbor_id tiebreak)."""
    nwords = (dims + _WORD - 1) // _WORD
    packed = emb.select("vec_id", *_pack_words(dims))
    from ..cache import persist_tracked

    packed = persist_tracked(packed)
    q = packed.where(F.col("vec_id") % every == 0)
    q = q.select(
        F.col("vec_id").alias("query_id"),
        *[F.col(f"w{i}").alias(f"qw{i}") for i in range(nwords)],
    )
    ham = None
    for i in range(nwords):
        term = F.bit_count(F.expr(f"qw{i} ^ w{i}"))
        ham = term if ham is None else ham + term
    cand = (
        F.broadcast(q)
        .crossJoin(packed)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            ham.cast("bigint").alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "query_id", "neighbor_id", "hamming",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def binary_hamming_sql(
    dims: int, every: int = BIN_EVERY, k: int = BIN_K
) -> str:
    nwords = (dims + _WORD - 1) // _WORD
    packs = ",\n         ".join(
        f"CAST(list_sum(list_transform(generate_series(1,{_WORD}),"
        f" i -> CASE WHEN embedding[{w * _WORD}+i] > 0"
        f" THEN 1::BIGINT << (i-1) ELSE 0 END)) AS BIGINT) AS w{w}"
        for w in range(nwords)
    )
    hsum = " + ".join(
        f"bit_count(xor(q.w{i}, c.w{i}))" for i in range(nwords)
    )
    return f"""
WITH packed AS (
  SELECT vec_id,
         {packs}
  FROM embeddings
),
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST({hsum} AS BIGINT) AS hamming
  FROM packed q JOIN packed c
    ON q.vec_id % {every} = 0 AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, hamming, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY hamming, neighbor_id) AS rnk
  FROM cand) WHERE rnk <= {k}
"""
