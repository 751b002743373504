"""Retrieval wave (round 4): BM25 ranked search over the document corpus,
plus the three TPC-H decorrelation shapes the suite still lacked — Q18
(IN over a grouped HAVING), Q21 (EXISTS + NOT EXISTS pair with a
same-key / different-key residual), and Q22 (scalar-subquery threshold +
NOT EXISTS anti join).

BM25 is the natural next step past the reference's TF-IDF pipeline: the
reference builds exactly the document-frequency table BM25's idf term
needs (/root/reference/tfidf-calculator/calculate_idf_scores.py:40-60)
and scores documents by summed term weights
(/root/reference/worker.py:76-84);
BM25 adds the saturating tf and length normalization that make the score
a ranking function. All four queries are [Q]: exact DuckDB twins, with
every floating-point aggregate rounded to fixed decimals before an exact
decimal/integer sum so the value hash is partition-order independent.

Scale notes (SCALE.md §Retrieval wave): BM25 filters the exploded token
stream to the query vocabulary BEFORE any aggregation — the shuffled
volume is bounded by postings of the queried terms, never corpus token
count — and doc length rides the explode so no corpus-wide doc_id join
is ever made; the per-query top-k is a WindowGroupLimit (partial top-k
below the shuffle). Q18's HAVING filter reduces the fact table to the
qualifying-order set before either dimension join; Q21's EXISTS /
NOT EXISTS pair becomes one semi + one anti join, both equi on orderkey
with the supplier inequality as a residual; Q22's scalar threshold is an
exact cents-average broadcast, and the dormancy test is an anti join
against the date-pruned orders slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..cache import persist_tracked
from ..functions import text as T
from ..sources import load_table
from ..sources.catalog import spread
from .registry import register

# ---------------------------------------------------------------------------
# BM25 top-k retrieval
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10
# Fixed benchmark query set (terms drawn from the synthetic corpus vocab).
_BM25_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (1, ("hash", "join", "merge")),
    (2, ("window", "sort", "order")),
    (3, ("stream", "batch", "spark")),
)

_BM25_VALUES_SQL = ",".join(
    f"({qid},'{w}')" for qid, ws in _BM25_QUERIES for w in ws
)


# CTE chain ending in `bm25_scored(query_id, doc_id, score)` — shared by the
# plain top-k oracle and the hybrid-fusion oracle so both engines score from
# ONE definition of BM25.
_BM25_SCORED_CTES = f"""
qterms(query_id, word) AS (VALUES {_BM25_VALUES_SQL}),
toks AS (
  SELECT doc_id, len({T.tokens_sql('text')}) AS dl,
         unnest({T.tokens_sql('text')}) AS word
  FROM documents
),
stats AS (
  -- over documents, not toks: a zero-token doc must still count in N/avgdl
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum({T.token_count_sql('text')}) AS DOUBLE) / count(*) AS avgdl
  FROM documents
),
tf AS (
  SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS tf,
         CAST(any_value(dl) AS DOUBLE) AS dl
  FROM toks
  WHERE word IN (SELECT DISTINCT word FROM qterms)
  GROUP BY doc_id, word
),
df AS (SELECT word, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY word),
contrib AS (
  SELECT q.query_id, tf.doc_id,
         CAST(round(
           ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * {_BM25_K1 + 1.0}
           / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                                    + {_BM25_B} * tf.dl / stats.avgdl)),
           6) AS DECIMAL(18,6)) AS c,
         CASE WHEN tf.tf >= 2 THEN 1 ELSE 0 END AS deep
  FROM tf
  JOIN qterms q USING (word)
  JOIN df USING (word)
  CROSS JOIN stats
),
bm25_scored AS (
  -- grade: graded-relevance judgment for the NDCG evaluator — the number
  -- of distinct query terms the doc repeats (tf >= 2). Independent enough
  -- of the score's saturating-tf ordering to make NDCG non-trivial;
  -- consumers that don't select it are unaffected.
  SELECT query_id, doc_id, CAST(sum(c) AS DOUBLE) AS score,
         CAST(sum(deep) AS BIGINT) AS grade
  FROM contrib GROUP BY query_id, doc_id
)"""


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, score) BM25 relation — the Spark twin of
    ``_BM25_SCORED_CTES``; see text_bm25_topk's docstring for the plan
    shape (vocab prefilter, dl riding the explode, persisted tf)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    exploded = spread(docs).select(
        "doc_id",
        F.size(toks).alias("dl"),
        F.explode(toks).alias("word"),
    )
    vocab = sorted({w for _, ws in _BM25_QUERIES for w in ws})
    # persisted: tf is query-vocabulary-bounded (tiny next to the corpus)
    # and feeds BOTH the df aggregate and the scoring join — without the
    # persist, the df branch re-tokenizes the whole corpus a second time.
    tf = persist_tracked(
        exploded.where(F.col("word").isin(vocab))
        .groupBy("doc_id", "word")
        .agg(
            F.count("*").cast("double").alias("tf"),
            F.any_value("dl").cast("double").alias("dl"),
        )
    )
    df_t = tf.groupBy("word").agg(F.count("*").cast("double").alias("df"))
    stats = docs.select(F.size(toks).alias("dl")).agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    qterms = spark.createDataFrame(
        [(qid, w) for qid, ws in _BM25_QUERIES for w in ws],
        "query_id int, word string",
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + F.lit(_BM25_K1) * (
        F.lit(1.0) - F.lit(_BM25_B)
        + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
    )
    contrib = (
        tf.join(F.broadcast(qterms), "word")
        .join(F.broadcast(df_t), "word")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.round(idf * F.col("tf") * F.lit(_BM25_K1 + 1.0) / denom, 6)
            .cast("decimal(18,6)")
            .alias("c"),
            F.when(F.col("tf") >= 2, 1).otherwise(0).alias("deep"),
        )
    )
    return contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c").cast("double").alias("score"),
        F.sum("deep").cast("bigint").alias("grade"),
    )


@register(
    "text_bm25_topk",
    oracle=f"""
WITH {_BM25_SCORED_CTES}
SELECT query_id, doc_id, score, rk FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rk
  FROM bm25_scored
) WHERE rk <= {_BM25_TOPK}
""",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval: score every document against a fixed set of
    keyword queries with Lucene-variant BM25 (idf = ln((N-df+.5)/(df+.5)+1),
    saturating tf, length normalization b=0.75) and keep the top-10 per
    query. Extends the reference's TF-IDF weighting
    (/root/reference/tfidf-calculator/calculate_idf_scores.py:40-60,
    /root/reference/worker.py:76-84) into a ranking function over the same
    document-frequency statistics.

    Scale shape: doc length (dl) is computed per row and RIDES the token
    explode, so tf and dl come out of one grouped pass with no corpus-wide
    doc_id join; the exploded stream is filtered to the query vocabulary
    before the shuffle, bounding shuffled rows by the queried terms'
    postings (stopword-class terms are the skew watch item — a df cap
    drops them before scoring if needed). N and avgdl are a broadcast
    1-row aggregate; df is vocabulary-sized and broadcast; the per-query
    top-k is rank-over-window, which Spark executes as WindowGroupLimit
    (partial top-k below the final shuffle). Every per-term contribution
    is rounded to 6 decimals and summed as DECIMAL(18,6), so the score is
    bit-identical across engines and partition orders."""
    scored = _bm25_scored(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _BM25_TOPK)
        .select("query_id", "doc_id", "score", "rk")
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 — large-volume orders (IN over grouped HAVING)
# ---------------------------------------------------------------------------

_Q18_MIN_QTY = 200


@register(
    "rel_tpch_q18_large_orders",
    oracle=f"""
SELECT c_name, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING sum(CAST(l_quantity AS BIGINT)) > {_Q18_MIN_QTY})
GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
""",
)
def rel_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    lineitem quantity exceeds a threshold, with their customer — the
    canonical IN-over-grouped-HAVING subquery (reference has no
    subqueries; Tier C breadth). The oracle states the IN literally; the
    engine runs the decorrelated form: aggregate once, filter on the
    aggregate, and reuse THAT row as both the filter and the total_qty
    payload, so the fact table is scanned and aggregated exactly once
    (the oracle's restated join+group-by provably regroups to the same
    per-order row).

    Scale shape: the HAVING filter cuts the per-order aggregate to the
    rare heavy tail before either dimension join, so the join probe side
    is tiny (AQE turns both into broadcasts at runtime); quantities are
    integral by fixture contract and summed as int64, so total_qty is
    exact under any partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .where(F.col("total_qty") > _Q18_MIN_QTY)
    )
    return (
        orders.join(qty, orders.o_orderkey == qty.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 — lone late supplier (EXISTS + NOT EXISTS pair)
# ---------------------------------------------------------------------------


@register(
    "rel_tpch_q21_late_suppliers",
    oracle="""
WITH late AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
)
SELECT s_name, count(*) AS numwait
FROM late w
JOIN supplier ON w.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = w.l_orderkey
                AND l2.l_suppkey <> w.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = w.l_orderkey
                    AND l3.l_suppkey <> w.l_suppkey)
GROUP BY s_name
""",
)
def rel_tpch_q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): per supplier,
    the number of multi-supplier orders where it was the ONLY late
    supplier — the hardest decorrelation pair in the TPC-H suite: a
    correlated EXISTS (some OTHER supplier participated) and a correlated
    NOT EXISTS (no OTHER supplier was late), both correlating on the
    outer row's orderkey AND suppkey. "Late" is shipdate > orderdate+30d,
    the same fixture adaptation rel_tpch_q4 pins (no l_commitdate /
    l_receiptdate columns).

    Scale shape: EXISTS → LEFT SEMI and NOT EXISTS → LEFT ANTI, both equi
    joins on orderkey with the supplier inequality as a residual — never
    a per-row subquery and never a range explosion; the anti join's build
    side is the late set itself (already distinct pairs). Both joins
    carry no payload, short-circuit per probe key, and shuffle on the
    same orderkey, so the exchange is reused across the pair. The final
    supplier join is a broadcast; the numwait agg is supplier-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    pairs = li.select(
        F.col("l_orderkey").alias("p_orderkey"),
        F.col("l_suppkey").alias("p_suppkey"),
    ).distinct()
    others_late = late.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
    )
    lone = (
        late.join(
            pairs,
            (late.l_orderkey == pairs.p_orderkey)
            & (late.l_suppkey != pairs.p_suppkey),
            "left_semi",
        )
        .join(
            others_late,
            (late.l_orderkey == others_late.x_orderkey)
            & (late.l_suppkey != others_late.x_suppkey),
            "left_anti",
        )
    )
    return (
        lone.join(F.broadcast(supp), lone.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 — dormant high-balance accounts (scalar threshold + NOT EXISTS)
# ---------------------------------------------------------------------------

_Q22_NATIONS = (1, 3, 5, 7, 9)
_Q22_CUTOFF = "2001-01-01"


@register(
    "rel_tpch_q22_dormant_accounts",
    oracle=f"""
WITH pool AS (
  SELECT * FROM customer
  WHERE c_nationkey IN {_Q22_NATIONS}
),
avg_bal AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
         / count(*) / 100 AS a
  FROM pool WHERE c_acctbal > 0
)
SELECT c_nationkey, count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100
         AS totacctbal
FROM pool c CROSS JOIN avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}')
GROUP BY c_nationkey
""",
)
def rel_tpch_q22_dormant_accounts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers in a nation
    pool with above-average positive balance and NO recent orders,
    aggregated per nation. Fixture adaptations: the original's phone-
    prefix segments become a nationkey IN-list, and because every fixture
    customer has at least one order, "never ordered" becomes "no order
    since the cutoff" — the same correlated NOT EXISTS, now with a
    pushable date predicate inside the subquery.

    Scale shape: the scalar threshold is computed as an EXACT cents
    average (int64 sum, two deterministic divisions) and broadcast as a
    1-row cross join — a float avg() would make the `>` threshold
    partition-order dependent at the boundary. NOT EXISTS → LEFT ANTI
    against the date-pruned orders projection (the cutoff filter reaches
    the parquet scan, so the anti build side is the recent slice, not
    order history); the nation agg is pool-sized. totacctbal uses the
    same cents trick, so the hash is stable under any partitioning."""
    pool = load_table(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(list(_Q22_NATIONS))
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    avg_bal = (
        pool.where(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(cents).cast("double") / F.count("*") / 100).alias("a")
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(cents).cast("double") / 100).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# hybrid retrieval — BM25 + pseudo-relevance-feedback cosine, RRF-fused
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_DEPTH = 20
_PRF_DEPTH = 10

from ..functions import vectors as _V  # noqa: E402  (module-order: after T)

_HYBRID_COS_SQL = _V.cosine_sql("c.centroid", "e.embedding")


def _prf_centroids(feedback: DataFrame, emb: DataFrame) -> DataFrame:
    """(query_id, centroid) — per-query mean of the feedback docs'
    embeddings. Dimension-keyed exact-decimal means (sum cast to double
    BEFORE the divide), re-assembled as an index-ordered array so the
    downstream cosine folds dims identically on both engines."""
    cparts = (
        # broadcast the queries×10 feedback set and STREAM the corpus-sized
        # embeddings scan — broadcasting emb would invert the scale shape
        F.broadcast(feedback).join(emb, feedback.doc_id == emb.vec_id)
        .select(
            "query_id",
            F.posexplode("embedding").alias("pos", "val"),
        )
        .select(
            "query_id",
            "pos",
            F.round(F.col("val").cast("double"), 9)
            .cast("decimal(18,9)")
            .alias("cval"),
        )
    )
    return (
        cparts.groupBy("query_id", "pos")
        .agg(
            (F.sum("cval").cast("double") / F.count("*")).alias("cdim")
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cdim"))),
                lambda s: s.cdim,
            ).alias("centroid")
        )
    )


@register(
    "sim_hybrid_rrf_fusion",
    oracle=f"""
WITH {_BM25_SCORED_CTES},
lex AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rk
  FROM bm25_scored
  QUALIFY rk <= {_RRF_DEPTH}
),
feedback AS (SELECT query_id, doc_id FROM lex WHERE rk <= {_PRF_DEPTH}),
cparts AS (
  SELECT f.query_id, u.pos,
         CAST(round(CAST(u.val AS DOUBLE), 9) AS DECIMAL(18,9)) AS cval
  FROM feedback f
  JOIN embeddings emb ON emb.vec_id = f.doc_id,
  LATERAL (SELECT unnest(list_transform(emb.embedding,
                  (v, i) -> {{'pos': i, 'val': v}})) AS u)
),
centroids AS (
  SELECT query_id,
         list(CAST(sum_val AS DOUBLE) / cnt ORDER BY pos) AS centroid
  FROM (SELECT query_id, pos, CAST(sum(cval) AS DOUBLE) AS sum_val,
               count(*) AS cnt
        FROM cparts GROUP BY query_id, pos)
  GROUP BY query_id
),
sem AS (
  SELECT c.query_id, e.vec_id AS doc_id,
         row_number() OVER (PARTITION BY c.query_id
                            ORDER BY round({_HYBRID_COS_SQL}, 6) DESC,
                                     e.vec_id) AS rk
  FROM centroids c CROSS JOIN embeddings e
  QUALIFY rk <= {_RRF_DEPTH}
),
fused AS (
  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
         COALESCE(l.doc_id, s.doc_id) AS doc_id,
         CAST(COALESCE(CAST(round(1.0 / ({_RRF_K} + l.rk), 6)
                            AS DECIMAL(18,6)), 0)
            + COALESCE(CAST(round(1.0 / ({_RRF_K} + s.rk), 6)
                            AS DECIMAL(18,6)), 0)
            AS DOUBLE) AS rrf
  FROM lex l
  FULL OUTER JOIN sem s ON l.query_id = s.query_id AND l.doc_id = s.doc_id
)
SELECT query_id, doc_id, rrf, rk FROM (
  SELECT query_id, doc_id, rrf,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf DESC, doc_id) AS rk
  FROM fused
) WHERE rk <= {_BM25_TOPK}
""",
)
def sim_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 lexical ranking with a semantic
    ranking by reciprocal-rank fusion (RRF, k=60). The semantic query
    vector is built by pseudo-relevance feedback (Rocchio): the centroid
    of the BM25 top-10 documents' embeddings, ranked against the whole
    embedding table by cosine. Docs without an embedding row (sf0.1 has
    5000 docs but 2000 vectors) simply can't appear in the semantic
    ranking — RRF's COALESCE handles one-sided hits, which is exactly
    its production use.

    Scale shape: both rankings are top-20 cuts (WindowGroupLimit) before
    the fusion join, so the full-outer join is 2×depth×queries rows —
    trivially broadcastable no matter the corpus size. The centroid is
    dimension-keyed (queries×dims rows) and collected into an ordered
    array per query (index-ordered fold both engines); the semantic scan
    is ONE pass over embeddings against a broadcast centroid set — the
    brute-force baseline; at 100 TB the LSH/IVF index paths
    (operators/similarity.py) replace it with a bucket equi-join.
    Exactness: centroid components are rounded-decimal means; every
    rank contribution is round-6 decimal; cosine folds dims in index
    order — all partition-order independent, so the fused ranking is
    bit-stable across engines."""
    scored = _bm25_scored(spark, sf_dir)
    wq = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    # persisted: lex feeds the feedback centroid AND the fusion join
    lex = persist_tracked(
        scored.withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= _RRF_DEPTH)
        .select("query_id", "doc_id", "rk")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    feedback = lex.where(F.col("rk") <= _PRF_DEPTH).select(
        "query_id", "doc_id"
    )
    centroids = _prf_centroids(feedback, emb)
    cos = _V.cosine("centroid", "embedding")
    wsem = Window.partitionBy("query_id").orderBy(
        F.round(cos, 6).desc(), F.col("vec_id")
    )
    sem = (
        F.broadcast(centroids)
        .crossJoin(emb)
        .withColumn("rk", F.row_number().over(wsem))
        .where(F.col("rk") <= _RRF_DEPTH)
        .select("query_id", F.col("vec_id").alias("doc_id"), "rk")
    )

    def _contrib(rk: F.Column) -> F.Column:
        return F.coalesce(
            F.round(F.lit(1.0) / (F.lit(_RRF_K) + rk), 6).cast(
                "decimal(18,6)"
            ),
            F.lit(0).cast("decimal(18,6)"),
        )

    l = lex.select(
        F.col("query_id").alias("l_qid"),
        F.col("doc_id").alias("l_did"),
        F.col("rk").alias("l_rk"),
    )
    s = sem.select(
        F.col("query_id").alias("s_qid"),
        F.col("doc_id").alias("s_did"),
        F.col("rk").alias("s_rk"),
    )
    fused = l.join(
        s,
        (l.l_qid == s.s_qid) & (l.l_did == s.s_did),
        "full_outer",
    ).select(
        F.coalesce("l_qid", "s_qid").alias("query_id"),
        F.coalesce("l_did", "s_did").alias("doc_id"),
        (_contrib(F.col("l_rk")) + _contrib(F.col("s_rk")))
        .cast("double")
        .alias("rrf"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rk", F.row_number().over(wf))
        .where(F.col("rk") <= _BM25_TOPK)
        .select("query_id", "doc_id", "rrf", "rk")
    )


# ---------------------------------------------------------------------------
# MMR diversified reranking (greedy, unrolled)
# ---------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_CAND = 10
_MMR_PAIR_COS_SQL = _V.cosine_sql("ea.embedding", "eb.embedding")


@register(
    "sim_mmr_rerank",
    oracle=f"""
WITH {_BM25_SCORED_CTES},
feedback AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id) AS rk
    FROM bm25_scored) WHERE rk <= {_PRF_DEPTH}
),
cparts AS (
  SELECT f.query_id, u.pos,
         CAST(round(CAST(u.val AS DOUBLE), 9) AS DECIMAL(18,9)) AS cval
  FROM feedback f
  JOIN embeddings emb ON emb.vec_id = f.doc_id,
  LATERAL (SELECT unnest(list_transform(emb.embedding,
                  (v, i) -> {{'pos': i, 'val': v}})) AS u)
),
centroids AS (
  SELECT query_id,
         list(CAST(sum_val AS DOUBLE) / cnt ORDER BY pos) AS centroid
  FROM (SELECT query_id, pos, CAST(sum(cval) AS DOUBLE) AS sum_val,
               count(*) AS cnt
        FROM cparts GROUP BY query_id, pos)
  GROUP BY query_id
),
cand AS (
  SELECT query_id, doc_id, rel, rk FROM (
    SELECT c.query_id, e.vec_id AS doc_id,
           round({_HYBRID_COS_SQL}, 6) AS rel,
           row_number() OVER (PARTITION BY c.query_id
                              ORDER BY round({_HYBRID_COS_SQL}, 6) DESC,
                                       e.vec_id) AS rk
    FROM centroids c CROSS JOIN embeddings e) WHERE rk <= {_MMR_CAND}
),
sims AS (
  SELECT a.query_id, a.doc_id AS da, b.doc_id AS db,
         round({_MMR_PAIR_COS_SQL}, 6) AS sim
  FROM cand a JOIN cand b
    ON a.query_id = b.query_id AND a.doc_id <> b.doc_id
  JOIN embeddings ea ON ea.vec_id = a.doc_id
  JOIN embeddings eb ON eb.vec_id = b.doc_id
),
p1 AS (SELECT query_id, doc_id, rel FROM cand WHERE rk = 1),
r2 AS (
  SELECT c.query_id, c.doc_id,
         round({_MMR_LAMBDA} * c.rel - {1.0 - _MMR_LAMBDA} * s.sim, 6)
           AS mmr
  FROM cand c
  JOIN p1 ON p1.query_id = c.query_id AND c.doc_id <> p1.doc_id
  JOIN sims s ON s.query_id = c.query_id AND s.da = c.doc_id
             AND s.db = p1.doc_id
),
p2 AS (
  SELECT query_id, doc_id, mmr FROM (
    SELECT query_id, doc_id, mmr,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY mmr DESC, doc_id) AS rk
    FROM r2) WHERE rk = 1
),
r3 AS (
  SELECT c.query_id, c.doc_id,
         round({_MMR_LAMBDA} * c.rel
               - {1.0 - _MMR_LAMBDA} * max(s.sim), 6) AS mmr
  FROM cand c
  JOIN p1 ON p1.query_id = c.query_id AND c.doc_id <> p1.doc_id
  JOIN p2 ON p2.query_id = c.query_id AND c.doc_id <> p2.doc_id
  JOIN sims s ON s.query_id = c.query_id AND s.da = c.doc_id
             AND s.db IN (p1.doc_id, p2.doc_id)
  GROUP BY c.query_id, c.doc_id, c.rel
),
p3 AS (
  SELECT query_id, doc_id, mmr FROM (
    SELECT query_id, doc_id, mmr,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY mmr DESC, doc_id) AS rk
    FROM r3) WHERE rk = 1
)
SELECT query_id, 1 AS pick, doc_id, rel AS mmr FROM p1
UNION ALL SELECT query_id, 2, doc_id, mmr FROM p2
UNION ALL SELECT query_id, 3, doc_id, mmr FROM p3
""",
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversified reranking: greedily pick 3
    results per query maximizing λ·relevance − (1−λ)·max-similarity-to-
    already-picked (λ=0.7) from the top-10 semantic candidates of the
    hybrid pipeline's PRF centroid. MMR is inherently sequential; the
    greedy loop is UNROLLED to its fixed depth as three plan stages —
    the same trick text_textrank_unrolled pins for iterative algorithms,
    keeping the whole operator declarative (and oracle-expressible)
    instead of a driver-side loop.

    Scale shape: the candidate set is a per-query top-k cut
    (WindowGroupLimit) BEFORE any pairwise work; candidate embeddings
    are fetched once (broadcast id list, streamed corpus scan) and each
    greedy round computes only the ~k cosines against that round's
    1-row-per-query picked set — never the full k² pairwise matrix, and
    never a corpus-sized broadcast. The candidate relevance scan is the same single embeddings
    pass as the hybrid query (broadcast centroids); everything after it
    is candidate-bounded. Exactness: rel/sim/mmr are all round-6 with
    doc_id tiebreaks — a total order per round, so both engines pick
    identical chains (a first-pick tie changes every later round;
    round-6 + id tiebreak makes that impossible to diverge)."""
    scored = _bm25_scored(spark, sf_dir)
    wq = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    feedback = (
        scored.withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= _PRF_DEPTH)
        .select("query_id", "doc_id")
    )
    # r13: the candidate-relevance pass folds a 64-dim cosine per
    # (query, vector) pair — an interpreted HOF over the one-split
    # embeddings scan that ran single-task; the gated rebalance spreads
    # it (guide §2.5 input skew).
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    centroids = _prf_centroids(feedback, emb)
    cos = _V.cosine("centroid", "embedding")
    wsem = Window.partitionBy("query_id").orderBy(
        F.round(cos, 6).desc(), F.col("vec_id")
    )
    # persisted: cand feeds p1, both greedy rounds, and cand_emb
    cand = persist_tracked(
        F.broadcast(centroids)
        .crossJoin(emb)
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.round(cos, 6).alias("rel"),
            F.row_number().over(wsem).alias("rk"),
        )
        .where(F.col("rk") <= _MMR_CAND)
    )
    # candidate embeddings: restrict the corpus scan to the ≤ queries×k
    # candidate set ONCE (broadcast the tiny id list, STREAM emb — never
    # broadcast the corpus side); every pairwise cosine below runs on
    # this candidate-bounded relation.
    cand_emb = persist_tracked(
        F.broadcast(cand.select("query_id", "doc_id"))
        .join(emb, F.col("doc_id") == emb.vec_id)
        .select("query_id", "doc_id", "embedding")
    )

    def _sims_to(picked: DataFrame) -> DataFrame:
        """Round-6 cosine of every candidate to ONE picked doc per query
        (picked: p_qid, p_did). Computing sims per greedy round against
        the 1-row-per-query picked set costs ~k cosines per round — the
        full k×(k-1) pairwise matrix would evaluate ~k²/2 folds of which
        the depth-3 greedy reads only the two picked slices."""
        pe = (
            F.broadcast(picked)
            .join(
                cand_emb,
                (F.col("p_qid") == cand_emb.query_id)
                & (F.col("p_did") == cand_emb.doc_id),
            )
            .select("p_qid", "p_did", F.col("embedding").alias("p_emb"))
        )
        ce = cand_emb.select(
            F.col("query_id").alias("c_qid"),
            F.col("doc_id").alias("c_did"),
            F.col("embedding").alias("c_emb"),
        )
        return ce.join(
            F.broadcast(pe),
            (F.col("c_qid") == F.col("p_qid"))
            & (F.col("c_did") != F.col("p_did")),
        ).select(
            F.col("c_qid").alias("query_id"),
            F.col("c_did").alias("doc_id"),
            F.round(_V.cosine("c_emb", "p_emb"), 6).alias("sim"),
        )

    p1 = cand.where(F.col("rk") == 1).select(
        F.col("query_id").alias("p1_qid"),
        F.col("doc_id").alias("p1_did"),
        F.col("rel").alias("p1_rel"),
    )

    def _pick(r: DataFrame) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(
            F.col("mmr").desc(), F.col("doc_id")
        )
        return (
            r.withColumn("prk", F.row_number().over(w))
            .where(F.col("prk") == 1)
            .select("query_id", "doc_id", "mmr")
        )

    lam, lam1 = F.lit(_MMR_LAMBDA), F.lit(1.0 - _MMR_LAMBDA)
    s1 = _sims_to(
        p1.select(
            F.col("p1_qid").alias("p_qid"), F.col("p1_did").alias("p_did")
        )
    )
    r2 = cand.join(s1, ["query_id", "doc_id"]).select(
        "query_id",
        "doc_id",
        F.round(lam * F.col("rel") - lam1 * F.col("sim"), 6).alias("mmr"),
    )
    p2 = _pick(r2).select(
        F.col("query_id").alias("p2_qid"),
        F.col("doc_id").alias("p2_did"),
        "mmr",
    )
    s2 = _sims_to(
        p2.select(
            F.col("p2_qid").alias("p_qid"), F.col("p2_did").alias("p_did")
        )
    )
    r3 = (
        s1.unionByName(s2)
        .join(
            F.broadcast(p1),
            (F.col("query_id") == F.col("p1_qid"))
            & (F.col("doc_id") != F.col("p1_did")),
        )
        .join(
            F.broadcast(p2.select("p2_qid", "p2_did")),
            (F.col("query_id") == F.col("p2_qid"))
            & (F.col("doc_id") != F.col("p2_did")),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.max("sim").alias("maxsim"))
        .join(cand, ["query_id", "doc_id"])
        .select(
            "query_id",
            "doc_id",
            F.round(lam * F.col("rel") - lam1 * F.col("maxsim"), 6).alias(
                "mmr"
            ),
        )
    )
    p3 = _pick(r3)
    out1 = p1.select(
        F.col("p1_qid").alias("query_id"),
        F.lit(1).alias("pick"),
        F.col("p1_did").alias("doc_id"),
        F.col("p1_rel").alias("mmr"),
    )
    out2 = p2.select(
        F.col("p2_qid").alias("query_id"),
        F.lit(2).alias("pick"),
        F.col("p2_did").alias("doc_id"),
        "mmr",
    )
    out3 = p3.select(
        "query_id", F.lit(3).alias("pick"), "doc_id", "mmr"
    )
    return out1.unionByName(out2).unionByName(out3)


# ---------------------------------------------------------------------------
# NDCG@k ranking-quality evaluation
# ---------------------------------------------------------------------------

_NDCG_K = 10


@register(
    "text_bm25_ndcg_eval",
    oracle=f"""
WITH {_BM25_SCORED_CTES},
ranked AS (
  SELECT query_id, grade,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rnk
  FROM bm25_scored
),
ideal AS (
  SELECT query_id, grade,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY grade DESC, doc_id) AS rnk
  FROM bm25_scored
),
dcg AS (
  SELECT query_id,
         sum(CAST(round((pow(2, grade) - 1) / log2(rnk + 1), 9)
                  AS DECIMAL(18,9))) AS dcg
  FROM ranked WHERE rnk <= {_NDCG_K} GROUP BY query_id
),
idcg AS (
  SELECT query_id,
         sum(CAST(round((pow(2, grade) - 1) / log2(rnk + 1), 9)
                  AS DECIMAL(18,9))) AS idcg
  FROM ideal WHERE rnk <= {_NDCG_K} GROUP BY query_id
)
SELECT d.query_id,
       -- raw IEEE quotient of two exact decimals, deliberately not
       -- rounded: the division of identical doubles is bit-identical,
       -- rounding a ratio of grid values is not (sf0.1 lesson)
       CAST(d.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE) AS ndcg_at_10
FROM dcg d JOIN idcg i USING (query_id)
WHERE CAST(i.idcg AS DOUBLE) > 0
""",
)
def text_bm25_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the BM25 ranking against a graded relevance judgment —
    the ranking-quality evaluator a retrieval stack needs next to its
    recall report (`sim_recall_report`). Relevance grade = number of
    distinct query terms the document repeats (tf >= 2, computed inside
    the shared bm25_scored relation so both engines grade from ONE
    definition); the actual ranking is BM25's saturating-tf order, so the
    two disagree exactly where saturation demotes a term-repeating doc —
    NDCG < 1 on the fixture (query 3), non-degenerate by construction.

    Scale shape: everything is bounded by the queried terms' postings
    (the bm25_scored relation — see text_bm25_topk); on top of it the
    evaluator is two rank-over-window passes (actual by score, ideal by
    grade) that WindowGroupLimit cuts to the top-10 per query BELOW the
    shuffle, then a per-query 10-row aggregate. Exactness: each DCG
    contribution (2^grade - 1)/log2(rank+1) is rounded to 9 decimals and
    summed as DECIMAL(18,9) — partition-order independent — and the final
    ratio is the RAW IEEE quotient of those exact decimals (bit-identical
    across engines; rounding a ratio of grid values is the one
    non-portable step — see the oracle comment). The idcg > 0 guard drops
    all-zero-grade queries identically in both engines instead of
    dividing by zero."""
    scored = _bm25_scored(spark, sf_dir)
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.col("grade").desc(), F.col("doc_id")
    )

    def _dcg(df: DataFrame, w, out: str) -> DataFrame:
        contrib = F.round(
            (F.pow(F.lit(2.0), F.col("grade").cast("double")) - 1.0)
            / F.log2(F.col("rnk") + 1),
            9,
        ).cast("decimal(18,9)")
        return (
            df.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= _NDCG_K)
            .select("query_id", contrib.alias("c"))
            .groupBy("query_id")
            .agg(F.sum("c").alias(out))
        )

    dcg = _dcg(scored, w_rank, "dcg")
    idcg = _dcg(scored, w_ideal, "idcg")
    return (
        dcg.join(idcg, "query_id")
        .where(F.col("idcg").cast("double") > 0)
        .select(
            "query_id",
            (F.col("dcg").cast("double") / F.col("idcg").cast("double"))
            .alias("ndcg_at_10"),
        )
    )


# ---------------------------------------------------------------------------
# Sparse TF-IDF cosine all-pairs (posting-list join)
# ---------------------------------------------------------------------------

# df cap: words in more than half the corpus carry no discriminative weight
# and their postings dominate the self-join's Sum(df^2) cost — the standard
# DAAT prune. df >= 2 because a df-1 word can't produce a pair.
_SPARSE_MAX_DF_FRAC = 0.5
_SPARSE_MIN_DF = 2
_SPARSE_COS_MIN = 0.5


@register(
    "sim_sparse_tfidf_pairs",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({T.tokens_sql('text')}) AS word FROM documents
),
tf AS (
  SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS tf
  FROM toks GROUP BY doc_id, word
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
df AS (SELECT word, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY word),
w AS (
  SELECT tf.doc_id, tf.word,
         CAST(round(tf.tf * ln(n.n_docs / df.df), 6) AS DECIMAL(18,6)) AS wt
  FROM tf JOIN df USING (word) CROSS JOIN n
  WHERE df.df <= {_SPARSE_MAX_DF_FRAC} * n.n_docs
    AND df.df >= {_SPARSE_MIN_DF}
),
norms AS (
  SELECT doc_id, sqrt(CAST(sum(wt * wt) AS DOUBLE)) AS nrm
  FROM w GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(sum(a.wt * b.wt) AS DOUBLE) AS dot
  FROM w a JOIN w b USING (word)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, cos FROM (
  SELECT d.doc_a, d.doc_b,
         round(d.dot / (na.nrm * nb.nrm), 6) AS cos
  FROM dots d
  JOIN norms na ON na.doc_id = d.doc_a
  JOIN norms nb ON nb.doc_id = d.doc_b
) WHERE cos >= {_SPARSE_COS_MIN}
""",
)
def sim_sparse_tfidf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs SPARSE cosine similarity over TF-IDF vectors via a
    posting-list self-join — the lexical complement of the dense-embedding
    near-dup paths (`sim_cosine_near_dups` works on array<float>
    embeddings; this works on the documents' own term weights, the
    document-at-a-time sparse form classic all-pairs similarity search
    uses). Pairs sharing at least one informative word get their dot
    product from an equi-join on word; normalization divides by
    per-document norms computed over the SAME df-capped vocabulary.

    Scale shape: the self-join's shuffled volume is Sum_w df(w)^2 over the
    CAPPED vocabulary only — the df <= 0.5N prune drops stop-dense
    postings before the join (the standard DAAT bound; on the fixture it
    cuts candidate pairs 400x: 124,745 -> 300), and df >= 2 drops the
    pair-less tail. At 100 TB the remaining hot postings bound the skew:
    the next tightening is prefix filtering (dedup_prefix_filter_join) or
    banding (dedup_minhash_near_dups) — this query IS the exact verifier
    those approximations are recalled against. Exactness: weights are
    round-6 decimals, dot products and squared norms are exact decimal
    sums of decimal products (partition-order independent), cosine is
    round-6 double — bit-identical across engines."""
    docs = load_table(spark, sf_dir, "documents")
    exploded = spread(docs).select(
        "doc_id", F.explode(T.tokens("text")).alias("word")
    )
    tf = exploded.groupBy("doc_id", "word").agg(
        F.count("*").cast("double").alias("tf")
    )
    stats = docs.agg(F.count("*").cast("double").alias("n_docs"))
    df_t = tf.groupBy("word").agg(F.count("*").cast("double").alias("df"))
    # persisted: w feeds the norms aggregate AND both sides of the
    # pair join — three consumers of one tokenize+weight pass.
    w = persist_tracked(
        tf.join(F.broadcast(df_t), "word")
        .crossJoin(F.broadcast(stats))
        .where(
            (F.col("df") <= _SPARSE_MAX_DF_FRAC * F.col("n_docs"))
            & (F.col("df") >= _SPARSE_MIN_DF)
        )
        .select(
            "doc_id",
            "word",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
            .cast("decimal(18,6)")
            .alias("wt"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt")).cast("double")).alias("nrm")
    )
    a = w.select(
        F.col("doc_id").alias("doc_a"), "word", F.col("wt").alias("wa")
    )
    b = w.select(
        F.col("doc_id").alias("doc_b"), "word", F.col("wt").alias("wb")
    )
    dots = (
        a.join(b, "word")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("double").alias("dot"))
    )
    # norms is corpus-cardinality (one row per surviving doc) — no
    # broadcast hint: AQE picks broadcast at small SF and shuffle join at
    # scale, unlike the genuinely vocabulary-sized df_t above.
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "cos"
            ),
        )
        .where(F.col("cos") >= _SPARSE_COS_MIN)
    )


# ---------------------------------------------------------------------------
# matryoshka prefix-dimension recall eval (staged r7 -> r8)
# ---------------------------------------------------------------------------

_MRL_PREFIX = 16   # prefix dims scored against the full 64
_MRL_K = 10


def _mrl_recall_sql() -> str:
    cos_full = _V.cosine_sql("a.embedding", "b.embedding")
    cos_pre = _V.cosine_sql(
        f"list_slice(a.embedding, 1, {_MRL_PREFIX})",
        f"list_slice(b.embedding, 1, {_MRL_PREFIX})",
    )
    return f"""
WITH full_rk AS (
  SELECT * FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY round({cos_full}, 6) DESC, b.vec_id)
             AS rk
    FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id
  ) WHERE rk <= {_MRL_K}
),
pre_rk AS (
  SELECT * FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY round({cos_pre}, 6) DESC, b.vec_id)
             AS rk
    FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id
  ) WHERE rk <= {_MRL_K}
),
hits AS (
  SELECT f.query_id, count(*) AS n_overlap
  FROM full_rk f JOIN pre_rk p
    ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
  GROUP BY f.query_id
)
SELECT q.query_id,
       CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(round(CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / {_MRL_K}, 4)
            AS DOUBLE) AS recall_at_k
FROM (SELECT DISTINCT query_id FROM full_rk) q
LEFT JOIN hits h ON h.query_id = q.query_id
"""


@register("sim_dim_prefix_recall", oracle=_mrl_recall_sql())
def sim_dim_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style prefix-dimension recall eval: rank top-10
    neighbors by the FIRST 16 dims only, diff against the
    full-dimension ground truth, report per-query recall@k — the offline
    eval that decides how many leading dims an MRL-trained embedding can
    shed for cheap first-stage retrieval (these fixtures' embeddings are
    random, so the measured recall is the no-structure baseline an MRL
    model must beat). Both rankings reuse the exact broadcast-tile
    mapInArrow kernel (operators/similarity.py::topk) — the prefix pass
    just slices the array column first, paying 16/64 of the
    FLOPs, which is the entire point of prefix retrieval at serving time.

    Scale shape: two kernel passes (no n^2 shuffle — top-k selected
    inside the kernel against broadcast build tiles), one equi-join of
    two k*n_query-row rankings on (query, neighbor), one query-keyed
    count. The left join from the full-rank query list keeps
    zero-overlap queries in the report (recall 0, not a dropped row)."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    pre = emb.select(
        "vec_id", F.slice("embedding", 1, _MRL_PREFIX).alias("embedding")
    )
    full_rk = similarity.topk(emb, _MRL_K).select("query_id", "neighbor_id")
    pre_rk = similarity.topk(pre, _MRL_K).select("query_id", "neighbor_id")
    hits = (
        full_rk.join(pre_rk, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        full_rk.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_overlap"), F.lit(0))
            .cast("bigint")
            .alias("n_overlap"),
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double")
                / _MRL_K,
                4,
            ).alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# hard-negative mining for retrieval training (staged r7 -> r8)
# ---------------------------------------------------------------------------

def _hard_neg_sql() -> str:
    cos = _V.cosine_sql("a.embedding", "b.embedding")
    return f"""
WITH pr AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid, a.label AS la, b.label AS lb,
         round({cos}, 6) AS c
  FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id
),
pos AS (
  SELECT qid, nid, c FROM (
    SELECT qid, nid, c,
           row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS rk
    FROM pr WHERE la = lb
  ) WHERE rk = 1
),
neg AS (
  SELECT qid, nid, c FROM (
    SELECT qid, nid, c,
           row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS rk
    FROM pr WHERE la <> lb
  ) WHERE rk = 1
)
SELECT p.qid AS query_id,
       p.nid AS positive_id, CAST(p.c AS DOUBLE) AS pos_cosine,
       n.nid AS negative_id, CAST(n.c AS DOUBLE) AS neg_cosine,
       CAST(round(p.c - n.c, 6) AS DOUBLE) AS margin
FROM pos p JOIN neg n USING (qid)
"""


@register("sim_hard_negatives", oracle=_hard_neg_sql())
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — the training-data op behind every modern
    retrieval/embedding model: for each vector, emit its most similar
    SAME-label neighbor (the positive) and its most similar
    DIFFERENT-label neighbor (the hard negative), plus the margin between
    them. Small/negative margins are exactly the triplets contrastive
    training needs most; labels play the role of relevance groups.

    Physical plan: exactly TWO broadcast-tile kernel passes — one with a
    same-label candidate mask (positives), one with a diff-label mask
    (negatives) — applied INSIDE the kernel (labels ride the broadcast
    tiles and the probe batches; masked elements join the self-pair
    exclusion class). Kernel-pass count is independent of label
    cardinality: the r7 verdict flagged the previous 2·|labels|
    driver-looped form as quadratic pain at thousands of labels, and
    this is its fold-into-the-kernel fix (same hash output, asserted by
    tests/test_retrieval.py). No n^2 shuffle, no driver collect of
    label values at all."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    pos = similarity.topk(
        emb, 1, label_col="label", label_mode="same"
    ).select(
        "query_id",
        F.col("neighbor_id").alias("positive_id"),
        F.col("cosine").alias("pos_cosine"),
    )
    neg = similarity.topk(
        emb, 1, label_col="label", label_mode="diff"
    ).select(
        "query_id",
        F.col("neighbor_id").alias("negative_id"),
        F.col("cosine").alias("neg_cosine"),
    )
    return pos.join(neg, "query_id").select(
        "query_id",
        "positive_id",
        "pos_cosine",
        "negative_id",
        "neg_cosine",
        F.round(F.col("pos_cosine") - F.col("neg_cosine"), 6).alias("margin"),
    )


# ---------------------------------------------------------------------------
# margin-based bitext mining (built r8, staged r9)
# ---------------------------------------------------------------------------

_BTX_C = 16  # forward candidates considered per source vector
_BTX_K = 4   # top-k depth of the margin normalizer averages


def _bitext_margin_sql() -> str:
    from ..functions import vectors as V

    cos = f"round({V.cosine_sql('a.embedding', 'b.embedding')}, 6)"
    micro = f"CAST(round({cos} * 1000000, 0) AS BIGINT)"
    denom = 2 * _BTX_K * 1_000_000
    return f"""
WITH sa AS (SELECT * FROM embeddings WHERE label <= 4),
sb AS (SELECT * FROM embeddings WHERE label >= 5),
fwd AS (
  SELECT * FROM (
    SELECT a.vec_id AS qid, b.vec_id AS nid, {micro} AS cmu,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {cos} DESC, b.vec_id) AS rk
    FROM sa a, sb b
  ) WHERE rk <= {_BTX_C}
),
fa AS (
  SELECT qid, CAST(sum(cmu) AS BIGINT) AS sa_mu
  FROM fwd WHERE rk <= {_BTX_K} GROUP BY qid
),
bwd AS (
  SELECT * FROM (
    SELECT b.vec_id AS bq, {micro} AS cmu,
           row_number() OVER (PARTITION BY b.vec_id
                              ORDER BY {cos} DESC, a.vec_id) AS rk
    FROM sa a, sb b
  ) WHERE rk <= {_BTX_K}
),
fb AS (
  SELECT bq AS nid, CAST(sum(cmu) AS BIGINT) AS sb_mu
  FROM bwd GROUP BY bq
),
scored AS (
  SELECT f.qid, f.nid, f.cmu,
         2 * {_BTX_K} * f.cmu - fa.sa_mu - fb.sb_mu AS m_int
  FROM fwd f JOIN fa ON fa.qid = f.qid JOIN fb ON fb.nid = f.nid
)
SELECT qid AS src, nid AS dst,
       CAST(CAST(cmu AS DOUBLE) / 1000000 AS DOUBLE) AS cosine,
       CAST(CAST(m_int AS DOUBLE) / {denom} AS DOUBLE) AS margin
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY m_int DESC, nid) AS mrk
  FROM scored
) WHERE mrk = 1
"""


@register("sim_margin_bitext_mining", oracle=_bitext_margin_sql())
def sim_margin_bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext/pair mining (the LASER/CCMatrix criterion that
    builds parallel-corpus training data): the label space splits into
    two "languages" (labels 0-4 vs 5-9); for each source vector, score
    every forward candidate by its MARGIN over the neighborhood —
    cos(x,y) minus the mean of x's forward top-4 and y's backward
    top-4 cosines — and keep the best-margin mate. Margin beats
    raw cosine because hub vectors (high cosine to everything) get their
    neighborhood average subtracted away; absolute-cosine thresholds
    can't separate hubs from true pairs.

    Exactness: both directions' cosines are the kernel's round-6 values,
    carried as INTEGER micro-units; the normalizers are exact integer
    sums of each side's top-4 micro-cosines over the FIXED
    divisor 2K (k-occupancy normalization — corpora smaller than K
    shrink the normalizer toward zero), so the margin's rank key
    m = 2K*c - sum_fwd - sum_bwd is a pure BIGINT: ranking ties are
    engine-free and no double is ever rounded (the first draft rounded
    the double margin at 6dp and hit a half-boundary at sf0.1 — Spark's
    BigDecimal HALF_UP and DuckDB's binary-double round disagree
    exactly there). The emitted doubles are single divisions of those
    integers.

    Scale shape: TWO broadcast-tile kernel passes (forward k=16,
    backward k=4) — margin is evaluated only on forward kNN
    candidates (the production shape: mine within ANN neighborhoods,
    never score n^2 pairs); the normalizer joins are n*k-row relations
    keyed by vector id. The n^2 appears ONLY in the DuckDB oracle twin."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    side_a = emb.where(F.col("label") <= 4)
    side_b = emb.where(F.col("label") >= 5)

    micro = F.round(F.col("cosine") * 1_000_000, 0).cast("bigint")
    fwd = similarity.topk(side_b, _BTX_C, probe=side_a).select(
        F.col("query_id").alias("qid"),
        F.col("neighbor_id").alias("nid"),
        micro.alias("cmu"),
        "rk",
    )
    fa = (
        fwd.where(F.col("rk") <= _BTX_K)
        .groupBy("qid")
        .agg(F.sum("cmu").cast("bigint").alias("sa_mu"))
    )
    fb = (
        similarity.topk(side_a, _BTX_K, probe=side_b)
        .select(F.col("query_id").alias("b_nid"), micro.alias("b_cmu"))
        .groupBy("b_nid")
        .agg(F.sum("b_cmu").cast("bigint").alias("sb_mu"))
    )
    scored = (
        fwd.join(fa, "qid")
        .join(fb, fwd["nid"] == fb["b_nid"])
        .select(
            "qid",
            "nid",
            "cmu",
            (
                F.lit(2 * _BTX_K) * F.col("cmu")
                - F.col("sa_mu")
                - F.col("sb_mu")
            ).alias("m_int"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("m_int"), F.asc("nid"))
    denom = float(2 * _BTX_K * 1_000_000)
    return (
        scored.withColumn("mrk", F.row_number().over(w))
        .where(F.col("mrk") == 1)
        .select(
            F.col("qid").alias("src"),
            F.col("nid").alias("dst"),
            (F.col("cmu").cast("double") / 1_000_000).alias("cosine"),
            (F.col("m_int").cast("double") / denom).alias("margin"),
        )
    )


# ---------------------------------------------------------------------------
# Greedy k-center coreset selection (built r12, staged r13)
# ---------------------------------------------------------------------------

_KC_K = 4
_KC_CENT_COS_SQL = _V.cosine_sql("c.centroid", "e.embedding")
_KC_PAIR_COS_SQL = _V.cosine_sql("pe.embedding", "e.embedding")


def _kc_sql() -> str:
    parts = [f"""cparts AS (
  SELECT u.pos,
         CAST(round(CAST(u.val AS DOUBLE), 9) AS DECIMAL(18,9)) AS cval
  FROM embeddings emb,
  LATERAL (SELECT unnest(list_transform(emb.embedding,
                  (v, i) -> {{'pos': i, 'val': v}})) AS u)
),
cent AS (
  SELECT list(CAST(sum_val AS DOUBLE) / cnt ORDER BY pos) AS centroid
  FROM (SELECT pos, CAST(sum(cval) AS DOUBLE) AS sum_val,
               count(*) AS cnt
        FROM cparts GROUP BY pos)
),
s0 AS (
  SELECT e.vec_id, round(1 - ({_KC_CENT_COS_SQL}), 6) AS d
  FROM embeddings e CROSS JOIN cent c
  WHERE round(1 - ({_KC_CENT_COS_SQL}), 6) IS NOT NULL
),
p1 AS (
  SELECT 1 AS pick, vec_id, d AS dist FROM s0
  ORDER BY d DESC, vec_id LIMIT 1
)"""]
    prev_union = "SELECT pick, vec_id, dist FROM p1"
    for r in range(2, _KC_K + 1):
        parts.append(f"""m{r} AS (
  SELECT e.vec_id, min(round(1 - ({_KC_PAIR_COS_SQL}), 6)) AS md
  FROM embeddings e
  JOIN ({prev_union}) p ON e.vec_id <> p.vec_id
  JOIN embeddings pe ON pe.vec_id = p.vec_id
  WHERE e.vec_id NOT IN (SELECT vec_id FROM ({prev_union}))
  GROUP BY e.vec_id
  HAVING min(round(1 - ({_KC_PAIR_COS_SQL}), 6)) IS NOT NULL
),
p{r} AS (
  SELECT {r} AS pick, vec_id, md AS dist FROM m{r}
  ORDER BY md DESC, vec_id LIMIT 1
)""")
        prev_union += f" UNION ALL SELECT pick, vec_id, dist FROM p{r}"
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT CAST(pick AS INT) AS pick, vec_id, dist"
          f"\nFROM ({prev_union})"
    )


@register("curation_kcenter_coreset", oracle=_kc_sql(), staged=True)
def curation_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (built r12, staged r13) — the
    COVERAGE-side diverse-subset operator beside SemDeDup (which
    removes redundancy) and MMR (which blends relevance with
    diversity): pick k points so that the farthest point from the
    picked set is as close as possible — the classic 2-approximation
    of the k-center objective, and the standard seed/coreset selector
    a curation pipeline runs to pick maximally-spread exemplars for
    labeling or few-shot pools. Seeded deterministically at the point
    FARTHEST from the corpus centroid (the maximally atypical doc);
    each later round picks the point maximizing its min cosine
    distance to everything already picked.

    Exactness: the centroid is dimension-keyed exact-decimal means
    (the PRF-centroid device); every distance is round-6 with vec_id
    tiebreaks, so each greedy argmax is a TOTAL order and both
    engines pick identical chains (the MMR determinism argument —
    a first-pick tie would change every later round, which round-6 +
    id tiebreak makes impossible). Zero-norm embeddings drop via the
    NULL-cosine guard.

    Scale shape: the greedy loop is UNROLLED to k={_KC_K} plan
    stages; each round is one corpus scan joined to a <=k-row
    BROADCAST picked set, a vec-keyed min-reduce, and a
    TakeOrdered(1) — never a pairwise matrix, never a corpus-sized
    broadcast, exactly k passes at any scale."""
    emb = persist_tracked(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    cparts = emb.select(F.posexplode("embedding").alias("pos", "val")).select(
        "pos",
        F.round(F.col("val").cast("double"), 9)
        .cast("decimal(18,9)")
        .alias("cval"),
    )
    cent = (
        cparts.groupBy("pos")
        .agg((F.sum("cval").cast("double") / F.count("*")).alias("cdim"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cdim"))),
                lambda s: s.cdim,
            ).alias("centroid")
        )
    )
    d0 = F.round(1 - _V.cosine("centroid", "embedding"), 6)
    p1 = (
        emb.crossJoin(F.broadcast(cent))
        .select("vec_id", d0.alias("d"))
        .where(F.col("d").isNotNull())
        .orderBy(F.col("d").desc(), "vec_id")
        .limit(1)
        .select(F.lit(1).alias("pick"), "vec_id", F.col("d").alias("dist"))
    )
    picks = persist_tracked(p1)
    for r in range(2, _KC_K + 1):
        chosen = picks.select("vec_id").join(emb, "vec_id").select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
        )
        pd_ = F.round(1 - _V.cosine("cemb", "embedding"), 6)
        pr = (
            emb.join(
                picks.select(F.col("vec_id").alias("pid")),
                F.col("vec_id") == F.col("pid"),
                "left_anti",
            )
            .crossJoin(F.broadcast(chosen))
            .select("vec_id", pd_.alias("d"))
            .groupBy("vec_id")
            .agg(F.min("d").alias("md"))
            .where(F.col("md").isNotNull())
            .orderBy(F.col("md").desc(), "vec_id")
            .limit(1)
            .select(
                F.lit(r).alias("pick"), "vec_id",
                F.col("md").alias("dist"),
            )
        )
        picks = persist_tracked(picks.unionAll(pr))
    return picks.select(
        F.col("pick").cast("int").alias("pick"), "vec_id", "dist"
    )
