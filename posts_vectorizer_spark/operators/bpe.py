"""BPE vocabulary induction on-engine — fixed-round byte-pair-merge
training over the corpus word-frequency table, fully oracle-checkable
(integer pair counts, lexicographic tiebreaks, and a windowed formulation
of the greedy non-overlapping merge — no sequential fold, so both engines
express the identical computation).

Classic BPE (Sennrich et al. 2016, public algorithm): train on the
word->frequency table (vocab-sized — NEVER the raw corpus), start from
character symbols, and per round (a) count adjacent symbol pairs weighted
by word frequency (overlapping occurrences count per position), (b) take
the most frequent pair (ties: lexicographic on the pair), (c) merge that
pair greedily left-to-right, non-overlapping, in every word.

The greedy non-overlap is the only sequential-looking step; it is exactly
expressible with windows: within each maximal RUN of consecutive matching
positions, the applied merges are the odd-ranked ones ("aaa" has matches
at positions 1,2; only position 1 merges). Runs are gaps-and-islands:
run starts where a match follows a non-match.

Scale shape per round: everything operates on the exploded symbol table
of the WORD VOCABULARY (|vocab| x avg word length rows — ~1e9 rows at a
100 TB corpus, trivial), with one word-keyed window pass and one tiny
pair-count aggregation; the corpus itself is touched once, up front, by
the word-frequency count. The best-pair is a broadcast 1-row join, kept
declarative (no driver-side collect between rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import text as T

ROUNDS_DEFAULT = 3


def _symbols0(documents: DataFrame) -> DataFrame:
    """(word, freq, i, sym): per-vocab-word character symbols, 1-indexed."""
    from ..sources.catalog import spread

    words = (
        spread(documents)
        .select(F.explode(T.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    return words.select(
        "word",
        "freq",
        F.posexplode(F.split("word", "")).alias("i0", "sym"),
    ).select("word", "freq", (F.col("i0") + 1).alias("i"), "sym")


def _one_round(syms: DataFrame, rnd: int) -> tuple[DataFrame, DataFrame]:
    """(merge_row, next_symbols): apply one BPE merge round."""
    w = Window.partitionBy("word").orderBy("i")
    paired = syms.withColumn("nxt", F.lead("sym").over(w))
    counts = (
        paired.where(F.col("nxt").isNotNull())
        .groupBy("sym", "nxt")
        .agg(F.sum("freq").alias("c"))
    )
    best = (
        counts.agg(
            F.min_by(
                F.struct(
                    F.col("sym").alias("left"),
                    F.col("nxt").alias("right"),
                    F.col("c").alias("pair_count"),
                ),
                F.struct(
                    (-F.col("c")).alias("nc"),
                    F.col("sym").alias("l"),
                    F.col("nxt").alias("r"),
                ),
            ).alias("b")
        )
        .select(
            F.lit(rnd).alias("round"),
            F.col("b.left").alias("left_sym"),
            F.col("b.right").alias("right_sym"),
            F.concat(F.col("b.left"), F.col("b.right")).alias("merged"),
            F.col("b.pair_count").cast("bigint").alias("pair_count"),
        )
    )
    m = paired.crossJoin(F.broadcast(best.select("left_sym", "right_sym", "merged")))
    m = m.withColumn(
        "match",
        (F.col("sym") == F.col("left_sym")) & (F.col("nxt") == F.col("right_sym")),
    )
    # gaps-and-islands: rank matches inside each run; odd ranks merge
    m = m.withColumn(
        "run_start",
        F.col("match")
        & ~F.coalesce(F.lag("match").over(w), F.lit(False)),
    )
    m = m.withColumn(
        "run_id",
        F.sum(F.col("run_start").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    rw = Window.partitionBy("word", "run_id").orderBy("i")
    m = m.withColumn(
        "mrank",
        F.when(
            F.col("match"),
            F.sum(F.col("match").cast("int")).over(
                rw.rowsBetween(Window.unboundedPreceding, 0)
            ),
        ),
    )
    m = m.withColumn("applied", F.col("match") & (F.col("mrank") % 2 == 1))
    # keep: applied positions emit the merged symbol; a position is
    # consumed when the PREVIOUS position applied a merge
    m = m.withColumn(
        "consumed", F.coalesce(F.lag("applied").over(w), F.lit(False))
    )
    kept = m.where(~F.col("consumed")).select(
        "word",
        "freq",
        "i",
        F.when(F.col("applied"), F.col("merged")).otherwise(F.col("sym")).alias("sym"),
    )
    nxt = kept.withColumn("i", F.row_number().over(w))
    return best, nxt


def merges(documents: DataFrame, rounds: int = ROUNDS_DEFAULT) -> DataFrame:
    """(round, left, right, merged, pair_count) — the learned merge table."""
    syms = _symbols0(documents)
    outs = []
    for r in range(1, rounds + 1):
        best, syms = _one_round(syms, r)
        outs.append(best)
    result = outs[0]
    for b in outs[1:]:
        result = result.unionByName(b)
    # a pair-exhausted corpus makes the min_by aggregate emit one all-NULL
    # row; the SQL twin's LIMIT 1 over an empty relation emits nothing —
    # align on nothing
    return result.where(F.col("left_sym").isNotNull())


def _round_sql(prev: str, rnd: int) -> str:
    return f"""
paired{rnd} AS (
  SELECT word, freq, i, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY i) AS nxt
  FROM {prev}
),
best{rnd} AS (
  SELECT {rnd} AS round, sym AS left_s, nxt AS right_s,
         sym || nxt AS merged, CAST(sum(freq) AS BIGINT) AS pair_count
  FROM paired{rnd} WHERE nxt IS NOT NULL
  GROUP BY sym, nxt
  ORDER BY pair_count DESC, left_s, right_s
  LIMIT 1
),
marked{rnd} AS (
  SELECT p.word, p.freq, p.i, p.sym, b.merged,
         (p.sym = b.left_s AND p.nxt = b.right_s) AS match
  FROM paired{rnd} p CROSS JOIN best{rnd} b
),
started{rnd} AS (
  SELECT *,
         match AND NOT coalesce(
           lag(match) OVER (PARTITION BY word ORDER BY i), false
         ) AS run_start
  FROM marked{rnd}
),
runs{rnd} AS (
  SELECT *,
         sum(CASE WHEN run_start THEN 1 ELSE 0 END)
           OVER (PARTITION BY word ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM started{rnd}
),
app{rnd} AS (
  SELECT *,
         match AND (sum(CASE WHEN match THEN 1 ELSE 0 END)
                    OVER (PARTITION BY word, run_id ORDER BY i
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    % 2 = 1) AS applied
  FROM runs{rnd}
),
seq{rnd} AS (
  SELECT word, freq,
         row_number() OVER (PARTITION BY word ORDER BY i) AS i,
         CASE WHEN applied THEN merged ELSE sym END AS sym
  FROM (
    SELECT *,
           coalesce(lag(applied) OVER (PARTITION BY word ORDER BY i),
                    false) AS consumed
    FROM app{rnd}
  ) WHERE NOT consumed
)"""


def merges_sql(rounds: int = ROUNDS_DEFAULT) -> str:
    parts = [
        f"""tok AS (SELECT unnest({T.tokens_sql('text')}) AS word FROM documents),
words AS (SELECT word, count(*) AS freq FROM tok GROUP BY word),
seq0 AS (
  SELECT word, freq,
         CAST(generate_subscripts(split(word, ''), 1) AS BIGINT) AS i,
         unnest(split(word, '')) AS sym
  FROM words
)"""
    ]
    prev = "seq0"
    for r in range(1, rounds + 1):
        parts.append(_round_sql(prev, r))
        prev = f"seq{r}"
    selects = [
        f"SELECT round, left_s AS left_sym, right_s AS right_sym, merged, pair_count FROM best{r}"
        for r in range(1, rounds + 1)
    ]
    return "WITH " + ",".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def segment_stats(documents: DataFrame, rounds: int = ROUNDS_DEFAULT) -> DataFrame:
    """One-row corpus segmentation report after applying the learned
    merges: vocabulary size, corpus token occurrences, total symbols
    before (characters) and after the merges, and the compression ratio —
    the train->apply loop of tokenizer induction, on-engine."""
    syms = _symbols0(documents)
    first = syms
    for r in range(1, rounds + 1):
        _, syms = _one_round(syms, r)
    before = first.groupBy("word", "freq").agg(F.count("*").alias("n0"))
    after = syms.groupBy("word", "freq").agg(F.count("*").alias("n1"))
    joined = before.join(after, ["word", "freq"])
    return joined.agg(
        F.count("*").cast("bigint").alias("n_vocab"),
        F.sum("freq").cast("bigint").alias("n_word_occurrences"),
        F.sum(F.col("n0") * F.col("freq")).cast("bigint").alias("chars_total"),
        F.sum(F.col("n1") * F.col("freq")).cast("bigint").alias("symbols_total"),
        F.round(
            F.sum(F.col("n1") * F.col("freq")).cast("double")
            / F.sum(F.col("n0") * F.col("freq")),
            6,
        ).cast("double").alias("compression"),
    )


def segment_stats_sql(rounds: int = ROUNDS_DEFAULT) -> str:
    # reuse merges_sql's CTE chain; swap its final UNION for the report
    with_part = merges_sql(rounds).split("\nSELECT round, left_s")[0]
    return (
        with_part
        + f""",
before_seg AS (SELECT word, freq, count(*) AS n0 FROM seq0 GROUP BY word, freq),
after_seg AS (SELECT word, freq, count(*) AS n1 FROM seq{rounds} GROUP BY word, freq)
SELECT CAST(count(*) AS BIGINT) AS n_vocab,
       CAST(sum(b.freq) AS BIGINT) AS n_word_occurrences,
       CAST(sum(b.n0 * b.freq) AS BIGINT) AS chars_total,
       CAST(sum(a.n1 * a.freq) AS BIGINT) AS symbols_total,
       CAST(round(CAST(sum(a.n1 * a.freq) AS DOUBLE)
                  / sum(b.n0 * b.freq), 6) AS DOUBLE) AS compression
FROM before_seg b JOIN after_seg a USING (word, freq)
"""
    )
