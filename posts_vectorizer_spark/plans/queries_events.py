"""Event-stream analytics in batch mode (SURVEY.md §2.10 ST6).

The same ``window()`` / ``session_window`` expressions run unchanged under
Structured Streaming with a watermark (streaming/worker.py smoke-tests that
path); batch mode makes them DuckDB-checkable via ``time_bucket`` and
lag/cumsum sessionization.

Windows use epoch-aligned 1-hour / 30-minute grids where Spark's origin and
DuckDB's time_bucket origin (2000-01-01) coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import register


@register(
    "events_tumbling_window",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(value), 6) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6: tumbling 1-hour event-time windows — in streaming this is the
    same expression after withWatermark('ts', ...)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@register(
    "events_sliding_window",
    oracle="""
WITH shifted AS (
  SELECT e.*,
         time_bucket(INTERVAL '30 minutes', e.ts)
           - k.k * INTERVAL '30 minutes' AS window_start
  FROM events e, (SELECT unnest([0, 1]) AS k) k
)
SELECT window_start,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(value), 6) AS DOUBLE) AS total_value
FROM shifted
WHERE ts >= window_start AND ts < window_start + INTERVAL '1 hour'
GROUP BY window_start
""",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6: sliding window (1 hour wide, 30-minute slide) — every event lands
    in two windows; the oracle reconstructs the same assignment by shifting
    30-minute buckets."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


@register(
    "events_session_window",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, value,
         -- strictly >: Spark MERGES an event landing exactly gap after its
         -- predecessor (verified by the exact-boundary golden test in
         -- tests/test_extras.py) — sessions extend through a touching window
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '6 hours'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM ordered
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '6 hours' AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(value), 6) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_id
""",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6: session windows (6-hour inactivity gap) via the native
    session_window expression; the oracle sessionizes with lag + cumulative
    new-session flags. Spark's session end = last event + gap."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "6 hours").alias("w"), "user_id")
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


@register(
    "events_first_per_key",
    oracle="""
SELECT user_id, event_type, event_id, ts FROM (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rk
  FROM events
) WHERE rk = 1
""",
)
def events_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7 (batch form): deterministic keep-first dedup per key — the
    idempotent-upsert semantics of the worker's job flag (worker.py:92,99)
    as a ranking window, not dropDuplicates (which keeps an arbitrary row)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.select("user_id", "event_type", "event_id", "ts", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") == 1)
        .drop("rk")
    )


@register(
    "events_hypertable_rollup",
    oracle="""
WITH m AS (
  SELECT time_bucket(INTERVAL '1 minute', ts) AS ws,
         count(*) AS n,
         sum(CAST(value AS DECIMAL(18,6))) AS v
  FROM events GROUP BY 1
),
h AS (
  SELECT time_bucket(INTERVAL '1 hour', ws) AS ws,
         sum(n) AS n, sum(v) AS v
  FROM m GROUP BY 1
),
d AS (
  SELECT time_bucket(INTERVAL '1 day', ws) AS ws,
         sum(n) AS n, sum(v) AS v
  FROM h GROUP BY 1
)
SELECT 'minute' AS level, ws AS window_start,
       CAST(n AS BIGINT) AS n, CAST(v AS DOUBLE) AS total_value FROM m
UNION ALL
SELECT 'hour', ws, CAST(n AS BIGINT), CAST(v AS DOUBLE) FROM h
UNION ALL
SELECT 'day', ws, CAST(n AS BIGINT), CAST(v AS DOUBLE) FROM d
""",
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: minute -> hour -> day
    continuous aggregates where each coarser level re-aggregates the FINER
    level's partials (sum-of-sums / sum-of-counts), never the raw events.

    Scale shape: the raw table is touched once (minute grid); the hour
    rollup shuffles ~1/60th of that, the day rollup ~1/1440th — the
    TimescaleDB continuous-aggregate / OLAP-cube refresh pattern. Because
    count and decimal-sum are mergeable, each level is exact, and in
    production each level would persist as its own partitioned table for
    incremental refresh. Sums run in decimal so re-aggregation order can't
    perturb float results across levels.
    """
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(F.window("ts", "1 minute")["start"].alias("ws")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
    )
    h = m.groupBy(F.window("ws", "1 hour")["start"].alias("ws")).agg(
        F.sum("n").alias("n"), F.sum("v").alias("v")
    )
    d = h.groupBy(F.window("ws", "1 day")["start"].alias("ws")).agg(
        F.sum("n").alias("n"), F.sum("v").alias("v")
    )

    def lvl(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("level"),
            F.col("ws").alias("window_start"),
            F.col("n").cast("bigint").alias("n"),
            F.col("v").cast("double").alias("total_value"),
        )

    return lvl(m, "minute").unionByName(lvl(h, "hour")).unionByName(
        lvl(d, "day")
    )


@register(
    "events_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type, next_type, count(*) AS n
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts over each user's event sequence (the
    sequence-mining primitive behind funnel discovery / next-action
    models). lead() is evaluated inside the per-user partition after one
    shuffle on user_id; event_id breaks timestamp ties so the sequence —
    and therefore the matrix — is deterministic."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "events_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
)
SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
       CAST(datediff('day', f.cohort_week, a.act_week) / 7 AS INTEGER)
         AS week_offset,
       count(*) AS active_users
FROM firsts f JOIN activity a USING (user_id)
GROUP BY 1, 2
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen week, counted
    in each later week they were active — THE product-analytics cohort
    query. Two aggregations on user_id (first-seen, distinct active weeks)
    share a single shuffle key; the cohort join is user_id-keyed as well,
    so at 100 TB the whole plan is one partitioning reused three times.
    Both engines truncate weeks to Monday, so offsets divide evenly by 7."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").alias("act_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


@register(
    "events_session_paths",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '6 hours'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessions AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_id
  FROM ordered
),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sessions GROUP BY user_id, session_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path HAVING count(*) >= 2
""",
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: the ordered event-type sequence of every
    6-hour-gap session, grouped into repeated paths (>= 2 sessions) —
    the product-analytics workload behind funnel discovery and
    navigation-flow dashboards. Sessionization is the native
    session_window (same boundary semantics the events_session_window
    oracle pins); the path is a deterministic in-session sort by
    (ts, event_id) rendered as one string so both engines group on a
    flat key.

    Scale shape: one (user, session)-keyed aggregation collects each
    session's own events (bounded by session length, never user
    history), then one path-keyed count — both map-side combinable; the
    >= 2 filter bounds the output to genuinely repeated journeys."""
    e = load_table(spark, sf_dir, "events")
    sess = (
        e.groupBy(F.session_window("ts", "6 hours").alias("w"), "user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        sess.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .where(F.col("n_sessions") >= 2)
        .select("path", F.col("n_sessions").cast("bigint").alias("n_sessions"))
    )


# ---------------------------------------------------------------------------
# RFM segmentation via value-level quintile cuts
# ---------------------------------------------------------------------------

_RFM_Q = 5


def _rfm_cuts_sql(metric_cte: str, col: str) -> str:
    """Value-level quintile cutpoints for one metric: cut_k = the
    ceil(k*N/5)-th smallest value, k = 1..4, from the bounded
    distinct-value grid (the conformal-threshold pattern)."""
    return f"""
  SELECT list(cut ORDER BY k) AS cuts FROM (
    SELECT k, min({col}) AS cut FROM (
      SELECT {col}, sum(c) OVER (ORDER BY {col}) AS cum, t.n
      FROM (SELECT {col}, count(*) AS c FROM {metric_cte} GROUP BY {col}),
           (SELECT count(*) AS n FROM {metric_cte}) t
    ), (SELECT unnest(generate_series(1, {_RFM_Q - 1})) AS k)
    WHERE cum >= (k * n + {_RFM_Q - 1}) // {_RFM_Q}
    GROUP BY k
  )
"""


_RFM_SQL = f"""
WITH obs_end AS (SELECT CAST(max(ts) AS DATE) AS end_day FROM events),
per_user AS (
  SELECT user_id,
         date_diff('day', CAST(max(ts) AS DATE),
                   (SELECT end_day FROM obs_end)) AS rec,
         count(*) AS freq,
         coalesce(sum(CASE WHEN event_type = 'purchase' THEN
           CAST(round(value, 6) AS DECIMAL(18,6)) END),
           CAST(0 AS DECIMAL(18,6))) AS mon
  FROM events GROUP BY user_id
),
rcuts AS ({_rfm_cuts_sql('per_user', 'rec')}),
fcuts AS ({_rfm_cuts_sql('per_user', 'freq')}),
mcuts AS ({_rfm_cuts_sql('per_user', 'mon')}),
scored AS (
  SELECT u.user_id, u.rec, u.freq, u.mon,
         {_RFM_Q} - len(list_filter(rcuts.cuts, c -> u.rec > c))
           AS r_score,
         1 + len(list_filter(fcuts.cuts, c -> u.freq > c)) AS f_score,
         1 + len(list_filter(mcuts.cuts, c -> u.mon > c)) AS m_score
  FROM per_user u, rcuts, fcuts, mcuts
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(rec) AS DOUBLE) / count(*) AS avg_recency_days,
       CAST(sum(freq) AS DOUBLE) / count(*) AS avg_frequency,
       CAST(CAST(sum(mon) AS DECIMAL(38,6)) AS DOUBLE) AS total_monetary
FROM scored GROUP BY r_score, f_score, m_score
"""


@register("events_rfm_segments", oracle=_RFM_SQL)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation (built r9
    session 3, staged r10) — the classic customer-analytics grid:
    each user scores 1..5 on how recently they acted, how often, and
    how much purchase value they carry, and the readout aggregates the
    (r, f, m) segments. Quintile boundaries are VALUE-LEVEL order
    statistics — cut_k = the ceil(k*N/5)-th smallest value from the
    bounded distinct-value grid (the conformal-threshold pattern), and
    a score is 1 + #cuts strictly below the value (recency inverted:
    recent = high) — pure value logic, so ties land identically in
    both engines with NO global row-order sort (a plain ntile would
    need one — the scale-killer this formulation avoids). Monetary
    sums add round-6 DECIMALs (exact, order-free).

    Scale shape: one user-keyed aggregate (the only data-sized
    shuffle), three bounded value-grid windows, three 1-row cut-list
    broadcasts, one <=125-key segment aggregate."""
    events = load_table(spark, sf_dir, "events")
    obs_end = events.agg(F.max("ts").cast("date").alias("end_day"))
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.max("ts").cast("date").alias("last_day"),
            F.count("*").alias("freq"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round("value", 6).cast("decimal(18,6)"),
                    )
                ),
                F.lit(0).cast("decimal(18,6)"),
            ).alias("mon"),
        )
        .crossJoin(F.broadcast(obs_end))
        .select(
            "user_id",
            F.datediff("end_day", "last_day").alias("rec"),
            "freq", "mon",
        )
    )
    from ..cache import persist_tracked

    per_user = persist_tracked(per_user)

    def cuts(col):
        grid = per_user.groupBy(col).agg(F.count("*").alias("c"))
        n = per_user.agg(F.count("*").alias("n"))
        cum = grid.withColumn(
            "cum",
            F.sum("c").over(
                Window.orderBy(col).rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        ks = spark.range(1, _RFM_Q).select(F.col("id").alias("k"))
        return (
            cum.crossJoin(F.broadcast(n))
            .crossJoin(F.broadcast(ks))
            .filter(
                F.col("cum")
                >= F.floor(
                    (F.col("k") * F.col("n") + _RFM_Q - 1) / _RFM_Q
                )
            )
            .groupBy("k")
            .agg(F.min(col).alias("cut"))
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("k", "cut"))
                ).alias("kc")
            )
            .select(
                F.transform(F.col("kc"), lambda x: x["cut"]).alias("cuts")
            )
        )

    def score(vcol, cuts_col):
        return 1 + F.size(F.filter(cuts_col, lambda c: vcol > c))

    scored = (
        per_user.crossJoin(F.broadcast(cuts("rec").select(
            F.col("cuts").alias("rc"))))
        .crossJoin(F.broadcast(cuts("freq").select(
            F.col("cuts").alias("fc"))))
        .crossJoin(F.broadcast(cuts("mon").select(
            F.col("cuts").alias("mc"))))
        .select(
            "rec", "freq", "mon",
            (_RFM_Q + 1 - score(F.col("rec"), F.col("rc"))).alias("r_score"),
            score(F.col("freq"), F.col("fc")).alias("f_score"),
            score(F.col("mon"), F.col("mc")).alias("m_score"),
        )
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_users"),
        (F.sum("rec").cast("double") / F.count("*")).alias(
            "avg_recency_days"
        ),
        (F.sum("freq").cast("double") / F.count("*")).alias(
            "avg_frequency"
        ),
        F.sum("mon").cast("decimal(38,6)").cast("double").alias(
            "total_monetary"
        ),
    ).select(
        F.col("r_score").cast("long").alias("r_score"),
        F.col("f_score").cast("long").alias("f_score"),
        F.col("m_score").cast("long").alias("m_score"),
        F.col("n_users").cast("long").alias("n_users"),
        "avg_recency_days", "avg_frequency", "total_monetary",
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution — 3 unrolled power-iteration steps
# ---------------------------------------------------------------------------

_MKV_STEPS = 3

_MKV_SQL = """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
tm AS (
  SELECT event_type AS i, next_type AS j, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
),
rowsum AS (SELECT i, sum(n) AS ni FROM tm GROUP BY i),
p AS (
  SELECT tm.i, tm.j,
         CAST(round(CAST(tm.n AS DOUBLE) / rowsum.ni, 9)
              AS DECIMAL(18,9)) AS pij
  FROM tm JOIN rowsum USING (i)
),
states AS (SELECT i AS state FROM rowsum),
k AS (SELECT count(*) AS k FROM states),
pi0 AS (
  SELECT state, CAST(round(1.0 / k.k, 6) AS DECIMAL(18,6)) AS pi
  FROM states, k
),
r1 AS (
  SELECT p.j AS state,
         CAST(sum(CAST(round(CAST(pi0.pi * p.pij AS DOUBLE), 9)
              AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS raw
  FROM pi0 JOIN p ON p.i = pi0.state GROUP BY p.j
),
pi1 AS (
  SELECT state, CAST(round(CAST(raw AS DOUBLE)
         / (SELECT CAST(sum(raw) AS DOUBLE) FROM r1), 6)
         AS DECIMAL(18,6)) AS pi
  FROM r1
),
r2 AS (
  SELECT p.j AS state,
         CAST(sum(CAST(round(CAST(pi1.pi * p.pij AS DOUBLE), 9)
              AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS raw
  FROM pi1 JOIN p ON p.i = pi1.state GROUP BY p.j
),
pi2 AS (
  SELECT state, CAST(round(CAST(raw AS DOUBLE)
         / (SELECT CAST(sum(raw) AS DOUBLE) FROM r2), 6)
         AS DECIMAL(18,6)) AS pi
  FROM r2
),
r3 AS (
  SELECT p.j AS state,
         CAST(sum(CAST(round(CAST(pi2.pi * p.pij AS DOUBLE), 9)
              AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS raw
  FROM pi2 JOIN p ON p.i = pi2.state GROUP BY p.j
),
pi3 AS (
  SELECT state, CAST(round(CAST(raw AS DOUBLE)
         / (SELECT CAST(sum(raw) AS DOUBLE) FROM r3), 6)
         AS DECIMAL(18,6)) AS pi
  FROM r3
)
SELECT pi3.state,
       CAST(pi1.pi AS DOUBLE) AS pi_step1,
       CAST(pi2.pi AS DOUBLE) AS pi_step2,
       CAST(pi3.pi AS DOUBLE) AS pi_step3
FROM pi3 JOIN pi2 USING (state) JOIN pi1 USING (state)
"""


@register("events_markov_stationary", oracle=_MKV_SQL)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-journey Markov chain by
    THREE unrolled power-iteration steps (built r9 session 3, staged
    r10) — the long-run where-do-users-end-up readout on top of
    events_transition_matrix's counts: row-normalize to P (round-9
    DECIMAL), start uniform, and iterate pi <- normalize(pi P),
    reporting all three steps so convergence itself is
    oracle-checked (the kmeans/pagerank/Platt/Bradley-Terry unrolled
    convention). Each pi_i*P_ij term rounds to 9dp DECIMAL before its
    exact sum; each step's vector re-pins to the 6dp grid after one
    double renormalization division (the DoReMi weight pattern).
    States whose row sum is zero cannot occur (a state appears in P's
    rows only if it has an outgoing transition); absorbing mass
    flowing to never-emitting states is renormalized away per step.

    Scale shape: one user-keyed window + (i, j) count (the only
    data-sized work, shared shape with events_transition_matrix);
    all three steps run on the |states|^2 matrix via broadcast
    joins."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    tm = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("i"), F.col("next_type").alias("j")
        )
        .agg(F.count("*").alias("n"))
    )
    from ..cache import persist_tracked

    # the matrix is |states|^2 rows: collapse it to ONE partition before
    # the persisted reuse so the three iteration joins/aggregates run as
    # 1-task stages under ANY shuffle-partition setting (a vanilla-200
    # session paid ~20 s of empty-task scheduling here before this)
    tm = persist_tracked(tm.coalesce(1))
    rowsum = tm.groupBy("i").agg(F.sum("n").alias("ni"))
    p = tm.join(F.broadcast(rowsum), "i").select(
        "i", "j",
        F.round(F.col("n").cast("double") / F.col("ni"), 9)
        .cast("decimal(18,9)").alias("pij"),
    )
    k = rowsum.agg(F.count("*").alias("k"))
    pi = rowsum.crossJoin(F.broadcast(k)).select(
        F.col("i").alias("state"),
        F.round(F.lit(1.0) / F.col("k"), 6).cast("decimal(18,6)").alias("pi"),
    )

    def step(pi):
        raw = (
            p.join(
                F.broadcast(pi.withColumnRenamed("state", "i")), "i"
            )
            .groupBy(F.col("j").alias("state"))
            .agg(
                F.sum(
                    F.round(
                        (F.col("pi") * F.col("pij")).cast("double"), 9
                    ).cast("decimal(28,9)")
                ).cast("decimal(38,9)").alias("raw")
            )
            .coalesce(1)
        )
        tot = raw.agg(F.sum("raw").cast("double").alias("tot"))
        return raw.crossJoin(F.broadcast(tot)).select(
            "state",
            F.round(F.col("raw").cast("double") / F.col("tot"), 6)
            .cast("decimal(18,6)").alias("pi"),
        )

    steps = []
    for _ in range(_MKV_STEPS):
        pi = step(pi)
        steps.append(pi)
    p1, p2, p3 = steps
    return (
        p3.select("state", F.col("pi").cast("double").alias("pi_step3"))
        .join(
            p2.select("state", F.col("pi").cast("double").alias("pi_step2")),
            "state",
        )
        .join(
            p1.select("state", F.col("pi").cast("double").alias("pi_step1")),
            "state",
        )
        .select("state", "pi_step1", "pi_step2", "pi_step3")
    )


# ---------------------------------------------------------------------------
# Hill tail-index estimator (heavy-tail diagnostic over event values)
# ---------------------------------------------------------------------------

_HILL_K = 100  # top-order statistics the estimator averages over

_HILL_SQL = f"""
WITH pos AS (
  SELECT value, event_id FROM events WHERE value > 0
),
top AS (
  SELECT value,
         row_number() OVER (ORDER BY value DESC, event_id) AS rk
  FROM pos
  ORDER BY value DESC, event_id
  LIMIT {_HILL_K + 1}
),
thresh AS (
  SELECT value AS xk FROM top WHERE rk = {_HILL_K + 1}
),
terms AS (
  SELECT CAST(round(ln(t.value / th.xk), 9) AS DECIMAL(28,9)) AS lr
  FROM top t, thresh th WHERE t.rk <= {_HILL_K}
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(lr) AS DECIMAL(38,9)) AS slr
  FROM terms
)
SELECT s.k, CAST(th.xk AS DOUBLE) AS xk,
       CAST(CAST(s.slr AS DOUBLE) / s.k AS DOUBLE) AS hill,
       CAST(s.k / CAST(s.slr AS DOUBLE) AS DOUBLE) AS alpha
FROM s, thresh th
WHERE s.k = {_HILL_K} AND s.slr > 0
"""


@register("events_hill_tail", oracle=_HILL_SQL)
def events_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimator (Hill 1975; built r10, staged r11) —
    the standard heavy-tail diagnostic over the event value
    distribution: hill = mean(ln(x_(i)/x_(k+1))) over the top-k order
    statistics, alpha = 1/hill. alpha <= 2 means infinite variance
    (means/variances of this metric are unstable and sampling plans
    must switch to quantile logic); large alpha means a thin tail.
    Pareto-shaped values give alpha ~ the Pareto exponent. Each log
    ratio rounds to 9dp DECIMAL before the EXACT sum (ln has matched
    cross-engine everywhere; the sum would otherwise be FP-order
    dependent), and hill/alpha are single double expressions of the
    exact sum. Deterministic through ties via the (value, event_id)
    order.

    Scale shape: the only global operation is top-(k+1) — Spark plans
    TakeOrderedAndProject (per-partition heads, driver merge of k+1
    rows), never a sort; the rank window then runs on the bounded
    (k+1)-row head coalesced to one partition, and the estimator is a
    1-row aggregate of k exact decimals."""
    ev = load_table(spark, sf_dir, "events")
    pos = ev.where(F.col("value") > 0).select("value", "event_id")
    top = (
        pos.orderBy(F.desc("value"), F.asc("event_id"))
        .limit(_HILL_K + 1)
        .coalesce(1)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("value"), F.asc("event_id"))
            ),
        )
    )
    from ..cache import persist_tracked

    top = persist_tracked(top)
    thresh = top.where(F.col("rk") == _HILL_K + 1).select(
        F.col("value").alias("xk")
    )
    terms = (
        top.where(F.col("rk") <= _HILL_K)
        .crossJoin(F.broadcast(thresh))
        .select(
            F.round(F.log(F.col("value") / F.col("xk")), 9)
            .cast("decimal(28,9)")
            .alias("lr")
        )
    )
    s = terms.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("lr").cast("decimal(38,9)").alias("slr"),
    )
    k, slr = F.col("k"), F.col("slr").cast("double")
    return (
        s.crossJoin(F.broadcast(thresh))
        .where((k == _HILL_K) & (slr > 0))
        .select(
            k,
            F.col("xk").cast("double").alias("xk"),
            (slr / k).cast("double").alias("hill"),
            (k / slr).cast("double").alias("alpha"),
        )
    )


# ---------------------------------------------------------------------------
# journey transition entropy (sequence predictability)
# ---------------------------------------------------------------------------

_TRANS_ENTROPY_SQL = """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
tm AS (
  SELECT event_type AS i, next_type AS j, count(*) AS nij
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
),
mi AS (SELECT i, sum(nij) AS ni FROM tm GROUP BY i),
tot AS (SELECT sum(nij) AS n FROM tm),
terms AS (
  SELECT CAST(round(-(tm.nij * ln(CAST(tm.nij AS DOUBLE) / mi.ni)), 9)
              AS DECIMAL(28,9)) AS t
  FROM tm JOIN mi USING (i)
),
marg AS (
  SELECT CAST(round(-(ni * ln(CAST(ni AS DOUBLE) / tot.n)), 9)
              AS DECIMAL(28,9)) AS t
  FROM mi, tot
)
SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n_transitions,
       (SELECT CAST(count(*) AS BIGINT) FROM mi) AS n_states,
       CAST((SELECT CAST(CAST(sum(t) AS DECIMAL(38,9)) AS DOUBLE)
             FROM terms) / (SELECT n FROM tot) AS DOUBLE) AS h_cond,
       CAST((SELECT CAST(CAST(sum(t) AS DECIMAL(38,9)) AS DOUBLE)
             FROM marg) / (SELECT n FROM tot) AS DOUBLE) AS h_marginal,
       CASE WHEN (SELECT CAST(CAST(sum(t) AS DECIMAL(38,9)) AS DOUBLE)
                  FROM marg) > 0 THEN
         CAST(1 - (SELECT CAST(CAST(sum(t) AS DECIMAL(38,9)) AS DOUBLE)
                   FROM terms)
                / (SELECT CAST(CAST(sum(t) AS DECIMAL(38,9)) AS DOUBLE)
                   FROM marg) AS DOUBLE)
       END AS predictability
FROM (SELECT 1) WHERE (SELECT n FROM tot) > 0
"""


@register(
    "events_transition_entropy", oracle=_TRANS_ENTROPY_SQL
)
def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey transition entropy (built r10, staged r11) — the
    sequence-predictability readout over the SAME per-user transition
    counts events_markov_stationary iterates on: conditional entropy
    H(next | current) = -Σ (n_ij/N) ln(n_ij/n_i), the marginal
    H(current), and predictability = 1 - H_cond/H_marg (0 = the next
    event type is independent of the current one, 1 = deterministic
    journeys). The honest feature-value check before spending model
    capacity on sequential structure. Every plogp term is N-scaled
    round-9 DECIMAL over exact transition counts (the MI/chi2/PSI
    lattice); readouts are identical double expressions of exact sums.

    Scale shape: the per-user lead() window shuffles once on user_id
    (the sessionization exchange every journey query shares); the
    transition matrix is |types|²-bounded, and everything after the
    count is cell-sized."""
    ev = load_table(spark, sf_dir, "events")
    return transition_entropy_readout(transition_counts(ev))


def transition_counts(ev: DataFrame) -> DataFrame:
    """(i, j, nij) journey transition counts — the complete ADDITIVE
    sufficient statistic of the entropy readout. Additive across any
    USER-disjoint split (the per-user lead() forms pairs inside one
    user's journey only), which is exactly how the streaming drain
    splits its batches."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    return seq.groupBy(
        F.col("event_type").alias("i"), F.col("next_type").alias("j")
    ).agg(F.count("*").alias("nij"))


def transition_entropy_readout(tm: DataFrame) -> DataFrame:
    """H(next|current) / H(current) / predictability as a pure function
    of the (i, j, nij) transition table — N-scaled round-9 DECIMAL
    plogp lattice, identical double readouts both engines."""
    from ..cache import persist_tracked

    tm = persist_tracked(tm)
    mi = tm.groupBy("i").agg(F.sum("nij").alias("ni"))
    tot = tm.agg(F.sum("nij").alias("n"))
    states = mi.agg(F.count("*").alias("n_states"))
    cond = (
        tm.join(F.broadcast(mi), "i")
        .select(
            F.round(
                -(F.col("nij")
                  * F.log(F.col("nij").cast("double") / F.col("ni"))),
                9,
            )
            .cast("decimal(28,9)")
            .alias("t")
        )
        .agg(F.sum("t").cast("decimal(38,9)").cast("double").alias("hc_n"))
    )
    marg = (
        mi.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                -(F.col("ni")
                  * F.log(F.col("ni").cast("double") / F.col("n"))),
                9,
            )
            .cast("decimal(28,9)")
            .alias("t")
        )
        .agg(F.sum("t").cast("decimal(38,9)").cast("double").alias("hm_n"))
    )
    n = F.col("n").cast("bigint")
    hc = F.col("hc_n") / n
    hm = F.col("hm_n") / n
    return (
        tot.crossJoin(F.broadcast(states))
        .crossJoin(F.broadcast(cond))
        .crossJoin(F.broadcast(marg))
        .where(n > 0)
        .select(
            n.alias("n_transitions"),
            F.col("n_states").cast("bigint").alias("n_states"),
            hc.alias("h_cond"),
            hm.alias("h_marginal"),
            F.when(F.col("hm_n") > 0, 1 - F.col("hc_n") / F.col("hm_n"))
            .cast("double")
            .alias("predictability"),
        )
    )
