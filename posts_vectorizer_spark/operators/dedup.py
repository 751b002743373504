"""Deduplication operators (Tier C, BASELINE.json north star).

Exact dedup, word-shingle Jaccard near-dup, SimHash, and a portable
MinHash+LSH (band-bucket candidate generation -> exact Jaccard verify).
Everything is hash-groupBy / join shaped — the patterns that scale to 100 TB:

* exact:    md5 digest (16 bytes) -> groupBy — never shuffles full texts.
* MinHash:  per-doc signatures via k portable hash functions, banded so
            candidate generation is an equi-join on band values (shuffle
            proportional to #docs × #bands, NOT #docs²).
* SimHash:  one 24-bit signature per doc; near-dup = small Hamming distance.
* Jaccard:  exact verification ONLY over candidate pairs.

All hashes are the engine's portable polynomial hashes
(functions/text.py) so every stage is DuckDB-checkable; MLlib's
MinHashLSH/approxSimilarityJoin is the [R]-checked alternative
(tests/test_dedup.py) — same algorithm, library implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..cache import persist_tracked
from ..functions import text as T
from ..sources import spread

# MinHash parameters: k = BANDS * ROWS_PER_BAND hash functions.
# h_i(w) = (A[i] * char_hash(w) + B[i]) % MINHASH_P
MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne)
MINHASH_BANDS = 4
MINHASH_ROWS = 4
_A = (1013, 2843, 4691, 6869, 8923, 10_663, 12_923, 15_217,
      17_909, 19_379, 21_649, 23_801, 25_951, 27_943, 29_989, 31_991)
_B = (377, 1597, 2731, 3989, 5237, 6571, 7919, 9311,
      10_733, 12_157, 13_591, 15_013, 16_447, 17_881, 19_319, 20_747)

SIMHASH_BITS = 24
JACCARD_THRESHOLD = 0.5
SHINGLE_N = 3


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_keep_first(documents: DataFrame) -> DataFrame:
    """(doc_id, fingerprint, is_canonical) — keep-first exact dedup keyed on
    a 16-byte md5 digest of the text (never shuffles the text payload).
    Canonical row = lowest doc_id per fingerprint (deterministic).

    The digest is the JVM-intrinsic md5 (functions/text.py::digest), not
    the per-char polynomial fold — hashing whole documents through an
    interpreted higher-order lambda was ~95% of this operator's task time
    (12 s of 12.3 s at sf0.1) for a value that is only an equality key.
    The polynomial rolling hash remains the contract where integer
    arithmetic needs it (minhash, simhash, word routing) and in
    text_fingerprints, the rolling-hash checklist item."""
    fp = spread(documents).select("doc_id", T.digest("text").alias("fingerprint"))
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return fp.withColumn("is_canonical", F.row_number().over(w) == 1)


EXACT_KEEP_FIRST_SQL = f"""
WITH fp AS (SELECT doc_id, {T.digest_sql('text')} AS fingerprint FROM documents)
SELECT doc_id, fingerprint,
       row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1 AS is_canonical
FROM fp
"""


# ---------------------------------------------------------------------------
# distinct word sets (shared by Jaccard / MinHash)
# ---------------------------------------------------------------------------

def _doc_words(documents: DataFrame) -> DataFrame:
    return (
        documents.select("doc_id", F.explode(T.tokens("text")).alias("word"))
        .distinct()
    )


_DOC_WORDS_SQL = (
    "SELECT DISTINCT doc_id, unnest({t}) AS word FROM documents"
).format(t=T.tokens_sql("text"))


# ---------------------------------------------------------------------------
# MinHash + LSH banding (portable, oracle-checkable)
#
# Set representation = distinct word-{SHINGLE_N}-gram shingle hashes, the
# classic shingle -> minhash -> band pipeline (MMDS ch. 3). Word-level sets
# are useless on a small vocabulary (every doc shares most words, so
# min-hashes collide globally and banding prunes nothing); shingles are
# selective because their universe is |vocab|^n.
# ---------------------------------------------------------------------------

# Combine base for folding per-token hashes into a shingle hash. Max
# intermediate: (P-1) * SHINGLE_B + (P-1) ≈ 1e15 — safely inside int64.
SHINGLE_B = 1_000_003


def _doc_shingle_arrays(documents: DataFrame) -> DataFrame:
    """(doc_id, shs) — the doc's DISTINCT shingle-hash set as one int64
    array per row. Fully narrow: ``array_distinct`` dedups within the row,
    so the set representation costs ZERO shuffle (the old exploded
    ``.distinct()`` shuffled #docs x #shingles rows — at 100 TB that was
    the pipeline's largest exchange, and a per-doc set is bounded by doc
    length, never by corpus size).

    Each TOKEN is char-hashed once, then a shingle hash is a polynomial
    fold of its {SHINGLE_N} token hashes — versus hashing each n-gram
    string, this touches every character once instead of n times and never
    materializes the n-gram strings (the dominant cost of the whole MinHash
    pipeline was exactly that re-hashing)."""
    toks = T.tokens("text")
    th = F.transform(toks, lambda t: T.char_hash(t))
    # r12: the length gate runs on the CHEAP token count BEFORE the
    # rebalance — filtering on size(th) after the projection let the
    # optimizer inline the whole tokenize+char-hash fold into a pushed
    # filter BELOW the spread exchange, re-hashing the corpus on the
    # single scan task (18.6 s single-task CPU in the r12 decontaminate
    # profile). size(tokens) == size(th) (transform preserves length),
    # so the kept rows are identical; only the tokenize+size crosses to
    # the scan side, and it is selective there.
    docs = spread(
        documents.where(F.size(toks) >= SHINGLE_N)
    ).select("doc_id", th.alias("th"))
    comb = lambda i: F.aggregate(  # noqa: E731
        F.slice("th", i, SHINGLE_N),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * SHINGLE_B + h) % T.HASH_MOD,
    )
    shingles = F.transform(
        F.sequence(F.lit(1), F.size("th") - (SHINGLE_N - 1)), comb
    )
    # (length gate already applied pre-spread on the token count above —
    # repeating it here on size(th) would re-inline the hash fold into a
    # pushed-down filter)
    return docs.select("doc_id", F.array_distinct(shingles).alias("shs"))


def _doc_shingles(
    documents: DataFrame, arrays: DataFrame | None = None
) -> DataFrame:
    """(doc_id, sh) — exploded distinct shingle set (the join-friendly
    form; rows are already distinct because the array is)."""
    arr = _doc_shingle_arrays(documents) if arrays is None else arrays
    return arr.select("doc_id", F.explode("shs").alias("sh"))


def _doc_shingles_sql() -> str:
    th = f"list_transform({T.tokens_sql('text')}, sh_t -> {T.char_hash_sql('sh_t')})"
    comb = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_slice(th, sh_i, sh_i + {SHINGLE_N - 1})),"
        f" (acc, h) -> (acc * {SHINGLE_B} + h) % {T.HASH_MOD})"
    )
    return f"""
SELECT DISTINCT doc_id, sh FROM (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, len(th) - {SHINGLE_N - 1}), sh_i -> {comb}
         )) AS sh
  FROM (SELECT doc_id, {th} AS th FROM documents)
  WHERE len(th) >= {SHINGLE_N}
)
"""


def minhash_signatures(
    documents: DataFrame, arrays: DataFrame | None = None
) -> DataFrame:
    """(doc_id, sig_0..sig_{k-1}) — k min-hash values over the doc's distinct
    shingle set. All k minima are per-row ``array_min`` folds over the
    shingle ARRAY — zero shuffle (the old explode + groupBy-of-k-mins
    shuffled one row per (doc, shingle); a signature only ever needs its
    own row's set)."""
    arr = _doc_shingle_arrays(documents) if arrays is None else arrays

    def hash_fn(a: int, b: int):
        return lambda s: (s * a + b) % MINHASH_P

    sig_cols = [
        F.array_min(F.transform("shs", hash_fn(a, b))).alias(f"sig_{i}")
        for i, (a, b) in enumerate(zip(_A, _B))
    ]
    return arr.select("doc_id", *sig_cols)


def minhash_signatures_sql() -> str:
    sigs = ",\n       ".join(
        f"min((sh * {a} + {b}) % {MINHASH_P}) AS sig_{i}"
        for i, (a, b) in enumerate(zip(_A, _B))
    )
    return f"""
WITH shingled AS ({_doc_shingles_sql()})
SELECT doc_id, {sigs}
FROM shingled GROUP BY doc_id
"""


def _band_expr(band: int) -> F.Column:
    cols = [
        F.col(f"sig_{band * MINHASH_ROWS + r}").cast("string")
        for r in range(MINHASH_ROWS)
    ]
    return F.concat_ws(":", *cols)


def _banded(sigs: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_value) from ONE explode over an array of
    band structs — shared by self-join candidates and the incremental
    delta-vs-base probe."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band_id"), _band_expr(band).alias("band_value")
            )
            for band in range(MINHASH_BANDS)
        ]
    )
    return sigs.select("doc_id", F.explode(band_structs).alias("bnd")).select(
        "doc_id", "bnd.band_id", "bnd.band_value"
    )


def minhash_candidates(
    documents: DataFrame, arrays: DataFrame | None = None
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs: docs sharing at least one LSH band.
    The equi-join on (band_id, band_value) is the whole trick — shuffle cost
    is #docs × #bands, never #docs².

    Bands come from ONE explode over an array of (band_id, band_value)
    structs — a per-band union would re-evaluate the whole signature
    subtree (tokenize + hash + 16-way min fold) once per band. The tiny
    banded frame (#docs × #bands rows, no text payload) is persisted
    because the self-join scans it twice."""
    sigs = minhash_signatures(documents, arrays=arrays)
    bands = persist_tracked(_banded(sigs))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band_id", "band_value"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _band_rows_sql() -> str:
    return "\nUNION ALL\n".join(
        "SELECT doc_id, {band} AS band_id, {expr} AS band_value FROM sigs".format(
            band=band,
            expr=" || ':' || ".join(
                f"CAST(sig_{band * MINHASH_ROWS + r} AS VARCHAR)"
                for r in range(MINHASH_ROWS)
            ),
        )
        for band in range(MINHASH_BANDS)
    )


def minhash_candidates_sql() -> str:
    return f"""
WITH sigs AS ({minhash_signatures_sql()}),
bands AS ({_band_rows_sql()})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b USING (band_id, band_value)
WHERE a.doc_id < b.doc_id
"""


def jaccard_verify(
    documents: DataFrame,
    pairs: DataFrame,
    round_digits: int = 6,
    arrays: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for the given (doc_a, doc_b) pairs only.

    Each pair fetches BOTH docs' shingle arrays (two doc-keyed equi-joins
    against the persisted array relation) and intersects them in-row with
    ``array_intersect`` — O(|a|+|b|) per pair inside codegen. This
    replaced the exploded-shingle semi-join + count (the one
    SortMergeJoin the r3 plan audit flagged): that shape shuffled EVERY
    doc's exploded shingle set to serve the semi-join build side, where
    this one moves only the candidate docs' arrays. A band-collision pair
    with zero real overlap still emits (jaccard 0) — the arrays exist for
    every banded doc, and the intersection is just empty."""
    if arrays is None:
        arrays = persist_tracked(_doc_shingle_arrays(documents))
    a = arrays.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    b = arrays.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    with_counts = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("shs_a", "shs_b"))
            .cast("long")
            .alias("inter"),
            F.size("shs_a").cast("long").alias("sz_a"),
            F.size("shs_b").cast("long").alias("sz_b"),
        )
    )
    return with_counts.select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
            round_digits,
        ).alias("jaccard"),
    )


def minhash_near_dups(documents: DataFrame, threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Full pipeline: LSH candidates -> exact Jaccard -> threshold filter.

    ONE persisted per-doc shingle-ARRAY relation feeds both the signature
    side (narrow array_min folds — no shuffle) and the verify side (explode
    on demand); tokenize + 3-gram + hash runs once over the corpus."""
    arrays = persist_tracked(_doc_shingle_arrays(documents))
    cands = persist_tracked(minhash_candidates(documents, arrays=arrays))
    return jaccard_verify(documents, cands, arrays=arrays).where(
        F.col("jaccard") >= threshold
    )


def _jaccard_verify_tail_sql(
    select_cols: str, threshold: float, round_digits: int
) -> str:
    """The ONE copy of the SQL Jaccard-verify tail (shingled/sizes/inter +
    rounded-division threshold) shared by every oracle that verifies a
    `cands(doc_a, doc_b)` CTE — the math must not fork between the full,
    incremental, and table-served pipelines."""
    return f"""shingled AS ({_doc_shingles_sql()}),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingled GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cands c
  JOIN shingled wa ON wa.doc_id = c.doc_a
  WHERE EXISTS (SELECT 1 FROM shingled wb
                WHERE wb.doc_id = c.doc_b AND wb.sh = wa.sh)
  GROUP BY c.doc_a, c.doc_b
)
SELECT {select_cols},
       round(CAST(COALESCE(i.inter, 0) AS DOUBLE)
             / (sa.sz + sb.sz - COALESCE(i.inter, 0)), {round_digits}) AS jaccard
FROM cands c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE round(CAST(COALESCE(i.inter, 0) AS DOUBLE)
            / (sa.sz + sb.sz - COALESCE(i.inter, 0)), {round_digits}) >= {threshold}
"""


def minhash_near_dups_sql(threshold: float = JACCARD_THRESHOLD, round_digits: int = 6) -> str:
    return f"""
WITH cands AS ({minhash_candidates_sql()}),
{_jaccard_verify_tail_sql("c.doc_a, c.doc_b", threshold, round_digits)}"""


INCR_MOD = 5   # doc_id % 5 == 0 plays the "newly ingested batch" (~20%)


def incremental_minhash_near_dups(
    documents: DataFrame,
    mod: int = INCR_MOD,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """(new_doc, existing_doc, jaccard): ingestion-time dedup — probe a
    NEW batch against the EXISTING corpus through the LSH band index
    instead of re-running the all-pairs self-join. The batch split is a
    deterministic id partition (doc_id % mod) so the oracle states the
    same sides.

    This is the incremental shape a 100 TB pipeline actually runs per
    ingest: band buckets for the base corpus are a standing index (here
    rebuilt in-plan; at scale they're the persisted table the
    merge-upsert sink maintains), and each delta only joins its own
    #delta×#bands band rows against it — candidate volume scales with
    the BATCH, never the corpus pair count. Verification is the same
    in-row array_intersect Jaccard as minhash_near_dups."""
    arrays = persist_tracked(_doc_shingle_arrays(documents))
    bands = persist_tracked(
        _banded(minhash_signatures(documents, arrays=arrays))
    )
    delta = bands.where(F.col("doc_id") % mod == 0).select(
        F.col("doc_id").alias("doc_a"), "band_id", "band_value"
    )
    base = bands.where(F.col("doc_id") % mod != 0).select(
        F.col("doc_id").alias("doc_b"), "band_id", "band_value"
    )
    return probe_bands(documents, delta, base, arrays, threshold)


def probe_bands(
    documents: DataFrame,
    delta_bands: DataFrame,
    base_bands: DataFrame,
    arrays: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """The ONE copy of the incremental probe tail: join delta band rows
    (doc_a, band_id, band_value) against base band rows (doc_b, ...),
    dedupe candidates, exact-Jaccard verify, and emit the
    (new_doc, existing_doc, jaccard) contract — shared by the in-plan
    split (incremental_minhash_near_dups) and the table-served index
    (plans/queries_dedup.py::stream_minhash_index_drain), so the probe
    semantics cannot fork between the two oracle-checked twins."""
    cands = (
        delta_bands.join(base_bands, ["band_id", "band_value"])
        .select("doc_a", "doc_b")
        .distinct()
    )
    return (
        jaccard_verify(documents, cands, arrays=arrays)
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("doc_a").alias("new_doc"),
            F.col("doc_b").alias("existing_doc"),
            "jaccard",
        )
    )


def incremental_minhash_sql(
    mod: int = INCR_MOD,
    threshold: float = JACCARD_THRESHOLD,
    round_digits: int = 6,
) -> str:
    return f"""
WITH sigs AS ({minhash_signatures_sql()}),
bands AS ({_band_rows_sql()}),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band_id, band_value)
  WHERE a.doc_id % {mod} = 0 AND b.doc_id % {mod} <> 0
),
{_jaccard_verify_tail_sql(
    "c.doc_a AS new_doc, c.doc_b AS existing_doc", threshold, round_digits
)}"""


# ---------------------------------------------------------------------------
# shingle (word n-gram) Jaccard near-dup
# ---------------------------------------------------------------------------

def shingle_near_dups(documents: DataFrame, threshold: float = JACCARD_THRESHOLD,
                      round_digits: int = 6) -> DataFrame:
    """Near-dup pairs by word-{n}-gram shingle Jaccard. Candidates = pairs
    sharing >= 1 shingle (shingles are selective, unlike single words), then
    exact Jaccard over shingle sets. The candidate join shuffles on shingle
    hash — rare-key blocking, the classic dedup shape."""
    arrays = persist_tracked(  # feeds sizes + both sides of the self-join
        _doc_shingle_arrays(documents)
    )
    sh = _doc_shingles(documents, arrays=arrays)
    sizes = arrays.select("doc_id", F.size("shs").cast("long").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                round_digits,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def shingle_near_dups_sql(threshold: float = JACCARD_THRESHOLD, round_digits: int = 6) -> str:
    return f"""
WITH sh AS ({_doc_shingles_sql()}),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b USING (sh)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), {round_digits}) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), {round_digits}) >= {threshold}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash) — {SIMHASH_BITS}-bit SimHash over word counts: each
    bit is the sign of the count-weighted ±1 vote of that bit of the word's
    portable hash. One explode + groupBy(doc, word) + groupBy(doc)."""
    counts = (
        spread(documents).select("doc_id", F.explode(T.tokens("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
        .withColumn("wh", T.char_hash("word"))
    )
    bit_sums = counts.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when((F.floor(F.col("wh") / (2 ** b)) % 2) == 1, F.col("cnt"))
                .otherwise(-F.col("cnt"))
            ).alias(f"s_{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sim = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s_{b}") > 0, F.lit(2 ** b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_sql() -> str:
    sums = ",\n       ".join(
        f"sum(CASE WHEN floor(wh / {2 ** b}) % 2 = 1 THEN cnt ELSE -cnt END) AS s_{b}"
        for b in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"CASE WHEN s_{b} > 0 THEN {2 ** b} ELSE 0 END" for b in range(SIMHASH_BITS)
    )
    return f"""
WITH counts AS (
  SELECT doc_id, word, count(*) AS cnt
  FROM (SELECT doc_id, unnest({T.tokens_sql('text')}) AS word FROM documents)
  GROUP BY doc_id, word
),
hashed AS (SELECT doc_id, cnt, {T.char_hash_sql('word')} AS wh FROM counts),
bit_sums AS (SELECT doc_id, {sums} FROM hashed GROUP BY doc_id)
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM bit_sums
"""


def _simhash_block_bounds(max_hamming: int) -> list[int]:
    """Bit boundaries splitting the signature into max_hamming+1 blocks, as
    evenly as possible (24 bits, h=3 -> 4 blocks of 6)."""
    n_blocks = max_hamming + 1
    return [SIMHASH_BITS * i // n_blocks for i in range(n_blocks + 1)]


def simhash_near_dups(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash_a, simhash_b) <= max_hamming.

    Pigeonhole blocking with FULL recall: the signature splits into
    max_hamming+1 disjoint bit blocks; a pair within Hamming max_hamming has
    fewer differing bits than blocks, so at least one block matches exactly.
    Candidates come from one explode to (block_id, block_value) keys plus an
    equi-join (same shape as minhash_candidates) — shuffle is
    #docs x (max_hamming+1), never #docs² — then the exact Hamming filter
    verifies. A pair may agree on several blocks, hence the distinct."""
    sh = simhash(documents)
    bounds = _simhash_block_bounds(max_hamming)
    block_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_id"),
                (
                    F.floor(F.col("simhash") / (2 ** bounds[i]))
                    % (2 ** (bounds[i + 1] - bounds[i]))
                ).cast("long").alias("block_value"),
            )
            for i in range(len(bounds) - 1)
        ]
    )
    blocked = persist_tracked(
        sh.select("doc_id", "simhash", F.explode(block_structs).alias("blk"))
        .select("doc_id", "simhash", "blk.block_id", "blk.block_value")
    )
    a = blocked.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"),
        "block_id", "block_value",
    )
    b = blocked.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"),
        "block_id", "block_value",
    )
    cand = (
        a.join(b, ["block_id", "block_value"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_near_dups_sql(max_hamming: int = 3) -> str:
    bounds = _simhash_block_bounds(max_hamming)
    block_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {i} AS block_id,"
        f" CAST(floor(simhash / {2 ** bounds[i]}) % {2 ** (bounds[i + 1] - bounds[i])} AS BIGINT) AS block_value"
        " FROM sh"
        for i in range(len(bounds) - 1)
    )
    return f"""
WITH sh AS ({simhash_sql()}),
blocked AS ({block_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM blocked a JOIN blocked b USING (block_id, block_value)
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# dedup cluster canonicalization (connected components over near-dup pairs)
# ---------------------------------------------------------------------------

def connected_components(
    documents: DataFrame, pairs: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """(doc_id, component) — transitive closure of near-dup pairs: every doc
    labeled with the MIN doc_id reachable through the pair graph (singletons
    label themselves). This is the canonicalization step after any near-dup
    detector: keep one doc per component, drop the rest.

    Iterative min-label propagation (the scalable form — recursive SQL
    closure materializes |component|² paths; this keeps one label row per
    node): each round, every node takes the min of its own label and its
    neighbors' labels (hash-min), then relabels through the fresh label
    table (pointer jump), so convergence is ~O(log diameter) rounds rather
    than O(diameter); a changed-count action per round detects the
    fixpoint. Near-dup graphs converge in 2-3 rounds; DBSCAN's diameter-18
    fixture blob in 7 (measured by output-equality bisect over
    max_iterations). Driver-side actions are inherent to iterative
    fixpoints — this operator is exempt from the no-jobs-at-plan-build
    guard (tests/test_plans.py).

    Each round's labels are localCheckpoint()ed, NOT persist()ed: an
    iterative self-referencing loop needs its lineage physically truncated
    every round — with plain persist the round-k plan still nests all k-1
    prior plans, and any cache miss (or the cache manager declining the
    nested-self-join match, observed on this exact loop) re-executes the
    whole chain: measured 3× growth per round, 52 s by round 4, on a
    500-node diameter-18 graph that runs 0.5 s/round truncated. This is
    the GraphX/GraphFrames iteration pattern; on a multi-executor cluster
    swap localCheckpoint for reliable checkpoint() under a checkpoint dir
    if executor loss during a long propagation must be survivable.
    """
    edges = persist_tracked(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
    )
    # The per-round joins move LABEL-sized frames (one row per node), yet
    # each round paid 3 joins x `shuffle.partitions` near-empty tasks plus
    # a checkpoint of as many blocks — at fixture scale >100 sub-100ms
    # stages of pure scheduling overhead per query (r13 stage profile of
    # sim_dbscan: 145 stages). AQE's size-based coalescing is the
    # scale-adaptive fix, but its default `parallelismFirst` deliberately
    # ignores the advisory size to maximize parallelism. Flipping it OFF
    # for the DURATION OF THE FIXPOINT ONLY (every action between here and
    # the return runs on this driver thread) lets tiny label shuffles
    # coalesce to one task while a 100 TB label table still splits by the
    # advisory byte size — partitioning follows STATE size, the same rule
    # the CMS drain's state buckets follow. Restored in `finally`, so
    # downstream consumers of the returned (checkpointed) labels are
    # planned under the caller's conf.
    spark = documents.sparkSession
    _PF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    try:
        pf_prev = spark.conf.get(_PF)
    except Exception:
        pf_prev = None
    spark.conf.set(_PF, "false")
    try:
        return _cc_fixpoint(documents, edges, max_iterations)
    finally:
        if pf_prev is None:
            spark.conf.unset(_PF)
        else:
            spark.conf.set(_PF, pf_prev)


def _cc_fixpoint(
    documents: DataFrame, edges: DataFrame, max_iterations: int
) -> DataFrame:
    from ..cache import checkpoint_tracked

    labels = checkpoint_tracked(
        documents.select("doc_id", F.col("doc_id").alias("component")),
        eager=True,
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("n_comp"))
        )
        # `prev` rides along so the fixpoint probe below can read the
        # change flag straight off the checkpointed round output instead
        # of re-joining it against the previous label table (r13: one
        # fewer shuffle join per round; the probe job runs over cached
        # blocks only).
        hashmin = labels.join(
            neighbor_min, labels.doc_id == neighbor_min.src, "left"
        ).select(
            "doc_id",
            F.col("component").alias("prev"),
            F.least(
                F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
            ).alias("component"),
        )
        # Pointer jump (label-of-label shortcut): relabel every node
        # through the label table built THIS round, so a node whose label
        # already learned a smaller id adopts it immediately. Labels are
        # always doc_ids of graph nodes and only ever decrease, so the
        # composition preserves the fixpoint (min reachable id) while
        # label chains halve every round — hash-min alone needs
        # O(eccentricity of the min node) rounds (measured 18 on DBSCAN's
        # 500-node blob, ~40 at 2000 nodes), hash-min + jump needs
        # ~O(log diameter). One extra equi-join of two label-width frames
        # per round buys a diameter-independent round count — the
        # difference between 7 and several hundred shuffles on a 100 TB
        # spatial/near-dup graph.
        # (r13 probe, REJECTED: a SECOND pointer jump per round — chains
        # quarter instead of halve — grew the stage count 123 -> 178 at
        # sf0.1; the extra join per round costs more than the rounds it
        # removes. One jump stays the measured optimum.)
        jump = hashmin.select(
            F.col("doc_id").alias("j_id"), F.col("component").alias("j_comp")
        )
        # eager checkpoint: materializes + truncates lineage per round;
        # tracked so release_caches() frees each round's blocks (the raw
        # localCheckpoint() this used was the r12 ADVICE storage leak)
        updated = checkpoint_tracked(
            hashmin.join(jump, hashmin.component == jump.j_id, "left")
            .select(
                "doc_id",
                "prev",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("j_comp"), F.col("component")),
                ).alias("component"),
            ),
            eager=True,
        )
        # Existence probe, not a full count: only ==0 is ever consulted, so
        # limit(1) lets the round's driver action short-circuit on the first
        # changed row — read off the checkpointed blocks via the ride-along
        # prev column, no join.
        changed = (
            updated.where(F.col("component") != F.col("prev"))
            .limit(1)
            .count()
        )
        labels = updated.select("doc_id", "component")
        if changed == 0:
            break
    return labels.select("doc_id", "component")


def minhash_dedup_components_sql(threshold: float = JACCARD_THRESHOLD) -> str:
    """DuckDB twin: recursive-CTE transitive closure over the same near-dup
    pairs (fine at oracle scale; the Spark side uses label propagation)."""
    return f"""
WITH RECURSIVE nd AS (
  SELECT doc_a, doc_b FROM ({minhash_near_dups_sql(threshold)})
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM nd
  UNION
  SELECT doc_b, doc_a FROM nd
),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, min(dst) AS component
FROM reach GROUP BY src
"""
