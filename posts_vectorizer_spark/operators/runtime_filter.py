"""Runtime join filters — the engine's substitute for Spark's internal
runtime-filter framework (InjectRuntimeFilter builds BloomFilterAggregate
plans, but `bloom_filter_agg` is not in the public function registry, so
this builds the same shape from public primitives).

The pattern at 100 TB: a selective dimension-side predicate should prune
the fact scan BEFORE the join shuffle. A broadcast Bloom filter of the dim
keys does that with a fixed-size structure regardless of key cardinality —
the fact side drops most non-matching rows at the scan stage, and the
exact join afterwards removes the false positives, so the filter is purely
physical (never changes results).

Construction is fully declarative (no driver-side collect of keys):

  slot    = pmod(hash(key), n_slots)         -- which long in the table
  bit     = pmod(hash(key, SEED2), 64)       -- which bit in that long
  bloom   = map<slot, bit_or(1L << bit)>     -- built by one dim-side agg,
                                                carried as a 1-row map,
                                                broadcast to the fact side
  test    = bloom[slot] & (1L << bit) != 0   -- map lookup + bit test

One hash position per key (k=1) with two independent hash draws folded
into (slot, bit) — for the classic m/n ratios this keeps the false-positive
rate low enough for pruning (fp ~= keys / (64 * n_slots)); correctness
never depends on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BIT_SEED = 0x9E3779B9  # second murmur seed: decorrelates bit from slot


def _slot(key: Column, n_slots: int) -> Column:
    return F.pmod(F.hash(key), F.lit(n_slots))


def _bitmask(key: Column) -> Column:
    bit = F.pmod(F.hash(key, F.lit(BIT_SEED)), F.lit(64))
    # F.shiftleft only takes a literal shift; the SQL function accepts a
    # column — call it through the registry.
    return F.call_function("shiftleft", F.lit(1).cast("long"), bit.cast("int"))


def build_bloom(dim: DataFrame, key: str, n_slots: int = 4096) -> DataFrame:
    """1-row DataFrame with a ``bloom`` map<int,bigint> of the dim keys.

    Two aggregations, both dim-sized: per-slot bit_or (map-side
    combinable), then map_from_entries over the <= n_slots rows. The
    result is a single row suitable for crossJoin(broadcast(...))."""
    key_c = F.col(key)
    slots = (
        dim.select(
            _slot(key_c, n_slots).alias("_slot"), _bitmask(key_c).alias("_m")
        )
        .groupBy("_slot")
        .agg(F.bit_or("_m").alias("_mask"))
    )
    return slots.agg(
        F.map_from_entries(
            F.collect_list(F.struct("_slot", "_mask"))
        ).alias("bloom")
    )


def might_contain(bloom: Column, key: Column, n_slots: int = 4096) -> Column:
    """True if ``key`` may be in the filter (false positives possible,
    false negatives impossible). NULL keys test False — a NULL equi-join
    key can never match, so pruning it is exact."""
    mask = F.element_at(bloom, _slot(key, n_slots))
    return F.coalesce(
        (mask.bitwiseAND(_bitmask(key)) != 0), F.lit(False)
    )


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_slots: int = 4096,
) -> DataFrame:
    """fact ⋈ dim with the fact side pre-pruned by a broadcast Bloom filter
    of dim keys. Result is EXACTLY the inner equi-join (the join removes
    Bloom false positives); the filter only shrinks what reaches the join
    shuffle — at 100 TB this is the difference between shuffling the whole
    fact table and shuffling the ~matching slice."""
    bloom = build_bloom(dim, dim_key, n_slots)
    pruned = (
        fact.crossJoin(F.broadcast(bloom))
        .where(might_contain(F.col("bloom"), F.col(fact_key), n_slots))
        .drop("bloom")
    )
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])
