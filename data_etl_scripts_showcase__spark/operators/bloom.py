"""Bloom-filter pre-join pruning as plain DataFrame aggregates.

The reference's only join-pruning device is the collected IN-list spliced
into source SQL (SURVEY.md §2.3 J1, `Gonukkad_Merchants.py:44,61`) — O(all
ids) in one SQL string.  The scale-out form is a Bloom filter: hash every
build-side key into k bit positions of an m-bit array, broadcast the (tiny,
fixed-size) bit set, and drop probe rows that miss any position BEFORE the
shuffle join.  Spark's own runtime bloom pruning
(`spark.sql.optimizer.runtime.bloomFilter.enabled`, exercised by x19) does
this inside AQE; this operator is the explicit, engine-level form whose
bits are md5-derived so the DuckDB oracle reproduces the filter exactly.

Guarantees (asserted in tests and by the x27 query):
- NO false negatives: every true member passes (each of its k cells was
  set during build).
- False positives bounded by (1 - e^(-kn/m))^k; the query reports the
  observed count against the exact semi-join.

Scale: the filter is ≤ m rows of distinct bit positions (m = 8 Ki here —
a few KiB broadcast) regardless of build-side cardinality; the build is
one map-side-combined aggregate over distinct keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import h32

BLOOM_M = 8192  # bits
BLOOM_SEEDS = (11, 12, 13)  # k = 3 hash functions


def bloom_bits(
    df: DataFrame,
    key_col: str,
    m: int = BLOOM_M,
    seeds: tuple[int, ...] = BLOOM_SEEDS,
) -> DataFrame:
    """Build the filter: the DISTINCT set bit positions → (bit) rows.

    Distinct keys first (one shuffle, map-side combine), then k cells per
    key, then distinct positions — output ≤ m rows however many keys.
    """
    keys = df.select(F.col(key_col).alias("_k")).distinct()
    cells = F.array(
        *[h32(F.col("_k").cast("string"), s) % F.lit(m) for s in seeds]
    )
    return (
        keys.select(F.explode(cells).alias("bit"))
        .distinct()
        .select(F.col("bit").cast("bigint").alias("bit"))
    )


def bloom_probe(
    keys: DataFrame,
    bits: DataFrame,
    key_col: str,
    m: int = BLOOM_M,
    seeds: tuple[int, ...] = BLOOM_SEEDS,
) -> DataFrame:
    """Probe: keep ``keys`` rows plus a ``bloom_pass`` flag.

    Each probe key explodes to its k cells, equality-joins the broadcast
    bit set, and passes iff all k cells are present (count == k).  No probe
    row is lost (left join + conditional count), so the caller can report
    both the pruned candidate set and the pass/fail accounting.
    """
    k = len(seeds)
    cells = F.array(
        *[h32(F.col(key_col).cast("string"), s) % F.lit(m) for s in seeds]
    )
    exploded = keys.select(key_col, F.explode(cells).alias("bit"))
    hit = F.broadcast(bits.withColumn("_set", F.lit(1)))
    return (
        exploded.join(hit, "bit", "left")
        .groupBy(key_col)
        .agg((F.count("_set") == F.lit(k)).alias("bloom_pass"))
    )
