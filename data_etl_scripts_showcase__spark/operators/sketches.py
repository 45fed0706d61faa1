"""Mergeable frequency sketches: count-min (training-data pipeline ops).

Complements the other approximate aggregates in the engine (HLL distinct
counts via ``approx_count_distinct`` — a18; quantile sketches via
``approx_percentile`` — a14/a21) with a frequency sketch whose build,
merge, and probe are all plain DataFrame aggregates — no UDF, no driver
state.

Scale design (the 100 TB story):
- The sketch is a fixed ``depth × width`` counter grid (e.g. 4×256 =
  1 Ki counters) REGARDLESS of key cardinality — the whole point vs an
  exact key-count table when keys number in the billions.
- Build aggregates per-key partials first (|keys| rows, map-side
  combined), then folds them into the grid — the grid explode runs on
  |distinct keys| rows, never |rows|.
- Sketches are MERGEABLE: two grids over disjoint data merge by
  ``groupBy(row, bucket).sum`` — the property that lets every partition /
  day / shard sketch independently and combine at the end (asserted in
  tests).
- Hashes are md5-derived (like operators.dedup.h32), so any SQL engine —
  including the DuckDB oracle — reproduces the grid bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import h32

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket(key: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row-``row``'s bucket for a key: seeded 32-bit md5 hash mod width."""
    return h32(key.cast("string"), row) % F.lit(width)


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build a count-min sketch over ``df[key_col]`` → (row, bucket, n).

    Exact per-key counts are aggregated FIRST (one shuffle on the key,
    map-side partials), then each distinct key folds its count into
    ``depth`` grid cells — so the explode factor applies to |distinct
    keys|, and the output is at most depth×width rows however large the
    input.
    """
    per_key = df.groupBy(key_col).agg(F.count("*").alias("_n"))
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                cms_bucket(F.col(key_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        per_key.select(F.explode(rows).alias("rb"), F.col("_n"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("_n").cast("bigint").alias("n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): cell-wise sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(
        F.sum("n").cast("bigint").alias("n")
    )


HLL_M = 64  # registers (2^6); std-error ~ 1.04/sqrt(64) = 13%
HLL_SEED = 91
_HLL_WBITS = 26  # 32-bit hash minus 6 index bits


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """HyperLogLog register table over ``df[key_col]`` → (group…, idx, reg).

    The 32-bit md5 hash splits into a 6-bit register index and a 26-bit
    remainder ``w``; ``reg`` is the max over keys of rho(w) = leading-zero
    count of ``w`` + 1 (so ``reg`` ∈ [1, 27]).  Registers are MERGEABLE by
    cell-wise max — shards sketch independently and combine, the same
    property as the count-min grid.  Output is ≤ |groups|×64 rows at ANY
    key cardinality; md5-derived hashing keeps the oracle able to
    reproduce the registers bit-for-bit.
    """
    groups = group_cols or []
    h = h32(F.col(key_col).cast("string"), HLL_SEED)
    idx = (h % F.lit(HLL_M)).alias("idx")
    w = F.floor(h / F.lit(HLL_M)).cast("bigint")
    # rho = leading zeros in the 26-bit w, plus 1.  bin() strips leading
    # zeros, so bitlength(w) = length(bin(w)) and rho = 27 - bitlength —
    # except w = 0 (bin '0' has length 1), pinned to the max rank 27.
    rho = F.when(w == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(w))
    )
    return (
        df.select(*groups, idx, rho.cast("int").alias("rho"))
        .groupBy(*groups, "idx")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(*sketches: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge register tables built with the same (m, seed): cell-wise max."""
    groups = group_cols or []
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*groups, "idx").agg(F.max("reg").alias("reg"))


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Cardinality estimate per group from a register table.

    Exact-integer discipline (the v9/x4 micro-unit rule): the harmonic-mean
    denominator Z = Σ 2^(-reg) is scaled by 2^27 so every term — including
    the ``V`` empty registers contributing 2^0 each — is an exact BIGINT;
    the only float ops are one division (raw path) or one ln (linear-
    counting small-range correction, E_raw ≤ 2.5m with empties), rounded
    to 4 dp.  Any SQL engine reproduces the result exactly.
    """
    groups = group_cols or []
    scale = 1 << (_HLL_WBITS + 1)  # 2^27
    alpha = 0.709  # alpha_64 (HLL bias constant for m = 64)
    agg = registers.groupBy(*groups).agg(
        F.count("*").alias("_used"),
        F.sum(F.expr(f"shiftleft(1L, {_HLL_WBITS + 1} - reg)"))
        .cast("bigint")
        .alias("_z_used"),
    )
    v_empty = (F.lit(HLL_M) - F.col("_used")).cast("bigint")
    z_scaled = (F.col("_z_used") + v_empty * F.lit(scale)).cast("bigint")
    staged = agg.select(
        *groups, v_empty.alias("v_empty"), z_scaled.alias("z_scaled")
    )
    e_raw = F.lit(alpha * HLL_M * HLL_M * scale) / F.col("z_scaled")
    linear = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / F.col("v_empty").cast("double")
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (F.col("v_empty") > 0), linear
    ).otherwise(e_raw)
    return staged.select(
        *groups, "v_empty", "z_scaled", F.round(est, 4).alias("est_distinct")
    )


def cms_probe(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Estimate each key's frequency: min over the key's ``depth`` cells.

    The sketch side is tiny (≤ depth×width rows) and broadcasts; the probe
    is an equality join on (row, bucket) + a min aggregate per key — no
    shuffle of the sketch, one of the keys.  Estimates never undercount
    (CMS guarantee: est ≥ true; est ≤ true + εN with prob 1−δ).
    """
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                cms_bucket(F.col(key_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    probes = keys.select(F.col(key_col), F.explode(rows).alias("rb")).select(
        key_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("n").cast("bigint").alias("est_n"))
    )
