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
