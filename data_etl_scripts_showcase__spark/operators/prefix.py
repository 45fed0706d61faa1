"""Distributed inclusive prefix sums — the engine's cumulative primitive.

A running total in global order is the textbook case for a
single-partition window (``sum() OVER (ORDER BY ...)``) — a non-starter at
100 TB.  This operator computes the SAME inclusive running totals with the
bucket decomposition the engine already uses for row ids (scale_ops2.
global_row_ids) and ECDFs (a35) and shard offsets (x55/st21):

  1. bucket every row by a DATA-DERIVED range key that sorts consistently
     with ``order_cols``' leading column;
  2. one tiny aggregate: per-bucket totals → cumulative bucket offsets via
     a window over the (small) bucket list — |buckets| rows, not |rows|;
  3. broadcast the offsets back and add the intra-bucket running sum
     (window partitioned by bucket — shuffles on the bucket key only).

Results are a pure function of the data (bucket boundaries are values,
not partitioner samples): deterministic under any partitioning, exact for
integer inputs.  Skew only affects task balance — pick the bucket
granularity so one bucket's rows fit a task comfortably.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_running_sums(
    df: DataFrame,
    bucket_col: Column,
    order_cols: list[str],
    sums: dict[str, str],
) -> DataFrame:
    """Append inclusive running totals over the global (bucket, order)
    order: for each ``value_col -> out_col`` in ``sums``, ``out_col`` =
    sum of ``value_col`` over all rows at-or-before this row.

    ``bucket_col`` must sort consistently with ``order_cols[0]`` (the
    global_row_ids precondition) and must never evaluate to NULL: a NULL
    bucket would silently vanish from the offsets join while still being
    counted by callers that aggregate the un-joined input, so it is a
    hard error raised row-side (JVM ``raise_error``, no extra action).
    """
    guarded = F.when(bucket_col.isNotNull(), bucket_col).otherwise(
        F.raise_error(
            F.lit("bucketed_running_sums: bucket_col evaluated to NULL; "
                  "coalesce NULL order values into a sentinel bucket first")
        )
    )
    b = df.withColumn("_bkt", guarded)
    offset_aggs = [F.sum(v).alias(f"_bt_{v}") for v in sums]
    off = b.groupBy("_bkt").agg(*offset_aggs)
    wprev = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    for v in sums:
        off = off.withColumn(
            f"_off_{v}", F.coalesce(F.sum(f"_bt_{v}").over(wprev), F.lit(0))
        )
    offsets = off.select("_bkt", *[f"_off_{v}" for v in sums])
    wb = Window.partitionBy("_bkt").orderBy(
        *[F.col(c) for c in order_cols]
    ).rowsBetween(Window.unboundedPreceding, 0)
    out = b.join(F.broadcast(offsets), "_bkt")
    for v, name in sums.items():
        out = out.withColumn(name, F.col(f"_off_{v}") + F.sum(v).over(wb))
    return out.drop("_bkt", *[f"_off_{v}" for v in sums])
