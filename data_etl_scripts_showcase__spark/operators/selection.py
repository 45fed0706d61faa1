"""Distributed exact selection (k-th smallest) by histogram bisection.

Exact order statistics at 100 TB cannot sort: a global sort shuffles the
world, and ``percentile``'s exact aggregate buffers every value per
group.  Selection by histogram refinement needs only COUNTING passes:

  pass 1:  n, lo, hi                       (one aggregate)
  pass 2+: 128-bin counts over [lo, hi)    (one aggregate per round)
           → the k-th value's bin becomes the new [lo, hi), and k is
             reduced by the mass below it
  final:   the surviving range holds ≤ n/128^rounds values — small
           enough to rank exactly with a window over the filtered rows

Each round divides the candidate range by 128, so 2 rounds leave
n/16,384 of the data and 3 rounds n/2M — the classic external-memory
selection algorithm, expressed as Spark aggregates.  Every boundary is
derived from data values with mirrored arithmetic, and the result is an
actual data value: exact, partitioning-independent, engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NBINS = 128


def kth_smallest(
    df: DataFrame, col: str, k: int, rounds: int = 2
) -> float:
    """Exact k-th smallest value (1-based) of ``df[col]`` via
    ``rounds`` histogram-narrowing passes + one exact rank on the
    surviving sliver.  Driver traffic per pass is one scalar row."""
    first = df.agg(
        F.count(col).alias("n"),
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
    ).collect()[0]
    n = first["n"]
    if n == 0:
        raise ValueError("kth_smallest on empty input")
    lo, hi = float(first["lo"]), float(first["hi"])
    if not 1 <= k <= n:
        raise ValueError(f"k={k} out of range 1..{n}")

    cur = df.select(F.col(col).alias("_x"))
    for _ in range(rounds):
        if lo == hi:
            return lo
        width = (hi - lo) / NBINS
        binned = (
            cur.where((F.col("_x") >= lo) & (F.col("_x") <= hi))
            .select(
                F.least(
                    F.floor((F.col("_x") - F.lit(lo)) / F.lit(width)).cast("int"),
                    F.lit(NBINS - 1),
                ).alias("_b")
            )
            .groupBy("_b")
            .agg(F.count("*").alias("_n"))
            .collect()
        )
        counts = {r["_b"]: r["_n"] for r in binned}
        cum = 0
        for b in range(NBINS):
            c = counts.get(b, 0)
            if cum + c >= k:
                k -= cum
                lo2 = lo + b * width
                # the last bin is closed on the right (least() clamp)
                hi = hi if b == NBINS - 1 else lo + (b + 1) * width
                lo = lo2
                break
            cum += c
        else:  # pragma: no cover - k validated above
            raise AssertionError("k beyond histogram mass")
        # shrink the scanned set to the surviving range
        cur = cur.where((F.col("_x") >= lo) & (F.col("_x") <= hi))

    from pyspark.sql import Window as W

    sliver = cur.where((F.col("_x") >= lo) & (F.col("_x") <= hi))
    row = (
        sliver.withColumn(
            "_rn", F.row_number().over(W.orderBy(F.col("_x").asc()))
        )
        .where(F.col("_rn") == k)
        .collect()
    )
    return float(row[0]["_x"])
