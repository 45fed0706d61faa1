"""Distributed exact selection (k-th smallest) by histogram bisection.

Exact order statistics at 100 TB cannot sort: a global sort shuffles the
world, and ``percentile``'s exact aggregate buffers every value per
group.  Selection by histogram refinement needs only COUNTING passes:

  pass 1:  n, lo, hi                       (one aggregate)
  pass 2+: 128-bin counts over [lo, hi]    (one aggregate per round)
           → the k-th value's bin becomes the new candidate set, and k
             is reduced by the mass below it
  final:   the surviving set holds ≤ n/128^rounds values — small
           enough to rank exactly with a window over the filtered rows

Each round divides the candidate range by 128, so 2 rounds leave
n/16,384 of the data and 3 rounds n/2M — the classic external-memory
selection algorithm, expressed as Spark aggregates.

Float discipline: a round NEVER narrows by recomputed edges
(``lo + b*width`` can land an ulp away from the value's true bin
boundary and drop a counted value).  Instead the winning bin's rows are
selected with the IDENTICAL binning expression used to count them, and
the next round's [lo, hi] are that bin's exact observed min/max (data
values, not arithmetic).  The result is an actual data value: exact,
partitioning-independent, engine-independent.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NBINS = 128


def _bin_expr(lo: float, width: float) -> Column:
    """The one binning expression — counting and narrowing must share it
    bit-for-bit so a counted value can never fall outside its bin."""
    return F.least(
        F.floor((F.col("_x") - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(NBINS - 1),
    )


def kth_smallest(
    df: DataFrame, col: str, k: int, rounds: int = 2
) -> float:
    """Exact k-th smallest value (1-based) of ``df[col]`` via
    ``rounds`` histogram-narrowing passes + one exact rank on the
    surviving sliver.  Driver traffic per pass is one O(NBINS) row set."""
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

    # NULLs are excluded from the rank set up front: k is validated against
    # the non-null count, and row_number over ``_x ASC`` would otherwise
    # sort NULLs first on the rounds=0 / width-underflow paths and shift
    # the k-th rank.
    cur = df.select(F.col(col).alias("_x")).where(F.col("_x").isNotNull())
    for _ in range(rounds):
        if lo == hi:
            return lo
        width = (hi - lo) / NBINS
        if width <= 0 or not math.isfinite(width):
            # (hi - lo)/NBINS underflowed (or overflowed): only a handful
            # of representable doubles remain between lo and hi — stop
            # narrowing and rank the survivors exactly.
            break
        binned = (
            cur.select("_x", _bin_expr(lo, width).alias("_b"))
            .groupBy("_b")
            .agg(
                F.count("*").alias("_n"),
                F.min("_x").alias("_lo"),
                F.max("_x").alias("_hi"),
            )
            .collect()
        )
        rows = {r["_b"]: r for r in binned}
        cum = 0
        for b in range(NBINS):
            c = rows[b]["_n"] if b in rows else 0
            if cum + c >= k:
                k -= cum
                break
            cum += c
        else:  # pragma: no cover - k validated above
            raise AssertionError("k beyond histogram mass")
        # Narrow with the IDENTICAL binning expression (old lo/width) —
        # never with recomputed float edges.
        cur = cur.where(_bin_expr(lo, width) == b)
        # Next round's range: the bin's exact observed extremes (data
        # values from the same aggregate), so the new histogram covers
        # every surviving row — still one counting pass per round.
        lo, hi = float(rows[b]["_lo"]), float(rows[b]["_hi"])

    from pyspark.sql import Window as W

    row = (
        cur.withColumn(
            "_rn", F.row_number().over(W.orderBy(F.col("_x").asc()))
        )
        .where(F.col("_rn") == k)
        .collect()
    )
    return float(row[0]["_x"])
