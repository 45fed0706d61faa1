"""As-of (point-in-time) join — a custom operator Spark lacks natively.

Classic need in training-data and feature pipelines: for every left event,
attach the most recent right-side observation at-or-before its timestamp,
per key (feature backfill, last-known-price, state-at-time-of-event).

Spark-first formulation — NOT a range join: tag the two sides, union them,
and carry right-side values forward with ``last(..., ignorenulls=True)``
over a (key-partitioned, time-ordered) window.  One shuffle on the key, one
sort — O(n log n) per key and no candidate-pair blow-up, so it scales to
100 TB where an inequality-join (O(|L|·|R|) worst case per key) would not.
Right-side rows sort BEFORE left rows at equal timestamps, giving the
standard at-or-before (``l.ts >= r.ts``) semantics that DuckDB's
``ASOF JOIN`` implements — which is exactly the oracle used to verify it.

Right side must be unique per (key, ts) — pre-dedupe with a deterministic
rule (see queries/joins_q) or the "most recent" row is ill-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right row with ``right.on <= left.on`` per key.

    Right value columns (everything outside ``by`` + ``on``) are appended,
    suffixed, null when no prior right row exists.  ``on`` must be the same
    column name on both sides.
    """
    key_cols = by + [on]
    vcols = [c for c in right.columns if c not in key_cols]
    lcols = [c for c in left.columns if c not in key_cols]
    out_vcols = {c: c + suffix if c in left.columns else c for c in vcols}

    l2 = left
    for c in vcols:
        l2 = l2.withColumn(out_vcols[c], F.lit(None).cast(right.schema[c].dataType))
    l2 = l2.withColumn("_side", F.lit(1))

    r2 = right
    for c in vcols:
        r2 = r2.withColumnRenamed(c, out_vcols[c])
    for c in lcols:
        r2 = r2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r2 = r2.withColumn("_side", F.lit(0))

    ordered = key_cols + lcols + [out_vcols[c] for c in vcols] + ["_side"]
    u = l2.select(*ordered).unionByName(r2.select(*ordered))

    w = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.select(
        *key_cols,
        *lcols,
        *[
            F.last(out_vcols[c], ignorenulls=True).over(w).alias(out_vcols[c])
            for c in vcols
        ],
        "_side",
    )
    return filled.where(F.col("_side") == 1).drop("_side")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    tolerance: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of FORWARD join: earliest right row with ``right.on >=
    left.on`` per key, optionally within ``tolerance`` (an INTERVAL
    string, e.g. ``'2 days'``).

    Same union+window shape as :func:`asof_join` but ordered DESCENDING,
    so the running fill carries the NEXT right observation backward; at
    equal timestamps the right row still sorts before the left row it
    should match.  With ``tolerance``, matches farther than the horizon
    are nulled out (match time included so callers can audit distance).
    One shuffle + one sort per key — same 100 TB properties as backward.

    The matched right timestamp is always appended as ``{on}{suffix}``.
    """
    key_cols = by + [on]
    vcols = [c for c in right.columns if c not in key_cols]
    lcols = [c for c in left.columns if c not in key_cols]
    out_vcols = {c: c + suffix if c in left.columns else c for c in vcols}
    on_match = on + suffix

    l2 = left
    for c in vcols:
        l2 = l2.withColumn(out_vcols[c], F.lit(None).cast(right.schema[c].dataType))
    l2 = l2.withColumn(on_match, F.lit(None).cast(right.schema[on].dataType))
    l2 = l2.withColumn("_side", F.lit(1))

    r2 = right
    for c in vcols:
        r2 = r2.withColumnRenamed(c, out_vcols[c])
    r2 = r2.withColumn(on_match, F.col(on))
    for c in lcols:
        r2 = r2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r2 = r2.withColumn("_side", F.lit(0))

    ordered = (
        key_cols + lcols + [out_vcols[c] for c in vcols] + [on_match, "_side"]
    )
    u = l2.select(*ordered).unionByName(r2.select(*ordered))

    w = (
        W.partitionBy(*by)
        .orderBy(F.col(on).desc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fill_cols = [out_vcols[c] for c in vcols] + [on_match]
    filled = u.select(
        *key_cols,
        *lcols,
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in fill_cols
        ],
        "_side",
    ).where(F.col("_side") == 1).drop("_side")

    if tolerance is not None:
        within = F.col(on_match) <= F.col(on) + F.expr(f"INTERVAL {tolerance}")
        for c in fill_cols:
            filled = filled.withColumn(c, F.when(within, F.col(c)))
    return filled
