"""Linear multi-touch attribution — exact-integer conservation.

Reference parity: the reference derives per-merchant value rollups row by
row (buisness_profile_etl/main.py:587-607); this operator is the same
"split a value across contributing rows" shape, generalized to the
marketing-attribution query w29 exposes.

The money-conservation contract: every purchase's value (in integer
milli-cents) is distributed EXACTLY across its touches —

    sum(credit_mc over the purchase's touches) == value_cents * 1000

Each touch gets the FLOOR share ``floor(value_mc / n_touches)`` and the
floor-consistent remainder ``pmod(value_mc, n_touches)`` (always in
``[0, n)``, even for refunds where value_mc < 0) goes to the EARLIEST
touch (ties broken by event_id), so the split is deterministic, integer,
and order-independent — the driver's hash gate and a finance
reconciliation both see bit-identical totals.  ``base*n + rem ==
value_mc`` holds for ANY sign of value_mc; a sign-of-dividend ``%``
would break it for negatives (e.g. -7 mc over 2 touches would credit
-9).  All arithmetic is bigint (pmod + exact ``div`` on the already-
divisible numerator) — no double division, so parity with the integer
oracle holds past 2^53.

Scale shape: the touch join is keyed on user_id (hash join) with the
time window as a residual predicate; the per-purchase touch count and
the earliest-touch rank ride ONE window partitioned by purchase id —
never an unpartitioned window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def linear_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "INTERVAL 1 DAY",
) -> DataFrame:
    """Per-(click, purchase) credit rows with exact conservation.

    ``clicks``: (event_id, user_id, ts); ``purchases``: (p_id, p_uid,
    p_ts, value_cents).  Returns one row per touch with ``credit_mc``
    (integer milli-cents): floor share + remainder-to-earliest-touch.
    """
    touched = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_uid"))
        & (F.col("ts") <= F.col("p_ts"))
        & (F.col("ts") >= F.col("p_ts") - F.expr(lookback)),
    )
    wp = W.partitionBy("p_id")
    wr = wp.orderBy(F.col("ts").asc(), F.col("event_id").asc())
    staged = touched.select(
        "event_id",
        "user_id",
        "p_id",
        "value_cents",
        (F.col("value_cents").cast("bigint") * 1000).alias("_vmc"),
        F.count("*").over(wp).alias("_n"),
        (F.row_number().over(wr) == 1).alias("_first"),
    )
    # floor-consistent split in pure bigint: rem = pmod(vmc, n) in [0, n);
    # (vmc - rem) is exactly divisible by n, so integral `div` == floor —
    # conservation holds for negative vmc and bit-exactly above 2^53.
    rem = F.pmod(F.col("_vmc"), F.col("_n"))
    base = F.expr("(_vmc - pmod(_vmc, _n)) div _n")
    return staged.select(
        "event_id",
        "user_id",
        "p_id",
        "value_cents",
        (base + F.when(F.col("_first"), rem).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("credit_mc"),
    )
