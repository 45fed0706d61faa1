"""Linear multi-touch attribution — exact-integer conservation.

Reference parity: the reference derives per-merchant value rollups row by
row (buisness_profile_etl/main.py:587-607); this operator is the same
"split a value across contributing rows" shape, generalized to the
marketing-attribution query w29 exposes.

The money-conservation contract: every purchase's value (in integer
milli-cents) is distributed EXACTLY across its touches —

    sum(credit_mc over the purchase's touches) == value_cents * 1000

Each touch gets ``value_mc div n_touches`` and the remainder
(``value_mc mod n_touches`` < n_touches) goes to the EARLIEST touch
(ties broken by event_id), so the split is deterministic, integer, and
order-independent — the driver's hash gate and a finance reconciliation
both see bit-identical totals.

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
    n = F.count("*").over(wp)
    value_mc = F.col("value_cents") * 1000
    base = F.floor(value_mc / n).cast("bigint")
    rem = (value_mc % n).cast("bigint")
    first = F.row_number().over(wr) == 1
    return touched.select(
        "event_id",
        "user_id",
        "p_id",
        "value_cents",
        (base + F.when(first, rem).otherwise(F.lit(0))).alias("credit_mc"),
    )
