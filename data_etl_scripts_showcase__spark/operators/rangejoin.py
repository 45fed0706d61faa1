"""Interval (range-containment) join — banded, shuffle-friendly.

The naive formulation `point.ts BETWEEN iv.start AND iv.end` is an
inequality join: Spark can only execute it as a broadcast-nested-loop or
cartesian plan — O(|P|·|I|) per key, which does not survive 100 TB.

Banded formulation: quantize time into fixed buckets; each interval explodes
to the buckets it covers, each point lands in exactly ONE bucket, and the
join becomes an EQUALITY join on (key, bucket) followed by the exact
containment filter.  Each (point, interval) pair can meet in at most one
bucket (the point's), so no dedup pass is needed.  Cost is
O(|P| + |I|·span/bucket + matches) with a plain hash shuffle — pick the
bucket width near the typical interval span so each interval explodes to
~1-3 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import ntz_epoch_us


_INTEGRAL_DTYPES = {"tinyint", "smallint", "int", "bigint"}


def _floor_div_exact(x: Column, y: int) -> Column:
    """Exact floor division of an INTEGRAL column by a positive literal.

    ``F.floor(x / y)`` computes the quotient in DOUBLE, which is exact
    only while the dividend stays under 2^53 (epoch-microseconds cross
    that around year 2112; arbitrary bigint keys can sit anywhere in
    int64).  Above it, the rounded quotient can floor to the wrong
    bucket — and a wrong bucket here silently DROPS join matches: the
    post-join containment predicate can only remove false positives,
    never recover a pair the equality join never produced.

    Exact route: ``pmod`` makes the dividend an exact multiple of ``y``
    (floor-consistent for negatives — same pmod discipline as
    operators/attribution.py), the division then runs in DECIMAL(38,0),
    where an exactly-divisible quotient is exact for the whole int64
    range.  One decimal op per row; nothing at shuffle granularity.
    """
    # subtract in DECIMAL as well: at the int64 edge (x near -2^63) the
    # bigint subtraction itself overflows under ANSI mode
    exact = x.cast("decimal(38,0)") - F.pmod(x, F.lit(y))
    return (exact / F.lit(y)).cast("bigint")


def _bucket(ts: Column, seconds: int, dtype: str) -> Column:
    """Quantize a timestamp-or-numeric column into ``seconds``-wide buckets.

    Three contracts, chosen by the RESOLVED dtype (the operator has the
    DataFrame in hand):
    - timestamp / timestamp_ntz / date → DST-safe wall-clock microseconds
      via :func:`ntz_epoch_us` (a plain ``unix_micros(cast)`` would shift
      across DST transitions in non-UTC sessions), then exact integral
      floor-division;
    - integral numeric (bigint/int/…) → the value IS epoch seconds; exact
      floor-division (see :func:`_floor_div_exact` for why not
      ``floor(ts / seconds)``).  Casting a numeric through TIMESTAMP_NTZ
      is not a legal Spark cast, and routing it through the session
      timezone would silently change the bucket boundaries;
    - double/float/decimal → ``floor(ts / seconds)``; the input itself
      carries double precision, so the double quotient is as exact as
      the data.
    """
    if dtype.startswith("timestamp") or dtype == "date":
        return _floor_div_exact(ntz_epoch_us(ts), seconds * 1_000_000)
    if dtype in _INTEGRAL_DTYPES:
        return _floor_div_exact(ts, seconds)
    return F.floor(ts / F.lit(seconds)).cast("bigint")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by: list[str],
    bucket_seconds: int = 900,
) -> DataFrame:
    """Inner join: points falling inside [start, end] per key (inclusive).

    Returns all columns of both sides (names must not collide outside
    ``by``).  Equality-join plan — no nested-loop, no cartesian.
    """
    p_dtype = dict(points.dtypes)[point_ts]
    iv_dtypes = dict(intervals.dtypes)
    p = points.withColumn(
        "_b", _bucket(F.col(point_ts), bucket_seconds, p_dtype)
    )
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket(F.col(start_col), bucket_seconds, iv_dtypes[start_col]),
                _bucket(F.col(end_col), bucket_seconds, iv_dtypes[end_col]),
            )
        ),
    )
    return (
        p.join(iv, on=by + ["_b"])
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("_b")
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    eps: Column | int | float,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Band (theta) join: pairs with ``|left_val - right_val| <= eps``,
    executed as an EQUALITY join on value buckets of width eps.

    The naive plan for a band predicate is a nested-loop/cartesian join —
    quadratic and a non-starter at scale.  Bucketing by ``floor(v / eps)``
    guarantees any in-band partner sits in the same or an adjacent bucket,
    so exploding the left side to its 3 neighbor buckets turns the theta
    join into a hash-partitioned equality join (3x left fan-out, never
    |L|x|R|), with the exact band predicate re-applied after.  Same trick
    as the interval join above, applied to a symmetric numeric band.
    ``extra_keys`` are additional equality keys (they ride the same
    shuffle).

    Precision: when BOTH value columns resolve to integral dtypes and
    ``eps`` is a literal positive int, bucketing routes through
    :func:`_floor_div_exact` — exact over the full int64 domain, same as
    ``interval_join``'s numeric contract (a double quotient near 2^60/eps
    can land more than one bucket off, and the ±1 fan-out then silently
    drops matches).  Otherwise (float data, or a runtime-Column eps where
    no dtype branch is possible) the quotient runs in double, which
    carries the data's own precision.
    """
    keys = list(extra_keys or [])
    l_dtype = dict(left.dtypes)[left_val]
    r_dtype = dict(right.dtypes)[right_val]
    if (
        isinstance(eps, int)
        and not isinstance(eps, bool)
        and eps > 0
        and l_dtype in _INTEGRAL_DTYPES
        and r_dtype in _INTEGRAL_DTYPES
    ):
        lb = _floor_div_exact(F.col(left_val), eps)
        rb = _floor_div_exact(F.col(right_val), eps)
        eps = F.lit(eps)
    else:
        if not isinstance(eps, Column):
            eps = F.lit(eps)
        lb = F.floor(F.col(left_val) / eps).cast("bigint")
        rb = F.floor(F.col(right_val) / eps).cast("bigint")
    l3 = left.select(
        "*", F.explode(F.array(lb - 1, lb, lb + 1)).alias("_band")
    )
    r1 = right.select("*", rb.alias("_band"))
    return (
        l3.join(r1, keys + ["_band"])
        .where((F.col(left_val) - F.col(right_val)).between(-eps, eps))
        .drop("_band")
    )
