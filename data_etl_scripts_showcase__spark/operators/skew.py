"""Skew-mitigation operators (SURVEY.md §4 / BASELINE north star).

At 100 TB a handful of hot keys (one merchant with millions of events, one
n-gram shared by every document) can pin a whole stage on one reducer.
Joins get skew-splitting for free from AQE (`session.py`); hot-key
AGGREGATION is handled here with two-stage salting: pre-aggregate on
(key, salt) so each hot key's rows spread over ``n_salt`` reducers, then
combine the per-salt partials.  Works for any re-aggregatable function
(sum/count/min/max); averages decompose into sum+count.

The salt is `xxhash64(uniform row attr) % n_salt` — deterministic per row,
uniform across reducers, and invisible in the result (the second stage
collapses it), so salted and unsalted plans are value-identical (oracle- and
property-tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt_on: Column | str,
    sums: dict[str, Column] | None = None,
    count_name: str | None = None,
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage (salted) aggregation.

    ``sums``: {out_name: column_expr} summed in both stages (use exact
    decimals for money — `functions.dec2` — so the two-stage regrouping is
    bit-identical to one-stage).  ``count_name``: optional row-count output.
    ``salt_on``: any row-level column with high cardinality (an id, an event
    key) — hashed to spread a hot group across ``n_salt`` reducers.
    """
    sums = sums or {}
    salt = F.pmod(F.xxhash64(salt_on), F.lit(n_salt)).alias("_salt")

    stage1_aggs = [F.sum(expr).alias(f"_s_{name}") for name, expr in sums.items()]
    if count_name:
        stage1_aggs.append(F.count("*").alias("_s__cnt"))

    partial = df.groupBy(*keys, salt).agg(*stage1_aggs)

    stage2_aggs = [F.sum(f"_s_{name}").alias(name) for name in sums]
    if count_name:
        stage2_aggs.append(F.sum("_s__cnt").cast("bigint").alias(count_name))
    return partial.groupBy(*keys).agg(*stage2_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_on: Column | str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof fact-to-dim equi-join: salt the FACT side, replicate the
    DIM side ``n_salt``×, join on (key, salt).

    AQE's skew-join split handles most skew automatically; this manual form
    is for the residual case — a dimension too big to broadcast joined to a
    fact where one key dominates an entire partition even after AQE's
    split granularity.  The salt spreads that key's rows over ``n_salt``
    reducers; replication multiplies only the DIM side (n_salt × |dim|),
    which is the cheap side by assumption.  Value-identical to the plain
    join (oracle-tested)."""
    salt = F.pmod(F.xxhash64(salt_on), F.lit(n_salt))
    f = fact.withColumn("_salt", salt.cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = f.join(d, on=[key, "_salt"], how=how)
    return out.drop("_salt")
