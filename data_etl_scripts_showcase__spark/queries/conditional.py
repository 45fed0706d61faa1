"""Conditional / CASE logic (SURVEY.md §2.9 C1-C2).

C1 is the reference's profile_status derivation — a 7-branch first-match-wins
if/elif cascade over the VoM document
(/root/reference/buisness_profile_etl/main.py:675-698).  C2 is its sentinel
policy: output fields default to the string 'Not_Found' and are overwritten
only when the source field exists (main.py:501-568).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import NOT_FOUND
from ..sources import load_table
from . import register


@register(
    "c1_status_cascade",
    oracle="""
    SELECT o_orderkey,
           CASE
               WHEN o_orderstatus = 'F' AND o_orderpriority = '1-URGENT' THEN 'suspended'
               WHEN o_totalprice < 50000.0 THEN 'location_disabled'
               WHEN o_orderstatus = 'P' THEN 'processing'
               WHEN o_orderstatus = 'O' AND o_totalprice >= 150000.0 THEN 'verified'
               WHEN o_orderpriority = '5-LOW' THEN 'duplicate'
               WHEN o_orderstatus = 'O' THEN 'verification_required'
               ELSE 'unexpected_status'
           END AS profile_status
    FROM orders
    """,
    survey="C1",
)
def c1_status_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match-wins CASE cascade (profile_status — main.py:675-698).

    Same 7-branch shape: suspended → location_disabled → processing →
    verified → duplicate → verification_required → unexpected_status.
    Chained when() preserves the reference's evaluation order exactly.
    """
    o = load_table(spark, sf_dir, "orders")
    status = (
        F.when(
            (F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "1-URGENT"),
            "suspended",
        )
        .when(F.col("o_totalprice") < 50000.0, "location_disabled")
        .when(F.col("o_orderstatus") == "P", "processing")
        .when(
            (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") >= 150000.0),
            "verified",
        )
        .when(F.col("o_orderpriority") == "5-LOW", "duplicate")
        .when(F.col("o_orderstatus") == "O", "verification_required")
        .otherwise("unexpected_status")
    )
    return o.select("o_orderkey", status.alias("profile_status"))


@register(
    "c2_sentinel_defaulting",
    oracle="""
    SELECT c.c_custkey,
           coalesce(CAST(o.n_orders AS BIGINT), 0) AS n_orders,
           coalesce(o.last_status, 'Not_Found') AS last_status,
           CASE WHEN o.n_orders IS NULL THEN 'Not_Found'
                ELSE CAST(o.n_orders AS VARCHAR) END AS n_orders_text
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
               arg_max(o_orderstatus, o_orderkey) AS last_status
        FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
    survey="C2,F10",
)
def c2_sentinel_defaulting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Not_Found' sentinel policy on missing enrichments (main.py:501-568).

    Engine policy (SURVEY §7 risk register): internally missing data is NULL;
    the sentinel string is applied only at the presentation edge, via
    coalesce — exactly what this query's final projection does.
    """
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.max_by("o_orderstatus", "o_orderkey").alias("last_status"),
        )
    )
    joined = c.join(o, c.c_custkey == o.o_custkey, "left")
    return joined.select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("last_status", F.lit(NOT_FOUND)).alias("last_status"),
        F.when(F.col("n_orders").isNull(), NOT_FOUND)
        .otherwise(F.col("n_orders").cast("string"))
        .alias("n_orders_text"),
    )
