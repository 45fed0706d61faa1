"""Scans, projections, filters, set ops (SURVEY.md §2.1 S1-S4, §2.2 P1-P7, §2.6 U1-U2).

The reference implements each of these as a driver-side Python loop over
``list[dict]`` rows; here every one is a declarative plan whose filter and
projection reach the parquet scan (Catalyst ``PushDownPredicates`` /
``ColumnPruning``), so at 100 TB the scan only reads the referenced columns
and row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import register

# ---------------------------------------------------------------------------
# Flagship (SURVEY §7 Phase 1): the reference's filtered-snapshot pipeline
# (/root/reference/Azure_datalake_etl/Gonukkad_Merchants.py:28-68) collects a
# BigQuery id column to the driver, joins it into a SQL string, and makes
# MSSQL evaluate `WHERE PK_GMBId IN (…)`.  Spark-first shape: the id list
# stays distributed, the digits/trim cleanse (P2) is a column expression, and
# the IN-list becomes a broadcast left-semi join (J1) — no collect, no O(ids)
# SQL string, no injection surface.
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = """
WITH ids AS (
    SELECT CAST(trim(regexp_extract(c_name, '#([0-9]+)$', 1)) AS BIGINT) AS cust_id
    FROM customer
    WHERE regexp_extract(c_name, '#([0-9]+)$', 1) ~ '^[0-9]+$'
      AND c_acctbal > 0.0
)
SELECT
    o_orderkey,
    o_custkey,
    o_orderstatus,
    CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS is_open,
    o_totalprice,
    strftime(o_orderdate, '%Y-%m-%d') AS order_ds
FROM orders
WHERE o_custkey IN (SELECT cust_id FROM ids)
"""


@register(
    "flagship_active_customer_snapshot",
    oracle=FLAGSHIP_ORACLE,
    survey="S2,S3,P1,P2,J1,F2,F7,F12",
)
def flagship_active_customer_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-customer order snapshot: cleansed id list ⋉ orders, cast, stamp.

    Mirrors Gonukkad_Merchants.py end-to-end: id cleanse (not-null ∧ digits
    ∧ trim — main.py:68-70 analog), semi-join into the fact table, bool→int
    cast (convert_boolean — Gonukkad_Merchants.py:71-72), date-stamp column
    (strftime — Gonukkad_Merchants.py:81-82).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    id_str = F.regexp_extract(F.col("c_name"), r"#([0-9]+)$", 1)
    ids = (
        customer.withColumn("id_str", id_str)
        .where(
            F.col("id_str").isNotNull()
            & F.col("id_str").rlike("^[0-9]+$")
            & (F.col("c_acctbal") > 0.0)
        )
        .select(F.trim(F.col("id_str")).cast("bigint").alias("cust_id"))
    )
    # Broadcast the (small) id dimension — the 100 TB-scale replacement for
    # the reference's driver-collected IN-list.
    return (
        orders.join(
            F.broadcast(ids), orders.o_custkey == ids.cust_id, "left_semi"
        ).select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            (F.col("o_orderstatus") == "O").cast("int").alias("is_open"),
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_ds"),
        )
    )


# ---------------------------------------------------------------------------
# Projections / filters
# ---------------------------------------------------------------------------


@register(
    "p1_projection",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
    survey="P1,S2",
)
def p1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection (main.py:93,106 keeps a 4-column token subset)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "p2_digit_filter_trim",
    oracle="""
    SELECT trim(regexp_extract(c_name, '#([0-9]+)$', 1)) AS merchant_id
    FROM customer
    WHERE regexp_extract(c_name, '#([0-9]+)$', 1) ~ '^[0-9]+$'
      AND c_custkey % 3 <> 0
    """,
    survey="P2,F1,F2",
)
def p2_digit_filter_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Not-null ∧ all-digits filter + trim (main.py:68-70)."""
    df = load_table(spark, sf_dir, "customer")
    id_str = F.regexp_extract(F.col("c_name"), r"#([0-9]+)$", 1)
    return (
        df.withColumn("merchant_id", id_str)
        .where(
            F.col("merchant_id").isNotNull()
            & F.col("merchant_id").rlike("^[0-9]+$")
            & (F.col("c_custkey") % 3 != 0)
        )
        .select(F.trim("merchant_id").alias("merchant_id"))
    )


@register(
    "p3_multi_notnull_filter",
    oracle="""
    SELECT c_custkey,
           nullif(c_mktsegment, 'FURNITURE') AS segment,
           nullif(c_nationkey, 0) AS nation
    FROM customer
    WHERE nullif(c_mktsegment, 'FURNITURE') IS NOT NULL
      AND nullif(c_nationkey, 0) IS NOT NULL
    """,
    survey="P3",
)
def p3_multi_notnull_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip rows where either of two columns is null (main.py:112)."""
    df = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("FURNITURE"))
    nat = F.nullif(F.col("c_nationkey"), F.lit(0))
    return (
        df.select(
            "c_custkey", seg.alias("segment"), nat.alias("nation")
        ).where(F.col("segment").isNotNull() & F.col("nation").isNotNull())
    )


@register(
    "p4_string_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE NOT p_type LIKE '%PROMO%'
      AND p_name LIKE '%a%'
      AND p_name LIKE '%gear'
    """,
    survey="P4,F6",
)
def p4_string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """contains / endswith / negated-contains predicates (Gonukkad_Merchants.py:150-152)."""
    df = load_table(spark, sf_dir, "part")
    return df.where(
        (~F.col("p_type").contains("PROMO"))
        & F.col("p_name").contains("a")
        & F.col("p_name").endswith("gear")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "p5_column_nullout",
    oracle="""
    SELECT s_suppkey, s_name, CAST(NULL AS VARCHAR) AS geolocation, s_acctbal
    FROM supplier
    """,
    survey="P5",
)
def p5_column_nullout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Force a column to NULL before export (Gonukkad_Merchants.py:122)."""
    return load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.lit(None).cast("string").alias("geolocation"),
        "s_acctbal",
    )


@register(
    "p6_equality_filter",
    oracle="SELECT o_orderkey, o_custkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'",
    survey="P6",
)
def p6_equality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter on a field (topicType == 'OFFER' — main.py:659)."""
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
    )


@register(
    "p7_single_key_filter",
    oracle="SELECT * FROM orders WHERE o_custkey = 42",
    survey="P7",
)
def p7_single_key_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-key debug filter (main.py:476-477)."""
    return load_table(spark, sf_dir, "orders").where(F.col("o_custkey") == 42)


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "u1_union_pages",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    survey="U1",
)
def u1_union_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of paginated result pages (main.py:418-428 `all_data.extend`)."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderpriority"]
    page1 = orders.where(F.col("o_orderpriority") == "1-URGENT").select(*cols)
    page2 = orders.where(F.col("o_orderpriority") == "2-HIGH").select(*cols)
    return page1.unionByName(page2)


@register(
    "u2_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    survey="U-std",
)
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (standard surface; absent in reference — SURVEY §2.6)."""
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    done_c = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersect(done_c)


@register(
    "u3_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    survey="U-std",
)
def u3_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (standard surface)."""
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    done_c = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.exceptAll(done_c)


@register(
    "u4_union_by_name_missing",
    oracle="""
    WITH a AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    b AS (
        SELECT o_orderkey, o_orderpriority
        FROM orders WHERE o_orderkey % 3 = 1
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority FROM a
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), o_orderpriority FROM b
    """,
    survey="U-std extended (schema-reconciling union: unionByName with missing-column null fill)",
)
def u4_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of two frames with DIFFERENT column sets via
    ``unionByName(allowMissingColumns=True)`` — each side's missing
    columns null-fill, positions don't matter.  The schema-evolution
    counterpart at the plan level (io6 is the storage level): feeds from
    heterogeneous pipeline generations combine without manual column
    surgery."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = o.where(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_orderpriority"
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "u5_symmetric_difference",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
    b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
    only_a AS (SELECT k FROM a EXCEPT SELECT k FROM b),
    only_b AS (SELECT k FROM b EXCEPT SELECT k FROM a)
    SELECT k, 'open_only' AS side FROM only_a
    UNION ALL
    SELECT k, 'finished_only' AS side FROM only_b
    """,
    survey="U-std extended (symmetric difference: keys on exactly one side, labeled)",
)
def u5_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set symmetric difference with provenance: customers appearing in
    exactly one of {open orders, finished orders}, labeled by side —
    (A∖B) ∪ (B∖A) as two EXCEPTs over distinct key sets (each compiles
    to a hash anti join; at 100 TB both run on the deduplicated key
    relations, never the fact rows)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    b = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    return (
        a.exceptAll(b).withColumn("side", F.lit("open_only"))
        .unionByName(b.exceptAll(a).withColumn("side", F.lit("finished_only")))
    )
