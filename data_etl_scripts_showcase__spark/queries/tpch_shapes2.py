"""Decision-support query shapes, part 2 (TPC-H Q8/Q9/Q11/Q12/Q13/Q16/Q20/Q21
adapted).

Completes the canonical warehouse-shape sweep started in
:mod:`tpch_shapes`.  The reference (SURVEY.md §2.3) never runs multi-table
analytics, but these are the shapes any engine claiming its query surface
must execute well: market-share ratio aggregates over deep join chains,
profit rollups by derived year, group-by-HAVING against a global scalar,
conditional two-way counts, left-join count distributions, distinct-count
grouping with NOT-IN exclusion, semi-joins against aggregate subqueries,
and the waiting-supplier double-correlation.

Testdata schema deltas vs canonical TPC-H (TESTDATA.md): no partsupp →
distinct (l_partkey, l_suppkey) pairs stand in; no
commitdate/receiptdate/shipmode → lateness is l_shipdate vs o_orderdate;
no p_mfgr/s_comment → brand/acctbal predicates stand in.

Scale notes (100 TB framing):
- every fact-side filter sits on the scan (parquet pushdown);
- dimension sides (part, supplier, nation, region — KBs to GBs) broadcast,
  so lineitem crosses the network at most once per shape;
- correlated subqueries become windows or broadcast one-row scalars,
  never per-row re-execution;
- money math goes through exact decimals so sums are bit-stable under AQE
  task re-ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import dec2
from ..sources import load_table
from . import register


def _disc_price():
    """l_extendedprice * (1 - l_discount) as an exact decimal."""
    return dec2("l_extendedprice", 12) * (
        (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
    )


@register(
    "q8_nation_market_share",
    oracle="""
    WITH sales AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
               CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - l.l_discount AS DECIMAL(4,2)) AS dp,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
        JOIN region r    ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           round(CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_3'
                                        THEN dp END), 0) AS DOUBLE)
                 / CAST(sum(dp) AS DOUBLE), 6) AS mkt_share
    FROM sales
    GROUP BY o_year
    """,
    survey="J-std (TPC-H Q8 shape: market-share ratio over a 6-way join chain)",
)
def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3 suppliers' share of revenue sold into ASIA customers, per
    order year.  Six joins, but only lineitem→orders is big-big; customer,
    supplier and both nation legs broadcast, and the region predicate
    prunes the customer leg before it ships.  Numerator and denominator
    come out of ONE aggregate pass (conditional sum), not two scans."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cn = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        F.col("n_nationkey").alias("cn_key")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    dp = _disc_price()
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"), "left_semi")
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
    )
    num_t = "decimal(26,4)"
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", dp)),
                F.lit(0).cast(num_t),
            ).alias("_num"),
            F.sum(dp).alias("_den"),
        )
        .select(
            "o_year",
            F.round(
                F.col("_num").cast("double") / F.col("_den").cast("double"), 6
            ).alias("mkt_share"),
        )
    )


@register(
    "q9_product_profit_by_nation",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY sn.n_name, o_year
    """,
    survey="J-std (TPC-H Q9 shape: profit rollup by nation and derived year; no partsupp → profit = discounted price)",
)
def q9_product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Widget-line profit per (supplier nation, order year).  The part
    filter is applied BEFORE the join and broadcast, so only widget lines
    survive into the orders shuffle; supplier/nation broadcast.  GROUP BY
    on a derived column (year) — computed pre-shuffle, map-side partials
    apply."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"], "left_semi")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
    )
    return (
        j.groupBy("supp_nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("profit"))
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH part_value AS (
        SELECT l.l_partkey,
               sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                   * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS value_dec
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE n.n_regionkey = 3
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM part_value
    WHERE CAST(value_dec AS DOUBLE) >
          1.5 * (SELECT CAST(sum(value_dec) AS DOUBLE) / count(*) FROM part_value)
    """,
    survey="J-std,A-std (TPC-H Q11 shape: group-by HAVING against a global scalar subquery; no partsupp → lineitem value per part)",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose region-3-supplied value exceeds 1.5x the average part
    value (scale-invariant form of Q11's fraction threshold).  The
    per-part aggregate is computed ONCE and reused for both the global
    scalar (one-row broadcast via cross join) and the final filter — the
    classic Q11 trap is re-scanning the fact table for the denominator.
    Exact decimal sums make the threshold comparison engine-stable."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 3)
    eligible_s = s.join(
        F.broadcast(n), s["s_nationkey"] == n["n_nationkey"], "left_semi"
    )
    part_value = (
        li.join(F.broadcast(eligible_s), li["l_suppkey"] == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price()).alias("value_dec"))
    )
    total = part_value.agg(
        (F.sum("value_dec").cast("double") / F.count("*")).alias("_avg")
    )
    return (
        part_value.crossJoin(F.broadcast(total))
        .where(F.col("value_dec").cast("double") > 1.5 * F.col("_avg"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


@register(
    "q12_late_lines_by_status",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_linestatus
    """,
    survey="J-std,A5 (TPC-H Q12 shape: two-way conditional counts over a late-shipment join; no receipt/commit dates → shipdate vs orderdate)",
)
def q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Very-late lines (>90 days after order) split into high- vs
    low-priority counts per linestatus.  The cross-table lateness predicate
    can't push to either scan, but both column prunings do; the two
    conditional counts come out of one aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 90 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    """,
    survey="J-std,A-std (TPC-H Q13 shape: left join with join-time residual predicate → count distribution)",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-customer order counts, excluding 5-LOW orders
    INSIDE the join condition (not a post-filter — customers with only
    5-LOW orders must still appear with count 0).  Two aggregations: the
    first shuffles on custkey (same key as the join → AQE coalesces), the
    second on the tiny count domain."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    cond = (c["c_custkey"] == o["o_custkey"]) & (o["o_orderpriority"] != "5-LOW")
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON ps.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND ps.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000.0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    survey="J-std,A-std (TPC-H Q16 shape: distinct-count grouping with NOT-IN exclusion as anti-join; no partsupp → distinct lineitem pairs)",
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier counts per (brand, type, size) over selected
    sizes, excluding low-balance suppliers.  NOT IN becomes a broadcast
    left-anti join (the excluded set is small and provably null-free —
    blind NOT-IN translation risks the three-valued-logic trap); the
    distinct-pair reduction happens BEFORE the part join."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = (
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_s = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 2000.0)
        .select("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(bad_s), pairs["l_suppkey"] == bad_s["s_suppkey"], "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_promotable_suppliers",
    oracle="""
    WITH pair_qty AS (
        SELECT l.l_partkey, l.l_suppkey, sum(l.l_quantity) AS qty
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE 'small%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_partkey, l.l_suppkey
    ),
    heavy AS (
        SELECT l_suppkey FROM (
            SELECT l_suppkey, qty,
                   avg(qty) OVER (PARTITION BY l_partkey) AS part_avg
            FROM pair_qty
        ) WHERE qty > 0.5 * part_avg
    )
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
    """,
    survey="J-std (TPC-H Q20 shape: semi-join against an aggregate subquery; no partsupp availqty → above-half-average shipped quantity)",
)
def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped an above-half-average share of some 'small'
    part in 1996.  The aggregate subquery reduces lineitem to (part,
    supplier) totals FIRST; the relative threshold is a window over that
    already-tiny relation; the final IN is a left-semi join onto supplier.
    At 100 TB only the first groupBy touches fact-scale data — and its
    input is pre-filtered by a broadcast part semi-join plus a pushed
    shipdate range."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    pair_qty = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"], "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = W.partitionBy("l_partkey")
    heavy = (
        pair_qty.withColumn("part_avg", F.avg("qty").over(w))
        .where(F.col("qty") > 0.5 * F.col("part_avg"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(F.broadcast(heavy), s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH per_supp AS (
        SELECT l.l_orderkey, l.l_suppkey, max(l.l_shipdate) AS s_max
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY l.l_orderkey, l.l_suppkey
    ),
    flagged AS (
        SELECT l_orderkey, l_suppkey, s_max,
               max(s_max) OVER (PARTITION BY l_orderkey) AS o_max,
               count(*)   OVER (PARTITION BY l_orderkey) AS n_supp
        FROM per_supp
    ),
    winners AS (
        SELECT l_orderkey, l_suppkey,
               count(*) OVER (PARTITION BY l_orderkey) AS n_at_max
        FROM flagged
        WHERE n_supp > 1 AND s_max = o_max
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM winners w
    JOIN supplier s ON w.l_suppkey = s.s_suppkey
    WHERE w.n_at_max = 1
    GROUP BY s.s_name
    """,
    survey="J-std,W-std (TPC-H Q21 shape: EXISTS + NOT-EXISTS double correlation as two windows; no receiptdate → last-to-ship supplier)",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the SOLE last-to-ship supplier on multi-supplier
    finished orders — Q21's EXISTS (another supplier on the order) and
    NOT EXISTS (another supplier shipped later) become two window passes
    over the per-(order, supplier) max-shipdate relation: no correlated
    re-execution, and both windows share one shuffle on orderkey."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    per_supp = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("s_max"))
    )
    w_ord = W.partitionBy("l_orderkey")
    flagged = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "s_max",
        F.max("s_max").over(w_ord).alias("o_max"),
        F.count("*").over(w_ord).alias("n_supp"),
    )
    winners = (
        flagged.where((F.col("n_supp") > 1) & (F.col("s_max") == F.col("o_max")))
        .withColumn("n_at_max", F.count("*").over(w_ord))
        .where(F.col("n_at_max") == 1)
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        winners.join(F.broadcast(s), winners["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
