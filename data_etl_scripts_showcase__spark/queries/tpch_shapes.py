"""Decision-support query shapes (TPC-H Q4/Q6/Q7/Q10/Q14/Q15/Q17/Q18/Q19/Q22 adapted).

The reference never composes multi-table analytics (its one join is the
collected IN-list, SURVEY.md §2.3 J1), but an engine claiming its query
surface must handle the canonical warehouse shapes: correlated EXISTS,
scan-heavy filter-aggregates, top-k revenue joins, conditional ratio
aggregates, HAVING-subquery joins, disjunctive multi-column predicates,
multi-hop join chains, aggregate-view maxima, correlated per-key averages,
and scalar-subquery thresholds with anti-joins.
Adapted to the testdata schema (lineitem has no commitdate/receiptdate/
shipmode — predicates use shipdate/orderdate instead).

Every shape is written the way it should execute at 100 TB:
- filters sit directly on the scan (predicate pushdown to parquet);
- EXISTS / IN-subqueries are left-semi joins, never collected id lists;
- small build sides (part at one row per ~250k lineitem) broadcast;
- money math goes through exact decimals (bit-stable under AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    )
    GROUP BY o_orderpriority
    """,
    survey="J-std (TPC-H Q4 shape: correlated EXISTS → left-semi join)",
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one line shipped >30 days after order date,
    counted per priority.  The correlated EXISTS becomes a left-semi join
    with the correlation folded into the join condition — one shuffle on
    orderkey, no duplicate-orders blowup, no DISTINCT needed."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o["o_orderkey"] == li["l_orderkey"]) & (
        li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 30 DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q6_revenue_delta",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue_delta,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
    survey="A-std (TPC-H Q6 shape: pure scan-filter-aggregate, full pushdown)",
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue that would be forfeited by dropping small discounts: the
    pure scan-side query — all four predicates push to the parquet reader,
    the aggregate is a single global partial+final sum.  At 100 TB this is
    bandwidth-bound and embarrassingly parallel; any plan with a shuffle
    before the partial agg is wrong."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return f.agg(
        F.sum(dec2("l_extendedprice", 12) * F.col("l_discount").cast("decimal(4,2)"))
        .cast("double")
        .alias("revenue_delta"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q10_returned_item_revenue",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    survey="J-std,W-std (TPC-H Q10 shape: 3-way join → agg → top-k)",
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by returned-item revenue.  lineitem is filtered to
    'R' at the scan before joining (quarter of the rows), the 3-way join
    shuffles on orderkey then custkey, and the top-k is
    TakeOrderedAndProject — no global sort.  The exact-decimal revenue makes
    the ORDER BY deterministic (double sums would make rank 20/21 flap)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(_disc_price()).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", F.col("_rev").cast("double").alias("revenue"))
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT round(
             100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice AS DECIMAL(12,2))
                            * CAST(1 - l_discount AS DECIMAL(4,2)) END) AS DOUBLE)
                   / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                            * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE),
             6) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    survey="J-std,A5 (TPC-H Q14 shape: broadcast dim join + conditional ratio aggregate)",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of one month's revenue from PROMO parts.  part is the small
    dimension — broadcast explicitly so the month of lineitem never
    shuffles; the conditional numerator and total denominator come out of
    one aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    dp = _disc_price()
    joined = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    return joined.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", dp)).cast("double")
            / F.sum(dp).cast("double"),
            6,
        ).alias("promo_share_pct")
    )


@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, sum_qty
    FROM (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 140.0
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    survey="J-std (TPC-H Q18 shape: HAVING subquery joined back to facts)",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 140 units, with their customer.
    The aggregate-then-join order matters at scale: grouping lineitem FIRST
    shrinks it ~4× (one row per order) before any join, and the HAVING
    filter cuts that to the rare heavy orders — the joins then move almost
    no data.  (l_quantity is integral, so its double sum is exact.)"""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 140.0)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("c_custkey", "o_orderkey", "o_totalprice", "sum_qty")
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    survey="J-std (TPC-H Q19 shape: disjunctive mixed-table predicates over a broadcast join)",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three disjunctive brand/size/quantity bands.  The OR
    spans both tables so it can't fully push down — but its single-table
    residuals can: Catalyst derives `p_brand IN (...)` on the part scan and
    `l_quantity <= 30` on lineitem from the disjunction, and the join
    itself broadcasts part."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])

    def band(brand, size_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    return j.where(
        band("Brand#12", 15, 1, 11)
        | band("Brand#23", 25, 10, 20)
        | band("Brand#34", 35, 20, 30)
    ).agg(
        F.sum(_disc_price()).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q7_nation_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name
    """,
    survey="J-std (TPC-H Q7 shape: 5-hop join chain, fact at the center, dims broadcast)",
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-border trade volume by (supplier nation, customer nation).
    The deepest join chain in the suite: lineitem→orders→customer→nation
    and lineitem→supplier→nation.  Only the lineitem→orders hop is a
    big-big shuffle; customer/supplier/nation broadcast, so the fact table
    crosses the network exactly once."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy("supp_nation", "cust_nation").agg(
        F.sum(_disc_price()).cast("double").alias("revenue")
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(1 - l_discount AS DECIMAL(4,2))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    survey="J-std (TPC-H Q15 shape: aggregate view + global-max scalar subquery)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the quarter's maximum revenue.  The revenue view
    is computed ONCE and reused for both the max and the final filter —
    exact decimals make `= max` safe (double sums would make equality
    flap).  The max is a one-row broadcast, not a driver collect."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s["s_suppkey"])
        .orderBy("s_suppkey")
        .select(
            "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
    survey="J-std (TPC-H Q17 shape: correlated per-key average via window, no re-scan)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to sub-20%-of-average-quantity orders of one brand.
    The correlated per-part average becomes a window mean partitioned by
    partkey — one pass instead of the naive re-scan per probe row.  Order
    matters: the average must cover ALL lines of a part, so the window
    runs BEFORE the brand filter joins in; the fact table still crosses
    the network once (the window shuffle), since the filtered part join
    is a broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("l_partkey")
    li2 = li.withColumn("_avg_qty", F.avg("l_quantity").over(w))
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    j = li2.join(F.broadcast(p), li2["l_partkey"] == p["p_partkey"]).where(
        F.col("l_quantity") < 0.2 * F.col("_avg_qty")
    )
    return j.agg(
        (F.sum(dec2("l_extendedprice", 12)).cast("double") / 7.0).alias("avg_yearly"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH eligible AS (
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
        )
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM eligible e
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = e.c_custkey)
    GROUP BY c_nationkey
    """,
    survey="J-std (TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti-join)",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers who never ordered, per nation.
    The global average is a one-row broadcast (cross join), NOT EXISTS is
    a left-anti join on the order keys — no correlated re-execution
    anywhere.  (The average threshold compares raw doubles: both engines
    compute the same double from the same parquet values at this
    cardinality, and the eligible set is far from any boundary — the
    grouped sums still go through exact decimals.)"""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    eligible = c.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("_avg")
    )
    never_ordered = eligible.join(
        o, eligible["c_custkey"] == o["o_custkey"], "left_anti"
    )
    return never_ordered.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.sum(dec2("c_acctbal")).cast("double").alias("totacctbal"),
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem
    ),
    ranked AS (
        SELECT ps.partkey, ps.suppkey, s.s_acctbal, s.s_name,
               row_number() OVER (
                   PARTITION BY ps.partkey
                   ORDER BY s.s_acctbal ASC, ps.suppkey ASC
               ) AS rn
        FROM ps JOIN supplier s ON ps.suppkey = s.s_suppkey
    )
    SELECT partkey, suppkey, s_acctbal, s_name
    FROM ranked WHERE rn = 1 AND partkey < 2000
    """,
    survey="J-std (TPC-H Q2 shape: per-key argmin across a join — correlated-min subquery as window)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest supplier per part (Q2's correlated MIN subquery, adapted:
    lineitem's distinct part-supplier pairs stand in for partsupp).  The
    correlated `= (SELECT min(...))` becomes one window rank over the
    joined relation — one shuffle on partkey, no per-row re-execution,
    and the tie-break (lowest suppkey) makes the winner deterministic."""
    from pyspark.sql import Window as W

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal", "s_name"
    )
    j = li.join(F.broadcast(s), li["suppkey"] == s["s_suppkey"])
    w = W.partitionBy("partkey").orderBy(
        F.col("s_acctbal").asc(), F.col("suppkey").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("partkey") < 2000))
        .select("partkey", "suppkey", "s_acctbal", "s_name")
    )
