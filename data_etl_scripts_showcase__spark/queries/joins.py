"""Joins (SURVEY.md §2.3 J1-J3 + the standard join surface).

The reference implements exactly two join shapes, both by hand: a driver-
collected IN-list spliced into source SQL (J1 —
/root/reference/Azure_datalake_etl/Gonukkad_Merchants.py:44,61) and a
sequential per-row enrichment loop (J2 —
/root/reference/buisness_profile_etl/main.py:475-708).  Here both are
declarative joins: Catalyst picks broadcast-hash for small build sides
(dimension tables), sort-merge otherwise, and AQE re-plans at runtime —
the strategy that still works when the probe side is 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import ntz_epoch_us
from ..sources import load_table
from . import register


@register(
    "j1_broadcast_semi_join",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
    )
    """,
    survey="J1",
)
def j1_broadcast_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join replacing the collected IN-list (Gonukkad_Merchants.py:44,61).

    The id side stays distributed and is broadcast; at 100 TB the orders scan
    streams through the broadcast hash table with no shuffle of the big side.
    """
    orders = load_table(spark, sf_dir, "orders")
    ids = (
        load_table(spark, sf_dir, "customer")
        .where((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 1000.0))
        .select("c_custkey")
    )
    return orders.join(
        F.broadcast(ids), orders.o_custkey == ids.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "j2_multiway_left_enrichment",
    oracle="""
    SELECT
        o.o_orderkey,
        o.o_custkey,
        coalesce(c.c_name, 'Not_Found') AS customer_name,
        coalesce(n.n_name, 'Not_Found') AS nation_name,
        coalesce(r.r_name, 'Not_Found') AS region_name,
        o.o_totalprice
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    survey="J2,J3,C2",
)
def j2_multiway_left_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-way left-outer enrichment join (main.py:475-708 re-expressed).

    The reference attaches 7 keyed documents to each row sequentially; here
    each "virtual table" is a DataFrame and the attach is a left join.
    Dimension sides (customer/nation/region here) broadcast; the fact side
    never shuffles.  Missing enrichments keep the reference's `Not_Found`
    sentinel (main.py:501-568) via coalesce.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nf = F.lit("Not_Found")
    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left"
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select(
            "o_orderkey",
            "o_custkey",
            F.coalesce("c_name", nf).alias("customer_name"),
            F.coalesce("n_name", nf).alias("nation_name"),
            F.coalesce("r_name", nf).alias("region_name"),
            "o_totalprice",
        )
    )


@register(
    "j3_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    survey="J-std",
)
def j3_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left_anti (standard surface; SURVEY §2.3 note)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "j4_inner_fact_dim",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, s.s_name, l.l_quantity
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_acctbal > 0.0
    """,
    survey="J-std",
)
def j4_inner_fact_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⨝ broadcast dimension — the canonical star-schema probe."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 0.0)
    return li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "inner").select(
        "l_orderkey", "l_linenumber", "s_name", "l_quantity"
    )


@register(
    "j5_full_outer",
    oracle="""
    WITH open_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
         done_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
    SELECT
        coalesce(open_c.o_custkey, done_c.o_custkey) AS cust_id,
        open_c.o_custkey IS NOT NULL AS has_open,
        done_c.o_custkey IS NOT NULL AS has_done
    FROM open_c FULL OUTER JOIN done_c ON open_c.o_custkey = done_c.o_custkey
    """,
    survey="J-std",
)
def j5_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with presence indicators."""
    orders = load_table(spark, sf_dir, "orders")
    open_c = (
        orders.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    )
    done_c = (
        orders.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    )
    oc, dc = open_c.alias("oc"), done_c.alias("dc")
    return oc.join(dc, F.col("oc.o_custkey") == F.col("dc.o_custkey"), "full").select(
        F.coalesce(F.col("oc.o_custkey"), F.col("dc.o_custkey")).alias("cust_id"),
        F.col("oc.o_custkey").isNotNull().alias("has_open"),
        F.col("dc.o_custkey").isNotNull().alias("has_done"),
    )


@register(
    "j6_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name, (r.r_regionkey = n.n_regionkey) AS is_home
    FROM region r CROSS JOIN nation n
    """,
    survey="J-std",
)
def j6_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (tiny × tiny; guarded surface at scale)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select(
        "r_name",
        "n_name",
        (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home"),
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS order_ds,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
    survey="J-std,A2,W-std (TPC-H Q3 shape — join-order + top-k by revenue)",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered fact + broadcast dims, grouped
    exact-decimal revenue, global top-10.  Catalyst pushes both date filters
    into the scans; the customer segment filter shrinks the broadcast side
    before the join.  Tie-break (o_orderdate, l_orderkey) pins row identity
    for the oracle."""
    from ..functions import dec2

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    rev = dec2("l_extendedprice", 12) * (F.lit(1.0) - F.col("l_discount")).cast(
        "decimal(4,2)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_ds"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("order_ds"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_regional_revenue",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    survey="J-std,A2 (TPC-H Q5 shape — 6-way join, local-supplier predicate)",
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with the c_nationkey = s_nationkey
    'local supplier' predicate, region-filtered, per-nation exact-decimal
    revenue.  All dims broadcast; the two facts (orders, lineitem) meet in
    the single shuffled join."""
    from ..functions import dec2

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = dec2("l_extendedprice", 12) * (F.lit(1.0) - F.col("l_discount")).cast(
        "decimal(4,2)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "j7_asof_join",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts, value
        FROM events WHERE event_type = 'purchase'
        QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    )
    SELECT c.event_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           p.value AS last_purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    survey="custom op (as-of / point-in-time join — union+window, no range join)",
)
def j7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the value of the user's most recent purchase at or
    before it (null if none yet) — the point-in-time feature-backfill join.
    Union + last(ignorenulls) window: one shuffle, no candidate-pair
    explosion; verified against DuckDB's native ASOF JOIN."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    return asof_join(clicks, purchases, on="ts", by=["user_id"]).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("value").alias("last_purchase_value"),
    )


@register(
    "j8_interval_join",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(epoch_us(c.ts) - epoch_us(p.ts) AS BIGINT) AS offset_us
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND c.ts >= p.ts - INTERVAL 15 MINUTE
     AND c.ts <= p.ts + INTERVAL 15 MINUTE
    """,
    survey="custom op (interval/range join — time-bucket banding, equality-join plan)",
)
def j8_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks within ±15 min of a same-user purchase (attribution window).
    Banded into 900s buckets: intervals explode to ~3 buckets, points join
    by equality on (user, bucket), exact containment filtered after — the
    plan a naive BETWEEN join could never produce (it would go
    nested-loop).  Oracle is the naive inequality join in DuckDB."""
    from ..operators.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    windows = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        (F.col("ts") - F.expr("INTERVAL 15 MINUTES")).alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("w_end"),
    )
    return interval_join(
        clicks, windows, "ts", "w_start", "w_end", by=["user_id"]
    ).select(
        "click_id",
        "purchase_id",
        (ntz_epoch_us("ts")
         - ntz_epoch_us("p_ts")).alias("offset_us"),
    )


@register(
    "j9_asof_forward_tolerance",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts, value
        FROM events WHERE event_type = 'purchase'
        QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ),
    m AS (
        SELECT c.event_id, c.user_id, c.ts AS click_ts, p.ts AS p_ts, p.value
        FROM clicks c
        ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts <= p.ts
    )
    SELECT event_id,
           user_id,
           strftime(click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           CASE WHEN p_ts <= click_ts + INTERVAL 2 DAY
                THEN strftime(p_ts, '%Y-%m-%d %H:%M:%S') END AS next_purchase_ts,
           CASE WHEN p_ts <= click_ts + INTERVAL 2 DAY THEN value END
               AS next_purchase_value
    FROM m
    """,
    survey="custom op (forward as-of join with tolerance — union+window, no range join)",
)
def j9_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's NEXT purchase at-or-after it but no more
    than 2 days out (nulls beyond the horizon) — the did-the-click-convert
    feature.  Forward direction + tolerance completes the kdb-style as-of
    surface (j7 is backward/unbounded); same union + window fill, one
    shuffle per key, verified against DuckDB's native forward ASOF JOIN
    with the tolerance applied as a post-filter on the matched time."""
    from ..operators.asof import asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    out = asof_join_forward(
        clicks, purchases, on="ts", by=["user_id"], tolerance="2 days"
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("ts_asof", "yyyy-MM-dd HH:mm:ss").alias(
            "next_purchase_ts"
        ),
        F.col("value").alias("next_purchase_value"),
    )


@register(
    "j10_scd2_point_in_time",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type AS status, ts AS valid_from
        FROM ordered
        WHERE prev_type IS NULL OR event_type <> prev_type
        QUALIFY row_number() OVER (
            PARTITION BY user_id, ts ORDER BY event_id DESC
        ) = 1
    ),
    probes AS (SELECT event_id, user_id, ts FROM events)
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
           c.status AS pit_status,
           strftime(c.valid_from, '%Y-%m-%d %H:%M:%S') AS status_since
    FROM probes p
    ASOF LEFT JOIN changes c
      ON p.user_id = c.user_id AND p.ts >= c.valid_from
    """,
    survey="custom op (point-in-time SCD2 enrichment: as-of against validity intervals)",
)
def j10_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store PIT correctness: enrich every event with the SCD2
    status version VALID AT its own timestamp — the join that prevents
    time-travel leakage when building training features from a mutating
    dimension (x9 builds the versions; this consumes them as-of).  A
    version's validity starts inclusively at its change event, so an
    event always sees the state including its own change, never a future
    one.  Same union+window as-of machinery as j7 — one shuffle per key,
    no interval explosion."""
    from pyspark.sql import Window as W

    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    w_in = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w_in))
        .where(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_type", "event_id").alias("status"))
        # `since` duplicates valid_from as a VALUE column so the as-of
        # fill carries the matched version's start time through
        .select("user_id", "ts", "status", F.col("ts").alias("since"))
    )
    probes = ev.select("event_id", "user_id", "ts")
    out = asof_join(probes, changes, on="ts", by=["user_id"], suffix="_v")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        F.col("status").alias("pit_status"),
        F.date_format("since", "yyyy-MM-dd HH:mm:ss").alias("status_since"),
    )


@register(
    "j11_not_in_null_aware",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_without_f_orders
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    GROUP BY c_mktsegment
    """,
    survey="J-std extended (NOT IN with ANSI null semantics: null-aware anti join physical operator)",
)
def j11_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``NOT IN (subquery)`` with full ANSI three-valued-logic semantics:
    customers with no 'F'-status order, per segment.  Unlike j3's
    ``left_anti`` (which treats nulls as ordinary non-matches), NOT IN
    must return ZERO rows if the subquery ever yields a null — Spark
    plans a BroadcastHashJoin with a null-aware anti condition
    (NAAJ) to honor that without a cartesian fallback.  The engines'
    agreement here pins the subtlest join semantics in the SQL surface;
    at scale the F-order key list broadcasts exactly like j1's semi-join
    side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c.createOrReplaceTempView("_j11_customer")
    o.createOrReplaceTempView("_j11_orders")
    return spark.sql(
        """
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_without_f_orders
        FROM _j11_customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM _j11_orders WHERE o_orderstatus = 'F'
        )
        GROUP BY c_mktsegment
        """
    )


@register(
    "j12_band_join",
    oracle="""
    SELECT a.s_nationkey,
           a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
           round(abs(a.s_acctbal - b.s_acctbal), 2) AS bal_gap
    FROM supplier a
    JOIN supplier b
      ON a.s_nationkey = b.s_nationkey
     AND a.s_suppkey < b.s_suppkey
     AND abs(a.s_acctbal - b.s_acctbal) <= 200.0
    """,
    survey="J-std extended (band/theta join |a-b|<=eps as bucketed equality join — no cartesian)",
)
def j12_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join: same-nation supplier pairs whose account balances differ
    by at most 50.0 — the |a−b| ≤ ε theta predicate that naively plans as
    a nested-loop join.  `operators.rangejoin.band_join` rewrites it to an
    equality join on ε-width value buckets (left side exploded to its 3
    neighbor buckets), so the plan is a hash-partitioned join with 3×
    fan-out instead of |L|×|R| — the difference between feasible and
    impossible at 100 TB.  The exact predicate re-applies post-join;
    the oracle is the plain theta join."""
    from ..operators.rangejoin import band_join

    s = load_table(spark, sf_dir, "supplier")
    a = s.select(
        F.col("s_nationkey"),
        F.col("s_suppkey").alias("supp_a"),
        F.col("s_acctbal").alias("bal_a"),
    )
    b = s.select(
        F.col("s_nationkey"),
        F.col("s_suppkey").alias("supp_b"),
        F.col("s_acctbal").alias("bal_b"),
    )
    pairs = band_join(
        a, b, "bal_a", "bal_b", F.lit(200.0), extra_keys=["s_nationkey"]
    ).where(F.col("supp_a") < F.col("supp_b"))
    return pairs.select(
        "s_nationkey",
        "supp_a",
        "supp_b",
        F.round(F.abs(F.col("bal_a") - F.col("bal_b")), 2).alias("bal_gap"),
    )


@register(
    "j13_bitemporal_asof",
    oracle="""
    WITH vers AS (
        SELECT c_custkey, v,
               CAST(DATE '1995-01-01' + INTERVAL ((c_custkey % 300) + 180 * v) DAY AS DATE) AS valid_from,
               CAST(DATE '1995-01-01' + INTERVAL ((c_custkey % 300) + 180 * v + (c_custkey % 30)) DAY AS DATE) AS tx_from
        FROM customer, (SELECT unnest([0, 1]) AS v)
    ),
    known AS (
        SELECT * FROM vers
        WHERE tx_from <= DATE '1996-07-01' AND valid_from <= DATE '1996-06-01'
    )
    SELECT c_custkey, CAST(v AS INTEGER) AS version,
           strftime(valid_from, '%Y-%m-%d') AS valid_from,
           strftime(tx_from, '%Y-%m-%d') AS tx_from
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY c_custkey ORDER BY valid_from DESC, tx_from DESC, v DESC
        ) AS rn
        FROM known
    ) WHERE rn = 1
    """,
    survey="J-std extended (bitemporal AS OF: valid-time plus transaction-time point query — what did we believe, when)",
)
def j13_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal point query: from versioned records carrying BOTH a
    valid-time (when the fact was true in the world) and a transaction
    time (when the warehouse learned it), answer 'as the system stood on
    T, what did we believe was true at V' — the audit/backtest semantics
    SCD2 (x9) and valid-time point-in-time joins (j10) can't express
    alone, because a late-arriving correction must be invisible to
    queries pinned before its tx time.  Plan: filter both time axes
    (pushable predicates), then the same deterministic argmax-per-key
    window as A7 — no new physical machinery, which is the point:
    bitemporality is a modeling discipline over ordinary columns."""
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer")
    vers = c.select(
        "c_custkey", F.explode(F.array(F.lit(0), F.lit(1))).alias("v")
    ).select(
        "c_custkey",
        "v",
        F.date_add(
            F.lit("1995-01-01").cast("date"),
            ((F.col("c_custkey") % 300) + 180 * F.col("v")).cast("int"),
        ).alias("valid_from"),
        F.date_add(
            F.lit("1995-01-01").cast("date"),
            (
                (F.col("c_custkey") % 300)
                + 180 * F.col("v")
                + (F.col("c_custkey") % 30)
            ).cast("int"),
        ).alias("tx_from"),
    )
    known = vers.where(
        (F.col("tx_from") <= F.lit("1996-07-01").cast("date"))
        & (F.col("valid_from") <= F.lit("1996-06-01").cast("date"))
    )
    w = W.partitionBy("c_custkey").orderBy(
        F.col("valid_from").desc(), F.col("tx_from").desc(), F.col("v").desc()
    )
    return (
        known.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("v").cast("int").alias("version"),
            F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
            F.date_format("tx_from", "yyyy-MM-dd").alias("tx_from"),
        )
    )


@register(
    "j14_nearest_asof_join",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts, value
        FROM events WHERE event_type = 'purchase'
        QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ),
    pairs AS (
        SELECT c.event_id, c.user_id, c.ts AS cts, p.ts AS pts, p.value,
               row_number() OVER (
                   PARTITION BY c.event_id
                   ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)) ASC, p.ts ASC
               ) AS rn
        FROM clicks c JOIN purchases p USING (user_id)
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           b.value AS nearest_purchase_value,
           CAST(epoch_us(b.pts) - epoch_us(c.ts) AS BIGINT) AS signed_dt_us
    FROM clicks c
    LEFT JOIN (SELECT * FROM pairs WHERE rn = 1) b ON b.event_id = c.event_id
    """,
    survey="custom op extended (NEAREST as-of join — either direction, backward-preferring tie-break; completes the backward/forward/nearest family)",
)
def j14_nearest_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third as-of semantics: for every click, the purchase NEAREST
    in time in EITHER direction (j7 looks only backward, j9 only
    forward), ties preferring the earlier/backward match.  Composed from
    the two linear as-of operators — one backward pass + one forward
    pass + a per-row CASE on the absolute deltas — so the plan is two
    union+window joins (each ONE shuffle on the key), never the
    quadratic candidate join the oracle uses for its tiny ground truth.
    The matched timestamps travel as value columns so the distance
    arithmetic is exact integer microseconds."""
    from ..operators.asof import asof_join, asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
        .withColumn("p_ts", F.col("ts"))
    )
    back = asof_join(clicks, purchases, on="ts", by=["user_id"]).select(
        "event_id",
        F.col("value").alias("b_value"),
        ntz_epoch_us("p_ts").alias("b_us"),
    )
    fwd = asof_join_forward(clicks, purchases, on="ts", by=["user_id"]).select(
        "event_id",
        F.col("value").alias("f_value"),
        ntz_epoch_us("p_ts").alias("f_us"),
    )
    c = clicks.withColumn("c_us", ntz_epoch_us("ts"))
    j = c.join(back, "event_id", "left").join(fwd, "event_id", "left")
    b_d = F.abs(F.col("c_us") - F.col("b_us"))
    f_d = F.abs(F.col("f_us") - F.col("c_us"))
    pick_b = F.col("b_us").isNotNull() & (
        F.col("f_us").isNull() | (b_d <= f_d)
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.when(pick_b, F.col("b_value"))
        .otherwise(F.col("f_value"))
        .alias("nearest_purchase_value"),
        F.when(pick_b, F.col("b_us") - F.col("c_us"))
        .otherwise(F.col("f_us") - F.col("c_us"))
        .cast("bigint")
        .alias("signed_dt_us"),
    )


@register(
    "j15_interval_join_numeric",
    oracle="""
    WITH c AS (
        SELECT event_id AS click_id, user_id,
               epoch_us(ts) // 1000000 AS ts_s
        FROM events WHERE event_type = 'click'
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id,
               epoch_us(ts) // 1000000 AS p_s
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.click_id, p.purchase_id,
           CAST(c.ts_s - p.p_s AS BIGINT) AS offset_s
    FROM c JOIN p
      ON c.user_id = p.user_id
     AND c.ts_s BETWEEN p.p_s - 900 AND p.p_s + 900
    """,
    survey="custom op (interval join, NUMERIC timestamp contract)",
)
def j15_interval_join_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j8's attribution window driven through ``interval_join``'s NUMERIC
    contract: the timestamps are pre-converted to BIGINT epoch seconds and
    the operator buckets them with plain integer division (no timestamp
    cast anywhere in the bucketing path).

    Exists because the round-4 regression — ``_bucket`` unconditionally
    casting through TIMESTAMP_NTZ, which is an illegal cast from BIGINT —
    was invisible to the oracle sweep: every registered query fed real
    timestamps.  This row sweep-guards the operator's second dtype contract
    (unit tests pin it too, but the driver gate only sees registry rows).
    Same banding plan as j8: equality join on (user, bucket), exact
    containment refilter, no nested-loop.
    """
    from ..operators.rangejoin import _floor_div_exact, interval_join

    ev = load_table(spark, sf_dir, "events")
    # epoch seconds via the same exact integral route the operator uses
    # internally — floor(us/1e6) computes the quotient in double, the
    # exact pattern _floor_div_exact exists to eliminate (ADVICE r5)
    secs = _floor_div_exact(ntz_epoch_us("ts"), 1_000_000)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", secs.alias("ts_s")
    )
    windows = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        secs.alias("p_s"),
        (secs - 900).alias("w_lo"),
        (secs + 900).alias("w_hi"),
    )
    return interval_join(
        clicks, windows, "ts_s", "w_lo", "w_hi", by=["user_id"],
        bucket_seconds=600,
    ).select(
        "click_id",
        "purchase_id",
        (F.col("ts_s") - F.col("p_s")).cast("bigint").alias("offset_s"),
    )
