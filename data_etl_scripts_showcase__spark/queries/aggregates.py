"""Aggregations (SURVEY.md §2.4 A1-A10 + standard agg surface).

The reference computes every aggregate in a sequential Python loop over one
merchant's rows (e.g. the metric-sum loop at
/root/reference/buisness_profile_etl/main.py:588-607).  Here each is a
hash aggregate with map-side partial aggregation — the shape that scales:
one shuffle on the group key, partials combined per partition first.

Money sums use the exact-decimal pattern from ``..functions`` so results are
bit-identical regardless of partitioning (and match the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import davg2, dec2, dsum2, lossy_int
from ..sources import load_table
from . import register


@register(
    "a1_count_by_group",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
    survey="A1",
)
def a1_count_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count per group (len(input_mid) — main.py:72)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "a2_grouped_sum_shredded_json",
    oracle="""
    SELECT event_type,
           CAST(sum(TRY_CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS INTEGER)) AS BIGINT) AS k_sum
    FROM events
    GROUP BY event_type
    """,
    survey="A2,F8,F16",
)
def a2_grouped_sum_shredded_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sum over a shredded JSON field, unparseables skipped.

    Mirrors the per-metric value sum (main.py:588-607): `int(value)` with
    ValueError swallowed → try_cast to int (nulls don't contribute to sum).
    JSON access via get_json_object (F16).
    """
    ev = load_table(spark, sf_dir, "events")
    k = lossy_int(F.get_json_object("props", "$.k"))
    return ev.groupBy("event_type").agg(F.sum(k).cast("bigint").alias("k_sum"))


PIVOT_STATUSES = ["O", "F", "P"]


@register(
    "a3_pivot_status_qty",
    oracle="""
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O,
           sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F,
           sum(CASE WHEN l_linestatus = 'P' THEN l_quantity END) AS P
    FROM lineitem GROUP BY l_returnflag
    """,
    survey="A3,M5",
)
def a3_pivot_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: metric rows → columns (metric_sum dict → 8 columns, main.py:608-615).

    Explicit pivot values — at scale an unvalued pivot needs an extra pass to
    discover distinct keys; declaring them keeps it one shuffle.
    (l_quantity is integral so its double sum is exact.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", PIVOT_STATUSES)
        .sum("l_quantity")
    )


@register(
    "a4_pivot_derived_totals",
    oracle="""
    WITH p AS (
        SELECT l_returnflag,
               coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0.0) AS open_qty,
               coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0.0) AS done_qty,
               coalesce(sum(CASE WHEN l_linestatus = 'P' THEN l_quantity END), 0.0) AS part_qty
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, open_qty, done_qty, part_qty,
           open_qty + done_qty + part_qty AS total_qty
    FROM p
    """,
    survey="A3,A4,F10",
)
def a4_pivot_derived_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived sums across pivoted columns with 0-defaults.

    `total_actions = calls + website + directions` over `.get(k, 0)` defaults
    (main.py:608-615) → coalesce(col, 0) + row-wise adds.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", PIVOT_STATUSES)
        .sum("l_quantity")
    )
    z = F.lit(0.0)
    open_q = F.coalesce(F.col("O"), z).alias("open_qty")
    done_q = F.coalesce(F.col("F"), z).alias("done_qty")
    part_q = F.coalesce(F.col("P"), z).alias("part_qty")
    return p.select("l_returnflag", open_q, done_q, part_q).withColumn(
        "total_qty", F.col("open_qty") + F.col("done_qty") + F.col("part_qty")
    )


@register(
    "a5_conditional_count",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS urgent_ct,
           CAST(count(CASE WHEN o_totalprice > 200000.0 THEN 1 END) AS BIGINT) AS big_ct,
           CAST(count(*) AS BIGINT) AS total_ct
    FROM orders GROUP BY o_orderstatus
    """,
    survey="A5",
)
def a5_conditional_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counts (additional_categories_count / offer_count — main.py:548-555,656-664)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("urgent_ct"),
        F.count(F.when(F.col("o_totalprice") > 200000.0, 1)).alias("big_ct"),
        F.count("*").alias("total_ct"),
    )


@register(
    "a6_existence_flag",
    oracle="""
    SELECT o_custkey,
           CASE WHEN bool_or(o_orderpriority = '1-URGENT') THEN 'Yes' ELSE 'No' END AS has_urgent,
           CASE WHEN bool_or(o_orderstatus = 'O') THEN 'Yes' ELSE 'No' END AS has_open
    FROM orders GROUP BY o_custkey
    """,
    survey="A6,M4",
)
def a6_existence_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Yes'/'No' any-match flags (has_cover/has_menu — main.py:635-645)."""
    o = load_table(spark, sf_dir, "orders")

    def flag(cond):
        return F.when(F.bool_or(cond), "Yes").otherwise("No")

    return o.groupBy("o_custkey").agg(
        flag(F.col("o_orderpriority") == "1-URGENT").alias("has_urgent"),
        flag(F.col("o_orderstatus") == "O").alias("has_open"),
    )


@register(
    "a7_argmax_latest_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey
    FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey ASC
               ) AS rn
        FROM orders
    )
    WHERE rn = 1
    """,
    survey="A7",
)
def a7_argmax_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max by timestamp with the reference's tie-break.

    latest_offer keeps the FIRST-seen post on equal createTime (strict `>` at
    main.py:661).  Spark max_by is nondeterministic on ties, so the ordering
    key is struct(ts, -key): latest timestamp, then lowest key wins —
    deterministic on any cluster.  (Oracle mirrors with DuckDB
    arg_max(key, (date, -key)) — lexicographic struct max, low key on ties.)
    """
    o = load_table(spark, sf_dir, "orders")
    ordkey = F.struct(F.col("o_orderdate"), (-F.col("o_orderkey")).alias("neg"))
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordkey).alias("latest_orderkey")
    )


@register(
    "a8_round_avg",
    oracle="""
    SELECT o_orderstatus,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice), 1) AS avg_price,
           CAST(count(*) AS BIGINT) AS order_count
    FROM orders GROUP BY o_orderstatus
    """,
    survey="A8,F9",
)
def a8_round_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round(avg(x), 1) + count (overall_rating/totalReviewCount — main.py:618-627)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(davg2("o_totalprice"), 1).alias("avg_price"),
        F.count("*").alias("order_count"),
    )


@register(
    "a9_reconciliation_gate",
    oracle="""
    WITH i AS (SELECT count(*) AS input_rows FROM orders),
         o AS (SELECT count(*) AS output_rows FROM orders WHERE o_totalprice >= 0.0)
    SELECT CAST(i.input_rows AS BIGINT) AS input_rows,
           CAST(o.output_rows AS BIGINT) AS output_rows,
           i.input_rows = o.output_rows AS gate_ok
    FROM i, o
    """,
    survey="A9",
)
def a9_reconciliation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-count reconciliation gate before publish (main.py:717-741)."""
    o = load_table(spark, sf_dir, "orders")
    inp = o.agg(F.count("*").alias("input_rows"))
    out = o.where(F.col("o_totalprice") >= 0.0).agg(
        F.count("*").alias("output_rows")
    )
    return inp.crossJoin(out).select(
        "input_rows",
        "output_rows",
        (F.col("input_rows") == F.col("output_rows")).alias("gate_ok"),
    )


@register(
    "a10_daily_count",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS run_date, CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
    FROM events GROUP BY strftime(ts, '%Y-%m-%d')
    """,
    survey="A10,S13,F11,F12",
)
def a10_daily_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day active count (daily_active_mid_counts upsert — main.py:20-50)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("run_date"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "a11_distinct_counts",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
    survey="A-std",
)
def a11_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countDistinct (standard surface — SURVEY §2.4 note)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
    )


@register(
    "a12_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    survey="A-std",
)
def a12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (standard surface)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum2("l_extendedprice").alias("sum_price")
    )


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        sum(l_quantity) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
        CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="A1,A2,A8 (TPC-H Q1 shape — bench headline)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): 2-key groupBy, 8 aggregates.

    The bench headline aggregate: one shuffle, map-side partials, all
    expressions inside whole-stage codegen.  Exact-decimal sums keep the
    result bit-stable under AQE re-partitioning.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    ep = dec2("l_extendedprice", 12)
    disc_mult = (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
    tax_mult = (F.lit(1) + F.col("l_tax")).cast("decimal(4,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(ep).cast("double").alias("sum_base_price"),
        F.sum(ep * disc_mult).cast("double").alias("sum_disc_price"),
        F.sum(ep * disc_mult * tax_mult).cast("double").alias("sum_charge"),
        (F.sum(dec2("l_quantity", 12)).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(ep).cast("double") / F.count("*")).alias("avg_price"),
        (F.sum(F.col("l_discount").cast("decimal(4,2)")).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "x1_salted_agg_hot_keys",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    survey="§4 skew (two-stage salted aggregation — value-identical to plain groupBy)",
)
def x1_salted_agg_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe aggregation: salt on event_id spreads each event_type's
    rows over 16 reducers, partials combine in a second (tiny) shuffle.
    Exact-decimal sums make the two-stage regrouping bit-identical to the
    one-stage plan — which is precisely what the oracle checks."""
    from ..operators.skew import salted_agg

    return salted_agg(
        load_table(spark, sf_dir, "events"),
        keys=["event_type"],
        salt_on="event_id",
        sums={"value_sum": dec2("value")},
        count_name="n",
        n_salt=16,
    ).withColumn("value_sum", F.col("value_sum").cast("double"))


@register(
    "a13_cube",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(strftime(date_trunc('month', ts), '%Y-%m'), 'ALL') AS month,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY CUBE (event_type, date_trunc('month', ts))
    """,
    survey="A-std (CUBE — all grouping-set combinations in one pass)",
)
def a13_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, month): all four grouping sets in one shuffle
    (Spark expands grouping sets map-side — no four separate scans)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "month", F.date_format(F.date_trunc("month", "ts"), "yyyy-MM")
    )
    return (
        ev.cube("event_type", "month")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec2("value")).cast("double").alias("value_sum"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("month", F.lit("ALL")).alias("month"),
            "n",
            "value_sum",
        )
    )


@register(
    "a14_quantiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
    survey="A-std (exact interpolated quantiles; approx_percentile is the 100 TB path)",
)
def a14_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type p50/p95/p99 via exact interpolated percentile (matches
    DuckDB quantile_cont).  At 100 TB swap `percentile` for
    `approx_percentile` (t-digest, mergeable, no full sort) — same call
    shape, bounded error instead of exact ranks."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@register(
    "a20_grouping_sets",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY GROUPING SETS ((event_type, date_trunc('day', ts)),
                            (event_type), (date_trunc('day', ts)))
    """,
    survey="A-std (explicit GROUPING SETS via the SQL API — between rollup and cube)",
)
def a20_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through spark.sql — the third grouping-
    analytics entry point next to rollup (a12) and cube (a13), and the
    proof that the engine's SQL surface accepts ANSI grouping analytics
    directly.  Spark expands the sets map-side: one scan, one shuffle,
    regardless of how many sets are named."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    view = "events_gs_view"
    ev.createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(day, 'ALL') AS day,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM {view}
        GROUP BY GROUPING SETS ((event_type, day), (event_type), (day))
    """)


@register(
    "a22_pivot_multi_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS O_n,
           CAST(sum(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O_price,
           CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS F_n,
           CAST(sum(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F_price
    FROM lineitem GROUP BY l_returnflag
    """,
    survey="A3 extended (pivot with MULTIPLE aggregates per pivot value)",
)
def a22_pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot carrying two aggregates per value (count + exact-decimal
    sum): Spark emits `<value>_<agg-alias>` columns from one shuffle —
    still a single pass, the pivot values just fan the aggregation
    buffers out horizontally."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            # count("*") is rejected inside pivot aggregates — count a literal
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("price"),
        )
    )
    return p.select(
        "l_returnflag",
        F.col("O_n"),
        F.col("O_price"),
        F.col("F_n"),
        F.col("F_price"),
    )
