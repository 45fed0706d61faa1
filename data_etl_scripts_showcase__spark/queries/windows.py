"""Window functions / sorts / limits / top-k (SURVEY.md §2.5).

The reference's only windowed computation is a sequential running max
(latest OFFER — /root/reference/buisness_profile_etl/main.py:659-662);
the engine exposes the full analytic surface: ranking, frames, lag/lead,
top-k per group.  All orderings carry a unique tie-break key so results are
deterministic under any partitioning (Spark window sort is otherwise only
partial-order stable).  Running double sums go through exact decimals —
windowed accumulation order is engine-internal, so only an associative
exact type guarantees cross-engine equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import dec2, ntz_epoch_us
from ..sources import load_table
from . import register


@register(
    "w1_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
    survey="W-std,A7",
)
def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (rank + filter — the scalable top-k).

    At 100 TB this is one hash-partition shuffle on the group key; no global
    sort, no driver involvement.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "w2_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
    survey="W-std",
)
def w2_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend (cumulative frame)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec2("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "w3_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           o_totalprice - coalesce(lag(o_totalprice) OVER w, o_totalprice) AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    survey="W-std",
)
def w3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics per customer order history."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    prev = F.lag("o_totalprice").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - F.coalesce(prev, F.col("o_totalprice"))).alias(
            "delta"
        ),
    )


@register(
    "w4_rank_dense_rank",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(rank() OVER w AS INTEGER) AS price_rank,
           CAST(dense_rank() OVER w AS INTEGER) AS price_dense_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    survey="W-std",
)
def w4_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank within priority class."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


@register(
    "w5_order_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    survey="W-std (ORDER BY + LIMIT)",
)
def w5_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 (Spark executes as TakeOrderedAndProject — no full sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "w6_latest_by_window",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_totalprice AS latest_price
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey ASC
               ) AS rn
        FROM orders
    )
    WHERE rn = 1
    """,
    survey="A7 (window formulation)",
)
def w6_latest_by_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key as a window (A7's second formulation, SURVEY §2.5).

    Same semantics as a7_argmax_latest_per_key (max_by), pinned to the
    reference tie-break: strict `>` on timestamp keeps the earliest-seen row
    (main.py:659-662) → DESC date, ASC key, row_number()=1.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_totalprice").alias("latest_price"),
        )
    )


@register(
    "w7_sessionize_batch",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), numbered AS (
        SELECT user_id, ts, event_id,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS duration_us
    FROM numbered GROUP BY user_id, session_id
    """,
    survey="W-std (batch sessionization: gap-based session ids via lag + running sum)",
)
def w7_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session): the
    classic lag → boundary-flag → running-sum-as-session-id composition.
    One shuffle on user_id serves both windows AND the final per-session
    aggregate (same partitioning — Catalyst reuses the exchange).  The
    streaming twin is st3_session_windows; timestamps compare in exact
    epoch micros (int64) for cross-engine determinism."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = ntz_epoch_us("ts")
    prev_us = F.lag(us).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(prev_us.isNull() | (us - prev_us > 1_800_000_000), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (
            F.max(ntz_epoch_us("ts"))
            - F.min(ntz_epoch_us("ts"))
        ).alias("duration_us"),
    )


@register(
    "w8_rolling_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts) ASC
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS hour_value_sum
    FROM events
    """,
    survey="W-std (RANGE frame: time-based rolling window, value-bounded not row-bounded)",
)
def w8_rolling_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour value sum via a RANGE frame over epoch
    micros.  RANGE (not ROWS) makes the frame a time interval — rows with
    equal timestamps land in the same frame on both engines, so no
    tie-break is needed for determinism (plus exact-decimal summation)."""
    ev = load_table(spark, sf_dir, "events")
    us = ntz_epoch_us("ts")
    w = (
        W.partitionBy("user_id")
        .orderBy(us.asc())
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec2("value")).over(w).cast("double").alias("hour_value_sum"),
    )


@register(
    "w9_ntile_deciles",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(10) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS INTEGER) AS price_decile
    FROM orders
    """,
    survey="W-std (ntile bucketing)",
)
def w9_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global price deciles.  An unpartitioned window is a single-reducer
    sort — fine for a bounded result like bucket boundaries, but at 100 TB
    the same decile labels should come from approx_percentile boundaries
    joined back (no global sort); this query pins the exact semantics."""
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return o.select(
        "o_orderkey", F.ntile(10).over(w).alias("price_decile")
    )


@register(
    "w10_distribution_ranks",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER w, 6) AS price_pct_rank,
           round(cume_dist() OVER w, 6) AS price_cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    survey="W-std (distribution functions: percent_rank / cume_dist)",
)
def w10_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist within order status.  The unique (price,
    key) ordering makes every row its own peer group, so both engines
    compute identical rational values; rounded to 6 dp only to guard the
    final double division."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    )


@register(
    "w11_resample_ffill",
    oracle="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
    grid AS (
        SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        FROM span
    ),
    j AS (
        SELECT g.user_id, g.day, d.v
        FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    )
    SELECT user_id,
           strftime(day, '%Y-%m-%d') AS day,
           CAST(last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS value_filled,
           v IS NULL AS is_gap
    FROM j
    """,
    survey="W-std (time-series resample to a daily grid + forward fill — gap-aware metrics)",
)
def w11_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize an irregular event stream: per-user daily grid over the
    user's active span (sequence + explode — each user expands only their
    own range), left-join the actual daily sums, forward-fill gaps with
    last(ignorenulls).  The grid explode is data-proportional (no dense
    cross join of all users × all days) and the fill is one window over
    the same user_id shuffle the join already produced."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(dec2("value")).cast("double").alias("v"))
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    j = grid.join(daily, ["user_id", "day"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.last("v", ignorenulls=True).over(w).alias("value_filled"),
        F.col("v").isNull().alias("is_gap"),
    )


@register(
    "w12_value_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_price,
           nth_value(o_totalprice, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    survey="W-std (value frames: first/last/nth_value with explicit full-partition frames)",
)
def w12_value_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth order value per customer.  last_value and nth_value
    take an EXPLICIT unbounded-following frame — the default frame stops at
    the current row, the classic silent-wrong-answer; pinning the frame is
    the portability contract (identical defaults trap exists in DuckDB)."""
    o = load_table(spark, sf_dir, "orders")
    base = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    full = base.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(base).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
    )


@register(
    "w13_funnel_conversion",
    oracle="""
    WITH first_signup AS (
        SELECT user_id, min(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    first_purchase AS (
        SELECT s.user_id, min(e.ts) AS purchase_ts
        FROM first_signup s
        JOIN events e ON e.user_id = s.user_id
         AND e.event_type = 'purchase' AND e.ts >= s.signup_ts
        GROUP BY s.user_id
    )
    SELECT s.user_id,
           strftime(s.signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_at,
           CASE WHEN p.user_id IS NOT NULL THEN 'converted' ELSE 'pending' END AS funnel_state,
           CAST(epoch_us(p.purchase_ts) - epoch_us(s.signup_ts) AS BIGINT) AS lag_us
    FROM first_signup s LEFT JOIN first_purchase p ON s.user_id = p.user_id
    """,
    survey="W-std (funnel analysis: stage anchoring + conversion lag, the product-analytics shape)",
)
def w13_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel: anchor each user at first signup, find the
    first purchase at-or-after it, classify converted/pending with the
    conversion lag.  Two min-aggregates and a left join — every step
    shuffles on user_id, so Catalyst reuses one exchange; no window over
    the raw event stream is needed (min-by-filter beats sort-based
    sessionizing when only stage boundaries matter)."""
    ev = load_table(spark, sf_dir, "events")
    us = ntz_epoch_us
    signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchase = (
        ev.where(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .where(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    j = signup.join(purchase, "user_id", "left")
    return j.select(
        "user_id",
        F.date_format("signup_ts", "yyyy-MM-dd HH:mm:ss").alias("signup_at"),
        F.when(F.col("purchase_ts").isNotNull(), "converted")
        .otherwise("pending")
        .alias("funnel_state"),
        (us("purchase_ts") - us("signup_ts")).alias("lag_us"),
    )


@register(
    "w14_cohort_retention",
    oracle="""
    WITH cohort AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    csize AS (SELECT cohort_day, count(*) AS cohort_size FROM cohort GROUP BY cohort_day),
    act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT c.cohort_day, datediff('day', c.cohort_day, a.day) AS day_offset, a.user_id
        FROM act a JOIN cohort c USING (user_id)
    )
    SELECT strftime(j.cohort_day, '%Y-%m-%d') AS cohort_ds,
           CAST(j.day_offset AS INTEGER) AS day_offset,
           CAST(count(DISTINCT j.user_id) AS BIGINT) AS active_users,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           round(CAST(count(DISTINCT j.user_id) AS DOUBLE) / s.cohort_size, 6) AS retention_rate
    FROM j JOIN csize s USING (cohort_day)
    WHERE j.day_offset BETWEEN 0 AND 14
    GROUP BY j.cohort_day, j.day_offset, s.cohort_size
    """,
    survey="W-std (cohort retention matrix: signup cohorts × day-offset purchase activity)",
)
def w14_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention matrix: users grouped by signup date, and for each
    day offset 0–14 the count and fraction of the cohort making a
    purchase — the product-analytics companion to the w13 funnel.

    Shape at scale: the cohort assignment is one user-keyed aggregate;
    activity days dedupe map-side (distinct on user+day); the join keys on
    user_id so it co-partitions with the cohort aggregate, and the final
    matrix is tiny (cohorts × offsets).  The cohort-size table is
    broadcast back onto it."""
    ev = load_table(spark, sf_dir, "events")
    cohort = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("cohort_day"))
    )
    csize = cohort.groupBy("cohort_day").agg(F.count("*").alias("cohort_size"))
    act = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    j = act.join(cohort, "user_id").withColumn(
        "day_offset", F.datediff("day", "cohort_day")
    )
    m = (
        j.where(F.col("day_offset").between(0, 14))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    return m.join(F.broadcast(csize), "cohort_day").select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_ds"),
        "day_offset",
        "active_users",
        "cohort_size",
        F.round(
            F.col("active_users").cast("double") / F.col("cohort_size"), 6
        ).alias("retention_rate"),
    )


@register(
    "w15_time_weighted_avg",
    oracle="""
    WITH o AS (
        SELECT user_id, value, epoch_us(ts) AS us, event_id,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS next_us
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(next_us - us) AS BIGINT) AS span_us,
           round(sum(value * (next_us - us)) / sum(next_us - us), 6) AS twa_value
    FROM o WHERE next_us IS NOT NULL
    GROUP BY user_id
    """,
    survey="W-std (time-weighted average over an irregular series — each value held until the next observation)",
)
def w15_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user over an irregularly-sampled series:
    each value is weighted by how long it was 'current' (until the next
    event) — the correct mean for sensor/price/state series where plain
    avg() over-weights bursts.  Pairs with the as-of join (j7) as the
    time-series surface.

    One (user_id → ts) window for the interval close, then a same-key
    aggregate — the shuffle co-locates with the window's.  Weights are
    exact integer microseconds (epoch_us convention), so only the final
    ratio is floating point."""
    ev = load_table(spark, sf_dir, "events")
    us = ntz_epoch_us("ts")
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    o = (
        ev.select("user_id", "value", us.alias("us"), "event_id")
        .withColumn("next_us", F.lead("us").over(w))
        .where(F.col("next_us").isNotNull())
    )
    dt = F.col("next_us") - F.col("us")
    return o.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum(dt).alias("span_us"),
        F.round(F.sum(F.col("value") * dt) / F.sum(dt), 6).alias("twa_value"),
    )


@register(
    "w16_activity_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    islands AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY d
                   ) AS INTEGER) AS anchor
        FROM days
    ),
    streaks AS (
        SELECT user_id, anchor,
               CAST(count(*) AS BIGINT) AS streak_len,
               min(d) AS streak_start
        FROM islands GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(streak_len) AS BIGINT) AS longest_streak,
           CAST(sum(streak_len) AS BIGINT) AS active_days,
           strftime(min(streak_start), '%Y-%m-%d') AS first_active_ds
    FROM streaks GROUP BY user_id
    """,
    survey="W-std (gaps-and-islands: consecutive-day activity streaks via the date-minus-rank anchor)",
)
def w16_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user (gaps-and-islands): every
    run of adjacent active days collapses to one island keyed by the
    classic ``date - row_number()`` anchor (constant within a run, distinct
    across runs), then per-user streak stats.

    Engagement-cohort shape the reference's daily active-mid counter
    (main.py:20-50) only approximates with one global number per day.
    Scale: the distinct, the window, and both aggregates all key on
    user_id — Catalyst runs the whole chain on ONE user-keyed shuffle
    (the distinct's day key is a strict superset), and per-user state is
    bounded by the calendar, not the event volume."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count("*").alias("streak_len"),
        F.min("d").alias("streak_start"),
    )
    return streaks.groupBy("user_id").agg(
        F.count("*").alias("n_streaks"),
        F.max("streak_len").alias("longest_streak"),
        F.sum("streak_len").alias("active_days"),
        F.date_format(F.min("streak_start"), "yyyy-MM-dd").alias("first_active_ds"),
    )


@register(
    "w17_interval_merge",
    oracle="""
    WITH iv AS (
        SELECT user_id, ts AS s,
               ts + INTERVAL 5 MINUTE AS e
        FROM events
    ),
    m AS (
        SELECT user_id, s, e,
               max(e) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_max_e
        FROM iv
    ),
    flagged AS (
        SELECT user_id, s, e,
               CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END AS is_start
        FROM m
    ),
    grp AS (
        SELECT user_id, s, e,
               sum(is_start) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM flagged
    )
    SELECT user_id,
           CAST(island AS BIGINT) AS island,
           strftime(min(s), '%Y-%m-%d %H:%M:%S') AS merged_start,
           strftime(max(e), '%Y-%m-%d %H:%M:%S') AS merged_end,
           CAST(count(*) AS BIGINT) AS n_intervals
    FROM grp
    GROUP BY user_id, island
    """,
    survey="W-std (overlapping-interval merge: running-max-end islands, the range form of w16)",
)
def w17_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-user intervals (each event opens a 5-minute
    validity window): an interval starts a new merged block iff it begins
    after the running max end of everything before it — the
    gaps-and-islands pattern generalized from days (w16) to arbitrary
    ranges.  Output: one row per merged block with its span and member
    count (the batch form of st3's session windows, but overlap-based
    rather than gap-based).

    Both windows and the final aggregate share the (user_id → s, e) sort:
    one shuffle + one sort for the whole chain, per-user state bounded by
    the running max — the same single-exchange discipline as x9."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = iv.withColumn("prev_max_e", F.max("e").over(w_prev)).withColumn(
        "is_start",
        F.when(
            F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")), 1
        ).otherwise(0),
    )
    grp = flagged.withColumn("island", F.sum("is_start").over(w_run))
    return grp.groupBy("user_id", "island").agg(
        F.date_format(F.min("s"), "yyyy-MM-dd HH:mm:ss").alias("merged_start"),
        F.date_format(F.max("e"), "yyyy-MM-dd HH:mm:ss").alias("merged_end"),
        F.count("*").alias("n_intervals"),
    ).select(
        "user_id",
        F.col("island").cast("bigint").alias("island"),
        "merged_start",
        "merged_end",
        "n_intervals",
    )


@register(
    "w18_ema_per_user",
    oracle="""
    WITH s AS (
        SELECT user_id,
               list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n,
           round(list_reduce(vals, (a, x) -> (a + x) / 2.0), 6) AS ema_last
    FROM s
    """,
    survey="§2.5 extended (recursive time-series fold: EMA via higher-order reduce, zero Python)",
)
def w18_ema_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average (α=0.5) of each user's event values in
    time order — the classic RECURSIVE time-series operator that plain
    window frames cannot express (each output depends on the previous
    output, not a fixed frame).  Expressed as a higher-order fold over the
    time-sorted value array: collect → sort by (ts, event_id) → aggregate
    lambda — all JVM codegen, zero Python.  Both engines fold
    left-to-right over the identical sequence, so the IEEE double result
    is bit-identical (rounded at output only for hash stability).

    Scale shape: one shuffle on user_id; per-user state is that user's
    event list — fine while per-key series fit memory (they do for
    per-user event streams; for unbounded series the streaming st5/st11
    state machines are the scale path)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "ts", "event_id", F.col("value").cast("double").alias("value")
                )
            )
        ).alias("rows")
    )
    vals = F.transform("rows", lambda r: r["value"])
    ema = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda a, x: (a + x) / F.lit(2.0),
    )
    return per_user.select(
        "user_id",
        F.size(vals).cast("bigint").alias("n"),
        F.round(ema, 6).alias("ema_last"),
    )


@register(
    "w19_ohlc_bars",
    oracle="""
    WITH e AS (
        SELECT event_type, date_trunc('hour', ts) AS bar, value,
               printf('%020d%012d', epoch_us(ts), event_id) AS ord
        FROM events
    )
    SELECT event_type,
           strftime(bar, '%Y-%m-%d %H:%M:%S') AS bar_start,
           CAST(count(*) AS BIGINT) AS n,
           min_by(value, ord) AS open,
           max(value) AS high,
           min(value) AS low,
           max_by(value, ord) AS close
    FROM e GROUP BY event_type, bar
    """,
    survey="§2.5 extended (OHLC downsampling: argmin/argmax-by-time bars in one aggregate)",
)
def w19_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the canonical time-series
    downsample.  Open/close are argmin/argmax by (ts, event_id) — exact
    element values with a total order, so no float accumulation and a
    deterministic tie-break — and the whole bar is ONE hash aggregate
    with map-side partials (no window, no sort): the shape that
    downsamples a 100 TB tick stream in a single shuffle."""
    ev = load_table(spark, sf_dir, "events")
    # zero-padded (epoch_us, event_id) string: one totally-ordered argmin/
    # argmax key both engines implement identically (struct keys are not
    # portable to the oracle's min_by)
    order = F.format_string(
        "%020d%012d", ntz_epoch_us("ts"), F.col("event_id")
    )
    return (
        ev.withColumn("bar", F.date_trunc("hour", "ts"))
        .groupBy("event_type", "bar")
        .agg(
            F.count("*").alias("n"),
            F.min_by("value", order).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order).alias("close"),
        )
        .select(
            "event_type",
            F.date_format("bar", "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
            "n",
            "open",
            "high",
            "low",
            "close",
        )
    )


@register(
    "w20_rate_cap",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_id, ts,
               row_number() OVER (
                   PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts, event_id
               ) AS rn
        FROM events
    )
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           CAST(rn AS INTEGER) AS rn
    FROM ranked WHERE rn <= 3
    """,
    survey="§2.5 extended (per-key rate cap: keep first N events per user per hour)",
)
def w20_rate_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution capping: keep at most 3 events per user per hour
    (first-arrived wins, deterministic (ts, event_id) order) — the
    anti-spam / anti-dominance gate training pipelines apply so no single
    key floods a time bucket.  One window over (user, hour); at 100 TB
    the partition key is (user, hour) so no single user's history ever
    concentrates on one task."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", F.date_trunc("hour", "ts")).orderBy(
        "ts", "event_id"
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


@register(
    "w21_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type,
               quantile_disc(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.event_id, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_disc(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(max(d.med), 2) AS med,
           round(max(m.mad), 6) AS mad,
           CAST(count(CASE WHEN d.adev > 3 * m.mad THEN 1 END) AS BIGINT)
               AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    survey="A-std extended (robust outlier detection: median absolute deviation gate)",
)
def w21_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier accounting per event type: median, MAD (median of
    absolute deviations), and how many values sit beyond 3 MADs — the
    outlier gate that, unlike x10's percentile winsorization, is immune
    to the outliers' own magnitude.  Both medians use DISCRETE quantiles
    (an actual data value, exact on both engines — no interpolation
    drift).  Two grouped exact-percentile aggregates + one broadcast of
    the per-type scalars; nothing scales with row count except the scans."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    j = dev.join(F.broadcast(mad), "event_type")
    return j.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.max("med"), 2).alias("med"),
        F.round(F.max("mad"), 6).alias("mad"),
        F.count(F.when(F.col("adev") > 3 * F.col("mad"), 1))
        .cast("bigint")
        .alias("n_outliers"),
    )


@register(
    "w22_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
               AS p_next
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    survey="§2.5 extended (behavioral sequence mining: event-transition matrix via lag window)",
)
def w22_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: for each user's event
    stream (deterministic (ts, event_id) order), count prev→next
    event-type transitions and normalize per source state — the Markov
    transition estimate behind funnel analysis, next-action prediction
    features, and bot detection (near-deterministic rows are scripted
    traffic).  One lag window and one hash aggregate, both keyed on
    user_id/prev_type — the window state is one row, the aggregate is
    |types|² cells at any event volume."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(W.partitionBy("prev_type")).cast("double"),
            6,
        ).alias("p_next"),
    )


@register(
    "w23_linear_interpolation",
    oracle="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
    grid AS (
        SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        FROM span
    ),
    j AS (
        SELECT g.user_id, g.day, d.v
        FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    ),
    br AS (
        SELECT user_id, day, v,
               last_value(v IGNORE NULLS) OVER wp AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                   OVER wp AS pd,
               first_value(v IGNORE NULLS) OVER wn AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                   OVER wn AS nd
        FROM j
        WINDOW wp AS (PARTITION BY user_id ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY user_id ORDER BY day
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id,
           strftime(day, '%Y-%m-%d') AS day,
           v IS NULL AS is_gap,
           round(CASE
               WHEN v IS NOT NULL THEN v
               WHEN pv IS NULL THEN nv
               WHEN nv IS NULL THEN pv
               ELSE pv + (nv - pv) * date_diff('day', pd, day)
                              / date_diff('day', pd, nd)
           END, 4) AS value_interp
    FROM br
    """,
    survey="W-std extended (time-series gap fill by LINEAR interpolation between bracketing samples)",
)
def w23_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill by linear interpolation: the per-user daily grid of w11,
    but each missing day takes the value LERPED between its bracketing
    known samples (edges fall back to nearest-known) — the fill that
    respects trends, where forward-fill (w11) flat-lines them.  Both
    bracketing scans are windows over the SAME user-keyed sort the grid
    join already produced: one shuffle total, and the grid explode stays
    data-proportional (each user expands only their own span).  The lerp
    is the identical IEEE expression on both engines, rounded to 4 dp."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(dec2("value")).cast("double").alias("v"))
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    j = grid.join(daily, ["user_id", "day"], "left")
    wp = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    known_day = F.when(F.col("v").isNotNull(), F.col("day"))
    br = j.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(known_day, ignorenulls=True).over(wp).alias("pd"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(known_day, ignorenulls=True).over(wn).alias("nd"),
    )
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * F.datediff(
        F.col("day"), F.col("pd")
    ) / F.datediff(F.col("nd"), F.col("pd"))
    return br.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("v").isNull().alias("is_gap"),
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v"))
            .when(F.col("pv").isNull(), F.col("nv"))
            .when(F.col("nv").isNull(), F.col("pv"))
            .otherwise(lerp),
            4,
        ).alias("value_interp"),
    )


@register(
    "w24_seasonal_anomaly",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    f AS (
        SELECT event_type, day, n,
               lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS expected
        FROM d
    ),
    r AS (
        SELECT event_type, day, n, expected,
               n - expected AS residual
        FROM f WHERE expected IS NOT NULL
    ),
    s AS (
        SELECT event_type,
               round(2.0 * stddev_samp(residual), 4) AS threshold
        FROM r GROUP BY event_type
    )
    SELECT r.event_type, strftime(r.day, '%Y-%m-%d') AS day, r.n, r.expected,
           CAST(r.residual AS BIGINT) AS residual,
           abs(CAST(r.residual AS DOUBLE)) > s.threshold AS is_anomaly
    FROM r JOIN s USING (event_type)
    """,
    survey="W-std extended (seasonal-naive anomaly detection: lag-7 forecast + residual sigma gate)",
)
def w24_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly monitoring over the event stream: per-type daily
    counts, a seasonal-naive forecast (same weekday last week — lag 7 in
    the ordered day series), and a 2σ residual gate.  This is the
    pipeline-health check a 100 TB ingest runs nightly: one aggregate to
    days (the only full-data pass), then windows and the sigma gate on
    the tiny (type × day) series.  Residuals are exact BIGINTs; the one
    float (the σ threshold) is rounded to 4 dp on both sides so the
    boolean gate compares identically."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy("day")
    r = (
        d.withColumn("expected", F.lag("n", 7).over(w))
        .where(F.col("expected").isNotNull())
        .withColumn("residual", F.col("n") - F.col("expected"))
    )
    s = r.groupBy("event_type").agg(
        F.round(2.0 * F.stddev_samp("residual"), 4).alias("threshold")
    )
    return r.join(F.broadcast(s), "event_type").select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        "expected",
        F.col("residual").cast("bigint").alias("residual"),
        (F.abs(F.col("residual").cast("double")) > F.col("threshold")).alias(
            "is_anomaly"
        ),
    )


@register(
    "w25_target_encoding_loo",
    oracle="""
    WITH g AS (
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_cat,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_cat
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey, o.o_orderpriority,
           CAST(CASE WHEN g.n_cat = 1 THEN NULL
                     ELSE round((g.sum_cat - CAST(o.o_totalprice AS DECIMAL(18,2)))
                                / (g.n_cat - 1), 4)
                END AS DOUBLE) AS te_loo,
           CAST(round(g.sum_cat / g.n_cat, 4) AS DOUBLE) AS te_naive
    FROM orders o JOIN g USING (o_orderpriority)
    WHERE o.o_orderkey % 20 = 0
    """,
    survey="W-std extended, NS-mlprep (leave-one-out target encoding: leakage-free categorical feature via group sums minus self)",
)
def w25_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target encoding done leakage-free: each row's category feature is
    the mean target of OTHER rows in its category — (Σ_cat − y_i)/(n_cat
    − 1) — the leave-one-out form that keeps a row's own label out of its
    feature (the same leakage discipline as d15's split).  Plan: one
    per-category aggregate (tiny — broadcast back), then pure arithmetic
    per row; no window over the full table, no shuffle of the fact beyond
    the aggregate.  Sums ride exact DECIMAL so the division inputs are
    bit-identical on both engines; the quotient rounds to 4 dp.  The
    naive (leaky) mean rides alongside for comparison."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_cat"),
        F.sum(dec2("o_totalprice")).alias("sum_cat"),
    )
    return (
        o.where(F.col("o_orderkey") % 20 == 0)
        .join(F.broadcast(g), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.when(F.col("n_cat") == 1, F.lit(None))
            .otherwise(
                F.round(
                    (F.col("sum_cat") - dec2("o_totalprice"))
                    / (F.col("n_cat") - 1),
                    4,
                )
            )
            .cast("double")
            .alias("te_loo"),
            F.round(F.col("sum_cat") / F.col("n_cat"), 4)
            .cast("double")
            .alias("te_naive"),
        )
    )


@register(
    "w26_missing_periods",
    oracle="""
    WITH span AS (
        SELECT event_type,
               CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1,
               CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_present
        FROM events GROUP BY event_type
    ),
    grid AS (
        SELECT event_type, n_present, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM span
    ),
    actual AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events),
    missing AS (
        SELECT g.event_type, g.n_present, g.day
        FROM grid g LEFT JOIN actual a
          ON a.event_type = g.event_type AND a.day = g.day
        WHERE a.day IS NULL
    )
    SELECT s.event_type,
           CAST(s.d1 - s.d0 + 1 AS BIGINT) AS n_expected,
           s.n_present,
           CAST(coalesce(m.n_missing, 0) AS BIGINT) AS n_missing,
           coalesce(m.first_missing, '') AS first_missing
    FROM span s
    LEFT JOIN (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_missing,
               strftime(min(day), '%Y-%m-%d') AS first_missing
        FROM missing GROUP BY event_type
    ) m ON m.event_type = s.event_type
    """,
    survey="W-std extended (completeness grid: expected-vs-present periods per key, missing-day accounting)",
)
def w26_missing_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-completeness SLA report: for each event type, the expected
    day grid (min..max) against the days actually present — count and
    first date of the holes.  This is the ingest-monitoring question 'did
    any feed skip a day' answered per key in one aggregate + one
    per-key grid anti-join; the grid explodes |keys|·|days| rows (tiny —
    it never touches event granularity), so the full-data pass is only
    the distinct (key, day) projection."""
    ev = load_table(spark, sf_dir, "events")
    span = ev.groupBy("event_type").agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
        F.countDistinct(F.col("ts").cast("date")).cast("bigint").alias("n_present"),
    )
    grid = span.select(
        "event_type",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    actual = ev.select(
        "event_type", F.col("ts").cast("date").alias("day")
    ).distinct()
    missing = grid.join(actual, ["event_type", "day"], "left_anti")
    msum = missing.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_missing"),
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("first_missing"),
    )
    return span.join(msum, "event_type", "left").select(
        "event_type",
        (F.datediff("d1", "d0") + 1).cast("bigint").alias("n_expected"),
        "n_present",
        F.coalesce("n_missing", F.lit(0).cast("bigint")).alias("n_missing"),
        F.coalesce("first_missing", F.lit("")).alias("first_missing"),
    )


@register(
    "w27_cusum_drift",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    k AS (
        SELECT event_type, CAST(floor(avg(n)) AS BIGINT) AS slack
        FROM d GROUP BY event_type
    ),
    p AS (
        SELECT d.event_type, d.day, d.n,
               sum(d.n - k.slack) OVER (
                   PARTITION BY d.event_type ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pref
        FROM d JOIN k USING (event_type)
    ),
    c AS (
        SELECT event_type, day, n, pref,
               CAST(pref - least(min(pref) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 0) AS BIGINT) AS cusum
        FROM p
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n, cusum,
           cusum > 5 * (SELECT floor(avg(slack)) FROM k) AS drift_alarm
    FROM c
    """,
    survey="W-std extended (CUSUM drift detection in closed form: the max(0,.) recursion as prefix-sum minus running-min)",
)
def w27_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change detection over daily volumes — the sequential drift
    detector that catches slow upward creep w24's per-day residual gate
    misses.  The textbook recursion S_t = max(0, S_{t-1} + x_t − k) looks
    iterative, but unrolls exactly to S_t = P_t − min(0, min_{i≤t} P_i)
    with P the prefix sum of (x − k) — two ordinary windows, no loop, no
    UDF, exact BIGINT arithmetic throughout (slack k = floor(mean)).
    Alarm when the accumulated excess passes 5k.  At 100 TB the windows
    run on the tiny (type × day) relation after the one full-data
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    k = d.groupBy("event_type").agg(
        F.floor(F.avg("n")).cast("bigint").alias("slack")
    )
    wseq = W.partitionBy("event_type").orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    p = d.join(F.broadcast(k), "event_type").withColumn(
        "pref", F.sum(F.col("n") - F.col("slack")).over(wseq)
    )
    c = p.withColumn(
        "cusum",
        (F.col("pref") - F.least(F.min("pref").over(wseq), F.lit(0))).cast(
            "bigint"
        ),
    )
    thr = k.agg(F.floor(F.avg("slack")).alias("t"))
    return c.crossJoin(F.broadcast(thr)).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        "cusum",
        (F.col("cusum") > 5 * F.col("t")).alias("drift_alarm"),
    )


@register(
    "w29_multitouch_attribution",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_cents
        FROM events WHERE event_type = 'purchase'
    ),
    touched AS (
        SELECT c.event_id, c.user_id, c.ts, p.p_id, p.value_cents
        FROM clicks c JOIN purchases p
          ON c.user_id = p.user_id
         AND c.ts <= p.p_ts AND c.ts >= p.p_ts - INTERVAL 1 DAY
    ),
    staged AS (
        SELECT event_id, user_id, p_id,
               value_cents * 1000 AS vmc,
               count(*) OVER (PARTITION BY p_id) AS n,
               row_number() OVER (
                   PARTITION BY p_id ORDER BY ts ASC, event_id ASC
               ) AS rn
        FROM touched
    ),
    -- floor-consistent split: rem = pmod(vmc, n) in [0, n); DuckDB's // and
    -- % truncate toward zero, so emulate pmod and divide the exactly-
    -- divisible numerator (conservation holds for negative vmc too).
    share AS (
        SELECT event_id, user_id,
               (vmc - ((vmc % n) + n) % n) // n
               + CASE WHEN rn = 1 THEN ((vmc % n) + n) % n ELSE 0 END
                   AS credit_mc
        FROM staged
    )
    SELECT event_id, user_id,
           CAST(count(*) AS BIGINT) AS n_conversions_touched,
           CAST(sum(credit_mc) AS BIGINT) AS credited_millicents
    FROM share GROUP BY event_id, user_id
    """,
    survey="W-std extended (multi-touch attribution: linear credit split across the conversion's preceding touches — exact integer milli-cents)",
)
def w29_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase's value is split
    EQUALLY across the user's clicks in the preceding 24 h, and each
    click accumulates its credit over every conversion it touched — the
    revenue-attribution readout marketing actually reconciles against
    (w13's funnel says WHETHER users convert; this says which touches
    get paid).  Credit is computed in integer MILLI-CENTS and CONSERVED
    exactly: each touch gets value_mc div n_touches, and the remainder
    goes to the earliest touch (ties by event_id) — so per-purchase
    credit sums reconcile to the purchase value bit-for-bit (the
    hypothesis property test pins this invariant over generated
    streams), and per-click sums are order-independent.

    Scale shape: the touch join is keyed on user_id (hash join) with the
    24 h range as a residual predicate — per-user event counts are
    bounded, so no candidate explosion; the per-conversion touch count
    and earliest-touch rank ride one window over the touched pairs
    (operators/attribution.py), and the final per-click rollup is a
    partial-aggregated groupBy."""
    from ..operators.attribution import linear_attribution

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("p_ts"),
        (dec2("value") * 100).cast("bigint").alias("value_cents"),
    )
    share = linear_attribution(clicks, purchases)
    return share.groupBy("event_id", "user_id").agg(
        F.count("*").cast("bigint").alias("n_conversions_touched"),
        F.sum("credit_mc").cast("bigint").alias("credited_millicents"),
    )
