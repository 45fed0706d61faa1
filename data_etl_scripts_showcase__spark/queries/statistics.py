"""Statistical aggregate surface (beyond-reference A-std extensions).

The reference computes only count/sum/avg/round (SURVEY.md §2.4); a real
analytics engine needs the dispersion/association/shape family.  All of
these are one-pass mergeable aggregates in Spark (Welford-style co-moment
merging under partial aggregation) — a single shuffle on the group key,
identical to the plan shape of `sum`, so they scale to 100 TB unchanged.

Determinism notes (oracle gate):
- stddev/variance/corr are accumulation-order-dependent in the last ~few
  ulps; both engines use numerically stable co-moment merges, so rounding
  to 6 dp (O(1)-magnitude results) / 2 dp (large-magnitude covariances)
  pins the hash.
- mode has no deterministic tie-break in either engine → implemented as
  count + rank with an explicit (freq DESC, value ASC) order on BOTH sides.
- approx_count_distinct (HLL++) can never hash-match DuckDB's sketch, so
  the query *verifies the approximation contract instead*: it returns the
  exact count plus a boolean "approx within 5%" — the oracle asserts TRUE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import dec2
from ..sources import load_table
from . import register


@register(
    "a15_dispersion_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS qty_stddev,
           round(var_samp(l_quantity), 6) AS qty_var,
           round(stddev_pop(l_quantity), 6) AS qty_stddev_pop,
           round(var_pop(l_quantity), 6) AS qty_var_pop
    FROM lineitem GROUP BY l_returnflag
    """,
    survey="A-std (dispersion: stddev/variance, sample + population)",
)
def a15_dispersion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group dispersion: one hash-agg pass, partials merge as
    (n, mean, M2) triples — no second scan, no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("qty_stddev_pop"),
        F.round(F.var_pop("l_quantity"), 6).alias("qty_var_pop"),
    )


@register(
    "a16_corr_covar",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           round(covar_pop(l_quantity, l_extendedprice), 2) AS qty_price_covar_pop
    FROM lineitem GROUP BY l_returnflag
    """,
    survey="A-std (association: corr / covariance)",
)
def a16_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation + covariance between quantity and price per return flag.
    Covariances are O(1e5)-magnitude so they round to 2 dp; corr is unit-
    scaled and rounds to 6 dp."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(q, p), 6).alias("qty_price_corr"),
        F.round(F.covar_samp(q, p), 2).alias("qty_price_covar"),
        F.round(F.covar_pop(q, p), 2).alias("qty_price_covar_pop"),
    )


@register(
    "a17_mode_deterministic",
    oracle="""
    SELECT l_returnflag, l_quantity AS modal_qty, freq
    FROM (
        SELECT l_returnflag, l_quantity,
               CAST(count(*) AS BIGINT) AS freq,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY count(*) DESC, l_quantity ASC
               ) AS rn
        FROM lineitem GROUP BY l_returnflag, l_quantity
    )
    WHERE rn = 1
    """,
    survey="A-std (mode with pinned tie-break — built-in mode() is nondeterministic on ties)",
)
def a17_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: value-level count then rank by (freq DESC, value
    ASC).  Two shuffles, but the second input is one row per distinct value
    — negligible at any scale (distinct quantities, not rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    counted = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("freq")
    )
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("freq").desc(), F.col("l_quantity").asc()
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("modal_qty"), "freq")
    )


@register(
    "a18_approx_distinct_check",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
    survey="A-std (approx_count_distinct — HLL++; oracle asserts the error contract)",
)
def a18_approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct at rsd=0.01, verified against the exact
    count to within 5% inside the query itself.  At 100 TB the exact side
    disappears and only the mergeable O(kB)-state sketch remains — this
    query exists to pin the accuracy contract under the oracle gate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("_approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_within_5pct"),
        )
    )


@register(
    "a19_histogram",
    oracle="""
    -- this DuckDB build has no width_bucket; the arithmetic below is its
    -- exact definition on [0, 350) with 14 buckets (underflow→0, overflow→15)
    SELECT CASE WHEN value < 0.0 THEN 0
                WHEN value >= 350.0 THEN 15
                ELSE CAST(floor(value * 14 / 350.0) AS INTEGER) + 1 END AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events GROUP BY 1
    """,
    survey="A-std (width_bucket histogram — fixed-width binning, one shuffle)",
)
def a19_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values: width_bucket is a pure
    expression (codegen'd), so the histogram is an ordinary hash aggregate
    — no sort, no driver-side binning."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.width_bucket("value", F.lit(0.0), F.lit(350.0), F.lit(14))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(dec2("value")).cast("double").alias("value_sum"),
        )
    )


@register(
    "x2_hash_sample",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS sample_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sample_spend
    FROM orders
    WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
    """,
    survey="A-std (deterministic hash sampling — reproducible across engines & cluster sizes)",
)
def x2_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample by key hash (md5 bucket < 10).

    TABLESAMPLE is partition-count-dependent and engine-specific; hashing
    the key makes the sample reproducible on any engine, any partitioning,
    any day — which is what a 100 TB pipeline needs for A/B-stable
    downsampling.  The filter is a pure expression, evaluated scan-side."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    return o.where(bucket % 100 < 10).agg(
        F.count("*").alias("sample_rows"),
        F.sum(dec2("o_totalprice")).cast("double").alias("sample_spend"),
    )


@register(
    "a21_approx_quantile_check",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS exact_p50,
           round(quantile_cont(value, 0.95), 6) AS exact_p95,
           TRUE AS approx_rank_ok
    FROM events GROUP BY event_type
    """,
    survey="A-std (approx_percentile error contract — the t-digest 100 TB path, verified)",
)
def a21_approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approx_percentile accuracy contract, oracle-verified like a18.

    The sketch's formal guarantee is bounded RANK error (≤ n/accuracy),
    not bounded value error — the estimate is an actual data point while
    exact `percentile` interpolates, so a value-distance check fails
    whenever neighboring data points are far apart (sparse groups).  The
    flag therefore verifies the real contract: the fraction of values ≤
    the estimate must sit within ±5% of the target quantile.  At 100 TB
    the exact side disappears and only the mergeable sketch runs."""
    ev = load_table(spark, sf_dir, "events")
    approx = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 10000)").alias("_a50"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("_a95"),
    )
    joined = ev.join(F.broadcast(approx), "event_type")
    agg = joined.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("exact_p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("exact_p95"),
        (F.count(F.when(F.col("value") <= F.col("_a50"), 1)) / F.count("*")).alias(
            "_r50"
        ),
        (F.count(F.when(F.col("value") <= F.col("_a95"), 1)) / F.count("*")).alias(
            "_r95"
        ),
    )
    ok = F.col("_r50").between(0.45, 0.55) & F.col("_r95").between(0.90, 1.0)
    return agg.select("event_type", "exact_p50", "exact_p95", ok.alias("approx_rank_ok"))


@register(
    "x6_salted_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment
    """,
    survey="§4 skew (salted fact-to-dim join — value-identical to the plain join)",
)
def x6_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof join: events salted on event_id, customer replicated 16×,
    join on (user_id, salt).  The aggregate downstream proves value
    identity with the unsalted plan — which is exactly what the oracle
    (a plain join) checks."""
    from ..operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, key="user_id", salt_on="event_id", n_salt=16)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(dec2("value")).cast("double").alias("value_sum"),
    )


# Per-stratum keep rates in basis points (event_type → bp of 10000).
STRATA_BP = {"purchase": 10000, "signup": 5000, "error": 2500, "click": 1000, "view": 500}


@register(
    "x7_stratified_sample",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS kept_rows,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS kept_value_sum
    FROM events
    WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
          < CASE event_type
              {" ".join(f"WHEN '{k}' THEN {v}" for k, v in STRATA_BP.items())}
              ELSE 0 END
    GROUP BY event_type
    """,
    survey="A-std (stratified deterministic sampling — per-class keep rates, the data-curation mix knob)",
)
def x7_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-class rates (rare classes kept
    whole, dominant classes thinned) — how training-data mixes are rebalanced.
    The keep decision is a pure hash of the row key against a per-stratum
    threshold: reproducible on any engine/partitioning, evaluated scan-side,
    and changing the mix is a literal edit, not a reshuffle."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 10000
    threshold = F.lit(0)
    for k, v in STRATA_BP.items():
        threshold = F.when(F.col("event_type") == k, v).otherwise(threshold)
    return (
        ev.where(bucket < threshold)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("kept_rows"),
            F.sum(dec2("value")).cast("double").alias("kept_value_sum"),
        )
    )


# x8: token-budget sampling over documents.
_BUDGET_TOKENS = 1000
_NORM_DOC = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "x8_token_budget_sample",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id,
               CAST(len(string_split({_NORM_DOC}, ' ')) AS INTEGER) AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS rand_key
        FROM documents
    ),
    c AS (
        SELECT source, doc_id, n_tokens,
               CAST(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY rand_key, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM t
    )
    SELECT source, doc_id, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= {_BUDGET_TOKENS}
    """,
    survey="A-std (token-budget sampling — deterministic per-source cut at a target token count)",
)
def x8_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sampling: take documents per source, in a deterministic
    pseudo-random order (md5 of the doc key), until the source's token
    budget is reached — how a training mix hits an exact per-domain token
    count instead of a row count.

    The order key is a content-independent hash, so the selection is
    reproducible on any engine and any partitioning.  The running sum is
    one window per source partition; at 100 TB the same cut runs
    hierarchically (per-partition partial sums, then offsets — the plan
    shape of w2_running_total) without changing the selected set."""
    from ..operators.text import token_count

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("rand_key"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("rand_key", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = t.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
    return c.where(F.col("cum_tokens") <= _BUDGET_TOKENS).select(
        "source", "doc_id", "n_tokens", "cum_tokens"
    )


@register(
    "x10_winsorized_stats",
    oracle="""
    WITH p AS (
        SELECT event_type,
               round(quantile_cont(value, 0.05), 6) AS p05,
               round(quantile_cont(value, 0.95), 6) AS p95
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           p.p05,
           p.p95,
           CAST(sum(CASE WHEN e.value < p.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
           CAST(sum(CASE WHEN e.value > p.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
           round(avg(least(greatest(e.value, p.p05), p.p95)), 6) AS winsorized_mean,
           round(avg(e.value), 6) AS raw_mean
    FROM events e JOIN p USING (event_type)
    GROUP BY e.event_type, p.p05, p.p95
    """,
    survey="A-std (winsorization: exact-percentile clipping — outlier-robust metric cleaning)",
)
def x10_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p05/p95-clipped) mean per event type, with clip counts
    and the raw mean for comparison — the outlier-robust cleaning pass for
    metric columns (a value column with sensor spikes or billing glitches
    shouldn't drag the training-mix statistics).

    Two passes by design: an exact-percentile aggregate per group (tiny:
    one row per event_type), broadcast back onto the fact scan for the
    clip + re-aggregate.  At 100 TB the first pass swaps to
    approx_percentile (a21's verified error contract) and the plan shape —
    small-side broadcast join, one fact shuffle — is unchanged.

    The clip thresholds are applied AT the quoted 6-dp precision (both
    engines round the interpolated percentile BEFORE comparing): the
    engines' linear interpolations can differ in the last ulp
    (2.52 vs 2.5200000000000005 on the 10x scale-probe data), and a
    strict `<` against an un-rounded threshold flips every row tied at
    the boundary — 50 rows at 10x volume.  Rounding first makes the
    counts reproducible across engines at any data volume, and means
    the thresholds the report QUOTES are the thresholds it APPLIED."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.05)), 6).alias("p05"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        ev.join(F.broadcast(p), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("p05").alias("p05"),
            F.first("p95").alias("p95"),
            F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0)).alias(
                "n_clipped_low"
            ),
            F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0)).alias(
                "n_clipped_high"
            ),
            F.round(F.avg(clipped), 6).alias("winsorized_mean"),
            F.round(F.avg("value"), 6).alias("raw_mean"),
        )
    )


@register(
    "x11_heavy_hitters",
    oracle="""
    WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
    t AS (SELECT sum(n) AS total, count(*) AS n_keys FROM c),
    r AS (
        SELECT c.user_id, c.n, t.total, t.n_keys,
               row_number() OVER (ORDER BY c.n DESC, c.user_id ASC) AS rk
        FROM c, t
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_rows,
           CAST(rk AS INTEGER) AS rk,
           round(CAST(n AS DOUBLE) / total, 6) AS frac_of_total,
           round(CAST(n AS DOUBLE) * n_keys / total, 6) AS skew_vs_uniform
    FROM r WHERE rk <= 10
    """,
    survey="A-std (heavy-hitter / skew diagnostics — the salting-decision input for x1/x6)",
)
def x11_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest join/group keys with their share of all rows and
    their skew factor vs a uniform key distribution — the diagnostic that
    decides WHEN the x1/x6 salting strategies are worth their extra pass.
    One key-count aggregate (map-side partials), a broadcast 1-row total,
    and a top-k rank with a pinned (count desc, key asc) tie-break.  The
    top-10 is selected limit-first (``orderBy().limit(10)`` →
    TakeOrderedAndProject, parallel partial top-k) BEFORE the rank window
    runs — a skew diagnostic is exactly the query that meets
    high-cardinality keys, so the selection must never funnel all
    |distinct keys| rows through one reducer."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    t = c.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_keys")
    )
    top = c.orderBy(F.col("n").desc(), F.col("user_id").asc()).limit(10)
    r = top.crossJoin(F.broadcast(t)).withColumn(
        "rk", F.row_number().over(W.orderBy(F.col("n").desc(), F.col("user_id").asc()))
    )
    return r.where(F.col("rk") <= 10).select(
        "user_id",
        F.col("n").alias("n_rows"),
        "rk",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("frac_of_total"),
        F.round(F.col("n").cast("double") * F.col("n_keys") / F.col("total"), 6).alias(
            "skew_vs_uniform"
        ),
    )


@register(
    "x13_train_val_test_split",
    oracle=f"""
    WITH t AS (
        SELECT source,
               CAST(len(string_split({_NORM_DOC}, ' ')) AS INTEGER) AS n_tokens,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
                   AS bucket
        FROM documents
    )
    SELECT source,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM t GROUP BY source, split
    """,
    survey="A-std (deterministic train/val/test split — hash-bucketed 80/10/10, leakage-free)",
)
def x13_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by hashing the document KEY —
    membership is a pure function of doc_id, so the split is identical on
    any engine, any partitioning, and any later re-run over a grown
    corpus (no leakage when new docs arrive: old docs never move).  Same
    hash-mod machinery as x2/x7; reported as per-(source, split) doc and
    token counts — the mix report that ships with a training set."""
    from ..operators.text import token_count

    d = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("source", split.alias("split"), token_count("text").alias("n_tokens"))
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


@register(
    "x16_source_mixture_resample",
    oracle="""
    WITH per AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    tot AS (
        SELECT CAST(sum(n_docs) AS DOUBLE) AS n_total,
               CAST(count(*) AS DOUBLE) AS n_sources
        FROM per
    ),
    p AS (
        SELECT source, n_docs,
               least(1.0, (n_total / n_sources) / n_docs) AS p_keep
        FROM per, tot
    ),
    kept AS (
        SELECT d.source, count(*) AS n_kept
        FROM documents d JOIN p USING (source)
        WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
              < CAST(floor(p.p_keep * 1000000) AS BIGINT)
        GROUP BY d.source
    ),
    tk AS (SELECT CAST(sum(n_kept) AS DOUBLE) AS total_kept FROM kept)
    SELECT p.source,
           CAST(p.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           round(p.p_keep, 6) AS p_keep,
           round(coalesce(k.n_kept, 0) / tk.total_kept, 6) AS achieved_share
    FROM p LEFT JOIN kept k USING (source), tk
    """,
    survey="A-std extended (source-mixture resampling: hash-thresholded downsample to target corpus weights)",
)
def x16_source_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus toward TARGET source weights (uniform here) by
    hash-thresholded downsampling: each over-represented source keeps a
    deterministic md5-bucketed fraction p = min(1, quota/n_s) of its
    documents — the static form of the mixture-weighting step every LLM
    training-data pipeline runs before tokenization.  Output: per-source
    kept counts, keep probability, and the achieved post-sample share.

    The keep decision is a pure expression of (doc_id, p_s): reproducible
    on any engine, partitioning, or day (same property as x2's hash
    sample), so the sampled corpus is stable across reruns — no RNG state,
    no TABLESAMPLE partition dependence.  The per-source stats are two
    tiny aggregates broadcast back onto the scan; the corpus itself
    shuffles zero times."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = per.agg(
        F.sum("n_docs").cast("double").alias("n_total"),
        F.count("*").cast("double").alias("n_sources"),
    )
    p = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.least(
            F.lit(1.0), (F.col("n_total") / F.col("n_sources")) / F.col("n_docs")
        ).alias("p_keep"),
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    kept = (
        d.join(F.broadcast(p.select("source", "p_keep")), "source")
        .where(bucket % 1000000 < F.floor(F.col("p_keep") * 1000000).cast("bigint"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    tk = kept.agg(F.sum("n_kept").cast("double").alias("total_kept"))
    return (
        p.join(kept, "source", "left")
        .crossJoin(F.broadcast(tk))
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.round("p_keep", 6).alias("p_keep"),
            F.round(
                F.coalesce("n_kept", F.lit(0)).cast("double") / F.col("total_kept"), 6
            ).alias("achieved_share"),
        )
    )


@register(
    "a23_weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag,
               l_extendedprice AS price,
               CAST(l_quantity AS DECIMAL(18,2)) AS wt
        FROM lineitem
    ),
    c AS (
        SELECT l_returnflag, price, wt,
               sum(wt) OVER (
                   PARTITION BY l_returnflag ORDER BY price
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cumw,
               sum(wt) OVER (PARTITION BY l_returnflag) AS total_w
        FROM w
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(max(total_w) AS DOUBLE) AS total_weight,
           min(CASE WHEN 2 * cumw >= total_w THEN price END) AS weighted_median_price
    FROM c
    GROUP BY l_returnflag
    """,
    survey="A-std extended (weighted median via exact-decimal cumulative weights, RANGE frame)",
)
def a23_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: cumulative weight
    over a RANGE frame (all price-peers accumulate together, so the
    running total is order-independent within ties), then the smallest
    price whose cumulative weight reaches half the total.  Weights are
    exact decimals — the 2·cumw ≥ W threshold is exact arithmetic, no
    float boundary.

    The weighted form of a14/a21's quantiles (sensor fusion, importance-
    weighted corpus stats).  One shuffle on the group key serves both
    windows and the final aggregate; at 100 TB swap the exact pass for a
    weighted t-digest with the same contract shape as a21."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        dec2("l_quantity").alias("wt"),
    )
    win_cum = (
        W.partitionBy("l_returnflag")
        .orderBy("price")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    win_all = W.partitionBy("l_returnflag")
    c = w.select(
        "l_returnflag",
        "price",
        F.sum("wt").over(win_cum).alias("cumw"),
        F.sum("wt").over(win_all).alias("total_w"),
    )
    return c.groupBy("l_returnflag").agg(
        F.count("*").alias("n_lines"),
        F.max("total_w").cast("double").alias("total_weight"),
        F.min(F.when(2 * F.col("cumw") >= F.col("total_w"), F.col("price"))).alias(
            "weighted_median_price"
        ),
    )


@register(
    "a24_countmin_frequency",
    oracle="""
    WITH per_key AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
    cells AS (
        SELECT user_id, n, r.rw AS row,
               ('0x' || substr(md5(concat(r.rw::VARCHAR, ':', user_id::VARCHAR)), 1, 8))::BIGINT % 256 AS bucket
        FROM per_key CROSS JOIN (SELECT unnest(range(0, 4)) AS rw) r
    ),
    sketch AS (
        SELECT row, bucket, CAST(sum(n) AS BIGINT) AS sn
        FROM cells GROUP BY row, bucket
    ),
    est AS (
        SELECT c.user_id, min(s.sn) AS est_n, min(c.n) AS exact_n
        FROM cells c JOIN sketch s USING (row, bucket)
        GROUP BY c.user_id
    )
    SELECT user_id,
           CAST(est_n AS BIGINT) AS est_n,
           CAST(exact_n AS BIGINT) AS exact_n,
           CAST(est_n - exact_n AS BIGINT) AS overcount
    FROM est
    """,
    survey="A-std extended (mergeable count-min sketch: build/probe as pure aggregates)",
)
def a24_countmin_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation over event user_ids: build a
    4×256 md5-hashed counter grid (fixed size at ANY key cardinality),
    probe every key back (min over its 4 cells), and report the exact
    count + the sketch's overcount alongside.  The overcount is provably
    ≥ 0 row-by-row — the driver-checked invariant — and the grid is
    mergeable cell-wise, the property that lets shards sketch
    independently at 100 TB (asserted in tests/test_operators.py)."""
    from ..operators.sketches import cms_build, cms_probe

    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id")
    exact = ev.groupBy("user_id").agg(F.count("*").cast("bigint").alias("exact_n"))
    est = cms_probe(sketch, exact.select("user_id"), "user_id")
    return est.join(exact, "user_id").select(
        "user_id",
        "est_n",
        "exact_n",
        (F.col("est_n") - F.col("exact_n")).cast("bigint").alias("overcount"),
    )


# x21: sequence packing into fixed context windows.
_CTX_TOKENS = 256


@register(
    "x21_sequence_packing",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id,
               CAST(len(string_split({_NORM_DOC}, ' ')) AS INTEGER) AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS rand_key
        FROM documents
    ),
    c AS (
        SELECT source, doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY rand_key, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before
        FROM t
    ),
    b AS (
        SELECT source, doc_id, n_tokens,
               CAST(cum_before // {_CTX_TOKENS} AS BIGINT) AS bin_id
        FROM c
    )
    SELECT source, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM b GROUP BY source, bin_id
    """,
    survey="A-std extended (sequence packing: docs -> fixed token-budget training bins)",
)
def x21_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assemble documents into fixed-context training
    bins (≈{0} tokens) per source — the assembly step between a sampled
    corpus and an LLM dataloader.  Contiguous-fill packing: docs in a
    deterministic pseudo-random order (md5 of doc key, same discipline as
    x8), bin = floor(tokens-before-this-doc / ctx), so bin assignment is
    a running sum + integer division — two window-free aggregates at 100 TB
    run hierarchically exactly like x8's budget cut, and the packing is
    reproducible on any engine/partitioning.  Output is per-bin occupancy
    (doc count, token sum, first doc), the shape a dataloader manifest
    needs.""".format(_CTX_TOKENS)
    from ..operators.text import token_count

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("rand_key"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("rand_key", "doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    )
    b = c.withColumn(
        "bin_id", F.expr(f"cum_before div {_CTX_TOKENS}").cast("bigint")
    )
    return b.groupBy("source", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


@register(
    "a26_approx_topk",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    ORDER BY n DESC, event_type LIMIT 3
    """,
    survey="A-std extended (approx_top_k heavy-hitter sketch — exact-regime contract vs true top-k)",
)
def a26_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``approx_top_k`` sketch queried in its exact regime:
    with sketch capacity ≫ distinct keys the frequent-items sketch
    degrades gracefully to the true top-k — which is the verifiable
    contract (the same discipline as a18's HLL±5% and a21's quantile
    bounds: an approximate operator earns its place by a checkable
    guarantee, not trust).  At 100 TB cardinalities the same one-pass,
    mergeable sketch keeps O(capacity) state per group where the exact
    x11 heavy-hitters pipeline needs a full key aggregate; the sketch's
    item counts remain exact for any item that never left the sketch.
    Deterministic here: the 5 event types have distinct counts at every
    generated SF (no tie-break ambiguity)."""
    ev = load_table(spark, sf_dir, "events")
    topk = ev.agg(
        F.expr("approx_top_k(event_type, 3)").alias("tk")
    ).select(F.explode("tk").alias("e"))
    return topk.select(
        F.col("e.item").alias("event_type"),
        F.col("e.count").cast("bigint").alias("n"),
    )


@register(
    "a27_regression_aggregates",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
           round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_y
    FROM lineitem GROUP BY l_returnflag
    """,
    survey="A-std extended (OLS regression aggregates: slope/intercept/R2 as one-pass co-moments)",
)
def a27_regression_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit of extendedprice on quantity
    via the SQL-standard ``regr_*`` aggregate family — trend estimation
    as a ONE-PASS aggregate (slope, intercept, R², means), no ML library
    and no second scan.  Like a15/a16, the co-moment state merges under
    partial aggregation (Welford-style), so the plan is identical to a
    `sum`: map-side partials, one shuffle of O(groups) co-moment
    triples, whatever the row count.  Results round to absorb the last
    ulps of accumulation order (both engines use numerically stable
    merges)."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("bigint").alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 4).alias("avg_y"),
    )
