"""Snapshot-maintenance ETL operators (SURVEY.md §2.1 S11-S13 extended).

The reference's whole reason to exist is daily snapshot refresh: re-dump
the full table, rename old blobs, CREATE OR REPLACE the warehouse copy
(Gonukkad_Merchants.py:79-178).  A Spark-first engine does snapshot
maintenance RELATIONALLY: diff two snapshots to see what changed (CDC),
merge updates key-wise instead of rewriting history (SCD1 upsert), and
profile the result before publishing.  All three are pure DataFrame plans
— one shuffle each, no driver materialization — and each is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dec2
from ..sources import load_table
from . import fragment, register

_CUT = "1998-01-01"


@register(
    "x3_snapshot_diff",
    oracle=f"""
    WITH prev AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderdate < TIMESTAMP '{_CUT} 00:00:00'
    ),
    curr AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
    SELECT CASE WHEN p.o_orderkey IS NULL THEN 'added'
                WHEN c.o_orderkey IS NULL THEN 'deleted'
                WHEN p.o_orderstatus <> c.o_orderstatus
                     OR p.o_totalprice <> c.o_totalprice THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           CAST(count(*) AS BIGINT) AS n
    FROM prev p FULL OUTER JOIN curr c ON p.o_orderkey = c.o_orderkey
    GROUP BY 1
    """,
    survey="S11,S12 extended (snapshot diff / CDC: full outer join keyed change classification)",
)
def x3_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two snapshot versions: full outer join
    on the key, classify added/deleted/changed/unchanged.  This replaces
    the reference's re-dump-everything daily refresh with an incremental
    view of what actually moved — at 100 TB the diff shuffles once on the
    key and the downstream write touches only changed partitions."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    prev = o.where(F.col("o_orderdate") < F.lit(_CUT).cast("timestamp_ntz")).select(
        *[F.col(c).alias(f"p_{c}") for c in cols]
    )
    curr = o.select(*[F.col(c).alias(f"c_{c}") for c in cols])
    j = prev.join(
        curr, prev["p_o_orderkey"] == curr["c_o_orderkey"], "full_outer"
    )
    change = (
        F.when(F.col("p_o_orderkey").isNull(), "added")
        .when(F.col("c_o_orderkey").isNull(), "deleted")
        .when(
            (F.col("p_o_orderstatus") != F.col("c_o_orderstatus"))
            | (F.col("p_o_totalprice") != F.col("c_o_totalprice")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return j.groupBy(change.alias("change_type")).agg(F.count("*").alias("n"))


@register(
    "x4_merge_upsert",
    oracle="""
    WITH unioned AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS src FROM orders
        UNION ALL
        SELECT o_orderkey, 'X' AS o_orderstatus,
               CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE) AS o_totalprice,
               1 AS src
        FROM orders WHERE o_orderkey % 10 = 0
    ),
    latest AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY src DESC) AS rn
        FROM unioned
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
    FROM latest WHERE rn = 1
    GROUP BY o_orderstatus
    """,
    survey="S13 extended (SCD1 merge/upsert: union + latest-wins window, no read-modify-write)",
)
def x4_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert without a transactional table format: union base
    with updates, keep the highest-precedence row per key via one window.
    The reference's K/V state file (main.py:20-50) does exactly this for
    one key; here it's the general keyed merge — one shuffle on the key,
    and at 100 TB the same plan IS how Delta/Iceberg implement MERGE
    under the hood (minus their transaction log).  Updates here are a
    deterministic synthetic 10% slice with status 'X'."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit(0).alias("src")
    )
    updates = (
        o.where(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            # 1.1× in exact DECIMAL, not binary double: the product of a
            # 2-dp decimal and 1.1 is exact at 3 dp, so the round to 2 dp is
            # the same HALF_UP everywhere — no engine-dependent half-even
            # boundary (the v9 micro-unit discipline).
            F.round(
                dec2("o_totalprice") * F.expr("CAST(1.1 AS DECIMAL(2,1))"), 2
            )
            .cast("double")
            .alias("o_totalprice"),
            F.lit(1).alias("src"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("o_orderkey").orderBy(F.col("src").desc())
    merged = (
        base.unionByName(updates)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(dec2("o_totalprice")).cast("double").alias("price_sum"),
    )


@register(
    "x5_profile_columns",
    oracle="""
    SELECT 'o_orderstatus' AS column_name,
           CAST(count(o_orderstatus) AS BIGINT) AS n_notnull,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
           min(o_orderstatus) AS min_val, max(o_orderstatus) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(o_orderpriority) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
    survey="A9 extended (pre-publish column profiling via unpivot — one scan, all columns)",
)
def x5_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile (null/distinct/min/max per column) computed in
    ONE scan: unpivot the string columns to (column_name, value) rows,
    then a single grouped aggregate.  The oracle's UNION ALL of per-column
    scans is the naive form — at 100 TB the unpivot form reads the table
    once instead of once per column."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderstatus", "o_orderpriority"]
    long = o.unpivot(
        ids=[], values=cols, variableColumnName="column_name", valueColumnName="value"
    )
    return long.groupBy("column_name").agg(
        F.count("value").alias("n_notnull"),
        F.countDistinct("value").alias("n_distinct"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
    )


@register(
    "x9_scd2_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type AS status, ts AS valid_from, event_id
        FROM ordered
        WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, status, valid_from,
           lead(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from, event_id
           ) AS valid_to,
           CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY valid_from, event_id
           ) AS INTEGER) AS version_n,
           lead(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from, event_id
           ) IS NULL AS is_current
    FROM changes
    """,
    survey="A-std (SCD type-2 dimension build: change-log → validity intervals)",
)
def x9_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change log: collapse
    each user's event stream into status VERSIONS — a row per change with
    `[valid_from, valid_to)` validity, version number, and is_current flag.
    The warehouse-history operator the reference's daily full snapshots
    (SURVEY.md §2.1 S11/S12) approximate by rewriting everything.

    Two windows over the SAME (user_id → ts, event_id) sort: the
    change-detection lag and the interval-closing lead reuse one shuffle +
    one sort (Catalyst collapses same-spec windows), and at 100 TB the
    partition key is the entity id so state never crosses executors.
    Ordering ties are pinned by event_id."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w_in = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w_in))
        .where(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select(
            "user_id",
            F.col("event_type").alias("status"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    w_out = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "status",
        "valid_from",
        F.lead("valid_from").over(w_out).alias("valid_to"),
        F.row_number().over(w_out).alias("version_n"),
        F.lead("valid_from").over(w_out).isNull().alias("is_current"),
    )


@register(
    "x12_malformed_json_quarantine",
    oracle="""
    WITH raw AS (
        SELECT event_id, event_type,
               CASE WHEN event_id % 10 = 0
                    THEN substr(props, 1, length(props) - 1)
                    ELSE props END AS payload
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN json_valid(payload) THEN 0 ELSE 1 END) AS BIGINT) AS n_quarantined,
           CAST(sum(CASE WHEN json_valid(payload)
                         THEN CAST(payload ->> 'k' AS INTEGER) END) AS BIGINT) AS k_sum_good
    FROM raw
    GROUP BY event_type
    """,
    survey="A-std (malformed-record quarantine: PERMISSIVE parse + dead-letter accounting)",
)
def x12_malformed_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter accounting for semi-structured ingest: parse a JSON
    payload PERMISSIVEly (every 10th row is deterministically truncated to
    simulate upstream corruption), count quarantined rows per group, and
    aggregate only the cleanly-parsed values.  The pattern the reference's
    swallow-errors-and-print scans (SURVEY.md §5) should have been: bad
    records are COUNTED and excluded, never silently dropped or fatal.

    `from_json` in PERMISSIVE mode yields a struct of NULL fields for
    unparseable input (every valid payload carries `k`, so `k IS NULL` is
    the quarantine predicate), and the whole pass is one scan + one
    aggregate — no Python, no second parse."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    payload = F.when(
        F.col("event_id") % 10 == 0,
        F.expr("substr(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    parsed = F.from_json(payload, "k int")
    return (
        ev.select("event_type", parsed.alias("p"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("p.k").isNull(), 1).otherwise(0)).alias(
                "n_quarantined"
            ),
            F.sum(F.col("p.k")).cast("bigint").alias("k_sum_good"),
        )
    )


@register(
    "x14_incremental_agg_maintenance",
    oracle=f"""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1998-02-01 00:00:00'
    GROUP BY o_custkey
    """,
    survey="S12,S13 extended (incremental aggregate maintenance: base + delta merge == full recompute)",
)
def x14_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a per-customer revenue aggregate: the
    pre-existing BASE aggregate (orders before the cutoff) is merged with
    the new day's DELTA aggregate (one month of arrivals) via a keyed
    full-outer coalesce — WITHOUT rescanning history.  The oracle is the
    full recompute over the union window, which is exactly the correctness
    statement of incremental view maintenance.

    This is the scale-out replacement for the reference's daily
    CREATE-OR-REPLACE full refresh (Gonukkad_Merchants.py:162-178): at
    100 TB the base aggregate is a stored table ~1000× smaller than the
    fact history, the delta scan touches only the new partition, and the
    merge shuffles only the aggregate keys.  Sums are DECIMAL(18,2) so
    base+delta addition is exact — merged output is bit-equal to the
    recompute on any partitioning."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp_ntz")
    upper = F.lit("1998-02-01").cast("timestamp_ntz")
    base = (
        o.where(F.col("o_orderdate") < cut)
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n0"),
            F.sum(dec2("o_totalprice")).alias("s0"),
        )
    )
    delta = (
        o.where((F.col("o_orderdate") >= cut) & (F.col("o_orderdate") < upper))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n1"),
            F.sum(dec2("o_totalprice")).alias("s1"),
        )
    )
    zero = F.lit(0).cast("decimal(28,2)")
    return base.join(delta, "o_custkey", "full_outer").select(
        "o_custkey",
        (F.coalesce("n0", F.lit(0)) + F.coalesce("n1", F.lit(0))).alias("n_orders"),
        (F.coalesce(F.col("s0").cast("decimal(28,2)"), zero)
         + F.coalesce(F.col("s1").cast("decimal(28,2)"), zero))
        .cast("double")
        .alias("revenue"),
    )


# The FK edges of the testdata star schema: (child, fk, parent, pk).
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


@register(
    "x15_fk_orphan_audit",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{child}' AS child_table, '{fk}' AS fk_column,
           CAST(count(*) AS BIGINT) AS n_child_rows,
           CAST(sum(CASE WHEN c.{fk} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_fk,
           CAST(sum(CASE WHEN c.{fk} IS NOT NULL AND p.{pk} IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
    FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk}
    """
        for child, fk, parent, pk in _FK_EDGES
    ),
    survey="A9 extended (referential-integrity audit: per-FK-edge orphan accounting)",
)
def x15_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge of the star schema:
    one row per edge with child cardinality, NULL-FK count, and orphan
    count (non-null FK with no parent).  The generalization of the
    reference's row-count reconciliation gate (A9, main.py:717-741) from
    'same number of rows' to 'every pointer resolves'.

    Each edge is a LEFT join to the parent's key projection: dimension
    parents broadcast, and the two fact-to-fact edges (lineitem→orders,
    orders→customer) shuffle only (key, key) pairs — at 100 TB each edge
    is one key-projected shuffle, and AQE picks broadcast vs sort-merge
    per edge.  NULL FKs are counted separately, not as orphans (SQL RI
    semantics: NULL can't dangle)."""
    out = None
    for child, fk, parent, pk in _FK_EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(fk))
        p = load_table(spark, sf_dir, parent).select(
            F.col(pk).alias("__pk"), F.lit(True).alias("__hit")
        )
        audit = (
            c.join(p, c[fk] == F.col("__pk"), "left")
            .agg(
                F.count("*").alias("n_child_rows"),
                F.sum(F.when(F.col(fk).isNull(), 1).otherwise(0)).alias("n_null_fk"),
                F.sum(
                    F.when(F.col(fk).isNotNull() & F.col("__hit").isNull(), 1).otherwise(0)
                ).alias("n_orphans"),
            )
            .select(
                F.lit(child).alias("child_table"),
                F.lit(fk).alias("fk_column"),
                "n_child_rows",
                "n_null_fk",
                "n_orphans",
            )
        )
        out = audit if out is None else out.unionByName(audit)
    return out


@register(
    "x17_expectations_suite",
    oracle="""
    WITH u AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_keys
        FROM orders
    )
    SELECT 'o_orderkey_not_null' AS rule,
           CAST(count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT) AS n_violations,
           count(CASE WHEN o_orderkey IS NULL THEN 1 END) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'o_orderkey_unique', dup_keys, dup_keys = 0 FROM u
    UNION ALL
    SELECT 'o_totalprice_positive',
           CAST(count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT),
           count(CASE WHEN o_totalprice <= 0 THEN 1 END) = 0
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus_in_domain',
           CAST(count(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END) AS BIGINT),
           count(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END) = 0
    FROM orders
    UNION ALL
    SELECT 'o_orderdate_in_range',
           CAST(count(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
                             OR o_orderdate > TIMESTAMP '2030-01-01 00:00:00'
                           THEN 1 END) AS BIGINT),
           count(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
                        OR o_orderdate > TIMESTAMP '2030-01-01 00:00:00'
                      THEN 1 END) = 0
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority_pattern',
           CAST(count(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
                           THEN 1 END) AS BIGINT),
           count(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
                      THEN 1 END) = 0
    FROM orders
    """,
    survey="A9 extended (declarative expectations suite: completeness/uniqueness/range/domain/pattern rules, one scan)",
)
def x17_expectations_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations evaluated pre-publish — the
    Deequ/Great-Expectations shape: completeness (not-null), uniqueness,
    range, domain membership, and regex pattern rules, each reported as
    (rule, violation count, pass verdict).  This is what the reference's
    single row-count gate (A9, main.py:717-741) grows into when "same
    cardinality" isn't enough to protect the warehouse.

    ONE scan computes every per-row rule as conditional-count aggregates
    (map-side combined, merged into one tiny result); uniqueness is the
    only rule that shuffles (count distinct on the key).  At 100 TB the
    rule set is a config table, and the violation counts land in the
    run-metrics store (S13) for trend alerting."""
    o = load_table(spark, sf_dir, "orders")

    def rule(name: str, viol) -> DataFrame:
        n = F.sum(F.when(viol, 1).otherwise(0)).cast("bigint")
        return o.agg(
            n.alias("n_violations")
        ).select(
            F.lit(name).alias("rule"),
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )

    uniq = o.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).cast("bigint").alias(
            "n_violations"
        )
    ).select(
        F.lit("o_orderkey_unique").alias("rule"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
    rules = [
        rule("o_orderkey_not_null", F.col("o_orderkey").isNull()),
        uniq,
        rule("o_totalprice_positive", F.col("o_totalprice") <= 0),
        rule(
            "o_orderstatus_in_domain",
            ~F.col("o_orderstatus").isin("O", "F", "P"),
        ),
        rule(
            "o_orderdate_in_range",
            (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp_ntz"))
            | (F.col("o_orderdate") > F.lit("2030-01-01").cast("timestamp_ntz")),
        ),
        rule(
            "o_orderpriority_pattern",
            ~F.col("o_orderpriority").rlike("^[1-5]-"),
        ),
    ]
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out


@register(
    "x18_bucketed_colocated_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    survey="J4 extended (bucketed storage: co-located fact-dim join, zero join-side exchange)",
)
def x18_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recurring-join amortization: both tables are written bucketed on the
    join key (the one-time shuffle), then joined as catalog tables — the
    scans expose their on-disk hash partitioning, so the sort-merge join
    plan has NO Exchange and (with sortBy) no Sort on either side
    (asserted in tests/test_plans.py).  At 100 TB this converts every
    nightly fact-dim join from a full shuffle into a local merge; the only
    exchange left in this query is the final small groupBy.  The merge
    hint forces the bucketed path even where the dim would broadcast."""
    import tempfile
    import uuid

    from ..sinks import write_bucketed

    tag = uuid.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"x18_{tag}_")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    )
    write_bucketed(o, f"x18_orders_{tag}", ["o_custkey"], 8, path=f"{base}/o")
    write_bucketed(c, f"x18_cust_{tag}", ["o_custkey"], 8, path=f"{base}/c")
    # the merge hint goes on a join INPUT (a post-join .hint() is a no-op);
    # it forces the bucketed sort-merge path even where the dim would
    # broadcast, which is what makes the zero-exchange plan assertable.
    j = (
        spark.table(f"x18_orders_{tag}")
        .hint("merge")
        .join(spark.table(f"x18_cust_{tag}"), on=["o_custkey"])
    )
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.sum(dec2("o_totalprice")).cast("double").alias("price_sum"),
    )


@register(
    "x19_targeted_delete",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events WHERE user_id NOT IN (3, 7)
    GROUP BY event_type
    """,
    survey="S11 extended (right-to-be-forgotten: key-level delete rewriting only affected partitions)",
)
def x19_targeted_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-level delete over a date-partitioned copy of the events table:
    find the partitions containing the doomed user_ids (metadata-scale),
    rewrite ONLY those through an anti-filter under dynamic partition
    overwrite, then aggregate the surviving dataset.  The oracle is the
    logical delete (NOT IN) over the original data — a green row proves
    the physical partition surgery equals the logical semantics.  The
    untouched-partitions-not-rewritten property is asserted file-level in
    tests/test_pipelines.py."""
    import tempfile

    from ..sinks import targeted_delete

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ds", F.date_format("ts", "yyyy-MM-dd")
    )
    base = tempfile.mkdtemp(prefix="x19_del_")
    ev.write.mode("overwrite").partitionBy("ds").parquet(base)
    targeted_delete(spark, base, part_col="ds", key_col="user_id", keys=[3, 7])
    back = spark.read.parquet(base)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@register(
    "x22_drift_psi",
    oracle=f"""
    WITH prev AS (
        SELECT o_orderpriority AS cat, count(*) AS n FROM orders
        WHERE o_orderdate < TIMESTAMP '{_CUT} 00:00:00'
        GROUP BY o_orderpriority
    ),
    curr AS (
        SELECT o_orderpriority AS cat, count(*) AS n FROM orders
        GROUP BY o_orderpriority
    ),
    tot AS (
        SELECT (SELECT sum(n) FROM prev) AS np, (SELECT sum(n) FROM curr) AS nc
    )
    SELECT p.cat,
           round(CAST(p.n AS DOUBLE) / tot.np, 6) AS p_prev,
           round(CAST(c.n AS DOUBLE) / tot.nc, 6) AS p_curr,
           round(
               (CAST(p.n AS DOUBLE) / tot.np - CAST(c.n AS DOUBLE) / tot.nc)
               * ln((CAST(p.n AS DOUBLE) / tot.np) / (CAST(c.n AS DOUBLE) / tot.nc)),
               6
           ) AS psi_contrib
    FROM prev p JOIN curr c USING (cat) CROSS JOIN tot
    """,
    survey="A9 extended (distribution drift between snapshots: per-category PSI contributions)",
)
def x22_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability drift between two snapshot versions: per
    category, the PSI contribution (Δshare · ln(share ratio)) comparing
    the pre-cutoff snapshot against current — the publish-gate input that
    catches silent upstream distribution shifts (a9 catches row-count
    loss; this catches mix change at constant counts).

    Determinism: output is PER-CATEGORY rows (no cross-category float
    sum, so no accumulation-order hazard); shares and contributions are
    rounded at 6 dp on both engines.  Scale shape: two key-count
    aggregates (map-side partials) + a broadcast 1-row totals join —
    shuffle volume is |categories|, not |rows|."""
    o = load_table(spark, sf_dir, "orders")
    prev = (
        o.where(F.col("o_orderdate") < F.lit(_CUT).cast("timestamp_ntz"))
        .groupBy(F.col("o_orderpriority").alias("cat"))
        .agg(F.count("*").alias("np_cat"))
    )
    curr = o.groupBy(F.col("o_orderpriority").alias("cat")).agg(
        F.count("*").alias("nc_cat")
    )
    tot = prev.agg(F.sum("np_cat").alias("np")).crossJoin(
        curr.agg(F.sum("nc_cat").alias("nc"))
    )
    j = prev.join(curr, "cat").crossJoin(F.broadcast(tot))
    p_prev = F.col("np_cat").cast("double") / F.col("np")
    p_curr = F.col("nc_cat").cast("double") / F.col("nc")
    return j.select(
        "cat",
        F.round(p_prev, 6).alias("p_prev"),
        F.round(p_curr, 6).alias("p_curr"),
        F.round((p_prev - p_curr) * F.log(p_prev / p_curr), 6).alias(
            "psi_contrib"
        ),
    )


@register(
    "x23_dataset_manifest",
    oracle="""
    SELECT 'region' AS table_name, CAST(count(*) AS BIGINT) AS n_rows FROM region
    UNION ALL SELECT 'nation', CAST(count(*) AS BIGINT) FROM nation
    UNION ALL SELECT 'customer', CAST(count(*) AS BIGINT) FROM customer
    UNION ALL SELECT 'supplier', CAST(count(*) AS BIGINT) FROM supplier
    UNION ALL SELECT 'part', CAST(count(*) AS BIGINT) FROM part
    UNION ALL SELECT 'orders', CAST(count(*) AS BIGINT) FROM orders
    UNION ALL SELECT 'lineitem', CAST(count(*) AS BIGINT) FROM lineitem
    UNION ALL SELECT 'events', CAST(count(*) AS BIGINT) FROM events
    UNION ALL SELECT 'documents', CAST(count(*) AS BIGINT) FROM documents
    UNION ALL SELECT 'embeddings', CAST(count(*) AS BIGINT) FROM embeddings
    """,
    survey="S1-S3 extended (dataset manifest: registry-wide health check, one count per table)",
)
def x23_dataset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog health-check over the ENTIRE table registry: one row per
    registered table with its row count — the freshness/completeness
    manifest a pipeline publishes alongside its outputs (and the only
    query that touches every source).  Each count is a metadata-cheap
    aggregate (parquet row-group stats make count(*) scan-free); the
    union is 10 one-row frames."""
    from ..sources import TABLES

    out = None
    for t in TABLES:
        c = (
            load_table(spark, sf_dir, t)
            .agg(F.count("*").cast("bigint").alias("n_rows"))
            .select(F.lit(t).alias("table_name"), "n_rows")
        )
        out = c if out is None else out.unionByName(c)
    return out


@register(
    "x25_backfill_planner",
    oracle="""
    WITH present AS (
        SELECT DISTINCT CAST(ts AS DATE) AS ds FROM events
        WHERE day(CAST(ts AS DATE)) % 7 <> 0
    ),
    bounds AS (
        SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events
    ),
    calendar AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS ds
        FROM bounds
    )
    SELECT strftime(ds, '%Y-%m-%d') AS missing_ds
    FROM calendar
    WHERE ds NOT IN (SELECT ds FROM present)
    """,
    survey="S11 extended (backfill planner: calendar anti-join over partition values)",
)
def x25_backfill_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill planning: which dates inside the dataset's own [min, max]
    span have no partition?  (Days divisible by 7 are masked out of the
    'present' set here to simulate failed daily runs.)  Calendar =
    ``sequence(min, max)`` exploded — generated, never scanned — and the
    gap list is a left-anti join against DISTINCT partition values, so
    the whole plan is metadata-scale: |days| rows on both sides no matter
    how many rows the partitions hold.  Feeding the output back through
    the snapshot pipeline is the reference's manual 'rerun yesterday'
    loop made declarative."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("ds")
    )
    present = ev.where(F.dayofmonth("ds") % 7 != 0).distinct()
    bounds = ev.agg(F.min("ds").alias("lo"), F.max("ds").alias("hi"))
    calendar = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("ds")
    )
    missing = calendar.join(present, "ds", "left_anti")
    return missing.select(F.date_format("ds", "yyyy-MM-dd").alias("missing_ds"))


@register(
    "x30_partition_skew_report",
    oracle="""
    WITH p AS (
        SELECT ('0x' || substr(md5(concat('7:', l_orderkey::VARCHAR)), 1, 8))::BIGINT % 32
                   AS part,
               l_orderkey
        FROM lineitem
    ),
    c AS (
        SELECT part, count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_keys
        FROM p GROUP BY part
    )
    SELECT CAST(part AS BIGINT) AS part,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_keys AS BIGINT) AS n_keys,
           round(n_rows / (avg(n_rows) OVER ()), 6) AS load_factor
    FROM c
    """,
    survey="NS-ops (shuffle-partition skew observability: per-partition load under the model partitioner)",
)
def x30_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-partition load report for a join/agg key: bucket lineitem by
    a 32-way model hash partitioner (md5-derived so the oracle reproduces
    it; Spark's real partitioner is murmur3 — same distributional shape),
    and report per-partition row count, distinct-key count, and load
    factor vs the mean.  This is the observability query behind the skew
    decisions the engine makes elsewhere — a load_factor ≫ 1 partition is
    what x1/x6 salting and AQE skew-join split; at 100 TB you run this on
    a sample BEFORE committing a partitioning scheme to a 1000-executor
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    from ..operators.dedup import h32
    from pyspark.sql import Window as W

    part = (h32(F.col("l_orderkey").cast("string"), 7) % 32).alias("part")
    c = li.select(part, "l_orderkey").groupBy("part").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_keys"),
    )
    return c.select(
        F.col("part").cast("bigint").alias("part"),
        "n_rows",
        "n_keys",
        F.round(
            F.col("n_rows") / F.avg("n_rows").over(W.partitionBy()), 6
        ).alias("load_factor"),
    )


@register(
    "x36_write_sizing_planner",
    oracle="""
    WITH rows_sized AS (
        SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
               octet_length(CAST(concat_ws('|',
                   o_orderkey::VARCHAR, o_custkey::VARCHAR, o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(18,2))::VARCHAR,
                   CAST(o_orderdate AS DATE)::VARCHAR, o_orderpriority) AS BLOB)) AS nbytes
        FROM orders
    )
    SELECT ym,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(nbytes) AS BIGINT) AS est_bytes,
           CAST(greatest(1, ceil(sum(nbytes) / 65536.0)) AS BIGINT) AS target_files
    FROM rows_sized GROUP BY ym
    """,
    survey="S11 extended (write sizing planner: per-partition target file count from estimated bytes)",
)
def x36_write_sizing_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The small-files problem, prevented instead of cured: before a
    partitioned write, estimate each partition's serialized size (exact
    canonical byte length per row — a cheap aggregate) and derive the
    repartition count that lands ~64 KiB files (64-128 MiB in
    production).  Feeding ``target_files`` into a per-partition
    ``repartition(n)`` (or rebalance hint) keeps every output file in
    the scanner's sweet spot, so the compaction pass (x19's sibling
    `compact_partitions`) becomes a rare repair, not a scheduled tax.
    One aggregate over the canonical projection — the same single-pass
    shape as x23's manifest."""
    o = load_table(spark, sf_dir, "orders")
    nbytes = F.octet_length(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            dec2("o_totalprice").cast("string"),
            F.col("o_orderdate").cast("date").cast("string"),
            F.col("o_orderpriority"),
        )
    )
    return (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            nbytes.alias("nbytes"),
        )
        .groupBy("ym")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("nbytes").cast("bigint").alias("est_bytes"),
            F.greatest(
                F.lit(1), F.ceil(F.sum("nbytes") / 65536.0)
            )
            .cast("bigint")
            .alias("target_files"),
        )
    )


@register(
    "x37_cdc_apply",
    oracle="""
    WITH log AS (
        SELECT o_custkey AS key,
               o_orderkey AS seq,
               CASE o_orderkey % 10 WHEN 0 THEN 'D' WHEN 1 THEN 'I' ELSE 'U' END AS op,
               CAST(o_totalprice AS DECIMAL(18,2)) AS val
        FROM orders
    ),
    latest AS (
        SELECT key, seq, op, val,
               row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
        FROM log
    )
    SELECT key AS c_custkey,
           CAST(seq AS BIGINT) AS last_seq,
           op AS last_op,
           CAST(val AS DOUBLE) AS last_val
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
    survey="S13/x4 extended (CDC ops-log replay: ordered I/U/D stream to final table state)",
)
def x37_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply — the Debezium-shaped primitive underneath every
    replicated table: an ordered change log of Insert/Update/Delete ops
    per key (synthesized deterministically from orders; seq = the change
    LSN) collapses to final state by LAST-WINS per key, with a trailing
    Delete erasing the key entirely.  x4's MERGE applies one delta batch;
    this replays an arbitrary-length history in ONE windowed pass — the
    bulk-backfill path when a replica bootstraps from the full log.  At
    100 TB the window rides a single hash shuffle on the key, and the
    same plan incrementalizes per batch (each micro-batch's last-wins
    merges associatively with stored state — st10's snapshot mechanics).
    Exact decimal values; deterministic seq ordering."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    log = o.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 10 == 0, "D")
        .when(F.col("o_orderkey") % 10 == 1, "I")
        .otherwise("U")
        .alias("op"),
        dec2("o_totalprice").alias("val"),
    )
    w = W.partitionBy("key").orderBy(F.col("seq").desc())
    latest = log.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return latest.where(F.col("op") != "D").select(
        F.col("key").alias("c_custkey"),
        F.col("seq").cast("bigint").alias("last_seq"),
        F.col("op").alias("last_op"),
        F.col("val").cast("double").alias("last_val"),
    )


# -- plan-audit fragments (VERDICT r4 #3) ------------------------------------


@fragment("x18_bucketed_colocated_join")
def _frag_x18(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same merge-hint sort-merge join + rollup, on the unbucketed loads
    # (the bucketed zero-exchange property itself is plan-asserted by the
    # dedicated test that reads the written tables)
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        o.hint("merge")
        .join(c, on=["o_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec2("o_totalprice")).cast("double").alias("price_sum"),
        )
    )


@fragment("x19_targeted_delete")
def _frag_x19(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the delete's two lazy plans fused: partition-find is a metadata-scale
    # distinct, the rewrite is this anti-filter; the post-delete aggregate
    # is what the query returns
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ds", F.date_format("ts", "yyyy-MM-dd")
    )
    kept = ev.where(~F.col("user_id").isin(3, 7))
    return kept.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
