"""Array / map operators (SURVEY.md §2.8 M1-M6).

The reference manipulates JSON arrays with Python loops (addressLines join —
/root/reference/buisness_profile_etl/main.py:443-446; periods→hours map —
main.py:535-546; media scan — main.py:637-645).  Here arrays are first-class
columns and every loop becomes a higher-order function (transform / filter /
exists / aggregate) evaluated inside codegen — no explode unless the
downstream op genuinely needs rows.

The driver tables carry no array columns, so these queries derive one:
``split(text)`` tokens on documents — same shapes the reference works over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dec2
from ..sources import load_table
from . import register

def TOKENS():
    """Token array column: whitespace-split doc text (needs an active session)."""
    return F.split(F.col("text"), " ")


@register(
    "m1_array_join",
    oracle="""
    SELECT doc_id,
           array_to_string(string_split(text, ' ')[1:5], ', ') AS head_tokens,
           array_to_string(string_split(text, ' '), ' ') AS rejoined
    FROM documents
    """,
    survey="M1,F3",
)
def m1_array_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array → delimited string (addressLines → ', '.join — main.py:443-446)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.array_join(F.slice(TOKENS(), 1, 5), ", ").alias("head_tokens"),
        F.array_join(TOKENS(), " ").alias("rejoined"),
    )


@register(
    "m2_entries_to_map_string",
    oracle="""
    WITH c AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY source, lang
    )
    SELECT source,
           array_to_string(
               list(concat(lang, '=', CAST(n AS VARCHAR)) ORDER BY lang), '; '
           ) AS lang_map
    FROM c GROUP BY source
    """,
    survey="M2",
)
def m2_entries_to_map_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-of-entries → keyed map, serialized canonically.

    Mirrors periods→daywise_hours (main.py:535-546): entries become a real
    MapType via map_from_entries (keys unique by construction here — the
    engine-wide LAST_WIN dedup policy covers the reference's dict-overwrite
    case), then the map serializes key-sorted so the oracle hash is stable.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    per_source = counts.groupBy("source").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("lang", "n")))
        ).alias("m")
    )
    serialized = F.array_join(
        F.transform(
            F.map_entries(F.col("m")),
            lambda e: F.concat(e.key, F.lit("="), e.value.cast("string")),
        ),
        "; ",
    )
    return per_source.select("source", serialized.alias("lang_map"))


@register(
    "m3_array_filter_count",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 5)) AS INTEGER) AS long_token_ct,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS token_ct
    FROM documents
    """,
    survey="M3,A5",
)
def m3_array_filter_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size(filter(arr, …)) conditional count (additional_categories_count —
    main.py:548-555; service_count — main.py:646-652)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.filter(TOKENS(), lambda x: F.length(x) > 5)).alias("long_token_ct"),
        F.size(TOKENS()).alias("token_ct"),
    )


@register(
    "m4_array_exists_flag",
    oracle="""
    SELECT doc_id,
           CASE WHEN list_has_any(string_split(text, ' '), ['spark']) THEN 'Yes' ELSE 'No' END AS has_spark,
           CASE WHEN list_has_any(string_split(text, ' '), ['join', 'merge']) THEN 'Yes' ELSE 'No' END AS has_join
    FROM documents
    """,
    survey="M4,A6",
)
def m4_array_exists_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exists(arr, …) → Yes/No flag (has_cover/has_menu — main.py:635-645)."""
    d = load_table(spark, sf_dir, "documents")

    def flag(cond):
        return F.when(cond, "Yes").otherwise("No")

    return d.select(
        "doc_id",
        flag(F.exists(TOKENS(), lambda x: x == "spark")).alias("has_spark"),
        flag(
            F.exists(TOKENS(), lambda x: (x == "join") | (x == "merge"))
        ).alias("has_join"),
    )


@register(
    "m5_explode_token_counts",
    oracle="""
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    """,
    survey="M5,A2",
)
def m5_explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode → grouped count (the datedValues double-explode shape —
    main.py:590-606).  One shuffle; map-side partial counts."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(TOKENS()).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@register(
    "m6_element_access",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS first_token,
           string_split(text, ' ')[-1] AS last_token,
           string_split(text, ' ')[3] AS third_token
    FROM documents
    """,
    survey="M6,F17",
)
def m6_element_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last/indexed element (addresses[0], additionalPhones[0] —
    main.py:499-522).  element_at is 1-based and null-safe like the oracle."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.element_at(TOKENS(), 1).alias("first_token"),
        F.element_at(TOKENS(), -1).alias("last_token"),
        F.element_at(TOKENS(), 3).alias("third_token"),
    )


@register(
    "m7_array_std_surface",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ')[1:10] AS toks FROM documents)
    SELECT doc_id,
           list_aggr(list_sort(list_distinct(toks)), 'string_agg', '|') AS sorted_unique,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_unique,
           list_aggr(list_transform(toks[1:3], x -> upper(x)), 'string_agg', '|') AS head_upper
    FROM t
    """,
    survey="M-std",
)
def m7_array_std_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_distinct / array_sort / transform (standard surface).

    Array outputs are projected through ``array_join(..., '|')`` so every
    column is a hashable scalar — the driver's canonicalizer (and any
    downstream sink) sees plain strings, never engine-specific list types.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.slice(TOKENS(), 1, 10)
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(toks)), "|").alias(
            "sorted_unique"
        ),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.array_join(
            F.transform(F.slice(toks, 1, 3), lambda x: F.upper(x)), "|"
        ).alias("head_upper"),
    )


@register(
    "m8_map_std_surface",
    oracle="""
    SELECT o_orderkey,
           list_aggr(list_sort(map_keys(MAP(['status','priority'],[o_orderstatus,o_orderpriority]))), 'string_agg', '|') AS keys_sorted,
           -- DuckDB map extraction yields a LIST; [1] unwraps to the scalar
           (MAP(['status','priority'],[o_orderstatus,o_orderpriority])['status'])[1] AS status_val,
           CAST(cardinality(MAP(['status','priority'],[o_orderstatus,o_orderpriority])) AS INTEGER) AS n_entries
    FROM orders
    """,
    survey="M-std (MapType surface: create_map / map_keys / element_at / size)",
)
def m8_map_std_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType column surface (the reference's daywise_hours dict —
    SURVEY §2.8 M2 — generalized): build, key-list, lookup, cardinality.
    Map internals never cross engines — every output is projected to
    sortable scalar/array form, which is also the right discipline for
    parquet interop at scale."""
    o = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        F.array_join(F.array_sort(F.map_keys(m)), "|").alias("keys_sorted"),
        F.element_at(m, "status").alias("status_val"),
        F.size(m).alias("n_entries"),
    )


@register(
    "m9_higher_order_fold",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(list_sum(list_transform(qtys, x -> x * x)) AS DOUBLE) AS qty_sq_sum,
           CAST(len(list_filter(qtys, x -> x > 25.0)) AS INTEGER) AS n_big,
           CAST(list_sum(qtys) AS DOUBLE) AS qty_sum
    FROM per_order
    """,
    survey="M-std (higher-order fold: transform → aggregate lambda, filter+size)",
)
def m9_higher_order_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array fold per order: transform (square), aggregate
    (sum-fold), filter+size — all JVM lambda expressions inside codegen,
    zero Python.  The array is sorted first so the fold order (and thus
    any float accumulation) is identical on both engines; quantities are
    integral so the sums are exact."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("qtys")
    )
    return per_order.select(
        "l_orderkey",
        F.aggregate(
            F.transform("qtys", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        ).alias("qty_sq_sum"),
        F.size(F.filter("qtys", lambda x: x > 25.0)).alias("n_big"),
        F.aggregate("qtys", F.lit(0.0), lambda a, x: a + x).alias("qty_sum"),
    )


@register(
    "m10_map_higher_order",
    oracle="""
    WITH m AS (
        SELECT o_orderkey,
               map_entries(MAP(['status', 'priority', 'cust'],
                               [o_orderstatus, o_orderpriority, CAST(o_custkey AS VARCHAR)])) AS ent
        FROM orders WHERE o_orderkey % 40 = 0
    )
    SELECT o_orderkey,
           list_aggr(list_sort(list_transform(
               list_filter(ent, e -> e.value IS NOT NULL AND len(e.value) > 1),
               e -> concat(e.key, '=', upper(e.value)))),
               'string_agg', '|') AS upper_props,
           CAST(len(list_filter(ent, e -> contains(e.value, '1'))) AS INTEGER) AS n_with_one,
           list_aggr(list_sort(list_transform(ent, e -> concat(e.key, ':', CAST(len(e.value) AS VARCHAR)))),
                     'string_agg', '|') AS key_lengths
    FROM m
    """,
    survey="M-std extended (map higher-order functions: map_filter / transform_values / entries projection, driver-hashable)",
)
def m10_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed higher-order surface: build a string map per order, then
    map_filter (predicate over k,v), transform_values (upper), and an
    entries projection (value lengths) — all codegen lambda expressions,
    no Python.  Every map output is projected through sorted
    ``array_join`` scalars (the m8 discipline) so the driver can hash it;
    map iteration order is never relied upon."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 40 == 0)
    m = o.select(
        "o_orderkey",
        F.create_map(
            F.lit("status"), F.col("o_orderstatus"),
            F.lit("priority"), F.col("o_orderpriority"),
            F.lit("cust"), F.col("o_custkey").cast("string"),
        ).alias("props"),
    )
    filtered = F.map_filter(
        "props", lambda k, v: v.isNotNull() & (F.length(v) > 1)
    )
    uppered = F.transform_values(filtered, lambda k, v: F.upper(v))
    return m.select(
        "o_orderkey",
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(uppered),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"]),
                )
            ),
            "|",
        ).alias("upper_props"),
        F.size(F.map_filter("props", lambda k, v: v.contains("1")))
        .cast("int")
        .alias("n_with_one"),
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries("props"),
                    lambda e: F.concat(
                        e["key"], F.lit(":"), F.length(e["value"]).cast("string")
                    ),
                )
            ),
            "|",
        ).alias("key_lengths"),
    )


@register(
    "m11_struct_field_surgery",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           round(CAST(o_totalprice AS DECIMAL(18,2)) * 0.9, 2)::DOUBLE AS discounted,
           upper(o_orderpriority) AS priority,
           CAST(NULL AS VARCHAR) IS NULL AS clerk_dropped
    FROM orders WHERE o_orderkey % 25 = 0
    """,
    survey="M-std extended (struct field surgery: withField/dropFields on nested rows without rebuild)",
)
def m11_struct_field_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-row evolution without rebuilding the struct: pack order
    attributes into one struct column, then ``withField`` (add a
    computed discount, uppercase an existing field IN PLACE) and
    ``dropFields`` (remove one) — the Column API that makes schema
    surgery on deeply nested 100 TB data a projection instead of an
    explode/rebuild round trip.  Output is flattened to scalars for the
    driver hash; the oracle computes the same post-surgery fields
    relationally."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 25 == 0)
    packed = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            dec2("o_totalprice").alias("price"),
            F.col("o_orderpriority").alias("priority"),
            F.lit("clerk#000").alias("clerk"),
        ).alias("rec"),
    )
    surgered = packed.withColumn(
        "rec",
        F.col("rec")
        .withField(
            "discounted",
            F.round(
                F.col("rec.price") * F.expr("CAST(0.9 AS DECIMAL(1,1))"), 2
            ).cast("double"),
        )
        .withField("priority", F.upper(F.col("rec.priority")))
        .dropFields("clerk", "price"),
    )
    return surgered.select(
        "o_orderkey",
        F.col("rec.status").alias("status"),
        F.col("rec.discounted").alias("discounted"),
        F.col("rec.priority").alias("priority"),
        F.lit(True).alias("clerk_dropped"),
    )
