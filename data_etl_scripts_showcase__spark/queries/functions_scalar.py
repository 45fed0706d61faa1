"""Scalar function surface (SURVEY.md §2.7 F1-F17).

Every scalar the reference hand-rolls in Python — strip/isdigit/join/
replace/round/strptime/parse_qs/json access — as JVM-side Column
expressions inside whole-stage codegen.  No Python runs per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import register


@register(
    "f_string_functions",
    oracle="""
    SELECT
        p_partkey,
        trim(p_name) AS name_trim,
        upper(p_brand) AS brand_upper,
        replace(p_name, ' ', '_') AS name_snake,
        concat(p_type, ':', p_brand) AS type_brand,
        concat_ws('|', p_name, p_type) AS name_type,
        substr(p_name, 1, 3) AS name_prefix,
        CAST(length(p_name) AS INTEGER) AS name_len,
        contains(p_name, 'gear') AS is_gear,
        regexp_extract(p_brand, '#([0-9]+)$', 1) AS brand_num
    FROM part
    """,
    survey="F1,F3,F4,F5,F6,F2",
)
def f_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trim / replace / concat / concat_ws / substring / length / contains / regexp
    (main.py:446-454 address building; Gonukkad_Merchants.py:153 .replace)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.trim("p_name").alias("name_trim"),
        F.upper("p_brand").alias("brand_upper"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.concat(F.col("p_type"), F.lit(":"), F.col("p_brand")).alias("type_brand"),
        F.concat_ws("|", "p_name", "p_type").alias("name_type"),
        F.substring("p_name", 1, 3).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.col("p_name").contains("gear").alias("is_gear"),
        F.regexp_extract("p_brand", r"#([0-9]+)$", 1).alias("brand_num"),
    )


@register(
    "f_date_functions",
    oracle="""
    SELECT
        o_orderkey,
        strftime(o_orderdate, '%Y-%m-%d') AS order_ds,
        strftime(o_orderdate - INTERVAL 7 DAY, '%Y-%m-%d') AS week_before,
        CAST(date_part('year', o_orderdate) AS INTEGER) AS order_year,
        CAST(date_part('month', o_orderdate) AS INTEGER) AS order_month,
        CAST(date_part('day', o_orderdate) AS INTEGER) AS order_day,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_epoch95,
        strftime(make_date(CAST(date_part('year', o_orderdate) AS INTEGER), 1, 1), '%Y-%m-%d') AS year_start
    FROM orders
    """,
    survey="F11,F12,F14",
)
def f_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date arithmetic / formatting / component extraction / make_date
    (Gonukkad_Merchants.py:79-84 yesterday-stamps; main.py:159 D-7 window;
    main.py:670-671 {y,m,d} struct → date)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_ds"),
        F.date_format(F.date_sub(F.col("o_orderdate").cast("date"), 7), "yyyy-MM-dd").alias(
            "week_before"
        ),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch95"
        ),
        F.date_format(
            F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1)), "yyyy-MM-dd"
        ).alias("year_start"),
    )


@register(
    "f_timestamp_roundtrip",
    oracle="""
    SELECT
        event_id,
        strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS iso_ts,
        CAST(strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ'), '%Y-%m-%dT%H:%M:%S.%fZ') AS TIMESTAMP) AS parsed_back,
        strftime(ts, '%Y-%m-%d') AS event_date,
        date_trunc('hour', ts) AS event_hour
    FROM events
    """,
    survey="F13",
)
def f_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 format → strptime parse-back → date truncation
    (main.py:661,672: strptime '%Y-%m-%dT%H:%M:%S.%fZ' then .date())."""
    ev = load_table(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    return ev.select(
        "event_id",
        iso.alias("iso_ts"),
        F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
        .cast("timestamp_ntz")
        .alias("parsed_back"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("event_hour"),
    )


@register(
    "f_url_parse",
    oracle="""
    WITH urls AS (
        SELECT event_id,
               concat('https://api.example.com/v1/metrics?user=', CAST(user_id AS VARCHAR),
                      '&type=', event_type, '&k=', regexp_extract(props, '"k": (-?[0-9]+)', 1)) AS url
        FROM events
    )
    SELECT event_id, url,
           regexp_extract(url, 'user=([^&]+)', 1) AS q_user,
           regexp_extract(url, 'type=([^&]+)', 1) AS q_type,
           regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
           regexp_extract(url, '://([^/]+)/', 1) AS host
    FROM urls
    """,
    survey="F15,F4",
)
def f_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL build + query-param extraction (parse_qs — main.py:184-188).

    Spark side uses the real parse_url expression; the oracle reproduces
    the same values with regexes (DuckDB has no URL functions).
    """
    ev = load_table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://api.example.com/v1/metrics?user="),
        F.col("user_id").cast("string"),
        F.lit("&type="),
        F.col("event_type"),
        F.lit("&k="),
        F.regexp_extract("props", '"k": (-?[0-9]+)', 1),
    )
    with_url = ev.select("event_id", url.alias("url"))
    return with_url.select(
        "event_id",
        "url",
        F.parse_url("url", F.lit("QUERY"), F.lit("user")).alias("q_user"),
        F.parse_url("url", F.lit("QUERY"), F.lit("type")).alias("q_type"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("scheme"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
    )


@register(
    "f_json_shred",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS INTEGER) AS k_typed,
           regexp_extract(props, '"k": (-?[0-9]+)', 1) AS k_raw,
           regexp_extract(props, '"missing": "(.*)"', 1) <> '' AS has_missing
    FROM events
    """,
    survey="F16,F8",
)
def f_json_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field access: schema'd from_json struct shredded once
    (main.py:443-454,499-568 response shredding).

    Perf note: the document is parsed ONCE (one from_json; the raw-text
    field is recovered from the typed struct) — at 100 TB a second
    get_json_object path would re-parse every document, doubling the
    dominant cost of the scan.  `k_raw` equals the JSON source text for
    integer-typed fields, which the oracle's regexp extracts directly."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT, missing STRING")
    return ev.select(
        "event_id", parsed.alias("_p")
    ).select(
        "event_id",
        F.col("_p.k").alias("k_typed"),
        F.col("_p.k").cast("string").alias("k_raw"),
        F.col("_p.missing").isNotNull().alias("has_missing"),
    )


@register(
    "f_casts_and_round",
    oracle="""
    SELECT
        c_custkey,
        (c_acctbal > 0.0) AS is_positive,
        CAST(c_acctbal > 0.0 AS INTEGER) AS is_positive_int,
        round(c_acctbal, 1) AS bal_round1,
        CAST(trunc(c_acctbal) AS BIGINT) AS bal_int,
        TRY_CAST(c_mktsegment AS INTEGER) AS seg_as_int,
        CAST(c_nationkey AS DOUBLE) AS nation_dbl
    FROM customer
    """,
    survey="F7,F8,F9",
)
def f_casts_and_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool→int (convert_boolean ×8 scripts), lossy int cast, round.

    Lossy-int semantics pinned to Python's `int()`: truncation toward zero
    (Spark double→bigint truncates; oracle uses trunc() because DuckDB's
    plain cast rounds half-even instead).
    """
    c = load_table(spark, sf_dir, "customer")
    pos = F.col("c_acctbal") > 0.0
    return c.select(
        "c_custkey",
        pos.alias("is_positive"),
        pos.cast("int").alias("is_positive_int"),
        F.round("c_acctbal", 1).alias("bal_round1"),
        F.col("c_acctbal").cast("bigint").alias("bal_int"),
        F.col("c_mktsegment").try_cast("int").alias("seg_as_int"),
        F.col("c_nationkey").cast("double").alias("nation_dbl"),
    )


@register(
    "f_listagg_sorted",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_name, ',' ORDER BY c_name ASC) AS members_csv,
           CAST(count(*) AS BIGINT) AS n_members
    FROM customer
    WHERE c_acctbal < 0.0
    GROUP BY c_nationkey
    """,
    survey="A-std (ordered string aggregation — listagg with pinned element order)",
)
def f_listagg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered listagg: collect_list is partition-order-nondeterministic,
    so the canonical deterministic form is array_sort before joining —
    same contract as DuckDB's string_agg(... ORDER BY).  Bounded per-group
    cardinality (negative-balance members) keeps the row width sane at
    scale; unbounded listagg at 100 TB is a design smell."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") < 0.0)
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("c_name"))).alias("members_csv"),
        F.count("*").alias("n_members"),
    )


@register(
    "f_bitwise_aggs",
    oracle="""
    SELECT o_orderstatus,
           CAST(bit_and(o_orderkey) AS BIGINT) AS key_and,
           CAST(bit_or(o_orderkey) AS BIGINT) AS key_or,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS key_xor
    FROM orders GROUP BY o_orderstatus
    """,
    survey="A-std (bitwise aggregates — flag-set folding / bitmap building blocks)",
)
def f_bitwise_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bit_and/bit_or/bit_xor grouped aggregates — associative+commutative,
    so they fold map-side like sum; the primitive under roaring-bitmap-style
    presence encodings."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("key_and"),
        F.bit_or("o_orderkey").alias("key_or"),
        F.bit_xor("o_orderkey").alias("key_xor"),
    )


@register(
    "f_fuzzy_match",
    oracle="""
    SELECT c_custkey,
           CAST(levenshtein(c_name, replace(c_name, '0', 'O')) AS INTEGER) AS edit_dist,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated
    FROM customer
    WHERE c_custkey <= 500
    """,
    survey="F-std (fuzzy matching: levenshtein edit distance + lpad/translate normalization)",
)
def f_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching plus key-padding/character-translation
    normalizers — the record-linkage scalar kit.  levenshtein is O(len²)
    per pair: at 100 TB it belongs AFTER a blocking join (as in d6's
    SimHash blocks), never in a cross product."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.levenshtein(
            F.col("c_name"), F.regexp_replace("c_name", "0", "O")
        ).alias("edit_dist"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
    )


@register(
    "f_variant_shred",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           json_extract_string(props, '$.k') AS k_str
    FROM events
    WHERE event_id < 1000
    """,
    survey="F16 extended (VariantType: schema-on-read semi-structured access, Spark 4)",
)
def f_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    try_parse_json once, then typed variant_get paths.  Versus
    get_json_object, variant parses the document ONCE into a binary
    columnar encoding — repeated field access at 100 TB doesn't re-parse
    the JSON text per extraction."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    v = F.try_parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
    )


@register(
    "f_null_surface",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CASE WHEN o_totalprice IS NOT NULL THEN 'priced' ELSE 'unpriced' END AS nvl2_price,
           CASE WHEN isnan(o_totalprice / nullif(o_totalprice - o_totalprice, 0.0))
                THEN -1.0 ELSE o_totalprice END AS nan_guarded
    FROM orders WHERE o_orderkey < 2000
    """,
    survey="F10 extended (null/NaN surface: nullif / nvl2 / nanvl guards)",
)
def f_null_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The null-algebra kit: nullif sentinel-to-null, nvl2 presence
    branching, NaN guarding for 0/0 divisions (NaN poisons comparisons
    and aggregates silently — at scale you guard at the expression, not
    in post-hoc cleaning)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    zero = F.col("o_totalprice") - F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.nvl2("o_totalprice", F.lit("priced"), F.lit("unpriced")).alias("nvl2_price"),
        F.when(
            F.isnan(F.col("o_totalprice") / F.nullif(zero, F.lit(0.0))), -1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("nan_guarded"),
    )


@register(
    "f_collation_ci",
    oracle="""
    WITH m AS (
        SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS mixed
        FROM documents
    )
    SELECT CAST(count(DISTINCT mixed) AS BIGINT) AS n_raw_distinct,
           CAST(count(DISTINCT lower(mixed)) AS BIGINT) AS n_ci_distinct,
           CAST(count(CASE WHEN lower(mixed) = 'en' THEN 1 END) AS BIGINT) AS n_en_ci
    FROM m
    """,
    survey="F-std extended (Spark 4 collations: case-insensitive compare/distinct via UTF8_LCASE)",
)
def f_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation surface: the lang column is case-mangled
    deterministically (even ids uppercased), then compared and
    distinct-counted under the UTF8_LCASE collation — the engine-level
    form of case-insensitive semantics, instead of sprinkling lower()
    into every predicate (which defeats statistics and pushdown on
    collated columns).  The raw distinct count doubles (EN vs en); the
    collated one restores the true language count; equality against 'EN'
    matches both cases.  Oracle uses explicit lower() — same semantics,
    pre-collation style."""
    d = load_table(spark, sf_dir, "documents")
    mixed = F.when(F.col("doc_id") % 2 == 0, F.upper("lang")).otherwise(
        F.col("lang")
    )
    m = d.select(
        mixed.alias("mixed"),
        F.collate(mixed, "UTF8_LCASE").alias("mixed_ci"),
    )
    return m.agg(
        F.countDistinct("mixed").alias("n_raw_distinct"),
        F.countDistinct("mixed_ci").alias("n_ci_distinct"),
        F.count(F.when(F.col("mixed_ci") == F.lit("EN"), 1)).alias("n_en_ci"),
    )


@register(
    "f_ansi_safe_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE round(l_extendedprice / l_discount, 4) END AS price_per_disc,
           CASE WHEN l_orderkey % 100000 = 7 THEN NULL
                ELSE 2 * l_orderkey END AS overflow_guarded,
           (['a','b','c'])[l_linenumber] AS third_letter
    FROM lineitem
    """,
    survey="F-std extended (ANSI-mode error discipline: try_divide/try_multiply/try_element_at)",
)
def f_ansi_safe_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 runs ANSI mode BY DEFAULT: division by zero, integer
    overflow, and out-of-range array access all RAISE instead of
    silently producing nulls/wraparound — the correctness posture the
    reference's swallow-and-continue error handling (SURVEY §5) inverts.
    Where null-on-error is the intended semantics, the engine says so
    EXPLICITLY with the try_* family: try_divide (zero divisors →
    null), try_multiply (overflow → null), try_element_at (out-of-range
    → null, here line numbers beyond the 3-letter array).  The oracle
    encodes the same semantics as CASE guards; an engine that silently
    wrapped or errored would diverge immediately.

    Overflow is deliberately RARE (keys ≡ 7 mod 100000 multiply by
    INT64_MAX and null out; everyone else doubles): Spark's try_*
    handle overflow by catching the JVM ArithmeticException per
    offending ROW, so a query that overflows on every row pays an
    exception throw per row — measured ~12.5 s for 600 k rows vs 0.2 s
    when overflow is the exception (the earlier form of this query did
    exactly that and topped the full-registry bench).  At 100 TB an
    always-overflowing try_* is a misuse of the API, and a mostly-
    overflowing column is a data bug to gate on, not compute through."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_discount")), 4
        ).alias("price_per_disc"),
        F.try_multiply(
            F.col("l_orderkey"),
            F.when(
                F.col("l_orderkey") % 100000 == 7,
                F.lit(9223372036854775807),
            )
            .otherwise(F.lit(2))
            .cast("bigint"),
        ).alias("overflow_guarded"),
        F.try_element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            F.col("l_linenumber"),
        ).alias("third_letter"),
    )


@register(
    "f_regexp_surface",
    oracle=r"""
    SELECT doc_id,
           coalesce(list_aggr(regexp_extract_all(text, '[0-9]+'), 'string_agg', '|'), '') AS all_numbers,
           CAST(len(regexp_extract_all(text, '[A-Z][a-z]+')) AS INTEGER) AS n_capitalized,
           regexp_replace(text, '\s+', '_', 'g') AS squashed,
           regexp_matches(text, '(?i)lorem|ipsum') AS mentions_lorem
    FROM documents WHERE doc_id % 20 = 0
    """,
    survey="F-std extended (regexp surface: extract_all / match count / global replace / boolean match)",
)
def f_regexp_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The regexp function family beyond single-group extract (F2's digits
    filter): ``regexp_extract_all`` (every match, projected through
    array_join for driver hashing), match counting, global replace, and
    boolean ``rlike`` with an inline case-insensitive flag.  All codegen —
    regexes compile once per task, not per row."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 20 == 0)
    return d.select(
        "doc_id",
        F.array_join(F.regexp_extract_all("text", F.lit("[0-9]+")), "|").alias(
            "all_numbers"
        ),
        F.size(F.regexp_extract_all("text", F.lit("[A-Z][a-z]+")))
        .cast("int")
        .alias("n_capitalized"),
        F.regexp_replace("text", r"\s+", "_").alias("squashed"),
        F.col("text").rlike("(?i)lorem|ipsum").alias("mentions_lorem"),
    )
