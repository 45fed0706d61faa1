"""§2.11 user-extensible compute: the UDF surfaces as oracle-checked queries.

mapInPandas (enrichment, multimodal) and applyInPandasWithState (streaming)
are exercised elsewhere; this module pins the remaining three surfaces —
scalar pandas_udf, grouped-agg pandas_udf, and applyInPandas grouped map —
each against a plain-SQL oracle, proving the Python stages are pure,
partitioning-independent functions of their inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import format_address, weighted_avg, zscore_groups
from ..sources import load_table
from . import register


@register(
    "udf1_pandas_scalar_address",
    oracle="""
    SELECT c.c_custkey,
           c.c_name || ', ' || c.c_mktsegment || ', ' || n.n_name AS label
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    survey="§2.11 (scalar pandas_udf — the extract_address shape, Arrow-vectorized)",
)
def udf1_pandas_scalar_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's extract_address (main.py:439-456) as a VECTORIZED
    scalar pandas_udf over a broadcast dim join — Arrow batches in/out,
    never row-at-a-time.  (The same logic is expressible as concat_ws —
    the preferred form; this query exists to verify the udf surface.)"""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return j.select(
        "c_custkey",
        format_address("c_name", "c_mktsegment", "n_name").alias("label"),
    )


@register(
    "udf2_grouped_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6)
               AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    survey="§2.11 (grouped-agg pandas_udf — the UDAF surface)",
)
def udf2_grouped_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean price per return flag via a grouped-agg
    pandas_udf — the user-defined-aggregate surface (the reference's
    metric-sum loop shape, main.py:588-607).  Note the scale caveat in
    ``functions/udfs.py``: grouped-agg pandas UDFs materialize each
    group, so built-in sum/sum is preferred where expressible."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg("l_extendedprice", "l_quantity"), 6).alias("wavg_price")
    )


@register(
    "udf3_applyinpandas_zscore",
    oracle="""
    SELECT event_id, event_type, value,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS zscore
    FROM events
    """,
    survey="§2.11 (applyInPandas grouped map — per-group normalization)",
)
def udf3_applyinpandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score normalization via applyInPandas (grouped
    map) — each group arrives as one pandas DataFrame, is normalized
    whole, and returns with the same cardinality.  The oracle recomputes
    the identical math with window aggregates; agreement proves the
    Python stage is a pure per-group function."""
    ev = load_table(spark, sf_dir, "events")
    return zscore_groups(ev, key="event_type")


@register(
    "udf4_python_udtf_sentences",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               list_filter(
                   list_transform(
                       regexp_split_to_array(text, '[.!?]+'),
                       x -> trim(x, ' ' || chr(9) || chr(10) || chr(13)
                                     || chr(12) || chr(11))
                   ),
                   x -> x <> ''
               ) AS parts
        FROM documents
    )
    SELECT doc_id,
           CAST(i - 1 AS INTEGER) AS sent_idx,
           parts[i] AS sentence,
           CAST(length(parts[i]) AS INTEGER) AS n_chars
    FROM s, LATERAL (SELECT unnest(range(1, len(parts) + 1)) AS i)
    """,
    survey="§2.11 extended (Python UDTF: lateral table function, 1→N sentence split)",
)
def udf4_python_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation via a registered Python UDTF invoked as a
    LATERAL table function in SQL — the fourth user-extensible surface
    (after scalar/grouped-agg pandas_udf and applyInPandas): user code
    that RETURNS A TABLE per input row, composable inside a query.

    The 1→N fan-out itself is the same shape as mm3/mm5's mapInPandas —
    which remains the preferred Arrow-batched path for hot loops; the
    UDTF form is the API-surface proof, verified value-for-value against
    a pure-SQL re-implementation of the same split."""
    from ..functions.udfs import SplitSentencesUdtf

    spark.udtf.register("split_sentences", SplitSentencesUdtf)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM __docs_udtf d, LATERAL split_sentences(d.text) s
        """
    )


@register(
    "udf5_arrow_scalar",
    oracle="""
    SELECT doc_id,
           CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
               AS approx_tokens,
           upper(substr(md5(text), 1, 8)) AS sig
    FROM documents
    """,
    survey="§2.11 extended (Arrow-optimized Python scalar UDF — Spark 4 useArrow path)",
)
def udf5_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's Arrow-optimized scalar Python UDF (``useArrow=True``):
    row-at-a-time author experience, Arrow-batched execution — the
    migration path for teams with legacy @udf code who can't rewrite to
    pandas_udf wholesale.  Ranks between the row-pickling UDF (~10-100×
    slower) and a true vectorized pandas_udf; the engine's hot paths
    stay pure-codegen (this is the API-surface proof, oracle-verified)."""
    import hashlib

    from pyspark.sql.functions import udf

    @udf("bigint", useArrow=True)
    def approx_tokens(text: str) -> int:
        return text.count(" ") + 1 if text is not None else None

    @udf("string", useArrow=True)
    def sig(text: str) -> str:
        return hashlib.md5(text.encode()).hexdigest()[:8].upper()

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        approx_tokens("text").alias("approx_tokens"),
        sig("text").alias("sig"),
    )


@register(
    "udf6_polymorphic_udtf",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
                   AS toks
        FROM documents
    )
    SELECT doc_id, toks[1] AS tok_1, toks[2] AS tok_2, toks[3] AS tok_3
    FROM t
    """,
    survey="§2.11 extended (polymorphic Python UDTF: plan-time dynamic schema via analyze())",
)
def udf6_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's polymorphic UDTF: ``analyze()`` derives the output
    schema (tok_1..tok_k) from the literal ``k`` at PLAN time, so a
    dynamic-width table function still binds statically downstream — the
    safe version of the reference's runtime ``rows[0].keys()`` schemas
    (SURVEY §1.2).  Row-at-a-time Python is the documented slow path
    (mapInPandas is the hot-loop form); this pins the API surface,
    verified value-for-value against the pure-SQL equivalent."""
    from ..functions.udfs import TopTokensUdtf
    from pyspark.sql.functions import lit, udtf

    spark.udtf.register("top_tokens", udtf(TopTokensUdtf))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf6")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok_1, t.tok_2, t.tok_3
        FROM __docs_udtf6 d, LATERAL top_tokens(d.text, 3) t
        """
    )
