"""User-extensible compute surface (SURVEY.md §2.11).

The reference's only "functions" are driver-side Python helpers; the engine
must let users bring the same shapes WITHOUT giving up scale:

- ``format_address`` — vectorized scalar ``pandas_udf``: the canonical
  `extract_address` example (/root/reference/buisness_profile_etl/
  main.py:439-456 builds a formatted address string field-by-field).
  Arrow-batched: ~10-100× the throughput of a row-at-a-time udf.
- ``weighted_avg`` — grouped-agg ``pandas_udf`` (the UDAF surface): the
  metric-sum loop shape (main.py:588-607) as a user aggregate.
- ``zscore_groups`` — ``applyInPandas`` grouped-map (the per-group
  DataFrame→DataFrame surface): whole-group normalization.
- ``py_bool_to_int`` — a row-at-a-time scalar ``udf`` kept ONLY as the
  documented anti-pattern (`convert_boolean`, ×8 in the reference, e.g.
  /root/reference/Azure_datalake_etl/Gonukkad_Merchants.py:71-72): it
  works, but the same semantics belong in a Column expression
  (``functions.bool_to_int``); tests assert the two agree.

Every UDF here is a pure function of its inputs (no state, no I/O), so
results are partitioning-independent — the property that makes them safe
at 1000 executors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType, StringType


@pandas_udf(StringType())
def format_address(name: pd.Series, segment: pd.Series, nation: pd.Series) -> pd.Series:
    """Vectorized address/label formatter (scalar pandas_udf).

    Mirrors the reference's extract_address: join the present parts with
    ', ', skipping missing ones (main.py:443-454's address_parts list).
    """
    parts = pd.concat([name, segment, nation], axis=1)
    return parts.apply(
        lambda r: ", ".join(str(v) for v in r if pd.notna(v)), axis=1
    )


@pandas_udf(DoubleType())
def weighted_avg(value: pd.Series, weight: pd.Series) -> float:  # GROUPED_AGG
    """Quantity-weighted average (grouped-agg pandas_udf — the UDAF shape).

    Spark feeds each group's columns as whole Series (map-side partials
    don't apply to grouped-agg pandas UDFs — the group is materialized, so
    keep group cardinality per key bounded at scale, or prefer built-in
    sum/sum which DO combine map-side)."""
    w = weight.sum()
    return float((value * weight).sum() / w) if w else float("nan")


ZSCORE_SCHEMA = "event_id bigint, event_type string, value double, zscore double"


def _zscore_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: z-score each row against its group (ddof=1)."""
    v = pdf["value"]
    sd = v.std(ddof=1)
    z = (v - v.mean()) / sd if sd and sd == sd else v * float("nan")
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "value": v,
            "zscore": z.round(6),
        }
    )


def zscore_groups(df: DataFrame, key: str = "event_type") -> DataFrame:
    """Per-group z-score normalization via applyInPandas (grouped map).

    One shuffle on the group key; each group materializes as a pandas
    frame, so the key must have bounded cardinality-per-group at 100 TB
    (event types do; user ids would need the windowed-expression form
    instead — same math as a Window.partitionBy avg/stddev)."""
    return df.select("event_id", key, "value").groupBy(key).applyInPandas(
        lambda pdf: _zscore_pdf(pdf), ZSCORE_SCHEMA
    )


@F.udf(IntegerType())
def py_bool_to_int(v):  # pragma: no cover - exercised via tests only
    """Row-at-a-time scalar udf — the documented SLOW PATH.

    Semantically identical to ``functions.bool_to_int`` (a JVM Column
    expression); exists so the engine demonstrably supports plain udfs
    while the library routes hot paths through expressions."""
    return None if v is None else (1 if v else 0)


# Characters Python's str.strip() removes — pinned explicitly so the SQL
# oracle can strip the identical set.
_STRIP_WS = " \t\n\r\f\v"


@F.udtf(returnType="sent_idx int, sentence string, n_chars int")
class SplitSentencesUdtf:
    """Python UDTF (Spark 4 table-function surface): one input text row →
    N sentence rows.  Sentences split on ``[.!?]+`` runs, whitespace
    stripped, empties dropped, 0-based index assigned in document order.

    Row-at-a-time Python — the documented slow path next to the
    Arrow-batched mapInPandas UDTF shape (mm3/mm5); exists to pin the
    ``CREATE FUNCTION``-style lateral-join surface end-to-end."""

    def eval(self, text):  # pragma: no cover - exercised via queries/tests
        import re

        if text is None:
            return
        i = 0
        for part in re.split(r"[.!?]+", text):
            part = part.strip(_STRIP_WS)
            if part:
                yield i, part, len(part)
                i += 1


class TopTokensUdtf:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze`` surface): the output
    schema is computed at plan time from the LITERAL ``k`` argument —
    ``top_tokens(text, 3)`` returns columns (tok_1, tok_2, tok_3).  This
    is the dynamic-schema table-function machinery (the engine-side
    answer to the reference's ``rows[0].keys()`` runtime schemas,
    SURVEY §1.2) done safely: the schema is resolved BEFORE execution,
    so downstream operators bind columns statically."""

    @staticmethod
    def analyze(text, k):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        n = int(k.value)
        schema = StructType()
        for i in range(n):
            schema = schema.add(f"tok_{i + 1}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text, k):  # pragma: no cover - exercised via queries
        import re

        toks = []
        if text:
            norm = re.sub(r"\s+", " ", text.lower()).strip()
            toks = norm.split(" ") if norm else []
        n = int(k)
        yield tuple(toks[i] if i < len(toks) else None for i in range(n))
