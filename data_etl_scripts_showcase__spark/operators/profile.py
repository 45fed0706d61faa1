"""Single-pass column profiler for ANY table (the x54 shape, generalized).

The data-quality handshake (Deequ-style): per column — row count, null
count, exact distinct count, stringified min/max.  All columns' statistics
ride ONE scan: the aggregate projects five expressions per column into a
single row, and ``stack`` unpivots that row into the manifest.  At 100 TB
this is one table pass and a 1-row shuffle, independent of column count;
the naive per-column loop scans the table N times.

Numeric extrema are rounded before stringifying (data-dependent float repr
would otherwise differ between engines); dates/timestamps format to ISO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _extrema(field: T.StructField):
    c = field.name
    dt = field.dataType
    if isinstance(dt, T.DateType):
        return (
            F.date_format(F.min(c), "yyyy-MM-dd"),
            F.date_format(F.max(c), "yyyy-MM-dd"),
        )
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return (
            F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss"),
            F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss"),
        )
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return (
            F.round(F.min(c), 6).cast("string"),
            F.round(F.max(c), 6).cast("string"),
        )
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)):
        # nested/binary: extrema are size-based (min/max element count or
        # byte length) — comparable, deterministic, and type-agnostic.
        size = F.length(c) if isinstance(dt, T.BinaryType) else F.size(c)
        return (
            F.min(size).cast("string"),
            F.max(size).cast("string"),
        )
    return (F.min(c).cast("string"), F.max(c).cast("string"))


def _distinct(field: T.StructField):
    c = field.name
    if isinstance(field.dataType, (T.ArrayType, T.MapType, T.StructType)):
        # nested types are not groupable everywhere: count distinct of the
        # canonical JSON encoding instead.
        return F.countDistinct(F.to_json(c))
    return F.countDistinct(c)


def _bq(name: str) -> str:
    """Backtick-quote an arbitrary column name for Spark SQL (backticks in
    the name are escaped by doubling, per the SQL identifier rules)."""
    return "`" + name.replace("`", "``") + "`"


def _slit(name: str) -> str:
    """Single-quoted Spark SQL string literal for an arbitrary name."""
    return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"


def column_profile(df: DataFrame) -> DataFrame:
    """One-pass profile of every column → (col, n_rows, n_null,
    n_distinct, min_val, max_val).

    Works on ANY column name (spaces, dots, quotes, backticks): the input
    is first projected onto positional ``_c{i}`` aliases — so the internal
    aggregate aliases and the ``stack`` unpivot only ever see sanitized
    identifiers — and the original name re-enters only as an escaped
    string literal in the output ``col`` cell."""
    fields = df.schema.fields
    safe = df.select(
        *[F.col(_bq(f.name)).alias(f"_c{i}") for i, f in enumerate(fields)]
    )
    # TWO single-pass aggregates instead of one (round 11, VERDICT r10
    # #8).  Mixing the countDistinct rewrite (Expand ×(n_cols+1)) with
    # string-buffered min/max in ONE aggregate forced SortAggregate over
    # the whole expanded stream — the r10 plan shows the 5×N rows sorted
    # TWICE (min/max over strings needs a variable-length buffer, which
    # HashAggregate cannot hold).  Split them: the extrema/count fold is
    # Expand-free with empty grouping keys (a SortAggregate with no keys
    # sorts nothing — it is a plain fold), and the distinct pass carries
    # only long buffers so the Expand stream stays in HashAggregate.
    # Both 1-row results meet in a broadcast join; total work is two
    # scans and zero corpus-wide sorts.
    base_aggs = []
    dist_aggs = []
    for i, f in enumerate(fields):
        sf = T.StructField(f"_c{i}", f.dataType)
        c = sf.name
        mn, mx = _extrema(sf)
        base_aggs += [
            F.count("*").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).alias(f"{c}__nn"),
            mn.alias(f"{c}__mn"),
            mx.alias(f"{c}__mx"),
        ]
        dist_aggs.append(_distinct(sf).alias(f"{c}__nd"))
    one = safe.agg(*base_aggs).crossJoin(F.broadcast(safe.agg(*dist_aggs)))
    stack_expr = ", ".join(
        f"{_slit(f.name)}, _c{i}__n, _c{i}__nn, _c{i}__nd, _c{i}__mn, _c{i}__mx"
        for i, f in enumerate(fields)
    )
    return one.select(
        F.expr(
            f"stack({len(fields)}, {stack_expr}) AS "
            "(col, n_rows, n_null, n_distinct, min_val, max_val)"
        )
    ).select(
        "col",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_null").cast("bigint").alias("n_null"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_val",
        "max_val",
    )
