"""Table registry + schema-checked parquet loaders.

The reference infers every output schema from the first row at runtime
(``fieldnames = list(rows[0].keys())`` — e.g.
/root/reference/Azure_datalake_etl/Gonukkad_Merchants.py:86) and declares no
input schema anywhere.  Our engine replaces that with a declared
``StructType`` registry per dataset (SURVEY.md §1.2): reads validate against
it, so source-side drift fails loudly instead of silently changing the sink.

Loaders deliberately do NOT pass the schema into ``spark.read`` — the parquet
footer is authoritative and the vectorized reader + pushdown work best
unhinted; we validate after binding instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _s(fields: list[tuple[str, T.DataType]]) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in fields])


TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": _s([("r_regionkey", T.IntegerType()), ("r_name", T.StringType())]),
    "nation": _s(
        [
            ("n_nationkey", T.IntegerType()),
            ("n_name", T.StringType()),
            ("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": _s(
        [
            ("c_custkey", T.LongType()),
            ("c_name", T.StringType()),
            ("c_nationkey", T.IntegerType()),
            ("c_acctbal", T.DoubleType()),
            ("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": _s(
        [
            ("s_suppkey", T.LongType()),
            ("s_name", T.StringType()),
            ("s_nationkey", T.IntegerType()),
            ("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": _s(
        [
            ("p_partkey", T.LongType()),
            ("p_name", T.StringType()),
            ("p_brand", T.StringType()),
            ("p_type", T.StringType()),
            ("p_size", T.IntegerType()),
            ("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": _s(
        [
            ("o_orderkey", T.LongType()),
            ("o_custkey", T.LongType()),
            ("o_orderstatus", T.StringType()),
            ("o_totalprice", T.DoubleType()),
            ("o_orderdate", T.TimestampNTZType()),
            ("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": _s(
        [
            ("l_orderkey", T.LongType()),
            ("l_partkey", T.LongType()),
            ("l_suppkey", T.LongType()),
            ("l_linenumber", T.IntegerType()),
            ("l_quantity", T.DoubleType()),
            ("l_extendedprice", T.DoubleType()),
            ("l_discount", T.DoubleType()),
            ("l_tax", T.DoubleType()),
            ("l_returnflag", T.StringType()),
            ("l_linestatus", T.StringType()),
            ("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": _s(
        [
            ("event_id", T.LongType()),
            ("ts", T.TimestampNTZType()),
            ("user_id", T.LongType()),
            ("event_type", T.StringType()),
            ("value", T.DoubleType()),
            ("props", T.StringType()),
        ]
    ),
    "documents": _s(
        [
            ("doc_id", T.LongType()),
            ("text", T.StringType()),
            ("lang", T.StringType()),
            ("source", T.StringType()),
            ("n_chars", T.LongType()),
        ]
    ),
    "embeddings": _s(
        [
            ("vec_id", T.LongType()),
            ("embedding", T.ArrayType(T.FloatType())),
            ("label", T.IntegerType()),
        ]
    ),
}


class SchemaDriftError(RuntimeError):
    """Source schema no longer matches the declared registry schema."""


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, validate: bool = True
) -> DataFrame:
    """Load one registry table from ``{sf_dir}/{name}.parquet``.

    Unlike the reference's silent try/except-print scans
    (/root/reference/Azure_datalake_etl/Gonukkad_Merchants.py:60-64 — scan
    failure yields an empty list), any mismatch raises.
    """
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects; read the raw int64 nanos and floor-divide to
        # micros (DuckDB's TIMESTAMP_NS → TIMESTAMP cast floors the same
        # way, keeping the oracle comparable).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if validate:
        expected = TABLE_SCHEMAS.get(name)
        if expected is not None:
            got = {f.name: f.dataType for f in df.schema.fields}
            want = {f.name: f.dataType for f in expected.fields}
            if got != want:
                raise SchemaDriftError(
                    f"{name}: parquet schema {got} != declared {want}"
                )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
