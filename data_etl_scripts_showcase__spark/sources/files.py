"""File sources/sinks: CSV with header, JSON archive (SURVEY.md §2.1 S4-S6).

The reference's interchange format between pipeline stages is CSV with a
header row (csv.DictReader/DictWriter — buisness_profile_etl/main.py:469-475,
710-715) and its audit trail is one raw JSON file per (run, endpoint, key)
(main.py:201-207 et al.).  Spark-first versions:

- CSV reads take a DECLARED schema — never inferSchema; at 100 TB schema
  inference is an extra full scan, and the reference's `rows[0].keys()`
  dynamic schema is the bug class we're eliminating (SURVEY §1.2).
- The JSON archive is a date/endpoint-partitioned directory sink, so the
  "replay one run of one endpoint" read the reference does by filename
  globbing becomes partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
) -> DataFrame:
    """S4: CSV-with-header source, schema declared by the caller."""
    return spark.read.csv(path, schema=schema, header=header)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    """S5: CSV-with-header sink — one lazy distributed write, replacing the
    reference's O(n²) rewrite-per-row loop (main.py:710-715)."""
    df.write.mode(mode).csv(path, header=header)


def write_json_archive(
    df: DataFrame,
    base_path: str,
    run_ds: str,
    endpoint: str,
    mode: str = "append",
) -> None:
    """S6: raw-response archive — `{base}/run_ds=…/endpoint=…/part*.json`.

    Partition columns replace the reference's per-key filename convention;
    a replay read of one run×endpoint is a pruned scan, not a glob.
    """
    (
        df.withColumn("run_ds", F.lit(run_ds))
        .withColumn("endpoint", F.lit(endpoint))
        .write.mode(mode)
        .partitionBy("run_ds", "endpoint")
        .json(base_path)
    )


def read_json_archive(
    spark: SparkSession,
    base_path: str,
    schema: T.StructType | str,
    run_ds: str | None = None,
    endpoint: str | None = None,
) -> DataFrame:
    """Replay reader for the S6 archive (partition-pruned when filtered).

    ``schema`` covers the payload columns; partition columns (run_ds,
    endpoint) are appended automatically by the reader.
    """
    df = spark.read.schema(
        T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    ).json(base_path)
    if run_ds:
        df = df.where(F.col("run_ds") == run_ds)
    if endpoint:
        df = df.where(F.col("endpoint") == endpoint)
    return df


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — columnar with predicate pushdown, same contract as the
    parquet path (vectorized reader, filter/column pruning reach the scan)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (snappy by default) — format parity for warehouses whose
    canonical interchange is ORC rather than parquet."""
    df.write.mode(mode).orc(path)


def write_text(df: DataFrame, path: str, column: str, mode: str = "overwrite") -> None:
    """Single-column raw text sink (one line per row) — the shape used for
    plain-text corpus exports in training-data pipelines."""
    df.select(F.col(column).cast("string").alias("value")).write.mode(mode).text(path)


def read_text(spark: SparkSession, path: str, column: str = "value") -> DataFrame:
    """Raw text source: one row per line, single string column."""
    return spark.read.text(path).withColumnRenamed("value", column)
