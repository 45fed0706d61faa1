"""Targeted deletion over partitioned data (right-to-be-forgotten).

Training-data pipelines need key-level deletes (user opt-outs, DMCA,
contaminated sources) over datasets far too large to rewrite.  The
reference's only deletion mechanism is the blob rename/retention sweep
(/root/reference/Azure_datalake_etl/Gonukkad_Merchants.py:142-155) — whole
files by age, nothing row-level.

Spark-first shape: the dataset is date-partitioned; a delete (a) finds the
partitions that actually CONTAIN the doomed keys (an aggregate over
partition values — metadata-scale, not data-scale), then (b) rewrites ONLY
those partitions through an anti-join under dynamic partition overwrite.
Untouched partitions are never read or written (asserted file-level in
tests/test_pipelines.py).  At 100 TB with daily partitions, deleting one
user touches the handful of days they appear in, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def affected_partitions(
    df: DataFrame, part_col: str, key_col: str, keys: list
) -> list[str]:
    """Partition values containing any of ``keys`` — the rewrite set.

    One pushdown-filtered scan projecting only (part_col); the collect is
    |affected partitions| values, the same metadata-scale driver read as
    `snapshot.latest_ds`.
    """
    rows = (
        df.where(F.col(key_col).isin(keys))
        .select(part_col)
        .distinct()
        .collect()
    )
    return sorted(str(r[0]) for r in rows)


def targeted_delete(
    spark: SparkSession,
    base_path: str,
    part_col: str,
    key_col: str,
    keys: list,
) -> list[str]:
    """Delete all rows with ``key_col ∈ keys`` from a ``part_col``-
    partitioned parquet dataset, rewriting only affected partitions.

    Returns the rewritten partition values.  Dynamic partition overwrite
    means a re-run (or a crash between partitions) is idempotent: the
    rewrite of a partition replaces exactly that partition.
    """
    df = spark.read.parquet(base_path)
    parts = affected_partitions(df, part_col, key_col, keys)
    if not parts:
        return []
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        df.where(F.col(part_col).isin(parts))
        .where(~F.col(key_col).isin(keys))
        .write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(base_path)
    )
    return parts
