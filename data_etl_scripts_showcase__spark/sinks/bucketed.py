"""Bucketed tables: pre-shuffled storage for co-located joins.

The reference re-fetches and re-joins the same keyed tables every daily run
(SURVEY.md §3.2-3.3) with no storage-level help.  At 100 TB the dominant
cost of a repeated fact-to-fact join is the shuffle; bucketing amortizes it
into the write: both tables are hash-partitioned by the join key into the
same number of buckets ON DISK, so every co-bucketed join (and groupBy on
the bucket key) runs with ZERO exchanges, forever after.

This is the storage-layout twin of the broadcast join: broadcast removes
the shuffle when one side is small, bucketing removes it when both sides
are big but the join is recurring.  `tests/test_plans.py` asserts the
no-Exchange plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``n_buckets`` should be sized so one bucket of the LARGER table fits an
    executor's memory at the target scale (100 TB / n_buckets ≲ a few GB);
    both sides of a recurring join must use the same count.  ``sort=True``
    additionally sorts within buckets so sort-merge joins skip their sort.
    """
    w = df.write.mode("overwrite").format("parquet")
    if path is not None:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.

    With matching bucket counts Spark's scan exposes the hash-partitioning
    to the planner (`outputPartitioning = HashPartitioning(bucket cols)`),
    which satisfies the join's distribution requirement — no Exchange on
    either side.  This is the read path the write above pays for.
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
