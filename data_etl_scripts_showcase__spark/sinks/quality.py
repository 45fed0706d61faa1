"""Quality gates + run-metrics state (SURVEY.md §2.4 A9, §2.1 S13).

The reference reconciles input vs output row counts before publishing and
only *logs* on failure (/root/reference/buisness_profile_etl/main.py:717-745);
its run-metrics store is a hand-parsed `date: count` text file upserted by
date key (main.py:20-50).  Here the gate RAISES (SURVEY §5: fail loudly) and
the metrics store is a tiny parquet table with merge-on-key semantics.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


class ReconciliationError(RuntimeError):
    """Publish gate failed: output cardinality != input cardinality."""


def reconcile(input_df: DataFrame, output_df: DataFrame, context: str = "") -> int:
    """A9 gate: row counts must match exactly; returns the count.

    Unlike the reference (prints + cloud-log, still exits 0), a mismatch
    raises and aborts the publish.
    """
    n_in, n_out = input_df.count(), output_df.count()
    if n_in != n_out:
        raise ReconciliationError(
            f"reconciliation failed{' for ' + context if context else ''}: "
            f"input_rows={n_in} output_rows={n_out}"
        )
    return n_in


def upsert_run_metrics(
    spark: SparkSession, path: str, run_date: str, metrics: dict[str, float]
) -> DataFrame:
    """S13 merge-on-key: upsert this run's metrics row by run_date.

    Same-key rows are replaced (the reference overwrites the current day's
    line), other days are preserved.  The table is tiny by construction
    (one row per day), so the read-modify-write is safe; the swap goes
    through a staging directory so a crash never leaves a half-written
    store.
    """
    new = spark.createDataFrame(
        [(run_date, *[float(metrics[k]) for k in sorted(metrics)])],
        ["run_date", *sorted(metrics)],
    )
    if os.path.exists(path):
        # merge-on-key: drop the old row for this run_date (anti-join), then
        # append the new one — other days untouched.
        old = spark.read.parquet(path)
        merged = old.join(
            new.select("run_date"), "run_date", "left_anti"
        ).unionByName(new, allowMissingColumns=True)
    else:
        merged = new
    staging = tempfile.mkdtemp(prefix="run_metrics_")
    merged.coalesce(1).write.mode("overwrite").parquet(staging)
    out = spark.read.parquet(staging)
    out.count()  # materialize before the swap
    if os.path.exists(path):
        shutil.rmtree(path)
    shutil.move(staging, path)
    return spark.read.parquet(path)


def table_fingerprint(df: DataFrame) -> tuple[int, int]:
    """Order-independent content checksum: (n_rows, sum of per-row 32-bit
    md5 hashes over ALL columns in a canonical string form).

    Commutative-sum hashing makes the fingerprint identical under any row
    order, partitioning, or file layout — so a 100 TB copy/migration
    (the reference's MSSQL → CSV → GCS → BigQuery hop) verifies with one
    scan per side and no sort.  Nulls are marked distinctly from empty
    strings; column order follows the schema, so both sides must agree
    on column order (use select to align first).  Doubles are formatted
    by Spark's cast-to-string on BOTH sides, which is consistent
    Spark-to-Spark; cross-engine comparison should canonicalize decimals
    first (see x31_table_fingerprint).
    """
    from pyspark.sql import functions as F

    canon = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in df.columns
        ],
    )
    h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("bigint")
    row = (
        df.select(h.alias("_h"))
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("_h"), F.lit(0)).cast("bigint").alias("fp"),
        )
        .collect()[0]
    )
    return int(row.n), int(row.fp)
