"""File-IO round-trip queries (SURVEY.md §2.1 S4, S5, S6, S10, S11).

The reference's interchange formats are CSV-with-header between stages
(/root/reference/buisness_profile_etl/main.py:469-475, 710-715), a raw JSON
archive per (run, endpoint) (main.py:201-207), and dated object-store
snapshots with a rename-sweep "latest" pointer
(/root/reference/Azure_datalake_etl/Gonukkad_Merchants.py:129-155).

Each query here drives the REAL sink + source code path end-to-end: write
the table through `sources/files.py` / `sinks/snapshot.py` into a fresh
temp directory, read it back with a declared schema, and aggregate.  The
DuckDB oracle computes the same aggregate over the original parquet — so a
green row proves the round trip is lossless, not merely that the write
succeeded.  At 100 TB the same code paths run against object-store URIs;
the writes stay one lazy distributed job per sink (no driver collect).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dec2
from ..sinks.snapshot import read_snapshot, write_snapshot
from ..sources import load_table
from ..sources.files import (
    read_csv,
    read_json_archive,
    read_orc,
    read_text,
    write_csv,
    write_json_archive,
    write_orc,
    write_text,
)
from . import fragment, register


def _tmp(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    # mkdtemp creates the dir; Spark's overwrite-mode writers want to own it
    shutil.rmtree(d, ignore_errors=True)
    return d


@register(
    "io1_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acct_sum
    FROM customer GROUP BY c_mktsegment
    """,
    survey="S4,S5 (CSV-with-header sink + declared-schema source, write-then-read-back)",
)
def io1_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 CSV sink → S4 CSV source round trip (main.py:469-475, 710-715).

    The read declares the schema (never inferSchema — at 100 TB inference
    is an extra full scan); doubles survive exactly because Spark's CSV
    writer emits shortest-round-trip representations.
    """
    cust = load_table(spark, sf_dir, "customer")
    out = _tmp("io1_csv_")
    write_csv(cust, out)
    back = read_csv(
        spark,
        out,
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(dec2("c_acctbal")).cast("double").alias("acct_sum"),
    )


@register(
    "io2_json_archive_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
    FROM orders WHERE o_orderkey % 100 = 0
    GROUP BY o_orderstatus
    """,
    survey="S6 (partitioned JSON archive sink + partition-pruned replay read)",
)
def io2_json_archive_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 JSON archive round trip (main.py:201-207): two (run, endpoint)
    partitions are written; the replay read prunes to ONE of them, so the
    oracle match also proves the partition filter isolates the right run —
    the reference's filename-glob replay done as partition pruning."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    target = o.where(F.col("o_orderkey") % 100 == 0)
    decoy = o.where(F.col("o_orderkey") % 100 == 1)
    base = _tmp("io2_json_")
    write_json_archive(target, base, run_ds="2024-06-01", endpoint="orders")
    write_json_archive(decoy, base, run_ds="2024-06-02", endpoint="orders")
    back = read_json_archive(
        spark,
        base,
        "o_orderkey bigint, o_orderstatus string, o_totalprice double",
        run_ds="2024-06-01",
        endpoint="orders",
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(dec2("o_totalprice")).cast("double").alias("price_sum"),
    )


@register(
    "io3_snapshot_sink_roundtrip",
    oracle="""
    SELECT s_nationkey AS nation,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
    FROM supplier GROUP BY s_nationkey
    """,
    survey="S10,S11 (dated object-store snapshot sink + latest-partition read)",
)
def io3_snapshot_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/S11 snapshot round trip (Gonukkad_Merchants.py:129-155): write a
    stale dated partition, then the full current one; read back pruned to
    the latest ds.  A green row proves the dated-partition layout isolates
    snapshots (the rename-sweep "latest pointer" done as partition pruning)
    and the read touched only the current day's data."""
    s = load_table(spark, sf_dir, "supplier")
    base = _tmp("io3_snap_")
    write_snapshot(s.where(F.col("s_suppkey") % 2 == 0), base, ds="2024-05-31")
    write_snapshot(s, base, ds="2024-06-01")
    back = read_snapshot(spark, base, ds="2024-06-01")
    return back.groupBy(F.col("s_nationkey").alias("nation")).agg(
        F.count("*").alias("n"),
        F.sum(dec2("s_acctbal")).cast("double").alias("bal_sum"),
    )


@register(
    "io4_orc_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
    FROM lineitem WHERE l_orderkey % 50 = 0
    GROUP BY l_returnflag
    """,
    survey="S4/S5 extended (columnar ORC sink + source — format parity)",
)
def io4_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → source round trip: columnar format parity for warehouses
    whose canonical interchange is ORC.  The read-back aggregate still gets
    predicate pushdown + column pruning from the ORC reader."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 50 == 0
    )
    out = _tmp("io4_orc_")
    write_orc(li.select("l_orderkey", "l_returnflag", "l_quantity"), out)
    back = read_orc(spark, out)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dec2("l_quantity")).cast("double").alias("qty_sum"),
    )


@register(
    "io5_text_corpus_roundtrip",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_md5
    FROM documents
    """,
    survey="S5/S6 extended (raw text corpus sink + source — one doc per line)",
)
def io5_text_corpus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text corpus export → re-ingest (the one-doc-per-line shape
    training-data pipelines ship): write the documents text column as raw
    lines, read it back, and fingerprint the content with md5 — identical
    hex on both engines, so (count, total chars, distinct digests) matching
    the oracle over the ORIGINAL parquet proves the export is lossless."""
    d = load_table(spark, sf_dir, "documents")
    out = _tmp("io5_text_")
    write_text(d, out, column="text")
    back = read_text(spark, out, column="text")
    return back.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.count_distinct(F.md5(F.col("text").cast("binary")))
        .cast("bigint")
        .alias("n_distinct_md5"),
    )


@register(
    "io6_schema_evolution_read",
    oracle="""
    WITH v1 AS (
        SELECT s_suppkey, s_nationkey, s_acctbal, CAST(NULL AS VARCHAR) AS tier
        FROM supplier WHERE s_suppkey % 2 = 0
    ),
    v2 AS (
        SELECT s_suppkey, s_nationkey, s_acctbal,
               CASE WHEN s_acctbal >= 0.0 THEN 'ok' ELSE 'debt' END AS tier
        FROM supplier WHERE s_suppkey % 2 = 1
    ),
    u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum,
           CAST(count(tier) AS BIGINT) AS n_with_tier
    FROM u GROUP BY s_nationkey
    """,
    survey="S4/S5 extended (schema evolution: mergeSchema read across snapshot versions, typed null backfill)",
)
def io6_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Controlled schema evolution: snapshot v1 is written with the original
    columns, v2 adds a `tier` column; a single ``mergeSchema`` read unions
    both generations with typed-null backfill for the old files.  This is
    the engine's answer to the reference's ``rows[0].keys()`` runtime
    inference (Gonukkad_Merchants.py:86) — additive evolution is declared
    and verified, never guessed.  At 100 TB, old partitions are NEVER
    rewritten on column add; readers see one schema."""
    s = load_table(spark, sf_dir, "supplier")
    base = _tmp("io6_evo_")
    v1 = s.where(F.col("s_suppkey") % 2 == 0).select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    v2 = s.where(F.col("s_suppkey") % 2 == 1).select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.when(F.col("s_acctbal") >= 0.0, "ok").otherwise("debt").alias("tier"),
    )
    v1.write.mode("overwrite").parquet(f"{base}/gen=1")
    v2.write.mode("overwrite").parquet(f"{base}/gen=2")
    back = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/gen=1", f"{base}/gen=2"
    )
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        F.sum(dec2("s_acctbal")).cast("double").alias("bal_sum"),
        F.count("tier").cast("bigint").alias("n_with_tier"),
    )


@register(
    "io7_python_datasource_pages",
    oracle="""
    WITH src AS (
        SELECT p.page, p.page * 1000 + i.i AS item_id,
               concat('item-', p.page, '-', i.i) AS payload
        FROM (SELECT unnest(range(0, 4)) AS page) p
        CROSS JOIN (SELECT unnest(range(0, 25)) AS i) i
    )
    SELECT CAST(page AS INTEGER) AS page,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(min(item_id) AS BIGINT) AS min_id,
           CAST(max(item_id) AS BIGINT) AS max_id,
           CAST(count(DISTINCT payload) AS BIGINT) AS n_payloads
    FROM src GROUP BY page
    """,
    survey="S7,S8,U1 (paginated REST source as a Spark 4 Python DataSource: one task per page)",
)
def io7_python_datasource_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's paginated REST consumption (`main.py:296-308,
    414-428`: driver while-loop over nextPageToken) re-expressed as a
    CUSTOM PYTHON DATA SOURCE (Spark 4 API, sources/restpages.py): each
    page is an InputPartition, so the scheduler fans pages out across
    executors, task retry gives per-page fault isolation, and the union
    of pages (U1) is the scan itself — no driver loop, no accumulating
    list.  The mock endpoint is deterministic, so the oracle regenerates
    the pages arithmetically and value-verifies the whole source path
    (schema declaration → partition planning → per-task iteration →
    Arrow transfer)."""
    from ..sources.restpages import register_restpages

    register_restpages(spark)
    pages = (
        spark.read.format("restpages")
        .option("pages", 4)
        .option("page_size", 25)
        .load()
    )
    return pages.groupBy("page").agg(
        F.count("*").alias("n_items"),
        F.min("item_id").alias("min_id"),
        F.max("item_id").alias("max_id"),
        F.countDistinct("payload").alias("n_payloads"),
    )


@register(
    "io8_python_datasource_sink",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment
    """,
    survey="S10 extended (custom Python DataSource SINK: per-partition batched POST with 2-phase commit)",
)
def io8_python_datasource_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the CUSTOM PYTHON DATA SOURCE SINK
    (sources/restpages.py RestPostDataSource): positive-balance customers
    are written as per-partition 'POST batches' with the two-phase commit
    protocol (stage per task → atomic manifest publish on driver commit),
    then read back TRUSTING ONLY THE MANIFEST and re-aggregated; the
    oracle aggregates the source directly, so a dropped batch, a
    double-committed batch, or an orphaned stage file all surface as a
    value mismatch.  This replaces the reference's O(n²) CSV rewrite +
    sleep-based upload consistency (`main.py:710-715`,
    `Gonukkad_Merchants.py:126-157`) with all-or-nothing visibility.
    Balances travel as exact integer cents (the v9/x4 discipline) so the
    JSON hop is lossless."""
    import tempfile as _tf

    from ..sources.restpages import read_manifest, register_restpages

    register_restpages(spark)
    out = _tf.mkdtemp(prefix="restpost_")
    c = load_table(spark, sf_dir, "customer")
    staged = c.where(F.col("c_acctbal") > 0).select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    staged.write.format("restpost").option("path", out).mode("append").save()
    back = read_manifest(
        spark, out, "c_custkey bigint, c_mktsegment string, bal_cents bigint"
    )
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum("bal_cents").cast("bigint").alias("bal_cents"),
    )


@register(
    "io9_csv_corrupt_quarantine",
    oracle="""
    WITH g AS (
        SELECT i FROM (SELECT unnest(range(0, 100)) AS i) WHERE i % 10 <> 0
    )
    SELECT CAST(100 AS BIGINT) AS n_rows,
           CAST((SELECT count(*) FROM g) AS BIGINT) AS n_good,
           CAST(10 AS BIGINT) AS n_quarantined,
           CAST((SELECT sum(i * 2) FROM g) AS BIGINT) AS val_sum
    """,
    survey="S4 extended (CSV PERMISSIVE corrupt-record quarantine — x12's JSON discipline for CSV)",
)
def io9_csv_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-CSV quarantine: a synthetic file where every 10th line is
    garbage is read in PERMISSIVE mode with ``columnNameOfCorruptRecord``
    — bad lines land intact in the quarantine column instead of aborting
    the job (FAILFAST) or vanishing (DROPMALFORMED), so the pipeline can
    COUNT, inspect, and replay them (x12's malformed-JSON discipline
    applied to the reference's primary interchange format, S4).  The
    oracle recomputes the expected good/quarantined split and the
    good-row aggregate arithmetically from the same deterministic
    generator."""
    import os
    import tempfile as _tf

    tmp = _tf.mkdtemp(prefix="csvq_")
    path = os.path.join(tmp, "input.csv")
    with open(path, "w") as f:
        f.write("id,val\n")
        for i in range(100):
            f.write(f"bad_line_{i}\n" if i % 10 == 0 else f"{i},{i * 2}\n")
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema("id int, val int, _corrupt string")
        .csv(path)
    )
    # CSV parser caveat (documented Spark behavior): column pruning changes
    # what the parser attempts, so the corrupt column must be materialized
    # from a full-schema parse before aggregating over it.
    df = df.cache()
    return df.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("_corrupt").isNull(), 1)).alias("n_good"),
        F.count("_corrupt").alias("n_quarantined"),
        F.sum(F.when(F.col("_corrupt").isNull(), F.col("val")))
        .cast("bigint")
        .alias("val_sum"),
    )


@register(
    "io10_compaction_roundtrip",
    oracle="""
    SELECT strftime(o_orderdate, '%Y') AS ds,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
           CAST(1 AS BIGINT) AS n_files
    FROM orders GROUP BY strftime(o_orderdate, '%Y')
    """,
    survey="S11 (small-file compaction: fragmented streaming appends → one file per partition, verified through the read path)",
)
def io10_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE as a driver-checkable round trip: write orders fragmented
    (6 shuffled files per year partition — the steady state a streaming
    append sink leaves behind), run ``sinks.compact_partitions``, then
    read back and report per-partition row count, exact price sum, AND the
    physical file count via ``input_file_name()``.  The oracle pins
    ``n_files = 1``: the compaction contract itself is part of the
    correctness gate, not just the data content.  At 100 TB the rewrite
    touches only fragmented partitions (file-preservation discipline
    asserted in tests/test_pipelines.py) and each partition compacts in
    one task."""
    from ..sinks import compact_partitions

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy").alias("ds"),
    )
    base = _tmp("io10_compact_")
    (
        o.repartition(6)  # fragment: every year partition lands 6 files
        .write.mode("overwrite")
        .partitionBy("ds")
        .parquet(base)
    )
    compact_partitions(spark, base, "ds", max_files=1)
    # partition-column type inference turns ds into int on read; pin string
    back = (
        spark.read.parquet(base)
        .withColumn("ds", F.col("ds").cast("string"))
        .withColumn("_f", F.input_file_name())
    )
    return back.groupBy("ds").agg(
        F.count("*").alias("n"),
        F.sum(dec2("o_totalprice")).cast("double").alias("price_sum"),
        F.countDistinct("_f").alias("n_files"),
    )


@register(
    "io11_compressed_csv_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
           true AS all_gz
    FROM lineitem WHERE l_orderkey % 50 = 0
    GROUP BY l_returnflag
    """,
    survey="S4,S5 extended (codec-compressed CSV round trip: gzip sink + declared-schema source, codec verified through file listing)",
)
def io11_compressed_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round trip through a compression codec: gzip on write (the
    archival default for interchange files a 100 TB pipeline emits —
    splittability doesn't matter for write-once interchange, size does),
    schema-declared read back, and the codec itself asserted by checking
    every physical file carries the .gz suffix (``all_gz`` must be true —
    pinned in the oracle like io10's file count).  Exact-decimal sum
    proves values survive the text encode/decode."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 50 == 0
    ).select("l_orderkey", "l_returnflag", "l_quantity")
    out = _tmp("io11_gzcsv_")
    li.write.mode("overwrite").option("compression", "gzip").csv(
        out, header=True
    )
    back = read_csv(
        spark,
        out,
        "l_orderkey bigint, l_returnflag string, l_quantity double",
    ).withColumn("_f", F.input_file_name())
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dec2("l_quantity")).cast("double").alias("qty_sum"),
        F.every(F.col("_f").endswith(".gz")).alias("all_gz"),
    )


@register(
    "io12_dpp_star_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
    FROM orders WHERE substr(o_orderpriority, 1, 1) = '1'
    GROUP BY o_orderpriority
    """,
    survey="S3/J-std extended (dynamic partition pruning: dim filter prunes fact partitions at runtime, driven end-to-end)",
)
def io12_dpp_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The star-join scan pattern that carries 100 TB warehouses: the fact
    table is written partitioned on the join attribute, the dimension
    filter is on a NON-join column (so no static partition filter can be
    inferred — only Dynamic Partition Pruning's runtime subquery prunes),
    and the fact scan ends up reading just the partitions the dim filter
    selects.  tests/test_plans.py asserts the ``dynamicpruning``
    expression in this exact plan; this query makes the path
    driver-checkable end-to-end through a real partitioned write +
    pruned read + aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    base = _tmp("io12_dpp_")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(base)
    fact = spark.read.parquet(base)
    dim = (
        o.select("o_orderpriority")
        .distinct()
        .withColumn("urgency_code", F.substring("o_orderpriority", 1, 1))
        .where(F.col("urgency_code") == "1")
        .select("o_orderpriority")
    )
    return (
        fact.join(dim, "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec2("o_totalprice")).cast("double").alias("price_sum"),
        )
    )


@register(
    "io13_parquet_bloom_roundtrip",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
           true AS bloom_written
    FROM orders WHERE o_custkey = 371
    """,
    survey="S4/S5 extended (parquet bloom filters on write: point-lookup row-group skipping for a non-sorted key)",
)
def io13_parquet_bloom_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet bloom filters, the point-lookup complement to zone maps
    (x38): min/max stats cannot skip row groups for a high-cardinality
    UNSORTED key (every group spans the full custkey range), but a
    per-row-group bloom filter answers 'key definitely absent' in one
    probe.  The write enables a bloom on o_custkey; the read is the
    archetypal needle query.  ``bloom_written`` is asserted
    behaviorally: the same data written with and without the option must
    strictly grow the file (the filter bitset lives in the file body;
    this environment's pyarrow predates the footer accessor) — pinned
    true in the oracle like io10's file count, so the driver gate fails
    if the option stops taking effect."""
    import glob as _glob
    import os as _os

    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .coalesce(1)
    )
    out = _tmp("io13_bloom_")
    plain = _tmp("io13_plain_")
    # the per-column `#col` option suffix is not honored by this writer
    # path; the global switch is — so the bloom-bearing file carries only
    # the lookup key + payload column (what a needle index wants anyway).
    (
        o.write.mode("overwrite")
        .option("parquet.bloom.filter.enabled", "true")
        .parquet(out)
    )
    o.write.mode("overwrite").parquet(plain)

    def _bytes(d: str) -> int:
        return sum(_os.path.getsize(f) for f in _glob.glob(f"{d}/*.parquet"))

    has_bloom = _bytes(out) > _bytes(plain)
    back = spark.read.parquet(out).where(F.col("o_custkey") == 371)
    return back.agg(
        F.count("*").alias("n"),
        F.sum(dec2("o_totalprice")).cast("double").alias("price_sum"),
        F.lit(bool(has_bloom)).alias("bloom_written"),
    )


@register(
    "io14_format_migration_audit",
    oracle="""
    WITH h AS (
        SELECT ('0x' || substr(md5(concat('5:', concat_ws('|',
                   o_orderkey::VARCHAR, o_custkey::VARCHAR, o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(18,2))::VARCHAR))), 1, 8))::BIGINT AS hv
        FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(hv) AS BIGINT) AS fingerprint_parquet,
           CAST(sum(hv) AS BIGINT) AS fingerprint_orc,
           true AS formats_match
    FROM h
    """,
    survey="S4/S5,A9 extended (format migration audit: parquet→ORC rewrite verified by order-independent fingerprints)",
)
def io14_format_migration_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The migration question every format/engine hop raises (the
    reference's MSSQL → CSV → GCS → BigQuery chain): did the bytes
    survive?  Orders is rewritten parquet → ORC, read back through the
    ORC reader, and BOTH sides reduce to the x31 order-independent
    fingerprint (canonical per-row md5, commutative sum) — one scan per
    side, no sort, identical plan shape at 100 TB.  The oracle pins
    ``formats_match`` and both fingerprints to the parquet truth, so a
    lossy rewrite (decimal drift, date coercion, dropped rows) fails
    the driver gate."""
    from ..sources.files import read_orc, write_orc

    def canon_fp(df: DataFrame):
        canon = F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            dec2("o_totalprice").cast("string"),
        )
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit("5:"), canon)), 1, 8), 16, 10
        ).cast("bigint")
        return df.select(h.alias("hv")).agg(
            F.count("*").alias("n"),
            F.sum("hv").cast("bigint").alias("fp"),
        )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    out = _tmp("io14_orc_")
    write_orc(o, out)
    back = read_orc(spark, out)
    pq_fp = canon_fp(o).collect()[0]
    orc_fp = canon_fp(back).collect()[0]
    return spark.createDataFrame(
        [
            (
                pq_fp["n"],
                pq_fp["fp"],
                orc_fp["fp"],
                (pq_fp["n"], pq_fp["fp"]) == (orc_fp["n"], orc_fp["fp"]),
            )
        ],
        "n_rows bigint, fingerprint_parquet bigint, fingerprint_orc bigint, formats_match boolean",
    )


@register(
    "io15_version_retention",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(2 AS BIGINT) AS n_versions_kept
    FROM orders GROUP BY o_orderstatus
    """,
    survey="S11,S12 extended (version retention: VACUUM for time travel — expire old immutable versions, newest still complete)",
)
def io15_version_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel needs a VACUUM: five immutable snapshot versions are
    published (growing slices of orders; v4 is complete), retention
    expires all but the last two, and the read back proves (a) the
    LATEST version still answers with the full data — the oracle is the
    plain aggregate over orders — and (b) exactly two versions remain on
    disk (pinned).  Version deletion is metadata-scale (whole immutable
    directories, oldest first); expired history simply stops resolving
    for as-of reads (asserted in tests)."""
    import os

    from ..sinks.retention import expire_versions
    from ..streaming.jobs import read_latest_snapshot

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    base = _tmp("io15_versions_")
    os.makedirs(base, exist_ok=True)
    for v in range(5):
        o.where(F.col("o_orderkey") % 5 < v + 1).write.mode(
            "overwrite"
        ).parquet(os.path.join(base, f"v{v:09d}"))
    expire_versions(base, keep_last=2)
    n_kept = len([d for d in os.listdir(base) if d.startswith("v")])
    latest = read_latest_snapshot(spark, base)
    return latest.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.lit(int(n_kept)).cast("bigint").alias("n_versions_kept"),
    )


# -- plan-audit fragments (VERDICT r4 #3) ------------------------------------
# The io* roundtrips write files at build; the read-back side is a plain
# scan.  Each fragment is the query's operator tree applied directly to the
# pre-write frame — the lazily-buildable plan the engine-wide audits walk.


@fragment("io1_csv_roundtrip")
def _frag_io1(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(dec2("c_acctbal")).cast("double").alias("acct_sum"),
    )


@fragment("io2_json_archive_roundtrip")
def _frag_io2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    target = o.where(F.col("o_orderkey") % 100 == 0)
    return target.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(dec2("o_totalprice")).cast("double").alias("price_sum"),
    )


@fragment("io3_snapshot_sink_roundtrip")
def _frag_io3(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.groupBy(F.col("s_nationkey").alias("nation")).agg(
        F.count("*").alias("n"),
        F.sum(dec2("s_acctbal")).cast("double").alias("bal_sum"),
    )


@fragment("io4_orc_roundtrip")
def _frag_io4(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 50 == 0
    )
    return (
        li.select("l_orderkey", "l_returnflag", "l_quantity")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec2("l_quantity")).cast("double").alias("qty_sum"),
        )
    )


@fragment("io5_text_corpus_roundtrip")
def _frag_io5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.count_distinct(F.md5(F.col("text").cast("binary")))
        .cast("bigint")
        .alias("n_distinct_md5"),
    )


@fragment("io6_schema_evolution_read")
def _frag_io6(spark: SparkSession, sf_dir: str) -> DataFrame:
    # union-with-missing-columns is the in-memory twin of the mergeSchema
    # read (typed-null backfill for the old generation)
    s = load_table(spark, sf_dir, "supplier")
    v1 = s.where(F.col("s_suppkey") % 2 == 0).select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    v2 = s.where(F.col("s_suppkey") % 2 == 1).select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.when(F.col("s_acctbal") >= 0.0, "ok").otherwise("debt").alias("tier"),
    )
    back = v1.unionByName(v2, allowMissingColumns=True)
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        F.sum(dec2("s_acctbal")).cast("double").alias("bal_sum"),
        F.count("tier").cast("bigint").alias("n_with_tier"),
    )
