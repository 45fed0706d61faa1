"""data_etl_scripts_showcase__spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``Ch-Siddharth/data-etl-scripts-showcase-``
(surveyed exhaustively in /root/repo/SURVEY.md).  The reference hand-rolls
every relational operation in row-at-a-time Python; here every capability is
a declarative DataFrame / Spark SQL plan optimized by Catalyst and executed
by Tungsten, designed for a 1000-executor cluster reading ~100 TB:

- no driver-side collects in any operator (SURVEY §4 anti-patterns);
- joins broadcast small sides and shuffle on keys otherwise;
- filters/projections are expressed declaratively so Catalyst pushes them
  into the parquet scan;
- Python only runs inside Arrow-batched Pandas UDFs (enrichment stage),
  never per-row.

Layout:
    session      SparkSession factory (AQE, UTC, Arrow)
    sources      table registry + schema-checked loaders, csv/json readers
    functions    scalar/column expression library (SURVEY §2.7-2.9)
    operators    relational/agg/window/array/dedup/similarity/text ops
    sinks        snapshot writers, CTAS promote, QA gates, run-metrics
    enrichment   mapInPandas keyed-enrichment stage (mockable fetcher)
    plans        end-to-end pipelines (reference §3.1-3.3 re-expressed)
    streaming    Structured Streaming jobs over the events table
    queries      the driver-facing query registry (queries()/oracle_sql())
"""

__version__ = "0.1.0"
