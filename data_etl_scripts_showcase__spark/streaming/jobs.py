"""Structured Streaming jobs over the events table (SURVEY.md §2.10).

The reference is batch-only; its closest streaming-adjacent semantics are
the daily incremental snapshot (Gonukkad_Merchants.py:79-84), the D-7
rolling metric window (main.py:159-162, 587-607) and latest-record-wins
(main.py:659-662).  This module provides their Structured Streaming
equivalents: windowed aggregations with watermarks, stateful dedup, and
availableNow incremental processing — validated against their batch
equivalents on the same data (SURVEY §7 risk register: streaming has no
reference ground truth, so batch equivalence IS the test).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dec2


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (schema declared, never inferred).

    The file stores TIMESTAMP(NANOS) (see sources.tables): the stream reads
    the raw int64 and floor-divides to micros, identically to the batch
    loader, so stream/batch equivalence is exact.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = (
        "event_id bigint, ts bigint, user_id bigint, event_type string, "
        "value double, props string"
    )
    # the file-stream source wants a directory; glob-filter to the events
    # file so sibling tables in sf_dir aren't swept into the stream.
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # TIMESTAMP (not NTZ): watermarks only accept event time with a zone;
    # session TZ is pinned UTC so wall-clock values match the batch loader.
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts + exact-decimal value sums per event type."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec2("value")).cast("double").alias("value_sum"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window counts (each event lands in window/slide windows)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
        )
    )


def sessionize_batch(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (session_window — dynamic-gap sessionization).

    Works identically over a stream (with watermark) or a batch frame; the
    oracle equivalent is the classic lag/cumsum gaps-and-islands SQL.
    """
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


def stream_dedup_keys(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup: first event per (user_id, event_type).

    dropDuplicatesWithinWatermark bounds the dedup state — the streaming
    form of latest/first-record-wins (main.py:659-662).
    """
    src = events.withWatermark("ts", watermark)
    return src.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )


def run_to_memory(
    sdf: DataFrame, mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Drive a streaming frame to completion synchronously (availableNow)
    and return the materialized result from the memory sink."""
    spark = sdf.sparkSession
    qname = name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(qname)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt_{qname}_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)
