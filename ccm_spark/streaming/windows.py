"""Structured Streaming surface — windowed aggregation over the events
stream.

The reference is batch-only (SURVEY.md §2.1: no streaming semantics exist),
so this is extension surface: the streaming ingestion a continuous
time-series pipeline needs before CCM-style analysis. The same
transformations run identically on batch DataFrames (pass any events
DataFrame) and on ``readStream`` sources — tests exercise both through
``trigger(availableNow)`` into a memory sink.

Watermarking: 10 minutes on event time handles late data; windowed
aggregates are append-safe. At scale this is standard shuffle-per-window
state, partitioned by (event_type, window) — no skew beyond event-type
cardinality, and AQE does not apply to streaming, so the shuffle partition
count is the lever.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ccm_spark.sources.tables import ts_micros

# fallback schema when the stream dir has no files yet to infer from
EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet. Streaming reads need a declared
    schema; infer it from a static read of the same directory so the ts
    physical type (int64 nanos vs TIMESTAMP[_NTZ]) is whatever the files
    actually carry — downstream ops dispatch on it via ``ts_micros``."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        schema = spark.read.parquet(sf_dir).schema
    except Exception:
        schema = EVENTS_SCHEMA
    return spark.readStream.schema(schema).parquet(f"{sf_dir}")


def _with_event_time(events: DataFrame) -> DataFrame:
    # dtype-dispatched epoch micros -> timestamp (keeps determinism for
    # int64-nanos inputs via integer floor division inside ts_micros)
    return events.withColumn("event_time", F.timestamp_micros(ts_micros(events)))


def windowed_event_stats(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window per-type stats; works on batch and streaming input."""
    e = _with_event_time(events)
    if e.isStreaming:
        e = e.withWatermark("event_time", watermark)
    return (
        e.groupBy(F.window("event_time", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def windowed_pair_correlation(
    events: DataFrame,
    x_event_type: str = "click",
    y_event_type: str = "view",
    window: str = "6 hours",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-window Pearson correlation between two event types' window sums —
    the streaming precursor of the CCM pair series: emits one correlation
    input row per (window), which a downstream batch CCM consumes."""
    e = _with_event_time(events)
    if e.isStreaming:
        e = e.withWatermark("event_time", watermark)
    pivoted = (
        e.where(F.col("event_type").isin([x_event_type, y_event_type]))
        .groupBy(F.window("event_time", window).alias("w"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == x_event_type, F.col("value")).otherwise(0.0)
            ).alias("x_sum"),
            F.sum(
                F.when(F.col("event_type") == y_event_type, F.col("value")).otherwise(0.0)
            ).alias("y_sum"),
            F.count("*").alias("n_events"),
        )
    )
    return pivoted.select(
        F.col("w.start").alias("window_start"), "x_sum", "y_sum", "n_events"
    )
