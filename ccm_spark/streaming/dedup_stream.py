"""Streaming deduplication — exactly-once semantics over at-least-once
ingestion.

Two flavors the continuous corpus/event pipeline needs:

- :func:`dedup_events_stream` — drop redelivered events by ``event_id``
  within a watermark horizon (``dropDuplicatesWithinWatermark``): state
  per key is retained only until the watermark passes it, so state size
  is bounded by (arrival rate × horizon), not by stream history.
- :func:`dedup_documents_stream` — drop exact-duplicate documents by
  content md5 as they are ingested; same bounded-state mechanism, keyed
  on the content hash (doc_ids differ across redeliveries, content does
  not).

Both fall back to plain ``dropDuplicates`` on batch inputs so one
transformation serves both execution modes (the tests assert
streaming == batch on a doubled source).

Scale: state lives in the state store partitioned by the dedup key —
uniform md5 keys shard evenly; the watermark horizon is the memory knob.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ccm_spark.streaming.windows import _with_event_time


def dedup_events_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop duplicate event deliveries by event_id (batch: dropDuplicates)."""
    e = _with_event_time(events)
    if e.isStreaming:
        return e.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return e.dropDuplicates(["event_id"])


def dedup_documents_stream(docs: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Keep the first-seen copy of each distinct document text.

    Ingestion-time exact dedup: key = 128-bit content md5 (collision-safe
    for corpus purposes), carried as a column so downstream near-dup
    stages can reuse it without re-hashing.
    """
    keyed = docs.withColumn("content_md5", F.md5("text"))
    if docs.isStreaming:
        keyed = keyed.withColumn("ingest_time", F.current_timestamp())
        return (
            keyed.withWatermark("ingest_time", watermark)
            .dropDuplicatesWithinWatermark(["content_md5"])
            .drop("ingest_time")
        )
    # batch: "first-seen" = lowest doc_id (ingestion order proxy) — a plain
    # dropDuplicates keeps an arbitrary partition-dependent row
    w = Window.partitionBy("content_md5").orderBy(F.col("doc_id").asc())
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
