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


def dedup_events_replay(
    spark,
    sf_dir: str,
    watermark: str = "1 hour",
    query_name: str = "jsonl_dedup_replay",
) -> DataFrame:
    """Deterministic two-delivery replay of :func:`dedup_events_stream`
    — staged gate candidate for the streaming dedup family (QUERIES.md
    r16 plan; previously the family's evidence ceiling was the
    count-tier assertions in tests/test_jsonl_dedup_stream.py).

    The events table is delivered TWICE as two mtime-staggered
    full-copy shards (``maxFilesPerTrigger=1``: micro-batch 0 = first
    delivery, micro-batch 1 = the full redelivery, exactly what
    at-least-once ingestion does), through
    ``dropDuplicatesWithinWatermark`` on event_id. Every redelivered
    row is value-identical to its first delivery and event_id is
    unique within the table (asserted), so the append emission
    multiset is SCHEDULE-INVARIANT and exactly one copy of each input
    row — regardless of whether a redelivery is suppressed by dedup
    state or by the watermark's late-row filter. The DuckDB twin
    therefore states the oracle entirely without the streaming
    machinery: the events table itself
    (``oracle_sql_ext.sql_dedup_events_replay``) — the salted_join
    discipline of certifying a mechanism by its result-invariance.
    Plumbing rides the shared ``_tercile_shard_replay`` harness (its
    ``shard_df`` hook expresses the redelivery the disjoint tercile
    split cannot), so a harness fix reaches this replay too.
    """
    from ccm_spark.sources.tables import load_table, ts_micros
    from ccm_spark.streaming.stateful import _tercile_shard_replay

    events = load_table(spark, sf_dir, "events")
    n = events.count()
    n_ids = events.select("event_id").distinct().count()
    if n != n_ids:
        raise ValueError(
            f"dedup_events_replay: events table has {n - n_ids} duplicate "
            "event_id rows — the replay oracle requires unique ids"
        )

    def build_stream(stream):
        deduped = dedup_events_stream(stream, watermark=watermark)
        return deduped.select(
            "event_id",
            ts_micros(deduped).alias("ts_us"),
            "user_id",
            "event_type",
            "value",
            "props",
        )

    return _tercile_shard_replay(
        spark,
        sf_dir,
        2,
        None,
        build_stream,
        query_name,
        "ccm_dedup_replay_",
        shard_df=lambda ev, i: ev,
    )
