from ccm_spark.streaming.windows import (
    event_stream,
    windowed_event_stats,
    windowed_pair_correlation,
)
from ccm_spark.streaming.stateful import (
    running_stats_batch,
    running_value_stats,
    streaming_detect_gaps,
    streaming_hourly_anomalies,
    streaming_hourly_anomalies_watermarked,
    streaming_sessionize,
    streaming_sessionize_watermarked,
)
from ccm_spark.streaming.dedup_stream import (
    dedup_documents_stream,
    dedup_events_stream,
)

__all__ = [
    "event_stream",
    "windowed_event_stats",
    "windowed_pair_correlation",
    "running_stats_batch",
    "running_value_stats",
    "streaming_detect_gaps",
    "streaming_hourly_anomalies",
    "streaming_hourly_anomalies_watermarked",
    "streaming_sessionize",
    "streaming_sessionize_watermarked",
    "dedup_documents_stream",
    "dedup_events_stream",
]
