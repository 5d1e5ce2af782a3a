from ccm_spark.streaming.windows import (
    event_stream,
    windowed_event_stats,
    windowed_pair_correlation,
)

__all__ = ["event_stream", "windowed_event_stats", "windowed_pair_correlation"]
