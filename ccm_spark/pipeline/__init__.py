from ccm_spark.pipeline import (
    dedup,
    events_ops,
    html,
    lm,
    mixing,
    multimodal,
    search,
    series_search,
    similarity,
    text,
    tokenize,
    urls,
)

__all__ = [
    "dedup",
    "events_ops",
    "html",
    "lm",
    "mixing",
    "multimodal",
    "search",
    "series_search",
    "similarity",
    "text",
    "tokenize",
    "urls",
]
