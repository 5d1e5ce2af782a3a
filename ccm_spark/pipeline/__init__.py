from ccm_spark.pipeline import (
    dedup,
    events_ops,
    lm,
    mixing,
    multimodal,
    similarity,
    text,
    tokenize,
    urls,
)

__all__ = [
    "dedup",
    "events_ops",
    "lm",
    "mixing",
    "multimodal",
    "similarity",
    "text",
    "tokenize",
    "urls",
]
