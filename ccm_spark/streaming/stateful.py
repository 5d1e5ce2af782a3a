"""Custom stateful streaming — per-key running statistics with
``applyInPandasWithState``.

Extension surface (the reference has no streaming, SURVEY.md §2.1): a
continuously-updated per-event-type mean/variance (Welford update) that a
quality-monitoring pipeline keeps over an unbounded event stream. State is
one tiny tuple per key, so at scale memory is bounded by key cardinality,
not stream length; the shuffle keys on event_type.

Batch equivalence: ``running_stats_batch`` computes the same quantities
with plain aggregations — the streaming test asserts the final state
matches it.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_type string, n bigint, mean double, m2 double"
STATE_SCHEMA = "n bigint, mean double, m2 double"


def _welford_merge(n, mean, m2, values: pd.Series):
    for v in values:
        n += 1
        delta = v - mean
        mean += delta / n
        m2 += delta * (v - mean)
    return n, mean, m2


def running_value_stats(events: DataFrame) -> DataFrame:
    """Streaming: per-event-type running (n, mean, m2) via flatMapGroupsWithState."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdfs:
            n, mean, m2 = _welford_merge(n, mean, m2, pdf["value"].astype(float))
        state.update((n, mean, m2))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n": [n], "mean": [mean], "m2": [m2]}
        )

    return (
        events.groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_stats_batch(events: DataFrame) -> DataFrame:
    """Batch ground truth for the same statistics."""
    return events.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.avg("value").alias("mean"),
        (F.var_pop("value") * F.count("value")).alias("m2"),
    )
