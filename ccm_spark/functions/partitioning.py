"""Partition-spreading helper for compute-bound narrow stages.

Small-by-bytes inputs (a single parquet file, a 5000-row corpus) arrive in
one partition, and AQE's partition coalescing will fold a plain
``repartition(col)`` right back to one partition because the byte size is
tiny — but the downstream work (interpreted higher-order functions, md5
per token, Python UDFs) is CPU-bound per ROW, not per byte. An explicit
partition count is exempt from AQE coalescing, which keeps such stages
spread across all cores. On a real cluster with many input splits this is
a near-no-op (hash exchange at the task count the session already targets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition on ``cols`` with an explicit partition count so AQE
    cannot coalesce the exchange away."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols)
