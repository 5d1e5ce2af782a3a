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


def spread(df: DataFrame, *cols: str, factor: int = 1) -> DataFrame:
    """Hash-repartition on ``cols`` with an explicit partition count so AQE
    cannot coalesce the exchange away.

    ``factor`` multiplies the partition count past the core count. Use > 1
    when the downstream per-GROUP cost is large and lumpy (e.g. a whole
    bootstrap sweep per pair_id in ``applyInPandas``): with partitions ==
    cores, hashing K heavy keys into K buckets strands ~(ln K / ln ln K)
    keys in the worst bucket while other cores idle; finer tasks let the
    scheduler rebalance. Measured on the 64-pair fleet: factor=8 cuts wall
    ~25% vs factor=1. Row-heavy evenly-costed stages should keep the
    default — the law of large row counts already balances them."""
    n = df.sparkSession.sparkContext.defaultParallelism * factor
    return df.repartition(n, *cols)
