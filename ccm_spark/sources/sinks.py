"""Parquet sinks — the write side of the engine.

The reference has no sinks at all (results are in-memory maps,
SURVEY.md §2.1); a 100 TB pipeline needs opinionated writers:

  - ``write_partitioned``: directory-partitioned parquet with a target
    file-size control (`repartition` by the partition columns so each
    directory gets a bounded file count instead of one file per task).
  - ``write_series_bucketed``: pair-bucketed layout for series data so a
    later CCM fast path (``fastpath.ccm_fast_iterated``) can run without
    its groupBy shuffle — the write-side half of a co-located join.

Compression default is zstd (better ratio than snappy at similar speed on
modern cores).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    files_per_partition: int = 1,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Write parquet partitioned by ``partition_by`` with a bounded file
    count per directory (at most ``files_per_partition`` files each)."""
    out = df
    if partition_by:
        keys = [F.col(c) for c in partition_by]
        if files_per_partition > 1:
            # Salt the repartition keys: hashing only the partition columns
            # would land each directory's rows in ONE task (one file) no
            # matter the knob. The salt splits a directory across up to
            # files_per_partition tasks.
            salt = F.pmod(
                F.xxhash64(F.struct(*[F.col(c) for c in df.columns])),
                F.lit(files_per_partition),
            )
            keys = [*keys, salt]
        # headroom so distinct (dir, salt) combos rarely hash-collide into
        # the same shuffle partition (a collision merges files, silently
        # undercutting the requested file count)
        shuffle_headroom = 8
        out = df.repartition(
            files_per_partition * max(shuffle_headroom, len(partition_by)), *keys
        )
        writer = out.write.partitionBy(*partition_by)
    else:
        writer = out.coalesce(files_per_partition).write
    writer.mode(mode).option("compression", compression).parquet(path)


def write_series_bucketed(
    series: DataFrame,
    path: str,
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Pair-clustered series layout: rows hash-partitioned by pair_id and
    sorted by (pair_id, t) within files, so downstream per-pair processing
    reads each pair contiguously from one file (mapInPandas with no
    shuffle). Plain directory parquet (no metastore dependency)."""
    (
        series.repartition(num_buckets, "pair_id")
        .sortWithinPartitions("pair_id", "t")
        .write.mode(mode)
        .option("compression", "zstd")
        .parquet(path)
    )


def read_series_bucketed(spark, path: str) -> DataFrame:
    """Read back a bucketed series layout (files preserve pair clustering)."""
    return spark.read.parquet(path)


def checksum(df: DataFrame) -> int:
    """Order-insensitive content checksum of a DataFrame (xor of row
    hashes) — a cheap distributed integrity check for sink verification."""
    hashed = df.select(F.xxhash64(F.struct(*df.columns)).alias("h"))
    # bit_xor: order-insensitive and overflow-free under ANSI mode
    row = hashed.agg(
        F.expr("bit_xor(h)").alias("x"), F.count("*").alias("n")
    ).collect()[0]
    return hash((row.x, row.n))


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = 8,
    seed: str = "epoch0",
    compression: str = "zstd",
) -> dict:
    """Write a corpus as numbered training shards in deterministic
    shuffled order, with a machine-readable manifest — the hand-off
    artifact from the data pipeline to a training job.

    Layout: ``shard=K/`` directories, one file each, where K is the
    global-shuffle partition index — so reading shard 0, 1, 2, ... and
    each file top-to-bottom IS the epoch's global permutation (rows carry
    ``shuffle_key`` and their absolute ``global_pos``). The manifest
    (returned AND written as ``_manifest.json``) records per-shard row
    and token counts plus the totals a trainer needs for scheduling;
    counts are derived from the same DataFrame that was written. NOTE:
    runs eagerly (the write + two counting jobs).

    Scale: the one exchange is the range partition of the shuffle;
    manifest aggregation touches only (shard, n_tokens) projections.
    """
    import json

    from ccm_spark.functions.hashing import tokens_col
    from ccm_spark.pipeline.mixing import global_shuffle, with_global_positions

    # Materialize the shuffled partitioning ONCE before stamping positions:
    # with_global_positions runs a counting job and the write runs a second
    # job, and repartitionByRange re-samples its range boundaries per
    # execution (seeded by RDD id) — at scale the sample is partial, so two
    # independent executions can place boundary rows in different
    # partitions, silently misaligning the count-derived offsets with the
    # written shards. localCheckpoint pins both jobs to the same
    # materialized partitions (and truncates the upstream lineage).
    shuffled = global_shuffle(docs, seed=seed, num_partitions=n_shards)
    gs = with_global_positions(shuffled.localCheckpoint(eager=True))
    out = gs.withColumn("shard", F.spark_partition_id()).withColumn(
        "n_tokens", F.size(tokens_col("text")).cast("long")
    )
    out.write.mode("overwrite").partitionBy("shard").option(
        "compression", compression
    ).parquet(path)
    spark = docs.sparkSession
    written = spark.read.parquet(path)
    per_shard = [
        {
            "shard": int(r["shard"]),
            "n_docs": int(r["n_docs"]),
            "n_tokens": int(r["n_tokens"]),
            "min_pos": int(r["min_pos"]),
            "max_pos": int(r["max_pos"]),
        }
        for r in written.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("global_pos").alias("min_pos"),
            F.max("global_pos").alias("max_pos"),
        )
        .orderBy("shard")
        .collect()
    ]
    manifest = {
        "seed": seed,
        "n_shards": len(per_shard),
        "n_docs": sum(s["n_docs"] for s in per_shard),
        "n_tokens": sum(s["n_tokens"] for s in per_shard),
        "shards": per_shard,
    }
    import os

    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def read_training_shards(spark, path: str, start_pos: int = 0):
    """The read half of the trainer hand-off: load a
    :func:`write_training_shards` layout as ``(manifest, df)`` where
    ``df`` holds every row with ``global_pos >= start_pos`` — resuming
    an epoch mid-stream (a restarted training job knows only its step
    number, which IS the global position).

    The manifest's per-shard ``[min_pos, max_pos]`` ranges make the
    resume a PARTITION-PRUNED read: shards entirely below ``start_pos``
    are excluded by a ``shard IN (...)`` predicate on the partition
    column (never opened — directory pruning, visible as a partition
    filter in the plan), and only the one boundary shard pays a row
    filter. Ordering contract: ``ORDER BY global_pos`` is the epoch
    permutation; within-shard file order already matches it, so a
    sequential consumer can read shard by shard without a sort."""
    import json
    import os

    with open(os.path.join(path, "_manifest.json")) as f:
        manifest = json.load(f)
    live = [
        s["shard"] for s in manifest["shards"] if s["max_pos"] >= start_pos
    ]
    df = spark.read.parquet(path).where(F.col("shard").isin(live))
    if start_pos > 0:
        df = df.where(F.col("global_pos") >= start_pos)
    return manifest, df
