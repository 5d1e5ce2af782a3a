"""C2/S1/S2 — library-size ladder + deterministic bootstrap sampling.

Reference parity: lib/ccm.ex:86-97 (C2 ladder), lib/ccm.ex:109-124 (S1
sample-without-replacement + S2 out-of-bag complement, with the L>=P and
|pred|<2 guards; those guards fall out naturally here — see plans/cross_map).

The reference samples with an unseeded RNG (lib/ccm.ex:117). Here sampling is
a *deterministic rank*: each embedding point gets an LCG key mixed from
(seed, dir_id, lib_size, sample_id, p); the first ``lib_size`` points by
(key, p) form the library. Same marginal distribution (uniform without
replacement), but replayable in Spark, DuckDB, and numpy alike — which is
what makes the driver's cross-engine hash check possible.

Scale notes:
  - The ladder is computed distributedly from per-pair counts with
    ``sequence()`` + ``explode`` — no driver round-trip, works for millions
    of pairs with heterogeneous lengths.
  - The fan-out (embedding x lib_sizes x samples) joins the per-pair ladder
    (AQE picks broadcast vs shuffle — the ladder grows with the fleet) and
    broadcasts the fixed-size samples dim; the row explosion is the
    algorithm's real cost (it IS the bootstrap), not overhead.
  - The rank window partitions by (pair_id, dir_id, lib_size, sample_id):
    at most P rows per partition, so no skew regardless of fleet size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ccm_spark.rng import sql_rank_key_expr


def lib_sizes_df(series: DataFrame, embedding_dim: int, tau: int) -> DataFrame:
    """C2 as a distributed op: (pair_id, lib_size) ladder per pair.

    max < 10 -> [max]; else range(max(max//10, 5), max, step max(2, max//20)).
    """
    counts = series.groupBy("pair_id").agg(F.count("*").alias("n"))
    max_lib = (F.col("n") - (embedding_dim - 1) * tau).cast("int")
    ladder = F.when(
        max_lib < 10, F.array(max_lib)
    ).otherwise(
        F.sequence(
            F.greatest(F.floor(max_lib / 10).cast("int"), F.lit(5)),
            max_lib,
            F.greatest(F.lit(2), F.floor(max_lib / 20).cast("int")),
        )
    )
    return counts.select("pair_id", F.explode(ladder).alias("lib_size"))


def fan_out_with_rank(
    emb: DataFrame,
    lib_sizes: DataFrame,
    num_samples: int,
    seed: int,
) -> DataFrame:
    """Explode embedding rows across (lib_size, sample_id) and rank them.

    Returns emb columns + (lib_size, sample_id, rank); ``rank <= lib_size``
    is the library flag (S1), the complement is the prediction set (S2).
    """
    spark = emb.sparkSession
    samples = spark.range(num_samples).select(F.col("id").cast("int").alias("sample_id"))
    # lib_sizes is ~20 rows PER PAIR — tiny locally, but unbounded in the
    # pair dimension (a million-pair fleet makes it a 20M-row relation), so
    # no broadcast hint: AQE broadcasts it while it is genuinely small and
    # falls back to a shuffled equi-join on pair_id when it is not. The
    # samples dim is a fixed num_samples rows regardless of scale — that
    # broadcast is always safe.
    fanned = (
        emb.join(lib_sizes, "pair_id")
        .crossJoin(F.broadcast(samples))
    )
    key = F.expr(sql_rank_key_expr("p", "sample_id", "lib_size", "dir_id", seed))
    w = Window.partitionBy("pair_id", "dir_id", "lib_size", "sample_id").orderBy(
        key.asc(), F.col("p").asc()
    )
    return fanned.withColumn("rank", F.row_number().over(w))
