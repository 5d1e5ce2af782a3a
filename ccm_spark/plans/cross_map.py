"""The full bidirectional CCM sweep as ONE lazy Catalyst plan.

Pipeline (SURVEY.md §3.4): series -> E1/A1 lead-window embedding (per
direction, unioned) -> C2 distributed ladder -> fan-out x samples with LCG
rank (S1/S2) -> within-group join + unrolled distance (J1/D1) -> top-k
window (K1) -> simplex weights (W1) -> weighted prediction agg (P1) ->
per-sample Pearson (R1) -> per-lib-size mean (R2) -> OLS slope (R3).

Nothing here executes — callers get DataFrames and Catalyst plans the whole
DAG at once (predicate pushdown, partial aggregation, AQE re-planning all
apply). Shuffle boundaries: the rank window, the kNN join, and the three
aggregations — all keyed on (pair_id, dir_id, [lib_size, sample_id]), so
parallelism grows with the pair fleet and no single key ever exceeds one
series' bootstrap fan-out.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.storagelevel import StorageLevel

from ccm_spark.config import CCMConfig
from ccm_spark.operators.embedding import DIRECTION_NAMES, embed_bidirectional
from ccm_spark.operators.knn import knn_candidates, top_k_neighbors
from ccm_spark.operators.sampling import fan_out_with_rank, lib_sizes_df
from ccm_spark.operators.simplex import simplex_weights, weighted_prediction
from ccm_spark.operators.stats import convergence, pearson_by_sample, skill_by_lib_size


def _direction_name_col() -> F.Column:
    return (
        F.when(F.col("dir_id") == 0, F.lit(DIRECTION_NAMES[0]))
        .otherwise(F.lit(DIRECTION_NAMES[1]))
        .alias("direction")
    )


def release_cached(result: DataFrame) -> None:
    """Unpersist the cached subtrees a plan function attached to ``result``
    (``_ccm_persisted``). Call after the terminal action: repeated API calls
    in a long-lived session would otherwise accumulate cached blocks on
    executors. No-op for plans without cached subtrees."""
    for df in getattr(result, "_ccm_persisted", []):
        df.unpersist()


def sample_corr_plan(
    series: DataFrame, config: CCMConfig
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """Returns (per-sample correlations, lib-size grid spanning both dirs,
    persisted subtrees for release_cached).

    ``series`` and the ranked fan-out are persisted: the series feeds four
    plan branches (two directions x embedding + the ladder + the grid) and
    the fan-out feeds both sides of the kNN self-join — without caching,
    Spark physically duplicates those subtrees (explain showed 170 exchanges
    and zero reuse), doubling the dominant fan-out computation at any scale.
    Both relations are bounded per pair (N and P x |ladder| x samples rows),
    so MEMORY_AND_DISK stays safe on executors.
    """
    series = series.persist(StorageLevel.MEMORY_AND_DISK)
    emb = embed_bidirectional(series, config.embedding_dim, config.tau)
    if config.lib_sizes is not None:
        spark = series.sparkSession
        explicit = spark.createDataFrame(
            [(int(ls),) for ls in config.lib_sizes], "lib_size int"
        )
        ladder = series.select("pair_id").distinct().crossJoin(explicit)
    else:
        ladder = lib_sizes_df(series, config.embedding_dim, config.tau)
    fanned = fan_out_with_rank(emb, ladder, config.num_samples, config.seed).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cands = knn_candidates(
        fanned, config.embedding_dim, config.exclusion_radius
    )
    nn = top_k_neighbors(cands, config.embedding_dim)
    pred = weighted_prediction(simplex_weights(nn))
    corr = pearson_by_sample(pred)
    dirs = series.sparkSession.range(2).select(F.col("id").cast("int").alias("dir_id"))
    lib_grid = ladder.crossJoin(F.broadcast(dirs))
    return corr, lib_grid, [series, fanned]


def skill_plan(series: DataFrame, config: CCMConfig) -> DataFrame:
    """(pair_id, direction, lib_size, correlation) — R2 output."""
    corr, lib_grid, persisted = sample_corr_plan(series, config)
    skill = skill_by_lib_size(corr, lib_grid, config.num_samples)
    out = skill.select(
        "pair_id", _direction_name_col(), "lib_size", "correlation"
    )
    out._ccm_persisted = persisted
    return out


def convergence_plan(series: DataFrame, config: CCMConfig) -> DataFrame:
    """(pair_id, direction, slope, convergent) — R3 output."""
    corr, lib_grid, persisted = sample_corr_plan(series, config)
    skill = skill_by_lib_size(corr, lib_grid, config.num_samples)
    conv = convergence(skill)
    out = conv.select("pair_id", _direction_name_col(), "slope", "convergent")
    out._ccm_persisted = persisted
    return out


def ccm_plan(series: DataFrame, config: CCMConfig) -> DataFrame:
    """Skill + convergence: one row per (pair, direction, lib_size).

    R3 (the per-(pair, dir) OLS slope, identical guards and formula to
    :func:`operators.stats.convergence`) is computed as WINDOW aggregates
    over the skill relation rather than a separate aggregation joined
    back. The join formulation planned the entire fan-out -> kNN ->
    aggregation chain — the workload's dominant cost — into BOTH join
    branches (Catalyst does not de-duplicate common subtrees across join
    inputs), executing it twice; even persisting skill still paid a cache
    round-trip plus the join's exchanges. The window adds ONE exchange on
    (pair_id, dir_id) — partitions of ladder-size rows, skew-free at any
    fleet size — and eliminates the join, the duplicate chain, and the
    cache outright.
    """
    corr, lib_grid, persisted = sample_corr_plan(series, config)
    skill = skill_by_lib_size(corr, lib_grid, config.num_samples)
    w = Window.partitionBy("pair_id", "dir_id")
    n = F.count("*").over(w).cast("double")
    x = F.col("lib_size").cast("double")
    y = F.col("correlation")
    sx = F.sum(x).over(w)
    sy = F.sum(y).over(w)
    sxx = F.sum(x * x).over(w)
    sxy = F.sum(x * y).over(w)
    den = n * sxx - sx * sx
    degenerate = (n < 3) | (den == 0.0)
    slope_val = (n * sxy - sx * sy) / den
    out = skill.select(
        "pair_id",
        _direction_name_col(),
        "lib_size",
        "correlation",
        F.when(degenerate, F.lit(0.0)).otherwise(slope_val).alias("slope"),
        F.when(degenerate, F.lit(False))
        .otherwise(slope_val > 0.001)
        .alias("convergent"),
    )
    out._ccm_persisted = persisted
    return out
