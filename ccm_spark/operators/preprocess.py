"""Series preprocessing for EDM — the conditioning steps run BEFORE any
cross-map (no reference analogue; the reference consumes raw lists):

  - :func:`first_difference` — de-trend by differencing: a shared trend
    makes two unrelated series mutually predictable and FAKES CCM
    convergence (the standard EDM pitfall); differencing removes it.
  - :func:`zscore` — per-pair standardisation, so amplitude differences
    between fleet members never leak into shared distance thresholds.
  - :func:`winsorize` — clip each column to its per-pair [p, 1-p]
    quantiles: one glitched sensor reading otherwise dominates every
    euclidean distance in its neighbourhood (kNN is not robust).

All three operate on the engine's fleet relation ``(pair_id, t, x, y)``
and are pure window/aggregate dataflow over the pair key — one shuffle
each at most, linear across a million-pair fleet, deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def first_difference(series: DataFrame, cols: tuple[str, str] = ("x", "y")) -> DataFrame:
    """x'_t = x_t - x_{t-1} per pair (t re-indexed from 0, one row
    shorter) — one lag window per pair, ordered by t."""
    w = Window.partitionBy("pair_id").orderBy("t")
    out = series
    for c in cols:
        out = out.withColumn(c, F.col(c) - F.lag(c).over(w))
    return (
        out.where(F.col(cols[0]).isNotNull())
        .withColumn("t", F.row_number().over(w) - 1)
        .select("pair_id", "t", *cols)
    )


def zscore(series: DataFrame, cols: tuple[str, str] = ("x", "y")) -> DataFrame:
    """(v - mean) / stddev_pop per pair and column; a constant column
    (sd = 0) maps to 0.0 — the same convention as the series-search
    z-normalisation."""
    aggs = []
    for c in cols:
        aggs += [F.avg(c).alias(f"_mu_{c}"), F.stddev_pop(c).alias(f"_sd_{c}")]
    stats = series.groupBy("pair_id").agg(*aggs)
    out = series.join(stats, "pair_id")
    for c in cols:
        out = out.withColumn(
            c,
            F.when(F.col(f"_sd_{c}") > 0, (F.col(c) - F.col(f"_mu_{c}")) / F.col(f"_sd_{c}"))
            .otherwise(F.lit(0.0)),
        )
    return out.select("pair_id", "t", *cols)


def winsorize(
    series: DataFrame,
    p: float = 0.05,
    cols: tuple[str, str] = ("x", "y"),
) -> DataFrame:
    """Clip each column to its per-pair exact [p, 1-p] quantiles
    (percentile with linear interpolation — deterministic, matching
    ``events_ops.value_quantiles``'s exact formulation rather than the
    sketch). Quantiles come from one aggregate per pair (bounded by
    fleet size, not points); the clip is a narrow projection."""
    if not 0 < p < 0.5:
        raise ValueError(f"winsorize: p must be in (0, 0.5), got {p}")
    aggs = []
    for c in cols:
        aggs += [
            F.expr(f"percentile({c}, {p})").alias(f"_lo_{c}"),
            F.expr(f"percentile({c}, {1 - p})").alias(f"_hi_{c}"),
        ]
    stats = series.groupBy("pair_id").agg(*aggs)
    out = series.join(stats, "pair_id")
    for c in cols:
        out = out.withColumn(
            c,
            F.least(F.greatest(F.col(c), F.col(f"_lo_{c}")), F.col(f"_hi_{c}")),
        )
    return out.select("pair_id", "t", *cols)
