"""R1/R2/R3 — Pearson skill, bootstrap mean, OLS-slope convergence.

Reference parity: lib/ccm.ex:187-213 (R1 Pearson with <2-pairs and
zero-denominator guards -> 0.0), lib/ccm.ex:59-67 (R2: sum of sample
correlations divided by num_samples), lib/ccm.ex:215-244 (R3: least-squares
slope of avg_corr vs lib_size; <3 points or zero denominator -> not
convergent; convergent iff slope > 0.001).

R1 is computed from raw sums with the reference's own formula rather than
``F.corr`` — this makes the 0.0 guards explicit and keeps the expression
identical to the DuckDB oracle SQL (Spark's corr yields NULL/NaN where the
reference yields 0.0, SURVEY.md §2 R1).

Degenerate samples (library >= all points, or <2 prediction points) simply
produce no rows here; R2 divides by the *constant* num_samples so a missing
sample contributes exactly the reference's 0.0. Lib sizes where every sample
is degenerate are reinstated by a left join from the ladder grid so R3 sees
the same (lib_size, 0.0) points the reference sees.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ccm_spark.operators.knn import GROUP_KEYS


#: zero-variance guard tolerance — must stay identical to oracle.VAR_EPS and
#: the DuckDB oracle SQL (see ccm_spark.oracle.VAR_EPS for rationale).
VAR_EPS = 1e-9


def pearson_by_sample(pred: DataFrame) -> DataFrame:
    """R1: per-sample Pearson correlation of (actual, predicted)."""
    n = F.count("*").cast("double")
    sa = F.sum("actual")
    sp = F.sum("predicted")
    saa = F.sum(F.col("actual") * F.col("actual"))
    spp = F.sum(F.col("predicted") * F.col("predicted"))
    sap = F.sum(F.col("actual") * F.col("predicted"))
    va = n * saa - sa * sa
    vp = n * spp - sp * sp
    degenerate = (
        (n < 2)
        | (va <= VAR_EPS * F.greatest(saa, F.lit(1.0)))
        | (vp <= VAR_EPS * F.greatest(spp, F.lit(1.0)))
    )
    corr = F.when(degenerate, F.lit(0.0)).otherwise(
        (n * sap - sa * sp) / (F.sqrt(va) * F.sqrt(vp))
    )
    return pred.groupBy(*GROUP_KEYS).agg(corr.alias("corr"))


def skill_by_lib_size(
    sample_corr: DataFrame, lib_grid: DataFrame, num_samples: int
) -> DataFrame:
    """R2: sum(corr)/num_samples per (pair, direction, lib_size), with
    fully-degenerate lib sizes reinstated as 0.0 from the ladder grid."""
    agg = sample_corr.groupBy("pair_id", "dir_id", "lib_size").agg(
        (F.sum("corr") / F.lit(float(num_samples))).alias("correlation")
    )
    return (
        lib_grid.join(agg, ["pair_id", "dir_id", "lib_size"], "left")
        .select(
            "pair_id",
            "dir_id",
            "lib_size",
            F.coalesce(F.col("correlation"), F.lit(0.0)).alias("correlation"),
        )
    )


def convergence(skill: DataFrame) -> DataFrame:
    """R3: OLS slope of correlation vs lib_size per (pair, direction)."""
    n = F.count("*").cast("double")
    x = F.col("lib_size").cast("double")
    y = F.col("correlation")
    sx = F.sum(x)
    sy = F.sum(y)
    sxx = F.sum(x * x)
    sxy = F.sum(x * y)
    den = n * sxx - sx * sx
    slope = F.when((n < 3) | (den == 0.0), F.lit(0.0)).otherwise(
        (n * sxy - sx * sy) / den
    )
    return skill.groupBy("pair_id", "dir_id").agg(
        slope.alias("slope"),
        F.when((n < 3) | (den == 0.0), F.lit(False))
        .otherwise(((n * sxy - sx * sy) / den) > 0.001)
        .alias("convergent"),
    )
