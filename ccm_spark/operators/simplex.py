"""W1/P1 — simplex projection weights + weighted prediction.

Reference parity: lib/ccm.ex:246-262 (W1: weight = 1.0 if dist < 1e-12 else
exp(-dist / (min_dist + 1e-8)); NOTE this matches the CODE, which deviates
from README.md:97-101 / Sugihara's normalisation — SURVEY.md §2 W1), and
lib/ccm.ex:142-177 (P1: x_hat = sum(w*target)/sum(w), 0.0 if sum(w)==0).

The sum(w)==0 guard is expressed with CASE so ANSI-mode Spark never divides
by zero; in practice exp() > 0 keeps the sum positive whenever neighbors
exist, but the guard pins the reference's degenerate semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ccm_spark.operators.knn import GROUP_KEYS


def simplex_weights(neighbors: DataFrame) -> DataFrame:
    """W1 over the k-nearest rows of one query point."""
    w = Window.partitionBy(*GROUP_KEYS, "q_p")
    min_dist = F.min("dist").over(w)
    weight = F.when(F.col("dist") < 1e-12, F.lit(1.0)).otherwise(
        F.exp(-F.col("dist") / (min_dist + 1e-8))
    )
    return neighbors.withColumn("weight", weight)


def weighted_prediction(weighted: DataFrame) -> DataFrame:
    """P1: one row per query point with (actual, predicted)."""
    wsum = F.sum("weight")
    return weighted.groupBy(*GROUP_KEYS, "q_p").agg(
        F.first("q_tgt").alias("actual"),
        F.when(wsum == 0.0, F.lit(0.0))
        .otherwise(F.sum(F.col("weight") * F.col("l_tgt")) / wsum)
        .alias("predicted"),
    )
