"""E1/A1/O1 — time-delay embedding as lead() window projections.

Reference parity: lib/ccm.ex:99-107 (E1, forward lags: row i =
[s[i+j*tau] for j in 0..E-1]), lib/ccm.ex:119 (A1, adjusted target =
target[i + (E-1)*tau]), lib/ccm.ex:48-53 (O1 direction dispatch:
``x_causes_y`` embeds Y and predicts X).

Design notes for scale:
  - Embedding components are kept as separate double columns ``e0..e{E-1}``
    rather than an array: distance expressions then stay fully inside
    whole-stage codegen with a fixed evaluation order (bit-reproducible
    across engines, which the oracle parity check needs).
  - One window pass per direction (no crossJoin-then-window): the window is
    partitioned by ``pair_id``, so a fleet of millions of series parallelises
    across executors with a single shuffle on pair_id.
  - ``t`` must be dense 0..N-1 per pair (the reference's implicit-index time
    model, README.md:60); the embedding row index ``p`` then equals ``t``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DIR_X_CAUSES_Y = 0  # embeds y, predicts x (lib/ccm.ex:50-51)
DIR_Y_CAUSES_X = 1  # embeds x, predicts y (lib/ccm.ex:52-53)

DIRECTION_NAMES = {DIR_X_CAUSES_Y: "x_causes_y", DIR_Y_CAUSES_X: "y_causes_x"}


def embed_direction(
    series: DataFrame,
    embedding_dim: int,
    tau: int,
    source_col: str,
    target_col: str,
    dir_id: int,
) -> DataFrame:
    """(pair_id, t, x, y) -> (pair_id, dir_id, p, e0..e{E-1}, tgt).

    Rows where any forward lead falls off the series tail are dropped
    (the reference's embedding simply stops at P = N-(E-1)*tau).
    """
    w = Window.partitionBy("pair_id").orderBy("t")
    cols = [F.col("pair_id"), F.lit(dir_id).alias("dir_id"), F.col("t").alias("p")]
    for j in range(embedding_dim):
        e = F.col(source_col) if j == 0 else F.lead(source_col, j * tau).over(w)
        cols.append(e.alias(f"e{j}"))
    shift = (embedding_dim - 1) * tau
    tgt = F.col(target_col) if shift == 0 else F.lead(target_col, shift).over(w)
    cols.append(tgt.alias("tgt"))
    out = series.select(*cols)
    # the last embedding component has the longest lead; its null marks the tail
    return out.where(F.col(f"e{embedding_dim - 1}").isNotNull() & F.col("tgt").isNotNull())


def embed_bidirectional(series: DataFrame, embedding_dim: int, tau: int) -> DataFrame:
    """Union of both directions (O2 runs both, lib/ccm.ex:79-84)."""
    xy = embed_direction(series, embedding_dim, tau, "y", "x", DIR_X_CAUSES_Y)
    yx = embed_direction(series, embedding_dim, tau, "x", "y", DIR_Y_CAUSES_X)
    return xy.unionByName(yx)
