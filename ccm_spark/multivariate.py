"""Multivariate (block) cross mapping — generalized embeddings from
several observables.

The reference is strictly univariate (one series embeds, the other is
predicted — lib/ccm.ex:48-74); real systems often expose SEVERAL
observables, and Deyle & Sugihara 2011's generalized embedding theorems
license manifolds built from mixed lags of any of them (rEDM's
``block_lnlp`` surface). This module is that extension: embed
``embedding_dim`` lags of EACH chosen observable (stacked block), then
run the untouched cross-map kernel chain — sampling, kNN, simplex
weights, guarded Pearson, convergence slope — against any target
observable. With a single embed column the block reduces BIT-FOR-BIT to
the univariate path (test-pinned), so every univariate pin transfers.

Scale shape: the library-size ladder fans out like the surrogate sweep
(`significance.py`) — a spread grid of lib_size cells, the block
broadcast once per executor, one vectorised kernel per cell, scalars
back to the driver; the distance matrix is computed once per TASK, so
grouping several cells per task (the spread default) amortises it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ccm_spark.config import CCMConfig
from ccm_spark import oracle


def block_cross_map(
    spark,
    block: dict,
    target_col: str,
    embed_cols: list[str],
    config: CCMConfig | None = None,
) -> dict:
    """Cross-map skill of predicting ``target_col`` from the generalized
    embedding of ``embed_cols``, over the full library-size ladder, with
    the R3 convergence verdict — the multivariate twin of
    ``CCM.cross_map``.

    ``block`` maps column name -> equal-length series. The effective
    embedding dimension is ``embedding_dim * len(embed_cols)`` (used for
    the k = dim+1 simplex neighborhood); the ladder, bootstrap sampling,
    and statistics are the univariate machinery unchanged.
    """
    cfg = config if config is not None else CCMConfig()
    if target_col not in block:
        raise ValueError(f"block_cross_map: unknown target {target_col!r}")
    for c in embed_cols:
        if c not in block:
            raise ValueError(f"block_cross_map: unknown embed column {c!r}")
    if not embed_cols:
        raise ValueError("block_cross_map: embed_cols must be non-empty")
    series = {k: np.asarray(v, dtype=np.float64) for k, v in block.items()}
    lengths = {len(v) for v in series.values()}
    if len(lengths) != 1:
        raise ValueError(f"block_cross_map: unequal column lengths {lengths}")
    n = lengths.pop()

    emb = oracle.block_embedding(
        [series[c] for c in embed_cols], cfg.embedding_dim, cfg.tau
    )
    tgt = oracle.adjusted_target(series[target_col], cfg.embedding_dim, cfg.tau)
    eff_dim = cfg.embedding_dim * len(embed_cols)
    lib_sizes = cfg.resolved_lib_sizes(n)
    num_samples, seed = cfg.num_samples, cfg.seed

    sc = spark.sparkContext
    bc = sc.broadcast((emb, tgt))

    def run(batches):
        from ccm_spark import oracle as _o

        bemb, btgt = bc.value
        dist = (
            _o._pairwise_distances(bemb)
            if 0 < bemb.shape[0] <= _o.PRECOMPUTE_DIST_MAX_P
            else None
        )
        for pdf in batches:
            rows = []
            for lib in pdf["lib_size"]:
                lib = int(lib)
                corrs = _o.cross_map_lib_batch(
                    bemb, btgt, lib, num_samples, 0, seed, eff_dim, dist
                )
                rows.append((lib, float(np.sum(corrs) / num_samples)))
            yield pd.DataFrame(rows, columns=["lib_size", "skill"])

    from ccm_spark.functions.partitioning import spread

    grid = [(int(lib),) for lib in lib_sizes]
    grid_df = spread(spark.createDataFrame(grid, "lib_size long"), "lib_size")
    rows = grid_df.mapInPandas(run, "lib_size long, skill double").collect()
    results = sorted((r.lib_size, r.skill) for r in rows)
    ls = np.array([r[0] for r in results], dtype=np.float64)
    cs = np.array([r[1] for r in results], dtype=np.float64)
    slope, convergent = oracle.ols_slope(ls, cs)
    return {
        "target": target_col,
        "embed_cols": list(embed_cols),
        "effective_dim": eff_dim,
        "results": [(int(a), float(b)) for a, b in results],
        "slope": float(slope),
        "convergent": bool(convergent),
    }
