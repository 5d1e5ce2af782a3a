"""End-to-end causal-screening walkthrough — the EDM side's analogue of
``corpus_pipeline.py``: from a raw series corpus to a causal edge list,
each stage a fleet operator from the engine (runnable documentation for
the README "EDM workflow" section).

    python examples/causal_screening.py

Stages (all one-shuffle fleet ops; a million-series corpus runs the
same code):
  0. sensor dedup          (SAX-bucketed series near-dup; drop echoes)
  1. embedding selection   (per-series (E, tau) by simplex self-pred)
  2. nonlinearity triage   (S-map theta scan; linear series drop out)
  3. decay triage          (forecast-horizon decay; noise drops out)
  4. pair significance     (surrogate null + BH-FDR across the fleet)
  5. causal network        (bidirectional CCM on the survivors)
"""

from __future__ import annotations


def run(spark) -> dict:
    import pandas as pd
    import pyspark.sql.functions as F

    from ccm_spark.config import CCMConfig
    from ccm_spark.generators import coupled_series
    from ccm_spark.network import ccm_network
    from ccm_spark.significance import (
        ccm_significance_fleet,
        embedding_scan_fleet,
        forecast_horizon_scan_fleet,
        smap_nonlinearity_fleet,
    )

    out: dict = {}

    # a 6-series corpus: two coupled systems + one uncoupled pair
    sys1 = coupled_series(length=150, coupling=0.6, noise_level=0.02,
                          x0=0.3, y0=0.4, seed=7)
    sys2 = coupled_series(length=150, coupling=0.5, noise_level=0.02,
                          x0=0.52, y0=0.81, seed=23)
    lone = coupled_series(length=150, coupling=0.0, noise_level=0.05,
                          x0=0.17, y0=0.66, seed=41)
    values = {
        0: sys1[0], 1: sys1[1], 2: sys2[0], 3: sys2[1], 4: lone[0], 5: lone[1]
    }
    # series 6 is a scaled+shifted ECHO of series 0 (a mirrored sensor)
    values[6] = 2.5 * values[0] + 10.0
    series = spark.createDataFrame(
        pd.concat(
            pd.DataFrame({"series_id": sid, "t": range(len(v)), "value": v})
            for sid, v in values.items()
        ),
        "series_id long, t long, value double",
    )

    # 0. sensor dedup: z-norm-identical channels collapse to the lower id
    # (an echoed sensor would otherwise fabricate a perfect causal edge)
    from ccm_spark.pipeline.series_search import series_neardup

    dup_pairs = series_neardup(series, max_dist=0.5)
    drop = {r.series_b for r in dup_pairs.collect()}
    out["dropped_echo_sensors"] = sorted(drop)
    series = series.where(~F.col("series_id").isin(list(drop)))

    # 1. per-series embedding verdicts — the E each later stage would use
    emb = {r.series_id: r for r in embedding_scan_fleet(
        series, e_values=[2, 3, 4], num_samples=8
    ).collect()}
    out["embedding"] = {sid: (r.best_e, r.best_tau) for sid, r in emb.items()}

    # 2. + 3. screening: keep series that are nonlinear AND decay with
    # horizon (state-dependent deterministic dynamics — CCM's habitat)
    nl = smap_nonlinearity_fleet(series).where("nonlinear")
    dk = forecast_horizon_scan_fleet(series, num_samples=8).where("decaying")
    survivors = sorted(
        r.series_id
        for r in nl.select("series_id").join(dk.select("series_id"), "series_id")
        .collect()
    )
    out["survivors"] = survivors

    # 4. pair significance on the surviving series' pairs
    pairs = [
        (a, b) for i, a in enumerate(survivors) for b in survivors[i + 1:]
    ]
    from ccm_spark.network import pair_series, pair_table

    ptab = pair_table(series, pairs)
    # 159 surrogates, not 19: the rank-test p-value floor is 1/(K+1) and
    # BH multiplies it by m/rank, so with m = 15 pairs and K = 19 even a
    # perfect pair bottoms out at q = 0.05 * 15/2 = 0.375 — the correction
    # could never keep anything. K = 159 puts the floor at 0.00625, which
    # clears q <= 0.05 with a few real hits among 15 pairs. The general
    # rule this example teaches: size the surrogate budget to the FDR
    # target TIMES the family size, or the fleet screens itself to zero.
    psig = ccm_significance_fleet(
        pair_series(series, ptab), CCMConfig(num_samples=8, seed=5),
        n_surrogates=159,
    )
    # ... corrected for multiple testing: thresholding RAW p-values
    # across a fleet admits ~alpha * n_pairs false links by construction;
    # BH keeps the expected false-discovery fraction at alpha instead
    from ccm_spark.significance import benjamini_hochberg

    fdr = benjamini_hochberg(psig, alpha=0.05, tiebreak_cols=["pair_id"])
    sig_rows = fdr.where("keep_fdr").select("pair_id", "q_value").collect()
    sig_pairs = sorted(r.pair_id for r in sig_rows)
    out["q_values"] = {str(pairs[r.pair_id]): round(r.q_value, 4) for r in sig_rows}
    out["significant_pairs"] = [pairs[i] for i in sig_pairs]

    # 5. the causal network on significant pairs only
    cfg = CCMConfig(num_samples=8, seed=5, lib_sizes=[40, 70, 100])
    net = ccm_network(series, out["significant_pairs"], cfg)
    edges = (
        net.where((F.col("lib_size") == 100) & F.col("convergent"))
        .select(
            F.when(F.col("direction") == "x_causes_y", F.col("a_id"))
            .otherwise(F.col("b_id")).alias("driver"),
            F.when(F.col("direction") == "x_causes_y", F.col("b_id"))
            .otherwise(F.col("a_id")).alias("response"),
            F.round("correlation", 3).alias("skill"),
        )
        .collect()
    )
    out["edges"] = sorted((r.driver, r.response, r.skill) for r in edges)
    return out


if __name__ == "__main__":
    import json
    import os
    import sys

    # running as a script puts examples/ on sys.path, not the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from ccm_spark.session import get_spark

    spark = get_spark("causal-screening-demo")
    print(json.dumps(run(spark), indent=2, default=str))
