"""Synthetic coupled-series generators (G1/G2 of SURVEY.md §2).

Logistic-map recurrences are inherently sequential in t, so a single series
is generated with a numpy loop; scale-out happens across series — a
parameter grid of (pair_id, length, coupling, ...) combos is distributed one
task per pair via ``mapInPandas`` in :func:`generate_grid_df`. That is the
100 TB story: millions of independent pairs, embarrassingly parallel, while
each pair's recurrence stays sequential (it cannot be otherwise).

Parity (reference file:line):
  G1 coupled logistic maps   lib/coupled_logistic_maps_generator.ex:6-27
     x' = clamp01(3.7*x*(1-x) + c*(y-x)); y' = clamp01(3.6*y*(1-y));
     x0=0.1, y0=0.2; Y drives X; run(length) emits length+1 points.
  G2 forced coupled series   lib/coupled_series_generator.ex:10-102
     x' = rx*x*(1-x); y' = ry*y*(1-y) + c*(x-y); clamp to [0.001, 0.999];
     uniform observation noise value + noise*(U(0,1)-0.5)*2; defaults
     rx=3.8, ry=3.6, c=0.3, noise=0.05, x0=0.3, y0=0.4.

The reference's G2 seeds its RNG only in run/1 (:117); here noise is always
seeded AND engine-portable: observation noise comes from the repo's own LCG
(ccm_spark.rng.lcg_rank_key keyed on (t, series, seed)), so a SQL oracle can
replay the noisy series bit-for-bit — numpy PCG could not be mirrored in any
SQL engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ccm_spark.rng import M31, lcg_rank_key


def coupled_logistic_maps(length: int, coupling: float = 0.02) -> tuple[np.ndarray, np.ndarray]:
    """G1: Y->X coupled logistic maps; returns (x, y) with length+1 points."""
    x = np.empty(length + 1)
    y = np.empty(length + 1)
    x[0], y[0] = 0.1, 0.2
    for t in range(length):
        x[t + 1] = min(1.0, max(0.0, 3.7 * x[t] * (1.0 - x[t]) + coupling * (y[t] - x[t])))
        y[t + 1] = min(1.0, max(0.0, 3.6 * y[t] * (1.0 - y[t])))
    return x, y


def coupled_series(
    length: int = 50,
    coupling: float = 0.3,
    r_x: float = 3.8,
    r_y: float = 3.6,
    noise_level: float = 0.05,
    x0: float = 0.3,
    y0: float = 0.4,
    seed: int = 123,
) -> tuple[np.ndarray, np.ndarray]:
    """G2: X->Y forced logistic maps with observation noise; length+1 points.

    Noise is uniform in [-noise_level, +noise_level] (reference
    lib/coupled_series_generator.ex:78-83) drawn from the LCG keyed on
    (t, series_id, seed) — a pure scalar function of the row, so the DuckDB
    oracle replays it exactly (sql_gen_coupled_series_noisy).
    """
    x = np.empty(length + 1)
    y = np.empty(length + 1)
    x[0], y[0] = x0, y0
    for t in range(length):
        nx = r_x * x[t] * (1.0 - x[t])
        ny = r_y * y[t] * (1.0 - y[t]) + coupling * (x[t] - y[t])
        x[t + 1] = min(0.999, max(0.001, nx))
        y[t + 1] = min(0.999, max(0.001, ny))
    ts = np.arange(length + 1)
    ux = lcg_rank_key(ts, 0, 0, 0, seed) / M31
    uy = lcg_rank_key(ts, 0, 0, 1, seed) / M31
    x = x + noise_level * (ux - 0.5) * 2.0
    y = y + noise_level * (uy - 0.5) * 2.0
    return x, y


def generate_test_cases() -> list[dict]:
    """The reference's four canonical cases (coupled_series_generator.ex:88-102):
    couplings {0.4 strong, 0.2 medium, 0.1 weak, 0.0 none}, length 50."""
    cases = [
        ("strong", 0.4, 0.02),
        ("medium", 0.2, 0.05),
        ("weak", 0.1, 0.03),
        ("none", 0.0, 0.05),
    ]
    out = []
    for i, (name, coupling, noise) in enumerate(cases):
        x, y = coupled_series(length=50, coupling=coupling, noise_level=noise, seed=1000 + i)
        out.append({"name": name, "coupling": coupling, "noise_level": noise, "x": x, "y": y})
    return out


def pairs_to_pdf(pairs: list[tuple[int, np.ndarray, np.ndarray]]) -> pd.DataFrame:
    """[(pair_id, x, y)] -> long-form pandas frame (pair_id, t, x, y)."""
    frames = []
    for pair_id, x, y in pairs:
        frames.append(
            pd.DataFrame(
                {
                    "pair_id": np.int64(pair_id),
                    "t": np.arange(len(x), dtype=np.int64),
                    "x": x,
                    "y": y,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def generate_grid_df(spark, grid: list[dict]):
    """Distributed generation: one task per parameter combo.

    ``grid`` rows: {pair_id, kind: 'g1'|'g2', length, coupling, [noise_level,
    r_x, r_y, seed]}. Each executor task runs the sequential recurrence for
    its pairs only — the scalable pattern for fleets of series.
    """
    from ccm_spark.functions.partitioning import spread

    grid_pdf = pd.DataFrame(grid)
    defaults = {"noise_level": 0.05, "r_x": 3.8, "r_y": 3.6, "seed": 123}
    for k, v in defaults.items():
        if k not in grid_pdf:
            grid_pdf[k] = v
    # explicit partition count: the grid is tiny by bytes but each row costs
    # a full sequential recurrence — a plain repartition(col) would be
    # AQE-coalesced back to one task and serialise the whole fleet
    grid_df = spread(spark.createDataFrame(grid_pdf), "pair_id")

    def gen(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if row.kind == "g1":
                    x, y = coupled_logistic_maps(int(row.length), float(row.coupling))
                else:
                    x, y = coupled_series(
                        length=int(row.length),
                        coupling=float(row.coupling),
                        r_x=float(row.r_x),
                        r_y=float(row.r_y),
                        noise_level=float(row.noise_level),
                        seed=int(row.seed),
                    )
                yield pairs_to_pdf([(int(row.pair_id), x, y)])

    return grid_df.mapInPandas(gen, schema="pair_id long, t long, x double, y double")
