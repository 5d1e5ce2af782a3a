"""EDM series preprocessing: numpy-replay pins per op, plus the
motivating behavior — differencing kills trend-faked CCM convergence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ccm_spark.operators.preprocess import first_difference, winsorize, zscore


def _series_df(spark, vals: dict[int, tuple[np.ndarray, np.ndarray]]):
    rows = []
    for pid, (x, y) in vals.items():
        rows.append(
            pd.DataFrame({"pair_id": pid, "t": range(len(x)), "x": x, "y": y})
        )
    return spark.createDataFrame(
        pd.concat(rows), "pair_id long, t long, x double, y double"
    )


def test_first_difference_matches_numpy(spark):
    rng = np.random.default_rng(3)
    vals = {i: (rng.normal(size=30), rng.normal(size=30)) for i in range(3)}
    out = first_difference(_series_df(spark, vals))
    got = {
        (r.pair_id, r.t): (r.x, r.y) for r in out.collect()
    }
    for pid, (x, y) in vals.items():
        dx, dy = np.diff(x), np.diff(y)
        assert sum(1 for k in got if k[0] == pid) == 29
        for t in range(29):
            assert got[(pid, t)] == (dx[t], dy[t])


def test_zscore_matches_numpy_and_guards_constants(spark):
    rng = np.random.default_rng(5)
    vals = {
        0: (rng.normal(3, 2, 40), rng.normal(-1, 0.5, 40)),
        1: (np.full(40, 7.0), rng.normal(size=40)),  # constant x
    }
    out = zscore(_series_df(spark, vals))
    got = {(r.pair_id, r.t): (r.x, r.y) for r in out.collect()}
    for pid, (x, y) in vals.items():
        zx = (x - x.mean()) / x.std() if x.std() > 0 else np.zeros_like(x)
        zy = (y - y.mean()) / y.std() if y.std() > 0 else np.zeros_like(y)
        for t in range(40):
            assert got[(pid, t)][0] == pytest.approx(zx[t], abs=1e-12)
            assert got[(pid, t)][1] == pytest.approx(zy[t], abs=1e-12)


def test_winsorize_matches_numpy(spark):
    rng = np.random.default_rng(9)
    x = rng.normal(size=50)
    x[3], x[17] = 100.0, -100.0  # planted glitches
    y = rng.normal(size=50)
    out = winsorize(_series_df(spark, {0: (x, y)}), p=0.1)
    got_x = np.array(
        [r.x for r in out.orderBy("t").collect()]
    )
    lo, hi = np.percentile(x, 10), np.percentile(x, 90)
    np.testing.assert_allclose(got_x, np.clip(x, lo, hi), rtol=0, atol=1e-12)
    assert got_x.max() <= hi + 1e-12 and got_x.min() >= lo - 1e-12
    with pytest.raises(ValueError, match="p must be"):
        winsorize(_series_df(spark, {0: (x, y)}), p=0.7)


def test_differencing_kills_trend_faked_convergence(spark):
    """Two INDEPENDENT noise series with a shared linear trend fake CCM
    convergence (the classic pitfall); after first-differencing the
    fake skill collapses."""
    from ccm_spark.config import CCMConfig
    from ccm_spark.plans.cross_map import skill_plan

    rng = np.random.default_rng(11)
    trend = np.linspace(0, 10, 150)
    x = trend + rng.normal(0, 0.3, 150)
    y = trend + rng.normal(0, 0.3, 150)
    df = _series_df(spark, {0: (x, y)})
    cfg = CCMConfig(num_samples=8, lib_sizes=[40, 80, 120], seed=3)
    raw = {
        r.lib_size: r.correlation
        for r in skill_plan(df, cfg).where("direction = 'x_causes_y'").collect()
    }
    diffed = {
        r.lib_size: r.correlation
        for r in skill_plan(first_difference(df), cfg)
        .where("direction = 'x_causes_y'")
        .collect()
    }
    assert raw[120] > 0.8          # the trend fakes high skill
    assert diffed[120] < 0.3       # differencing exposes independence
