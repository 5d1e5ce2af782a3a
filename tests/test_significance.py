"""Surrogate significance testing: deterministic, kernel-pinned, and
statistically sane on coupled vs decoupled dynamics."""

from __future__ import annotations

import numpy as np
import pytest

from ccm_spark.config import CCMConfig
from ccm_spark.generators import coupled_series
from ccm_spark.significance import ccm_significance, surrogate_offsets


def test_offsets_deterministic_and_bounded():
    a = surrogate_offsets(200, 19, seed=97)
    b = surrogate_offsets(200, 19, seed=97)
    assert a == b and len(a) == 19
    assert all(20 <= off <= 180 for off in a)  # min_shift = n//10
    assert len(set(a)) > 10  # draws actually vary
    assert surrogate_offsets(200, 19, seed=98) != a
    with pytest.raises(ValueError):
        surrogate_offsets(3, 5, seed=1)
    # draws must be decorrelated in k, not an arithmetic progression mod
    # span (the affine-LCG signature: all consecutive differences equal)
    for n, seed in [(200, 97), (200, 98), (1000, 1), (97, 12345)]:
        offs = surrogate_offsets(n, 19, seed)
        diffs = {offs[i + 1] - offs[i] for i in range(len(offs) - 1)}
        assert len(diffs) > 1, (n, seed)


def test_significance_coupled_is_significant(spark):
    x, y = coupled_series(length=150, coupling=0.6, noise_level=0.01, seed=7)
    cfg = CCMConfig(num_samples=10, seed=5)
    res = ccm_significance(spark, x, y, cfg, n_surrogates=19)
    assert res["actual_skill"] > res["surrogate_mean"] + 2 * res["surrogate_std"]
    assert res["p_value"] <= 0.05 and res["significant"]
    # exactly reproducible
    res2 = ccm_significance(spark, x, y, cfg, n_surrogates=19)
    assert res == res2


def test_significance_decoupled_is_not(spark):
    # noise 0.1, not ~0: two NOISE-FREE deterministic logistic maps from
    # fixed initial conditions are not exchangeable with their circular
    # shifts (the lag-0 alignment of the deterministic backbones carries
    # real cross information — at noise 0.01 the actual skill beats a
    # 99-surrogate null at p~0.01 for multiple seeds, a textbook caveat of
    # shift surrogates on deterministic data, not a bug). Moderate
    # observation noise restores exchangeability under H0.
    x, y = coupled_series(length=150, coupling=0.0, noise_level=0.1, seed=11)
    cfg = CCMConfig(num_samples=10, seed=5)
    res = ccm_significance(spark, x, y, cfg, n_surrogates=19)
    assert res["p_value"] > 0.05 and not res["significant"]


def test_surrogate_skills_pin_the_kernel(spark):
    """Each surrogate's skill must equal a driver-side oracle run on the
    same rolled target — the distributed sweep adds nothing."""
    from ccm_spark import oracle

    x, y = coupled_series(length=120, coupling=0.4, noise_level=0.02, seed=3)
    cfg = CCMConfig(num_samples=5, seed=9)
    from ccm_spark.significance import holdout_lib_size
    lib = holdout_lib_size(cfg, len(x))
    single = CCMConfig(num_samples=5, seed=9, lib_sizes=[lib])
    res = ccm_significance(spark, x, y, cfg, direction="y_causes_x", n_surrogates=3)
    offs = surrogate_offsets(len(x), 3, 97)
    want = [
        oracle.cross_map(x, np.roll(y, off), single, "y_causes_x")["results"][0][1]
        for off in offs
    ]
    # recompute the distributed surrogate skills from the summary pieces:
    # mean/max/std over exactly the three pinned values
    surr = np.array(want)
    assert abs(res["surrogate_mean"] - surr.mean()) < 1e-12
    assert abs(res["surrogate_max"] - surr.max()) < 1e-12
    assert abs(res["surrogate_std"] - surr.std()) < 1e-12
    actual = oracle.cross_map(x, y, single, "y_causes_x")["results"][0][1]
    assert abs(res["actual_skill"] - actual) < 1e-12


def test_ccm_api_significance_method(spark):
    from ccm_spark import CCM
    from ccm_spark.sources.tables import load_table  # noqa: F401

    x, y = coupled_series(length=120, coupling=0.5, noise_level=0.02, seed=7)
    c = CCM(spark, x, y, num_samples=8, seed=5)
    # 9 surrogates bottom out at p=0.1 — test at alpha matching that floor
    res = c.significance(n_surrogates=9, alpha=0.1)
    assert res["significant"] and res["n_surrogates"] == 9
    # DataFrame mode dispatches to the fleet implementation: a lazy
    # per-pair relation (one row for this single-pair frame), same
    # verdict machinery with the pair-derived surrogate seed
    df_mode = CCM.from_dataframe(c.series, num_samples=8, seed=5)
    fleet = df_mode.significance(n_surrogates=9, alpha=0.1)
    rows = fleet.collect()
    assert len(rows) == 1 and rows[0].pair_id == 0
    assert rows[0].n_surrogates == 9
    want = ccm_significance(
        spark, x, y, c.config, n_surrogates=9,
        surrogate_seed=97 + 104729 * 0, alpha=0.1,
    )
    assert rows[0].p_value == want["p_value"]
    assert abs(rows[0].actual_skill - want["actual_skill"]) < 1e-12
    # ...and DataFrame-mode lag_scan returns the fleet relation too
    lag_rel = df_mode.lag_scan(max_lag=3)
    lag_rows = lag_rel.collect()
    assert len(lag_rows) == 1 and lag_rows[0].pair_id == 0


def test_lag_scan_recovers_causal_delay(spark):
    """G2 couples x into y with a 1-step delay: the true direction's lag
    scan must peak at lag -1 (cause precedes effect), and the spurious
    reverse direction must peak at a POSITIVE lag — the Ye et al. 2015
    discrimination pattern."""
    from ccm_spark.significance import ccm_lag_scan

    x, y = coupled_series(length=200, coupling=0.6, noise_level=0.01, seed=7)
    cfg = CCMConfig(num_samples=10, seed=5)
    fwd = ccm_lag_scan(spark, x, y, cfg, max_lag=5)
    assert fwd["best_lag"] == -1 and fwd["causal_delay_consistent"]
    assert fwd["best_skill"] > 0.9
    skills = dict(fwd["skills"])
    assert sorted(skills) == list(range(-5, 6))
    # skill decays on both sides of the peak
    assert skills[-1] > skills[-3] > skills[-5]
    assert skills[-1] > skills[1] > skills[3]
    rev = ccm_lag_scan(spark, x, y, cfg, direction="y_causes_x", max_lag=5)
    assert rev["best_lag"] > 0 and not rev["causal_delay_consistent"]


def test_lag_scan_pins_the_kernel(spark):
    from ccm_spark import oracle
    from ccm_spark.significance import ccm_lag_scan, lag_aligned

    x, y = coupled_series(length=150, coupling=0.4, noise_level=0.02, seed=3)
    cfg = CCMConfig(num_samples=5, seed=9)
    res = ccm_lag_scan(spark, x, y, cfg, max_lag=3)
    single = CCMConfig(num_samples=5, seed=9, lib_sizes=[res["lib_size"]])
    for lag, skill in res["skills"]:
        xl, yl = lag_aligned(x, y, lag, "x_causes_y")
        want = oracle.cross_map(xl, yl, single, "x_causes_y")["results"][0][1]
        assert abs(skill - want) < 1e-12
    with pytest.raises(ValueError, match="max_lag"):
        ccm_lag_scan(spark, x, y, cfg, max_lag=0)


def test_ccm_api_lag_scan_method(spark):
    from ccm_spark import CCM

    x, y = coupled_series(length=150, coupling=0.5, noise_level=0.02, seed=7)
    c = CCM(spark, x, y, num_samples=5, seed=5)
    res = c.lag_scan(max_lag=3)
    assert res["best_lag"] <= 0 and len(res["skills"]) == 7


def test_significance_fleet_per_pair_verdicts(spark):
    """Fleet mode: coupled pairs significant, decoupled pairs not, and a
    pair's verdict matches the single-pair function run with that pair's
    derived surrogate seed."""
    from ccm_spark.generators import pairs_to_pdf
    from ccm_spark.significance import ccm_significance, ccm_significance_fleet

    # decoupled pairs need DISTINCT initial conditions: with coupling=0
    # the trajectory is a fixed deterministic sequence per (x0, y0) —
    # same-default pairs would all be the same data
    cases = [
        (0, 0.6, 0.3, 0.4),
        (1, 0.0, 0.52, 0.81),
        (2, 0.5, 0.3, 0.4),
        (3, 0.0, 0.17, 0.66),
    ]
    pairs = []
    for pid, coupling, x0, y0 in cases:
        x, y = coupled_series(
            length=150, coupling=coupling, noise_level=0.01,
            x0=x0, y0=y0, seed=20 + pid,
        )
        pairs.append((pid, x, y))
    series = spark.createDataFrame(
        pairs_to_pdf(pairs), "pair_id long, t long, x double, y double"
    )
    cfg = CCMConfig(num_samples=8, seed=5)
    out = {
        r.pair_id: r
        for r in ccm_significance_fleet(series, cfg, n_surrogates=19).collect()
    }
    assert out[0].significant and out[2].significant
    assert not out[1].significant and not out[3].significant
    # pair 2's row == the single-pair path with the derived seed
    x2, y2 = pairs[2][1], pairs[2][2]
    single = ccm_significance(
        spark, x2, y2, cfg, n_surrogates=19, surrogate_seed=97 + 104729 * 2
    )
    r2 = out[2]
    assert abs(r2.actual_skill - single["actual_skill"]) < 1e-12
    assert abs(r2.p_value - single["p_value"]) < 1e-12
    assert abs(r2.surrogate_mean - single["surrogate_mean"]) < 1e-12


def test_embedding_scan_finds_attractor_dimension(spark):
    """The logistic map is a 1-D attractor: self-prediction skill must
    saturate immediately (E=2-3, rho ~ 1) and DECAY as E over-embeds;
    white noise must stay unpredictable at every E."""
    import numpy as np

    from ccm_spark.significance import embedding_scan

    x, _ = coupled_series(length=200, coupling=0.3, noise_level=0.01, seed=7)
    r = embedding_scan(spark, x, num_samples=10)
    assert r["best_e"] in (2, 3) and r["best_skill"] > 0.99
    skills = {e: s for e, _, _, s in r["cells"]}
    assert sorted(skills) == [2, 3, 4, 5, 6, 7, 8]
    assert skills[8] < skills[r["best_e"]]  # over-embedding hurts
    rng = np.random.default_rng(1)
    r2 = embedding_scan(spark, rng.random(201), num_samples=10)
    assert r2["best_skill"] < 0.4


def test_embedding_scan_pins_the_kernel(spark):
    from ccm_spark import oracle
    from ccm_spark.significance import embedding_scan, holdout_lib_size

    x, _ = coupled_series(length=150, coupling=0.2, noise_level=0.02, seed=3)
    r = embedding_scan(spark, x, e_values=[2, 4], tau_values=[1, 2], num_samples=5, seed=9)
    assert len(r["cells"]) == 4
    for e, tau, lib, skill in r["cells"]:
        probe = CCMConfig(embedding_dim=e, tau=tau, num_samples=5, seed=9)
        assert lib == holdout_lib_size(probe, len(x) - 1)
        kcfg = CCMConfig(
            embedding_dim=e, tau=tau, num_samples=5, seed=9, lib_sizes=[lib]
        )
        want = oracle.cross_map(x[1:], x[:-1], kcfg, "x_causes_y")["results"][0][1]
        assert abs(skill - want) < 1e-12
    import pytest as _pytest

    with _pytest.raises(ValueError, match="E must be"):
        embedding_scan(spark, x, e_values=[1])


def test_ccm_api_suggest_embedding(spark):
    from ccm_spark import CCM

    x, y = coupled_series(length=150, coupling=0.4, noise_level=0.02, seed=7)
    c = CCM(spark, x, y, num_samples=5, seed=5)
    rec = c.suggest_embedding(e_values=[2, 3, 4], num_samples=5)
    assert rec["recommended_e"] in (2, 3, 4)
    assert rec["recommended_e"] == max(
        rec["x_scan"]["best_e"], rec["y_scan"]["best_e"]
    )
    # logistic dynamics: self-prediction is excellent for both series
    assert rec["x_scan"]["best_skill"] > 0.9
    assert rec["y_scan"]["best_skill"] > 0.9


def test_smap_theta_scan_separates_nonlinear_from_linear(spark):
    """S-map theta scan: the logistic map's skill must RISE with
    localisation (state-dependent dynamics), an AR(1) series must not —
    Sugihara 1994's operational nonlinearity test."""
    import numpy as np

    from ccm_spark.significance import smap_theta_scan

    x, _ = coupled_series(length=200, coupling=0.3, noise_level=0.02, seed=7)
    r = smap_theta_scan(spark, x)
    assert r["nonlinear"]
    assert r["best_theta"] >= 2.0
    assert r["best_skill"] > r["linear_skill"] + 0.2
    skills = dict(r["skills"])
    assert skills[8.0] > skills[1.0] > skills[0.0]

    rng = np.random.default_rng(3)
    n = 201
    ar = np.empty(n)
    ar[0] = 0.0
    eps = rng.normal(size=n)
    for t in range(n - 1):
        ar[t + 1] = 0.7 * ar[t] + eps[t]
    r2 = smap_theta_scan(spark, ar)
    # linear dynamics: localisation never buys meaningful skill
    assert r2["best_skill"] < r2["linear_skill"] + 0.02


def test_smap_scan_pins_the_kernel(spark):
    import pytest as _pytest

    from ccm_spark import oracle
    from ccm_spark.significance import smap_theta_scan

    x, _ = coupled_series(length=120, coupling=0.2, noise_level=0.02, seed=3)
    r = smap_theta_scan(spark, x, thetas=[0.0, 1.0, 4.0], embedding_dim=2)
    assert len(r["skills"]) == 3
    for theta, skill in r["skills"]:
        want = oracle.smap_forecast_skill(x, theta, 2, 1)
        assert abs(skill - want) < 1e-12
    with _pytest.raises(ValueError, match="thetas must include"):
        smap_theta_scan(spark, x, thetas=[1.0, 2.0])


def test_forecast_horizon_decay_separates_chaos_from_noise(spark):
    """Sugihara & May 1990: chaos predicts well at h=1 and decays with
    horizon; white noise is uniformly unpredictable."""
    import numpy as np

    from ccm_spark.significance import forecast_horizon_scan

    x, _ = coupled_series(length=250, coupling=0.3, noise_level=0.01, seed=7)
    r = forecast_horizon_scan(spark, x)
    skills = dict(r["skills"])
    assert r["skill_h1"] > 0.95
    assert r["decaying"] and skills[12] < skills[1] - 0.3
    # decay is (noisily) monotone over octaves
    assert skills[1] > skills[4] > skills[12]

    rng = np.random.default_rng(5)
    r2 = forecast_horizon_scan(spark, rng.random(250))
    assert all(s < 0.35 for _, s in r2["skills"])  # never predictable


def test_forecast_horizon_pins_kernel_and_validates(spark):
    import pytest as _pytest

    from ccm_spark import oracle
    from ccm_spark.significance import forecast_horizon_scan, holdout_lib_size

    x, _ = coupled_series(length=120, coupling=0.2, noise_level=0.02, seed=3)
    r = forecast_horizon_scan(spark, x, horizons=[1, 5], num_samples=5, seed=9)
    for h, skill in r["skills"]:
        src, tgt = x[:-h], x[h:]
        probe = CCMConfig(num_samples=5, seed=9)
        lib = holdout_lib_size(probe, len(src))
        kcfg = CCMConfig(num_samples=5, seed=9, lib_sizes=[lib])
        want = oracle.cross_map(tgt, src, kcfg, "x_causes_y")["results"][0][1]
        assert abs(skill - want) < 1e-12
    with _pytest.raises(ValueError, match="out of range"):
        forecast_horizon_scan(spark, x, horizons=[0])


def test_smap_nonlinearity_fleet_verdicts(spark):
    """Fleet screening: per-series verdicts match the single-series scan
    — logistic series flagged nonlinear, AR(1) not."""
    import numpy as np
    import pandas as pd

    from ccm_spark.significance import smap_nonlinearity_fleet, smap_theta_scan

    x, _ = coupled_series(length=200, coupling=0.3, noise_level=0.02, seed=7)
    rng = np.random.default_rng(3)
    n = 201
    ar = np.empty(n)
    ar[0] = 0.0
    eps = rng.normal(size=n)
    for t in range(n - 1):
        ar[t + 1] = 0.7 * ar[t] + eps[t]
    frames = []
    for sid, s in [(0, x), (1, ar)]:
        frames.append(
            pd.DataFrame(
                {"series_id": sid, "t": range(len(s)), "value": s}
            )
        )
    df = spark.createDataFrame(
        pd.concat(frames), "series_id long, t long, value double"
    )
    out = {r.series_id: r for r in smap_nonlinearity_fleet(df).collect()}
    assert out[0].nonlinear and not (
        out[1].best_skill > out[1].linear_skill + 0.02
    )
    # per-series rows bit-match the single-series scan
    single = smap_theta_scan(spark, x)
    assert abs(out[0].best_skill - single["best_skill"]) < 1e-12
    assert out[0].best_theta == single["best_theta"]


def test_embedding_scan_fleet_matches_single_series(spark):
    """Fleet (E, tau) selection: each row bit-matches embedding_scan on
    that series' values; too-short series are dropped, not fatal."""
    import numpy as np
    import pandas as pd

    from ccm_spark.significance import embedding_scan, embedding_scan_fleet

    x, y = coupled_series(length=200, coupling=0.3, noise_level=0.02, seed=7)
    frames = [
        pd.DataFrame({"series_id": 0, "t": range(len(x)), "value": x}),
        pd.DataFrame({"series_id": 1, "t": range(len(y)), "value": y}),
        pd.DataFrame({"series_id": 2, "t": range(10), "value": np.arange(10.0)}),
    ]
    df = spark.createDataFrame(
        pd.concat(frames), "series_id long, t long, value double"
    )
    evs, tvs = [2, 3, 4, 5], [1, 2]
    out = {
        r.series_id: r
        for r in embedding_scan_fleet(df, evs, tvs, num_samples=8).collect()
    }
    assert set(out) == {0, 1}  # the 10-point series is dropped
    for sid, s in [(0, x), (1, y)]:
        single = embedding_scan(spark, s, evs, tvs, num_samples=8)
        assert out[sid].best_e == single["best_e"]
        assert out[sid].best_tau == single["best_tau"]
        assert abs(out[sid].best_skill - single["best_skill"]) < 1e-12


def test_ccm_lag_scan_fleet_matches_single_series(spark):
    """Fleet lagged CCM: per-pair verdict bit-matches ccm_lag_scan."""
    import pandas as pd

    from ccm_spark.significance import ccm_lag_scan, ccm_lag_scan_fleet

    frames = []
    pairs = {}
    for pid, seed in [(0, 7), (1, 23)]:
        x, y = coupled_series(length=180, coupling=0.5, noise_level=0.02, seed=seed)
        pairs[pid] = (x, y)
        frames.append(
            pd.DataFrame({"pair_id": pid, "t": range(len(x)), "x": x, "y": y})
        )
    df = spark.createDataFrame(
        pd.concat(frames), "pair_id long, t long, x double, y double"
    )
    # plus a 10-point runt: dropped per task (exercises the empty-frame
    # path through the string-typed schema), not fatal
    frames.append(
        pd.DataFrame({"pair_id": 9, "t": range(10),
                      "x": pairs[0][0][:10], "y": pairs[0][1][:10]})
    )
    df = spark.createDataFrame(
        pd.concat(frames), "pair_id long, t long, x double, y double"
    )
    cfg = CCMConfig(num_samples=8, seed=5)
    out = {r.pair_id: r for r in ccm_lag_scan_fleet(df, cfg, max_lag=4).collect()}
    assert set(out) == {0, 1}
    for pid, (x, y) in pairs.items():
        single = ccm_lag_scan(spark, x, y, cfg, max_lag=4)
        assert out[pid].best_lag == single["best_lag"]
        assert abs(out[pid].best_skill - single["best_skill"]) < 1e-12
        assert out[pid].lib_size == single["lib_size"]
        assert (
            out[pid].causal_delay_consistent == single["causal_delay_consistent"]
        )


def test_forecast_horizon_scan_fleet_matches_single_series(spark):
    """Fleet horizon decay: verdicts match forecast_horizon_scan; the
    chaotic series decays, and oversized horizons are skipped per series
    rather than fatal."""
    import numpy as np
    import pandas as pd

    from ccm_spark.significance import (
        forecast_horizon_scan,
        forecast_horizon_scan_fleet,
    )

    x, _ = coupled_series(length=200, coupling=0.3, noise_level=0.02, seed=7)
    # 40 points: horizons up to 12 still fit (< len//2), but the series
    # exercises the per-series usable-horizon filtering path
    short = np.sin(np.arange(40) * 0.3)
    frames = [
        pd.DataFrame({"series_id": 0, "t": range(len(x)), "value": x}),
        pd.DataFrame({"series_id": 1, "t": range(len(short)), "value": short}),
    ]
    df = spark.createDataFrame(
        pd.concat(frames), "series_id long, t long, value double"
    )
    out = {
        r.series_id: r
        for r in forecast_horizon_scan_fleet(df, num_samples=8).collect()
    }
    assert set(out) == {0, 1}
    single = forecast_horizon_scan(spark, x, num_samples=8)
    assert abs(out[0].skill_h1 - single["skill_h1"]) < 1e-12
    assert out[0].decaying == single["decaying"]
    assert out[0].decaying  # chaotic logistic dynamics decay with horizon


def test_simplex_forecast_accuracy_and_fleet_parity(spark):
    """One-step forecasts of a noise-free logistic map land near the
    true next value (the map is deterministic and the attractor densely
    sampled); fleet rows bit-match the single-series function; horizon
    guards fire."""
    import numpy as np
    import pandas as pd

    from ccm_spark.significance import simplex_forecast, simplex_forecast_fleet

    x, y = coupled_series(length=400, coupling=0.4, noise_level=0.0, seed=7)
    res = simplex_forecast(x, horizons=[1, 2, 5])
    preds = dict(res["forecasts"])
    assert set(preds) == {1, 2, 5}
    # the true next value of the G2 map: r_x * x_n * (1 - x_n), clamped
    truth = min(0.999, max(0.001, 3.8 * x[-1] * (1.0 - x[-1])))
    assert abs(preds[1] - truth) < 0.05
    with pytest.raises(ValueError, match="horizon"):
        simplex_forecast(x, horizons=[0])
    with pytest.raises(ValueError, match="library"):
        simplex_forecast(x[:10], horizons=[8])

    frames = [
        pd.DataFrame({"series_id": 0, "t": range(len(x)), "value": x}),
        pd.DataFrame({"series_id": 1, "t": range(len(y)), "value": y}),
    ]
    df = spark.createDataFrame(
        pd.concat(frames), "series_id long, t long, value double"
    )
    fleet = {
        (r.series_id, r.h): r.prediction
        for r in simplex_forecast_fleet(df, horizons=[1, 2, 5]).collect()
    }
    for sid, s in [(0, x), (1, y)]:
        single = dict(simplex_forecast(s, horizons=[1, 2, 5])["forecasts"])
        for h, v in single.items():
            assert fleet[(sid, h)] == v, (sid, h)


def test_ccm_api_suggest_embedding_df_mode(spark):
    """DataFrame mode: per-(pair, side) embedding verdicts via the fleet
    scan over the melted pair relation, matching the single-series scan
    for each side."""
    from ccm_spark import CCM
    from ccm_spark.significance import embedding_scan

    x, y = coupled_series(length=150, coupling=0.4, noise_level=0.02, seed=7)
    c = CCM(spark, x, y, num_samples=8, seed=5)
    df_mode = CCM.from_dataframe(c.series, num_samples=8, seed=5)
    evs, tvs = [2, 3, 4], [1]
    out = {
        (r.pair_id, r.side): r
        for r in df_mode.suggest_embedding(evs, tvs, num_samples=8).collect()
    }
    assert set(out) == {(0, "x"), (0, "y")}
    for side, s in (("x", x), ("y", y)):
        single = embedding_scan(spark, s, evs, tvs, num_samples=8, seed=5)
        assert out[(0, side)].best_e == single["best_e"]
        assert abs(out[(0, side)].best_skill - single["best_skill"]) < 1e-12


def _bh_replay(ps: list[float], alpha: float):
    """Textbook BH on the driver: q_i = min_{j>=i} p_(j)*m/j clamped at 1."""
    m = len(ps)
    order = sorted(range(m), key=lambda i: ps[i])
    q = [0.0] * m
    running = float("inf")
    for rank in range(m, 0, -1):
        i = order[rank - 1]
        running = min(running, ps[i] * m / rank)
        q[i] = min(running, 1.0)
    return q, [qi <= alpha for qi in q]


def test_benjamini_hochberg_matches_replay_and_beats_raw_threshold(spark):
    """BH over a fixture with KNOWN positives: the three real signals
    survive, the borderline raw-threshold p-values (0.04..0.049, which a
    naive `p <= alpha` screen would all admit) do not; q-values match
    the textbook driver replay bit-for-bit."""
    from ccm_spark.significance import benjamini_hochberg

    ps = [0.001, 0.002, 0.008, 0.04, 0.045, 0.049, 0.2, 0.5, 0.9, 1.0]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "pair_id long, p_value double"
    )
    out = {
        r.pair_id: (r.bh_rank, r.q_value, r.keep_fdr)
        for r in benjamini_hochberg(
            df, alpha=0.05, tiebreak_cols=["pair_id"]
        ).collect()
    }
    want_q, want_keep = _bh_replay(ps, 0.05)
    for i, p in enumerate(ps):
        assert out[i][1] == want_q[i], (i, out[i][1], want_q[i])
        assert out[i][2] == want_keep[i]
    kept = sorted(i for i in out if out[i][2])
    assert kept == [0, 1, 2]  # raw thresholding would keep [0..5]
    assert [out[i][0] for i in range(10)] == list(range(1, 11))  # ranks


def test_benjamini_hochberg_ties_and_groups(spark):
    """Tied p-values share one q (the step-up min makes the tiebreak
    order irrelevant to the verdict), and group_cols corrects within
    each family independently."""
    from ccm_spark.significance import benjamini_hochberg

    rows = [
        ("a", 0, 0.01), ("a", 1, 0.01), ("a", 2, 0.8),
        ("b", 3, 0.04), ("b", 4, 0.9), ("b", 5, 0.95),
    ]
    df = spark.createDataFrame(rows, "fam string, pair_id long, p_value double")
    out = {
        r.pair_id: (r.q_value, r.keep_fdr)
        for r in benjamini_hochberg(
            df, alpha=0.05, group_cols=["fam"], tiebreak_cols=["pair_id"]
        ).collect()
    }
    assert out[0] == out[1]  # tied p -> identical q and verdict
    for fam, ids in (("a", [0, 1, 2]), ("b", [3, 4, 5])):
        want_q, want_keep = _bh_replay(
            [dict((i, p) for f, i, p in rows if f == fam)[i] for i in ids], 0.05
        )
        for j, i in enumerate(ids):
            assert out[i] == (want_q[j], want_keep[j]), (fam, i)


def test_exclusion_radius_threads_into_significance(spark):
    """The Theiler window must actually reach the surrogate kernels: a
    config with a radius yields a different actual skill than radius 0
    (same seed, same surrogates), and the fleet path agrees with the
    single-pair path under the same radius."""
    from ccm_spark.significance import ccm_significance

    x, y = coupled_series(length=120, coupling=0.5, noise_level=0.02, seed=7)
    base = ccm_significance(
        spark, x, y, CCMConfig(num_samples=6, seed=5), n_surrogates=5
    )
    windowed = ccm_significance(
        spark, x, y,
        CCMConfig(num_samples=6, seed=5, exclusion_radius=4),
        n_surrogates=5,
    )
    assert windowed["actual_skill"] != base["actual_skill"]

    import pandas as pd

    from ccm_spark.significance import ccm_significance_fleet

    series = spark.createDataFrame(
        pd.DataFrame(
            {"pair_id": 0, "t": range(len(x)), "x": x, "y": y}
        ),
        "pair_id long, t long, x double, y double",
    )
    fleet = ccm_significance_fleet(
        series, CCMConfig(num_samples=6, seed=5, exclusion_radius=4),
        n_surrogates=5, surrogate_seed=97,
    ).collect()[0]
    assert fleet.actual_skill == pytest.approx(
        windowed["actual_skill"], abs=1e-12
    )
