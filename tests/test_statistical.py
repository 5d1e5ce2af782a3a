"""End-to-end statistical validation (SURVEY.md §5 rebuild plan (b)).

The G2 generator's printed expectation (reference
lib/coupled_series_generator.ex:142) is "X causes Y should show
convergence, Y causes X should not" — but the reference's operational
convergence criterion (OLS slope of skill vs lib_size > 0.001 over the
full auto ladder, lib/ccm.ex:215-244) is deliberately blunt: its own
golden test pins NON-detection even with true coupling
(test/ccm_test.exs:10-13), because the long skill plateau dilutes the
slope. These tests therefore assert the statistically robust CCM
signatures — skill asymmetry between directions, monotone growth in the
true direction, slope ordering — plus a rising-region ladder where the
reference criterion genuinely fires, and a zero-coupling negative control.
"""

from __future__ import annotations

import pytest

from ccm_spark.config import CCMConfig
from ccm_spark.fastpath import ccm_apply_in_pandas
from ccm_spark.generators import coupled_series, generate_test_cases, pairs_to_pdf


@pytest.fixture(scope="module")
def results(spark):
    # length 300 = the reference's own golden-test size; the auto ladder
    # then tops out at 295 < P-1, avoiding the degenerate-tail artifact
    # (L >= P-1 leaves < 2 prediction points -> forced 0.0 sample).
    x1, y1 = coupled_series(length=300, coupling=0.4, noise_level=0.02, seed=11)
    x0, y0 = coupled_series(length=300, coupling=0.0, noise_level=0.02, seed=12)
    series = spark.createDataFrame(pairs_to_pdf([(1, x1, y1), (0, x0, y0)]))
    cfg = CCMConfig(num_samples=25, seed=3)
    rows = ccm_apply_in_pandas(series, cfg).collect()
    out = {}
    for r in rows:
        out.setdefault((r.pair_id, r.direction), []).append(r)
    return out


def _skill_curve(rows):
    return [c for _, c in sorted((r.lib_size, r.correlation) for r in rows)]


def test_strong_coupling_ccm_signatures(results):
    xy = _skill_curve(results[(1, "x_causes_y")])
    yx = _skill_curve(results[(1, "y_causes_x")])
    # skill asymmetry: recovering X from Y's manifold works far better
    assert max(xy) > 0.7 and max(xy) > 2 * max(yx)
    # monotone growth with library size in the true direction
    assert xy[-1] - xy[0] > 0.2 and xy[0] > 0.3
    # slope ordering
    slope_xy = results[(1, "x_causes_y")][0].slope
    slope_yx = results[(1, "y_causes_x")][0].slope
    assert slope_xy > 0 and slope_xy > slope_yx


def test_rising_region_ladder_triggers_convergence(spark):
    x, y = coupled_series(length=300, coupling=0.4, noise_level=0.02, seed=11)
    series = spark.createDataFrame(pairs_to_pdf([(0, x, y)]))
    cfg = CCMConfig(num_samples=25, lib_sizes=[20, 40, 60, 80, 100], seed=3)
    rows = {r.direction: r for r in ccm_apply_in_pandas(series, cfg).collect() if r.lib_size == 20}
    assert rows["x_causes_y"].convergent
    assert rows["x_causes_y"].slope > 2 * rows["y_causes_x"].slope


def test_zero_coupling_negative_control(results):
    assert not results[(0, "x_causes_y")][0].convergent
    assert not results[(0, "y_causes_x")][0].convergent
    for d in ("x_causes_y", "y_causes_x"):
        assert max(r.correlation for r in results[(0, d)]) < 0.35


def test_reference_canonical_cases_shapes():
    cases = generate_test_cases()
    assert [c["name"] for c in cases] == ["strong", "medium", "weak", "none"]
    assert [c["coupling"] for c in cases] == [0.4, 0.2, 0.1, 0.0]
    assert all(len(c["x"]) == 51 for c in cases)
