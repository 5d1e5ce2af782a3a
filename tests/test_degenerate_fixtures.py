"""FIXTURES.md F3 degenerate pins not covered elsewhere: duplicate points
(tie distances, the dist < 1e-12 weight clamp) and sub-embedding-length
series."""

from __future__ import annotations

import numpy as np
import pytest

from ccm_spark.config import CCMConfig
from ccm_spark import oracle
from ccm_spark.plans.cross_map import skill_plan
from tests.test_ccm_core import make_series_df


def test_duplicate_points_weight_clamp(spark):
    # period-2 series: embedding vectors repeat exactly -> many zero
    # distances -> the w=1.0 clamp (lib/ccm.ex:255-256) fires; Spark and
    # oracle must agree through the tie-breaking and clamping
    x = np.array([0.2, 0.8] * 20)
    y = np.array([0.3, 0.7] * 20)
    cfg = CCMConfig(num_samples=4, lib_sizes=[10, 20], seed=17)
    df = make_series_df(spark, x, y)
    got = {
        (r.direction, r.lib_size): r.correlation for r in skill_plan(df, cfg).collect()
    }
    for direction in ("x_causes_y", "y_causes_x"):
        want = dict(oracle.cross_map(x, y, cfg, direction)["results"])
        for ls in (10, 20):
            assert got[(direction, ls)] == pytest.approx(want[ls], abs=1e-9)


def test_series_shorter_than_embedding_window(spark):
    # N < (E-1)*tau + 2: embedding is empty -> no sample rows; the ladder
    # grid still reinstates a single 0.0 row per direction (max_lib < 10)
    x = [1.0, 2.0, 3.0]
    y = [3.0, 2.0, 1.0]
    cfg = CCMConfig(embedding_dim=3, tau=2, num_samples=2, seed=1)
    df = make_series_df(spark, x, y)
    rows = skill_plan(df, cfg).collect()
    assert len(rows) == 2  # one ladder entry per direction
    assert all(r.correlation == 0.0 for r in rows)
