"""Block (multivariate) cross mapping: bit-exact reduction to the
univariate kernel, and value from added observables."""

from __future__ import annotations

import pytest

from ccm_spark import oracle
from ccm_spark.config import CCMConfig
from ccm_spark.generators import coupled_series
from ccm_spark.multivariate import block_cross_map


def test_single_column_block_reduces_to_univariate(spark):
    """embed_cols=['y'] must reproduce oracle.cross_map(x, y,
    'x_causes_y') bit-for-bit — ladder, samples, slope, verdict."""
    x, y = coupled_series(length=150, coupling=0.4, noise_level=0.02, seed=7)
    cfg = CCMConfig(num_samples=8, seed=5)
    res = block_cross_map(spark, {"x": x, "y": y}, "x", ["y"], cfg)
    want = oracle.cross_map(x, y, cfg, "x_causes_y")
    assert res["results"] == [(int(a), float(b)) for a, b in want["results"]]
    assert res["slope"] == want["slope"]
    assert res["convergent"] == want["convergent"]
    assert res["effective_dim"] == cfg.embedding_dim
    # deterministic
    assert block_cross_map(spark, {"x": x, "y": y}, "x", ["y"], cfg) == res


def test_added_observable_improves_skill(spark):
    """A block manifold that also carries the target's own lags recovers
    the target better than the single-observable manifold — the point of
    generalized embeddings."""
    x, y = coupled_series(length=150, coupling=0.3, noise_level=0.05, seed=11)
    cfg = CCMConfig(num_samples=8, seed=5)
    uni = block_cross_map(spark, {"x": x, "y": y}, "x", ["y"], cfg)
    multi = block_cross_map(spark, {"x": x, "y": y}, "x", ["y", "x"], cfg)
    assert multi["effective_dim"] == 2 * cfg.embedding_dim
    assert multi["results"][-1][1] > uni["results"][-1][1]


def test_block_validation_errors(spark):
    x, y = coupled_series(length=60, coupling=0.3, noise_level=0.02, seed=3)
    with pytest.raises(ValueError, match="unknown target"):
        block_cross_map(spark, {"x": x, "y": y}, "z", ["y"])
    with pytest.raises(ValueError, match="unknown embed"):
        block_cross_map(spark, {"x": x, "y": y}, "x", ["w"])
    with pytest.raises(ValueError, match="non-empty"):
        block_cross_map(spark, {"x": x, "y": y}, "x", [])
    with pytest.raises(ValueError, match="unequal"):
        block_cross_map(spark, {"x": x, "y": y[:-1]}, "x", ["y"])
