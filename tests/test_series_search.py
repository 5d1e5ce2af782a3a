"""Data-series similarity search: the PAA-pruned top-k must EQUAL the
brute-force z-normalised ED ranking, and the prune must actually prune."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ccm_spark.pipeline.series_search import (
    _paa,
    _seg_lens,
    _znorm,
    paa_sketches,
    series_topk,
)


def _corpus(spark, n_series=40, length=96, seed=3):
    rng = np.random.default_rng(seed)
    base = np.sin(np.linspace(0, 6 * np.pi, length))
    rows = []
    vals = {}
    for sid in range(n_series):
        # families: shifted/scaled sinusoids (shape-identical under
        # z-norm), noisy sinusoids, and pure noise
        if sid % 3 == 0:
            v = 3.0 * base + sid  # z-norm removes offset/scale
        elif sid % 3 == 1:
            v = base + rng.normal(0, 0.3 + 0.02 * sid, length)
        else:
            v = rng.normal(0, 1, length)
        vals[sid] = v
        rows.append(pd.DataFrame({"series_id": sid, "t": range(length), "value": v}))
    df = spark.createDataFrame(
        pd.concat(rows), "series_id long, t long, value double"
    )
    return df, vals


def _brute_topk(vals: dict, q: np.ndarray, k: int):
    zq = _znorm(np.asarray(q, dtype=np.float64))
    d = {
        sid: float(np.sqrt(((zq - _znorm(np.asarray(v))) ** 2).sum()))
        for sid, v in vals.items()
    }
    return sorted(d.items(), key=lambda kv: (kv[1], kv[0]))[:k]


def test_series_topk_equals_bruteforce(spark):
    df, vals = _corpus(spark)
    q = 5.0 * np.sin(np.linspace(0, 6 * np.pi, 96)) + 42.0  # sinusoid family
    got = [
        (r.series_id, r.distance)
        for r in series_topk(df, q, k=7).orderBy("rank").collect()
    ]
    want = [(sid, round(d, 9)) for sid, d in _brute_topk(vals, q, 7)]
    assert got == want
    # the top hits are the shape-identical scaled sinusoids, distance ~0
    assert got[0][1] < 1e-6 and got[0][0] % 3 == 0


def test_series_topk_prunes_and_lower_bounds_hold(spark):
    """The PAA lemma: every sketch lower bound <= the true distance; the
    phase-2 candidate set is smaller than the corpus (real pruning)."""
    df, vals = _corpus(spark)
    q = np.sin(np.linspace(0, 6 * np.pi, 96))
    sk = {r.series_id: (r.n, r.sketch) for r in paa_sketches(df).collect()}
    zq = _znorm(q)
    q_paa, lens = _paa(zq, 16), _seg_lens(96, 16)
    n_below = 0
    k_exact = sorted(d for _, d in _brute_topk(vals, q, 7))[-1]
    for sid, v in vals.items():
        lb = float(np.sqrt((lens * (q_paa - np.asarray(sk[sid][1])) ** 2).sum()))
        true = float(np.sqrt(((zq - _znorm(np.asarray(v))) ** 2).sum()))
        assert lb <= true + 1e-9, sid
        if lb <= k_exact:
            n_below += 1
    assert n_below < len(vals)  # the prune has teeth on this corpus


def test_series_topk_guards(spark):
    df, _ = _corpus(spark, n_series=4)
    with pytest.raises(ValueError, match="segments"):
        series_topk(df, np.ones(8), k=2)
    short = spark.createDataFrame(
        [(99, t, float(t)) for t in range(50)], "series_id long, t long, value double"
    )
    with pytest.raises(ValueError, match="length"):
        series_topk(df.unionByName(short), np.ones(96), k=2)
