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


def test_dtw_topk_equals_bruteforce_and_band_zero_is_ed(spark):
    """PAA... no: LB_Keogh-pruned DTW equals brute-force banded DTW;
    with band 0 the warping collapses to plain z-normalised ED."""
    from ccm_spark.pipeline.series_search import _dtw_band, dtw_topk

    df, vals = _corpus(spark, n_series=30)
    rng = np.random.default_rng(9)
    # a time-warped sinusoid: DTW should find the sinusoid family close
    warp = np.interp(np.linspace(0, 95, 96) ** 1.03 / (95 ** 0.03),
                     np.arange(96), np.sin(np.linspace(0, 6 * np.pi, 96)))
    q = warp + rng.normal(0, 0.05, 96)

    w = int(round(0.1 * 96))
    zq = _znorm(np.asarray(q))
    want = sorted(
        (
            (sid, float(_dtw_band(zq, _znorm(np.asarray(v)), w)))
            for sid, v in vals.items()
        ),
        key=lambda kv: (kv[1], kv[0]),
    )[:6]
    got = [
        (r.series_id, r.distance)
        for r in dtw_topk(df, q, k=6, band_frac=0.1).orderBy("rank").collect()
    ]
    assert got == [(sid, round(d, 9)) for sid, d in want]
    # warping absorbs the time distortion: best DTW hit is a sinusoid
    assert got[0][0] % 3 != 2

    # band 0 == plain ED, but the DP accumulates in a different order
    # than the vector sum, so EXACT ties (the z-norm-identical sinusoid
    # family) can order differently in the last ulp — compare the tie-
    # canonicalised form (rounded distance, id)
    ed = _brute_topk(vals, q, 6)
    got0 = [
        (r.series_id, r.distance)
        for r in dtw_topk(df, q, k=6, band_frac=0.0).orderBy("rank").collect()
    ]
    # ten sinusoids are z-norm IDENTICAL, so which six of the exact tie
    # enter the top-k is sub-ulp-order dependent — the defensible
    # contract is the distance MULTISET plus validity of every member
    # (no unselected series strictly beats a selected one at 1e-9)
    assert sorted(round(d, 9) for _, d in got0) == sorted(
        round(d, 9) for _, d in ed
    )
    all_d = {sid: d for sid, d in _brute_topk(vals, q, len(vals))}
    selected = {sid for sid, _ in got0}
    min_unselected = min(d for sid, d in all_d.items() if sid not in selected)
    assert all(all_d[sid] <= min_unselected + 1e-9 for sid in selected)


def test_series_neardup_finds_shape_duplicates(spark):
    """Scaled/shifted copies of one signal (z-norm-identical) are found
    at distance ~0; verified pairs match a brute-force distance replay;
    precision is exact (no pair above the threshold is emitted)."""
    from ccm_spark.pipeline.series_search import series_neardup

    df, vals = _corpus(spark, n_series=24)
    out = series_neardup(df, max_dist=2.0)
    got = {(r.series_a, r.series_b): r.distance for r in out.collect()}
    # every % 3 == 0 series is a scaled/shifted sinusoid: all pairs found
    sins = [sid for sid in vals if sid % 3 == 0]
    for i, a in enumerate(sins):
        for b in sins[i + 1:]:
            assert (a, b) in got and got[(a, b)] < 1e-6, (a, b)
    # emitted distances match brute force and respect the threshold
    for (a, b), d in got.items():
        za, zb = _znorm(np.asarray(vals[a])), _znorm(np.asarray(vals[b]))
        assert d == round(float(np.sqrt(((za - zb) ** 2).sum())), 9)
        assert d <= 2.0


def test_series_topk_non_divisible_length(spark):
    """PAA segment boundaries on a length (50) the segment count (16)
    does not divide: the lower bound must still hold and the result
    still equals brute force."""
    df, vals = _corpus(spark, n_series=15, length=50, seed=11)
    q = 2.0 * np.sin(np.linspace(0, 6 * np.pi, 50)) - 1.0
    got = [
        (r.series_id, r.distance)
        for r in series_topk(df, q, k=5).orderBy("rank").collect()
    ]
    assert got == [(sid, round(d, 9)) for sid, d in _brute_topk(vals, q, 5)]


def test_dtw_topk_guards(spark):
    from ccm_spark.pipeline.series_search import dtw_topk

    df, _ = _corpus(spark, n_series=4)
    with pytest.raises(ValueError, match="too short"):
        dtw_topk(df, np.ones(3), k=2)


def test_dtw_band_diagonal_equals_scalar_dp():
    """The anti-diagonal vectorised DP must be bit-equal to the textbook
    scalar recurrence over random series, every band width, both parities
    of length (r6 verdict #2 rewrite safety)."""
    from ccm_spark.pipeline.series_search import _dtw_band

    def scalar_dtw(a, b, w):
        n = len(a)
        inf = np.inf
        prev = np.full(n + 1, inf)
        prev[0] = 0.0
        cur = np.empty(n + 1)
        for i in range(1, n + 1):
            cur[:] = inf
            lo, hi = max(1, i - w), min(n, i + w)
            for j in range(lo, hi + 1):
                cost = (a[i - 1] - b[j - 1]) ** 2
                cur[j] = cost + min(prev[j], cur[j - 1], prev[j - 1])
            prev, cur = cur, prev
        return float(np.sqrt(prev[n]))

    rng = np.random.default_rng(7)
    for n in (1, 2, 5, 24, 97):
        for w in (0, 1, 3, n // 2, n):
            a = rng.normal(size=n)
            b = rng.normal(size=n)
            assert _dtw_band(a, b, w) == scalar_dtw(a, b, w), (n, w)


def test_series_neardup_never_merges_different_lengths(spark):
    """r6 advice: two series sharing a SAX word but differing in length,
    or sharing length on MISALIGNED t grids, must never pair — a partial
    timestamp overlap would under-count the distance into a false
    positive."""
    from ccm_spark.pipeline.series_search import series_neardup

    base = np.sin(np.linspace(0, 6 * np.pi, 96))
    rows = []
    # 0 and 1: identical shape, same grid -> a REAL pair
    for sid, v in ((0, base), (1, 2.0 * base + 5.0)):
        rows += [(sid, t, float(x)) for t, x in enumerate(v)]
    # 2: same shape stretched to length 48 (same word, different n)
    short = np.sin(np.linspace(0, 6 * np.pi, 48))
    rows += [(2, t, float(x)) for t, x in enumerate(short)]
    # 3: same shape, same length, but t grid shifted by 1000
    rows += [(3, t + 1000, float(x)) for t, x in enumerate(base)]
    df = spark.createDataFrame(rows, "series_id long, t long, value double")
    got = {(r.series_a, r.series_b) for r in series_neardup(df, max_dist=2.0).collect()}
    assert (0, 1) in got
    assert all(2 not in pair for pair in got), got
    assert all(3 not in pair for pair in got), got


def test_topk_candidate_guard_and_prune_stats(spark):
    """The phase-2 candidate list is driver-bound, so it is guarded: a
    tiny max_candidates raises with the measured prune ratio instead of
    collecting, and the stats out-param reports the telemetry."""
    from ccm_spark.pipeline.series_search import dtw_topk

    df, vals = _corpus(spark, n_series=24)
    q = np.sin(np.linspace(0, 6 * np.pi, 96))
    stats: dict = {}
    got = series_topk(df, q, k=3, stats=stats)
    assert got.count() == 3
    assert stats["n_series"] == 24
    assert 0 <= stats["n_candidates"] <= 24
    assert stats["prune_ratio"] == 1.0 - stats["n_candidates"] / 24
    with pytest.raises(ValueError, match="max_candidates"):
        series_topk(df, q, k=3, max_candidates=0)
    dstats: dict = {}
    dtw_topk(df, q, k=3, band_frac=0.1, stats=dstats)
    assert dstats["n_series"] == 24
    with pytest.raises(ValueError, match="max_candidates"):
        dtw_topk(df, q, k=3, band_frac=0.1, max_candidates=0)
