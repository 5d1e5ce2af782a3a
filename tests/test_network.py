"""Causal-network discovery: plumbing pinned bit-exact to the reference
kernel per pair, guards enforced, true edges recovered."""

from __future__ import annotations

import pandas as pd
import pytest

from ccm_spark import oracle
from ccm_spark.config import CCMConfig
from ccm_spark.generators import coupled_series
from ccm_spark.network import ccm_network, pair_series, pair_table


def _corpus(spark):
    """Five series: 0 drives 1 and 2 drives 3 (two G2 systems with
    distinct initial conditions), 4 is an uncoupled map."""
    sys1_x, sys1_y = coupled_series(
        length=150, coupling=0.6, noise_level=0.02, x0=0.3, y0=0.4, seed=7
    )
    sys2_x, sys2_y = coupled_series(
        length=150, coupling=0.6, noise_level=0.02, x0=0.52, y0=0.81, seed=23
    )
    lone, _ = coupled_series(
        length=150, coupling=0.0, noise_level=0.05, x0=0.17, y0=0.66, seed=41
    )
    values = {0: sys1_x, 1: sys1_y, 2: sys2_x, 3: sys2_y, 4: lone}
    frames = [
        pd.DataFrame({"series_id": sid, "t": range(len(v)), "value": v})
        for sid, v in values.items()
    ]
    df = spark.createDataFrame(
        pd.concat(frames), "series_id long, t long, value double"
    )
    return df, values


def test_pair_table_guards(spark):
    df, _ = _corpus(spark)
    with pytest.raises(ValueError, match="self-pair"):
        pair_table(df, [(1, 1)])
    with pytest.raises(ValueError, match="duplicate unordered"):
        pair_table(df, [(0, 1), (1, 0)])
    with pytest.raises(ValueError, match="max_series"):
        pair_table(df, None, max_series=3)
    allp = pair_table(df).collect()
    assert len(allp) == 10  # C(5, 2)
    assert all(r.a_id < r.b_id for r in allp)


def test_pair_series_aligns_on_shared_time(spark):
    df, values = _corpus(spark)
    ptab = pair_table(df, [(0, 3)])
    rows = pair_series(df, ptab).collect()
    assert len(rows) == 151
    by_t = {r.t: (r.x, r.y) for r in rows}
    assert by_t[5] == (values[0][5], values[3][5])


def test_network_rows_bit_match_reference_kernel(spark):
    """Every (pair, direction) sweep must equal oracle.bidirectional_ccm
    on that pair's values — the network layer adds no arithmetic."""
    df, values = _corpus(spark)
    cfg = CCMConfig(num_samples=8, seed=5)
    pairs = [(0, 1), (2, 3), (0, 2), (1, 4)]
    out = ccm_network(df, pairs, cfg).collect()
    got = {}
    for r in out:
        got.setdefault((r.a_id, r.b_id, r.direction), []).append(
            (r.lib_size, r.correlation, r.slope, r.convergent)
        )
    assert len(got) == 2 * len(pairs)
    for a, b in pairs:
        want = oracle.bidirectional_ccm(values[a], values[b], cfg)
        for direction in ("x_causes_y", "y_causes_x"):
            w = want[direction]
            expect = sorted(
                (int(ls), float(c), float(w["slope"]), bool(w["convergent"]))
                for ls, c in w["results"]
            )
            assert sorted(got[(a, b, direction)]) == expect, (a, b, direction)


def test_network_recovers_true_edges(spark):
    """All-pairs on the 5-series corpus: both true directed couplings
    (0→1, 2→3) are convergent with the TOP cross-map skills;
    cross-system responses score well below them. Explicit lib_sizes
    with a real holdout — the default ladder's maximum leaves a 2-point
    prediction set whose Pearson quantizes to ±1 (the degenerate-eval
    regime holdout_lib_size exists for)."""
    df, _ = _corpus(spark)
    cfg = CCMConfig(num_samples=8, seed=5, lib_sizes=[40, 70, 100])
    out = ccm_network(df, config=cfg).collect()
    max_lib = 100
    # skill of edge driver→response lives on the response's manifold:
    # direction x_causes_y (a drives b) maps from M_b, so read the
    # x_causes_y rows for (a, b) and y_causes_x rows for (b drives a)
    skills = {}
    for r in out:
        if r.lib_size != max_lib:
            continue
        if r.direction == "x_causes_y":
            skills[(r.a_id, r.b_id)] = (r.correlation, r.convergent)
        else:
            skills[(r.b_id, r.a_id)] = (r.correlation, r.convergent)
    assert skills[(0, 1)][1] and skills[(2, 3)][1]
    true_edges = {(0, 1), (2, 3)}
    floor = min(skills[e][0] for e in true_edges)
    cross_system = [
        (d, r)
        for (d, r) in skills
        if (d, r) not in true_edges and {d, r} not in ({0, 1}, {2, 3})
    ]
    assert all(skills[e][0] < floor for e in cross_system)


def test_pair_series_inner_join_truncates_to_shared_range(spark):
    """Members covering different time ranges align on the INTERSECTION
    (a pair only spans what both cover) — no NULL-padded rows."""
    import pandas as pd

    rows = pd.concat(
        [
            pd.DataFrame({"series_id": 0, "t": range(0, 50),
                          "value": [float(i) for i in range(50)]}),
            pd.DataFrame({"series_id": 1, "t": range(20, 80),
                          "value": [float(i) * 2 for i in range(20, 80)]}),
        ]
    )
    df = spark.createDataFrame(rows, "series_id long, t long, value double")
    ptab = pair_table(df, [(0, 1)])
    out = pair_series(df, ptab).collect()
    assert sorted(r.t for r in out) == list(range(20, 50))
    assert all(r.x is not None and r.y is not None for r in out)
