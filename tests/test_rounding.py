"""The cross-engine rounding contract (SCALE.md determinism section):
Spark's F.round, DuckDB's round, and the Python/numpy twins
py_round_half_up / np_round_half_up must agree on every double —
including exact decimal ties, where the builtin round()/np.round
(binary banker's) genuinely diverge."""

from __future__ import annotations

import random

import duckdb
import numpy as np

from ccm_spark.functions.hashing import np_round_half_up, py_round_half_up

#: values that exposed real divergences: classifier-margin ties
#: (6-decimal weights x power-of-two count ratios), gradient-step ties
#: (g=0.000125 / n=500), and sign symmetry
KNOWN_TIES = [
    (-0.5973522875, 9),
    (-0.5973238125, 9),
    (-0.5991035, 6),
    (0.5973522875, 9),
    (5e-07, 6),
    (-5e-07, 6),
    (2.5e-09, 9),
    (-2.5e-09, 9),
    (0.1234565, 6),
]


def test_half_up_matches_duckdb_on_ties_and_randoms():
    con = duckdb.connect()
    cases = list(KNOWN_TIES)
    rng = random.Random(1)
    cases += [(rng.uniform(-1e3, 1e3), rng.choice([3, 6, 9])) for _ in range(20000)]
    for v, n in cases:
        want = con.execute(
            f"SELECT round(?::DOUBLE, {n})", [v]
        ).fetchone()[0]
        assert py_round_half_up(v, n) == want, (v, n)


def test_half_up_diverges_from_builtin_on_ties():
    """The reason the twins exist: at least one known tie where the
    builtin gives a different answer (if this ever stops holding, the
    twins are dead code)."""
    diverged = any(
        py_round_half_up(v, n) != round(v, n) for v, n in KNOWN_TIES
    )
    assert diverged


def test_np_round_half_up_matches_scalar_twin_and_spark(spark):
    vals = np.array([v for v, _ in KNOWN_TIES] + [0.0, -0.0, 123.456789])
    got = np_round_half_up(vals, 6)
    assert got.shape == vals.shape
    for v, g in zip(vals, got):
        assert g == py_round_half_up(float(v), 6)
    # shape preserved for matrices (the trainer artifact case)
    m = np_round_half_up(vals.reshape(3, 4), 6)
    assert m.shape == (3, 4)

    # and Spark's F.round agrees on the same doubles
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    rows = df.select(F.round("v", 6).alias("r")).collect()
    for v, r in zip(vals, rows):
        assert r.r == py_round_half_up(float(v), 6), v


def test_half_up_edge_values_match_f_round_semantics():
    import math

    assert py_round_half_up(-0.0, 6) == 0.0
    # huge magnitudes pass through (no fractional part above 2^53),
    # like F.round — the default Decimal context would raise here
    assert py_round_half_up(1e300, 6) == 1e300
    assert math.isnan(py_round_half_up(float("nan"), 6))
