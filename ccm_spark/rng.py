"""Deterministic cross-engine pseudo-randomness.

The bootstrap library sampling (S1, SURVEY.md §2) must be a pure function of
(seed, direction, lib_size, sample_id, point index) AND be computable
identically in Spark SQL, DuckDB SQL, and numpy — the driver's correctness
gate runs the same query in Spark and DuckDB and hash-compares values.

Native hash functions differ across engines (Spark xxhash64 vs DuckDB hash),
so we use plain 64-bit integer arithmetic both engines evaluate exactly:
a mixed-key reduction into a 31-bit state followed by two rounds of the
classic glibc LCG (a=1103515245, c=12345, m=2^31). All intermediates stay
below 2^62, so ANSI-mode Spark does not overflow.

Python/numpy mirror for the oracle is ``lcg_rank_key``.
"""

from __future__ import annotations

import numpy as np

M31 = 2_147_483_648  # 2^31
LCG_A = 1_103_515_245
LCG_C = 12_345

# key-mixing multipliers (arbitrary primes; small enough that
# idx*KA + sample*KB + lib*KC + dir*KD + seed < 2^62 for realistic sizes)
KA = 2_654_435_761  # point index
KB = 97_531         # sample_id
KC = 40_503         # lib_size
KD = 69_621         # direction id


def lcg_rank_key(
    idx: np.ndarray | int,
    sample_id: np.ndarray | int,
    lib_size: np.ndarray | int,
    dir_id: np.ndarray | int,
    seed: int,
) -> np.ndarray | int:
    """The random order key: two LCG rounds over a mixed 31-bit state.

    numpy mirror of :func:`sql_rank_key_expr`; used by the oracle and unit
    tests. Uses Python/object ints via np.int64 — all values < 2^62 so int64
    is exact.
    """
    h0 = (
        np.int64(idx) * KA
        + np.int64(sample_id) * KB
        + np.int64(lib_size) * KC
        + np.int64(dir_id) * KD
        + np.int64(seed)
    ) % M31
    h1 = (LCG_A * h0 + LCG_C) % M31
    h2 = (LCG_A * h1 + LCG_C) % M31
    return h2


def sql_rank_key_expr(idx: str, sample_id: str, lib_size: str, dir_id: str, seed: int) -> str:
    """SQL text for the same key, valid in BOTH Spark SQL and DuckDB.

    All operands are forced to BIGINT; every intermediate < 2^62.
    """
    h0 = (
        f"((CAST({idx} AS BIGINT) * {KA} + CAST({sample_id} AS BIGINT) * {KB} "
        f"+ CAST({lib_size} AS BIGINT) * {KC} + CAST({dir_id} AS BIGINT) * {KD} "
        f"+ {seed}) % {M31})"
    )
    h1 = f"(({LCG_A} * {h0} + {LCG_C}) % {M31})"
    h2 = f"(({LCG_A} * {h1} + {LCG_C}) % {M31})"
    return h2
