"""Spark-vs-DuckDB parity for oracles OUTSIDE the driver's 50-entry gate.

The registry is capped at 50 entries (the driver checks exactly that
window), so queries rotated out of the gate — currently the noise-free G2
generator, whose slot went to dedup_incremental — keep their SQL oracle
exercised HERE instead of rotting unexercised (ADVICE r4, entry.py).
Same comparison the driver makes: row count + exact values.
"""

from __future__ import annotations

import duckdb


def test_gen_coupled_series_sql_oracle_matches_spark(spark):
    from ccm_spark.entry import q_gen_coupled_series
    from ccm_spark.plans.oracle_sql_ext import sql_gen_coupled_series

    sdf = q_gen_coupled_series(spark, None)
    assert sdf.columns == ["t", "x", "y"]
    s_rows = sorted(tuple(r) for r in sdf.collect())
    d_rows = sorted(tuple(r) for r in duckdb.sql(sql_gen_coupled_series()).fetchall())
    # both sides round to 1e-6 before emitting, so equality is exact
    assert s_rows == d_rows
