"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in :mod:`ccm_spark.entry`; this file stays a thin
import shim so the package is the single source of truth.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ccm_spark.entry import entry, oracle_sql, queries  # noqa: E402,F401

__all__ = ["entry", "queries", "oracle_sql"]
