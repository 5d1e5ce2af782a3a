"""CSV series source — the reference's custom-data entry path.

The reference's livebook demo accepts two pasted comma-separated series,
requires equal length and >= 10 points, and runs bidirectional CCM on them
(examples.livemd:188-243). This module reproduces that path Spark-side:
``parse_pasted_series`` for the literal paste format, and ``read_csv_series``
for CSV files with (t, x, y) columns — the scalable ingestion variant
(spark.read.csv with explicit schema; no inferSchema scan).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MIN_POINTS = 10  # examples.livemd:218


def parse_pasted_series(
    spark: SparkSession, x_text: str, y_text: str, pair_id: int = 0
) -> DataFrame:
    """Two comma-separated strings -> (pair_id, t, x, y). Raises like the
    livemd on unequal length or < 10 points."""
    try:
        xs = [float(v) for v in x_text.split(",") if v.strip() != ""]
        ys = [float(v) for v in y_text.split(",") if v.strip() != ""]
    except ValueError as e:
        raise ValueError(f"series values must be numeric: {e}") from e
    if len(xs) != len(ys):
        raise ValueError(
            f"x and y series must have the same length (got {len(xs)} and {len(ys)})"
        )
    if len(xs) < MIN_POINTS:
        raise ValueError(f"need at least {MIN_POINTS} points (got {len(xs)})")
    rows = [(pair_id, t, xs[t], ys[t]) for t in range(len(xs))]
    return spark.createDataFrame(rows, "pair_id long, t long, x double, y double")


def read_csv_series(
    spark: SparkSession,
    path: str,
    has_header: bool = True,
) -> DataFrame:
    """CSV file(s) with columns (pair_id, t, x, y) -> series DataFrame.

    Explicit schema (no inference pass over the data); bad rows fail fast
    under the session's ANSI mode rather than silently nulling.
    """
    return (
        spark.read.option("header", str(has_header).lower())
        .schema("pair_id long, t long, x double, y double")
        .csv(path)
        .select("pair_id", "t", F.col("x").cast("double"), F.col("y").cast("double"))
    )
