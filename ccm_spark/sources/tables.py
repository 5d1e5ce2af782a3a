"""Parquet sources + the events -> aligned-series preparation.

The reference takes in-memory lists (lib/ccm.ex:20); the rebuild's sources
are parquet scans. ``events_pair_series`` turns the testdata events table
into the reference's (pair_id, t, x, y) time-series shape: two event types
become the two series, aligned on a dense per-type row index (the
reference's implicit index-as-time model, README.md:60).

Determinism: ``ts`` is normalised to epoch MICROSECONDS (``ts_micros``)
whatever the parquet physical type — int64 nanos (legacy testdata, read via
nanosAsLong), TIMESTAMP(us), or TIMESTAMP_NTZ(us) — and ordered with an
event_id tiebreak. DuckDB reads the same parquet at microsecond precision
(``epoch_us(ts)``), so both engines sort and bucket identically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql.types import TimestampNTZType, TimestampType

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fmt: str = "parquet"
) -> DataFrame:
    """Load one of the engine's tables. ``fmt`` accepts any Spark batch
    source ("parquet" default; "orc" / "json" / "csv" round-trip via
    :func:`convert_table`) — every downstream operator is
    format-agnostic because it only sees the DataFrame."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # TIMESTAMP_NTZ -> epoch micros goes through a session-tz-dependent
    # cast; pin UTC so ts_micros is environment-independent and equal to
    # DuckDB's epoch_us on the same file.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.{fmt}"
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    return reader.format(fmt).load(path)


def convert_table(
    spark: SparkSession, sf_dir: str, name: str, out_dir: str, fmt: str
) -> str:
    """Re-materialise a parquet table in another format (ORC/JSON/CSV)
    under ``out_dir`` so format-robustness can be exercised end-to-end;
    returns the written path (layout matches what ``load_table`` expects)."""
    df = load_table(spark, sf_dir, name)
    path = f"{out_dir}/{name}.{fmt}"
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)
    return path


def ts_micros(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-microseconds column for ``col``, dispatching on the dtype the
    parquet actually delivered (a user's parquet is micros more often than
    nanos; the engine must not hard-code one physical type):

      - TIMESTAMP_NTZ: interpret the wall clock in the session timezone
        (sessions pin UTC) — equals DuckDB's ``epoch_us(ts)``.
      - TIMESTAMP: already an instant; ``unix_micros`` directly.
      - integral (int64 nanos via nanosAsLong): floor-divide to micros —
        double division could round across a microsecond boundary and
        break DuckDB order parity, so integer DIV only.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, TimestampNTZType):
        return F.unix_micros(F.col(col).cast("timestamp"))
    if isinstance(dt, TimestampType):
        return F.unix_micros(F.col(col))
    return F.expr(f"CAST({col} AS BIGINT) DIV 1000")


def events_pair_series(
    spark: SparkSession,
    sf_dir: str,
    x_event_type: str = "click",
    y_event_type: str = "view",
    max_points: int = 300,
) -> DataFrame:
    """(pair_id=0, t, x, y): x = value sequence of one event type, y of
    another, each ordered by (microsecond ts, event_id), inner-aligned on t
    and truncated to ``max_points`` (CCM cost grows as O(S * sum (P-L)*L),
    so callers pin the series length; the reference's own workloads use
    N ~= 300, test/ccm_test.exs:6)."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = ts_micros(ev)
    filtered = ev.where(
        F.col("event_type").isin([x_event_type, y_event_type])
    ).select(
        "event_type", "event_id", "value", ts_us.alias("ts_us")
    )
    # Two-phase top-k so the global rank never sorts a whole event type on
    # one task (at 100 TB that single-task sort is the series-prep
    # bottleneck). Phase 1 keeps the first max_points rows per
    # (event_type, input split) — a superset of the global first max_points,
    # since the global winners from any split are also local winners there.
    # Phase 2 ranks the survivors: <= max_points * n_splits rows per type,
    # bounded regardless of data volume. (event_id is unique, so the
    # (ts_us, event_id) order is strict and both phases are deterministic
    # for ANY row-to-split assignment.)
    order = [F.col("ts_us").asc(), F.col("event_id").asc()]
    local_w = Window.partitionBy("event_type", "split_id").orderBy(*order)
    survivors = filtered.withColumn(
        "split_id", F.spark_partition_id()
    ).withColumn("local_rank", F.row_number().over(local_w)).where(
        F.col("local_rank") <= max_points
    )
    global_w = Window.partitionBy("event_type").orderBy(*order)
    ranked = survivors.select(
        "event_type",
        "value",
        (F.row_number().over(global_w) - 1).alias("t"),
    ).where(F.col("t") < max_points)
    xs = ranked.where(F.col("event_type") == x_event_type).select(
        "t", F.col("value").alias("x")
    )
    ys = ranked.where(F.col("event_type") == y_event_type).select(
        "t", F.col("value").alias("y")
    )
    return (
        xs.join(ys, "t")
        .select(F.lit(0).cast("long").alias("pair_id"), "t", "x", "y")
    )
