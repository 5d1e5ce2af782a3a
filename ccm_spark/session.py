"""SparkSession construction with the configs this engine relies on.

Centralised so every entry point (tests, bench, driver contract) reads
parquet the same way. Two configs make timestamp handling deterministic
across every ``ts`` physical type (see sources.tables.ts_micros):
``spark.sql.legacy.parquet.nanosAsLong`` lets Spark 4 read INT64
TIMESTAMP(NANOS) parquet (as a timezone-free long), and
``spark.sql.session.timeZone=UTC`` pins the TIMESTAMP_NTZ -> epoch-micros
conversion so it matches DuckDB's ``epoch_us`` in any environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ccm_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Defaults target the local test/bench environment; on a real cluster the
    same configs apply except ``master`` comes from the deployment. AQE is on
    so skewed CCM group fan-outs and the dedup joins re-plan at runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else int(cpus) if cpus.isdigit() else 32),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable configs to a session we did not build
    (the driver hands us one in ``__spark_entry__.entry``).

    ``nanosAsLong`` is session-settable at read time, so applying it here is
    enough for ``spark.read.parquet`` on the events table. ``timeZone`` is
    pinned to UTC so TIMESTAMP_NTZ -> epoch-micros conversion (ts_micros)
    is environment-independent.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
