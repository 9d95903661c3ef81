"""SparkSession factory tuned for this engine.

The reference runs one thread of one process (reference README.md:131-133
"not pipelined"); our engine is built for a multi-executor cluster and tested
on ``local[N]``. All scale-sensitive knobs live here so every entry point
(driver contract, tests, bench) shares one configuration:

- AQE on (runtime coalescing, skew-join splitting) — the 100 TB story relies
  on it re-planning skewed shuffles;
- shuffle partitions sized to cores for local mode (the 200 default
  over-parallelizes small local runs and under-parallelizes big clusters —
  clusters should override via ``spark.sql.shuffle.partitions``);
- session timezone pinned to UTC so timestamp semantics match external
  oracles (DuckDB is UTC-naive);
- Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "rosbag2parquet_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the session.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores. On a real
    cluster the caller supplies its own master/conf; everything here is safe
    to apply cluster-side too.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # session-wide parquet timestamp invariants (also asserted by
        # __spark_entry__._configure for driver-owned sessions): naive
        # timestamps read as session-TZ TimestampType; TIMESTAMP(NANOS)
        # columns surface as nanos-since-epoch longs which
        # sources.catalog.load_table rebuilds as micros — declared here so
        # no table read has to mutate the session behind the caller's back
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    builder = builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
