"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's `rosbag info`
aggregation surface, rosbag_example.cpp:37-72) on sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle; implementations live in
``rosbag2parquet_spark`` and co-locate each oracle next to its operator.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rosbag2parquet_spark import sinks  # noqa: E402
from rosbag2parquet_spark.functions import dedup, kmeans, similarity, text  # noqa: E402
from rosbag2parquet_spark.operators import (  # noqa: E402
    analytic,
    asof,
    keys,
    olap,
    relational,
    setops,
    tpch,
    windows,
)


def _configure(spark: SparkSession) -> SparkSession:
    """Session invariants the engine relies on (UTC so timestamps hash
    identically to the DuckDB oracle; AQE for runtime re-planning)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass  # immutable on some builds; harmless
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-type stats + derived rates on sf0.001 (reference
    rosbag_example.cpp:37-72 — the `rosbag info` analog)."""
    _configure(spark)
    return relational.q_derived(spark, "/root/testdata/sf0.001")


_MODULES = (
    relational,
    keys,
    olap,
    setops,
    tpch,
    analytic,
    asof,
    windows,
    text,
    dedup,
    similarity,
    kmeans,
    sinks,
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        for name, fn in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r}")

            def wrapped(spark, sf_dir, _fn=fn):
                return _fn(_configure(spark), sf_dir)

            out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
