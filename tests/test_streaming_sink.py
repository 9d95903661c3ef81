"""Streaming demux: the incremental partitioned sink must produce the same
per-type layout and row counts as the batch demux, and restarting against
the same checkpoint must not duplicate data (exactly-once file sink)."""

import os

import pytest
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.catalog import load_table
from rosbag2parquet_spark.streaming.sink import stream_demux
from tests.conftest import SF_DIR


@pytest.mark.slow
def test_stream_demux_layout_and_exactly_once(spark, tmp_path):
    out = str(tmp_path / "demux_out")
    q = stream_demux(spark, SF_DIR, out)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    events = load_table(spark, SF_DIR, "events")
    written = spark.read.parquet(out)
    assert written.count() == events.count()
    types = {r.event_type for r in events.select("event_type").distinct().collect()}
    dirs = {
        d.split("=", 1)[1]
        for d in os.listdir(out)
        if d.startswith("datatype=")
    }
    assert dirs == types

    # restart against same checkpoint: no new input → no duplicates
    q2 = stream_demux(spark, SF_DIR, out)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(out).count() == events.count()

    # per-type content parity with the batch source
    got = (
        spark.read.parquet(out)
        .groupBy("datatype")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("size"), 4).alias("s"))
    )
    want = (
        events.groupBy(F.col("event_type").alias("datatype"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("s"))
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
