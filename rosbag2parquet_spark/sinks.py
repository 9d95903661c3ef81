"""Sink-side queries: demux routing (S3), parquet sink round-trip (S16).

Both run the full converter (:mod:`rosbag2parquet_spark.convert`) into a
scratch directory, then read the written layout back — exercising the write
path end-to-end the way the reference's golden test does
(rosbag2parquet_test.cpp:160-303: convert, then re-read with a raw parquet
reader and assert content).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rosbag2parquet_spark.convert import convert
from rosbag2parquet_spark.sources.catalog import load_table

_SEQ_CONN_SQL = """
WITH seq AS (
  SELECT *, row_number() OVER (ORDER BY ts, event_id) - 1 AS seqno FROM events
),
conns AS (
  SELECT user_id, event_type,
         row_number() OVER (ORDER BY user_id, event_type) - 1 AS connection_id
  FROM (SELECT DISTINCT user_id, event_type FROM events)
)
"""


def _converted_dir(spark: SparkSession, sf_dir: str) -> str:
    """Run the converter once per sf_dir into a deterministic scratch path.
    The conversion writes into a unique temp dir and atomically renames it
    into place — a concurrent run either wins the rename or reuses the
    winner's output, never interleaves writes. (The scratch lives in /tmp
    across processes; delete it after changing converter code or fixtures.)"""
    tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), "rosbag2parquet_spark_out")
    out = os.path.join(root, tag)
    if not os.path.isdir(out):
        from rosbag2parquet_spark.operators.keys import PROPS_SCHEMA

        os.makedirs(root, exist_ok=True)
        work = tempfile.mkdtemp(prefix=f"{tag}_", dir=root)
        events = load_table(spark, sf_dir, "events")
        convert(
            spark,
            events,
            work,
            order_cols=["ts", "event_id"],
            payload_schema=PROPS_SCHEMA,
        )
        try:
            os.rename(work, out)  # atomic on same filesystem
        except OSError:
            pass  # another process won the race; its output is equivalent
    return out


def q_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type demultiplexer (reference GetHandler, FlattenedRosWriter.cpp:
    273-289): after the partitioned write, reading ONE type touches one
    partition directory — the partition filter prunes all others (the
    reference's per-type scan isolation, README.md:2-4)."""
    out = _converted_dir(spark, sf_dir)
    pertype = spark.read.parquet(os.path.join(out, "pertype"))
    return (
        pertype.filter(F.col("datatype") == "purchase")
        .select(
            "seqno",
            F.unix_micros("time").alias("time_us"),
            "size",
            "k",  # flattened payload field (S5 applied inside the converter)
            "connection_id",
        )
    )


ORACLE_DEMUX = (
    _SEQ_CONN_SQL
    + """
SELECT seqno, epoch_us(ts) AS time_us, value AS size,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k, connection_id
FROM seq JOIN conns USING (user_id, event_type)
WHERE event_type = 'purchase'
"""
)


def q_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink round-trip (reference TableBuffer write path,
    TableBuffer.cpp:10-162): the ``Messages`` table as written to disk and
    read back — the reference's exact (seqno, time_sec, time_nsec, size,
    connection_id) layout must survive the sink."""
    out = _converted_dir(spark, sf_dir)
    return spark.read.parquet(os.path.join(out, "Messages"))


ORACLE_SINK = (
    _SEQ_CONN_SQL
    + """
SELECT seqno,
       CAST(epoch_us(ts) // 1000000 AS INTEGER) AS time_sec,
       CAST((epoch_us(ts) % 1000000) * 1000 AS INTEGER) AS time_nsec,
       value AS size, connection_id
FROM seq JOIN conns USING (user_id, event_type)
"""
)


QUERIES = {"demux": q_demux, "sink": q_sink}
ORACLES = {"demux": ORACLE_DEMUX, "sink": ORACLE_SINK}
