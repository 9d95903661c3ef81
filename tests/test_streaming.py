"""Structured Streaming smoke: the streaming windowed plan over the finite
fixture must produce the batch answer (incrementalization correctness)."""

import pytest

from rosbag2parquet_spark.operators.windows import q_window_tumbling
from rosbag2parquet_spark.streaming.windowed import (
    run_to_memory,
    stream_events,
    windowed_counts,
)
from tests.conftest import SF_DIR


@pytest.mark.slow
def test_streaming_tumbling_equals_batch(spark):
    events = stream_events(spark, SF_DIR)
    agg = windowed_counts(events)
    run_to_memory(agg, "stream_tumbling", mode="complete")
    streamed = spark.sql("SELECT * FROM stream_tumbling")
    batch = q_window_tumbling(spark, SF_DIR)
    assert streamed.count() > 0
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
