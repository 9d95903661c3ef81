"""Stateful streaming: the applyInPandasWithState running profile must, after
draining the finite fixture, converge to the batch groupBy answer — and the
grouped-map (applyInPandas) zscore must equal the window-function zscore."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rosbag2parquet_spark.operators.olap import q_zscore
from rosbag2parquet_spark.sources.catalog import load_table
from rosbag2parquet_spark.streaming.stateful import running_user_profile
from rosbag2parquet_spark.streaming.windowed import run_to_memory, stream_events
from tests.conftest import SF_DIR


@pytest.mark.slow
def test_stateful_profile_converges_to_batch(spark):
    ev = stream_events(spark, SF_DIR).select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    out = running_user_profile(ev)
    run_to_memory(out, "profiles", mode="update")
    # last update per user == batch aggregate
    final = spark.sql(
        """
        SELECT user_id, max_by(n_events, n_events) AS n_events,
               round(max_by(total_value, n_events), 4) AS total_value
        FROM profiles GROUP BY user_id
        """
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    assert final.exceptAll(batch).count() == 0 and batch.exceptAll(final).count() == 0


def test_grouped_map_zscore_equals_window(spark):
    """applyInPandas grouped transform == the Tungsten window formulation
    (documents that the slow path is semantically interchangeable)."""
    ev = load_table(spark, SF_DIR, "events")

    def zscore_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "zscore": ((pdf["value"] - pdf["value"].mean()) / std).round(6),
            }
        )

    via_pandas = ev.groupBy("event_type").applyInPandas(
        zscore_pdf, schema="event_id long, event_type string, zscore double"
    )
    # q_zscore emits the raw decimal-exact-moment quotient (cross-engine
    # determinism); pandas computes float moments — compare at 6 dp
    via_window = q_zscore(spark, SF_DIR).withColumn(
        "zscore", F.round("zscore", 6)
    )
    assert via_pandas.exceptAll(via_window).count() == 0
    assert via_window.exceptAll(via_pandas).count() == 0
