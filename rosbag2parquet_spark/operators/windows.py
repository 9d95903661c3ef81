"""Time-windowed and sessionized aggregation over the event stream
(north-star X5). Batch formulations here; the Structured Streaming variants
(same logical plan + watermark) live in
:mod:`rosbag2parquet_spark.streaming.windowed`.

Scale notes: tumbling/sliding windows are hash-aggregations keyed on
(window, type) — partial aggregation map-side, one shuffle, AQE-coalesced.
Session windows shuffle once on the session key (user) and sweep linearly —
the same plan Structured Streaming uses for ``session_window`` state merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.catalog import load_table

SESSION_GAP_MIN = 30


# ------------------------------------------------------- tumbling window


def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type: count + value sum. Uses the
    native ``window()`` expression (epoch-aligned, same alignment as the
    oracle's date_trunc)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact DECIMAL accumulation — order-free, engine-identical
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


ORACLE_WINDOW_TUMBLING = """
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


# -------------------------------------------------------- sliding window


def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in 2
    windows). The oracle replicates by exploding each event into its two
    candidate windows — identical semantics to Spark's sliding window."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "total_value",
        )
    )


ORACLE_WINDOW_SLIDING = """
WITH cand AS (
  SELECT value,
         unnest([epoch_us(date_trunc('hour', ts))
                   + CASE WHEN epoch_us(ts) - epoch_us(date_trunc('hour', ts))
                              >= 1800000000 THEN 1800000000 ELSE 0 END,
                 epoch_us(date_trunc('hour', ts))
                   + CASE WHEN epoch_us(ts) - epoch_us(date_trunc('hour', ts))
                              >= 1800000000 THEN 0 ELSE -1800000000 END])
           AS window_start_us
  FROM events
)
SELECT window_start_us, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM cand GROUP BY 1
"""


# ------------------------------------------------------- session window


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user sessions closed by a 30-minute inactivity
    gap. Uses the native ``session_window`` expression (merge-on-overlap
    semantics — identical to the classic lag/cumsum formulation the oracle
    uses). Output: one row per session with span and size."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_last_us"),
        )
        .select("user_id", "session_start_us", "session_last_us", "n_events")
    )


ORACLE_SESSIONIZE = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts)) > {SESSION_GAP_MIN * 60 * 1000000}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id, epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) AS session_last_us, count(*) AS n_events
FROM numbered GROUP BY user_id, session_id
"""


# -------------------------------------------- sessionize via lag (parity)


def sessionize_lag(df: DataFrame, key: str, ts: str, gap_min: int) -> DataFrame:
    """The window-function formulation of sessionization (lag + cumulative
    sum over the gap indicator) — used by tests to cross-check
    ``session_window`` semantics, and the portable fallback for engines
    without a session primitive."""
    w = Window.partitionBy(key).orderBy(ts)
    gap_us = gap_min * 60 * 1_000_000
    marked = df.withColumn(
        "__new",
        F.when(
            F.lag(ts).over(w).isNull()
            | (F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "__sid", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return numbered.groupBy(key, "__sid").agg(
        F.unix_micros(F.min(ts)).alias("session_start_us"),
        F.unix_micros(F.max(ts)).alias("session_last_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


# -------------------------------------------------- hypertable rollup


def q_rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate (hypertable) pattern: the hourly aggregate is
    computed FROM the minutely aggregate, not from raw events — proving the
    partials are mergeable (count and exact DECIMAL sums re-aggregate
    losslessly). This is the materialized-rollup maintenance plan at 100 TB:
    raw → minutely once, then every coarser grain reads the rollup, never
    the raw table. The oracle aggregates raw events directly — equality IS
    the mergeability proof."""
    ev = load_table(spark, sf_dir, "events")
    minutely = ev.groupBy(
        F.window("ts", "1 minute").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("tv_dec"),
    )
    return (
        minutely.groupBy(
            F.date_trunc("hour", F.col("w.start")).alias("h"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("tv_dec").cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros("h").alias("hour_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


ORACLE_ROLLUP_HYPERTABLE = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


#: trailing-window width in epoch microseconds (1 hour)
_TRAIL_US = 3_600_000_000


def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE-frame trailing aggregate: per event, the count and
    exact-decimal sum of the SAME USER's events in the preceding hour —
    the per-entity rolling feature every monitoring / feature-store
    pipeline computes, and the one window-frame type (value-range, not
    row-count) the rest of the suite doesn't exercise. The frame bound is
    integer epoch-µs, so both engines evaluate the identical numeric RANGE
    semantics (ts ties are frame peers in both). One shuffle + sort on
    (user_id, ts) — Spark's WindowExec advances the range frame
    incrementally over the sorted run; no per-row rescan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rosbag2parquet_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_TRAIL_US, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("sum_trailing_1h"),
    )


ORACLE_ROLLING_WINDOW = f"""
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       count(*) OVER w AS n_trailing_1h,
       CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
         AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {_TRAIL_US} PRECEDING AND CURRENT ROW)
"""


QUERIES = {
    "window-tumbling": q_window_tumbling,
    "window-sliding": q_window_sliding,
    "sessionize": q_sessionize,
    "rollup-hypertable": q_rollup_hypertable,
    "rolling-window": q_rolling_window,
}

ORACLES = {
    "window-tumbling": ORACLE_WINDOW_TUMBLING,
    "window-sliding": ORACLE_WINDOW_SLIDING,
    "sessionize": ORACLE_SESSIONIZE,
    "rollup-hypertable": ORACLE_ROLLUP_HYPERTABLE,
    "rolling-window": ORACLE_ROLLING_WINDOW,
}
