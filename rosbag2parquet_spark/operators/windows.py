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

from rosbag2parquet_spark.sources.catalog import load_table, publish_scratch

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


# ------------------------------------------------ incremental rollup refresh

#: refresh boundary: rows at or after this instant are "the new data since
#: the last refresh" (2024-01-15 00:00:00 UTC, same epoch family as the
#: merge-upsert cutoff)
_REFRESH_CUTOFF_US = 1_705_276_800_000_000

#: the mergeable measure columns a materialized rollup must carry so a
#: refresh can combine partials without the raw history: additive (n,
#: sum_dec), extremal (mn, mx). avg/total derive at READ time from the
#: merged partials — never stored, so they merge trivially.
_ROLLUP_MEASURES = ("n", "sum_dec", "mn", "mx")


def rollup_partials(ev: DataFrame) -> DataFrame:
    """Aggregate events to the stored grain (hour × event_type) keeping
    only MERGEABLE partials. DECIMAL sum, not double: float addition isn't
    associative, so a double-summed rollup would drift from the direct
    aggregate under re-merging — decimal partials make refresh lossless."""
    return ev.groupBy(
        F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_start_us"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_dec"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )


def refresh_rollup(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge a DELTA's partials into a materialized BASE rollup — the
    continuous-aggregate refresh: cost is O(|delta| + touched groups),
    never O(history). Union + re-aggregate is the mergeable-partial
    combine; groups only the delta touches are the only ones whose rows
    change."""
    u = base.select("hour_start_us", "event_type", *_ROLLUP_MEASURES).unionByName(
        delta.select("hour_start_us", "event_type", *_ROLLUP_MEASURES)
    )
    return u.groupBy("hour_start_us", "event_type").agg(
        F.sum("n").alias("n"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def q_incr_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup REFRESH end-to-end: the pre-cutoff rollup is
    written to parquet ONCE (memoized per session+sf, like bucket-join's
    warehouse tables — it plays the stored continuous aggregate), then the
    post-cutoff delta aggregates and merges into it WITHOUT rescanning any
    pre-cutoff event. The oracle aggregates ALL raw events directly —
    equality proves the refresh is lossless, including min/max and the
    read-time avg derived from merged partials. At 100 TB this is the
    nightly-refresh plan: history is touched exactly once, ever."""
    import os
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(
        tempfile.gettempdir(), "rosbag2parquet_spark_incr_rollup"
    )
    base_path = os.path.join(root, tag)
    if not os.path.isdir(base_path):
        os.makedirs(root, exist_ok=True)
        work = tempfile.mkdtemp(prefix=f"{tag}_", dir=root)
        rollup_partials(
            ev.filter(F.unix_micros("ts") < _REFRESH_CUTOFF_US)
        ).write.parquet(os.path.join(work, "base"))
        # a lost publish race drops the loser's work dir; any non-race
        # failure re-raises (the r12-advisor rule, shared helper)
        publish_scratch(os.path.join(work, "base"), base_path)
        import shutil

        shutil.rmtree(work, ignore_errors=True)  # emptied (or stale) shell
    base = spark.read.parquet(base_path)
    delta = rollup_partials(
        ev.filter(F.unix_micros("ts") >= _REFRESH_CUTOFF_US)
    )
    merged = refresh_rollup(base, delta)
    return merged.select(
        "hour_start_us",
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.col("sum_dec").cast("double").alias("total_value"),
        F.col("mn").alias("min_value"),
        F.col("mx").alias("max_value"),
        (F.col("sum_dec").cast("double") / F.col("n")).alias("avg_value"),
    )


ORACLE_INCR_ROLLUP = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
       min(value) AS min_value,
       max(value) AS max_value,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*)
         AS avg_value
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
    "incr-rollup": q_incr_rollup,
    "rolling-window": q_rolling_window,
}

ORACLES = {
    "window-tumbling": ORACLE_WINDOW_TUMBLING,
    "window-sliding": ORACLE_WINDOW_SLIDING,
    "sessionize": ORACLE_SESSIONIZE,
    "rollup-hypertable": ORACLE_ROLLUP_HYPERTABLE,
    "incr-rollup": ORACLE_INCR_ROLLUP,
    "rolling-window": ORACLE_ROLLING_WINDOW,
}
