"""As-of (time-travel) join — north-star X6, the sensor-fusion pattern over
the reference's per-type tables (join camera frames to the latest GPS fix at
or before each frame; the reference leaves this to downstream engines,
README.md:14-18).

Spark has no native ASOF JOIN. Implementation: the union-and-carry-forward
plan — interleave probe and quote rows on the time axis, then
``last(value) IGNORE NULLS`` over a window partitioned by key and ordered by
(time, side). This is the scalable formulation:

- one shuffle total (the window partition on the join key), vs. a range-join
  which Spark would execute as broadcast-nested-loop;
- within each key-partition the window is a linear sweep — exactly the
  merge-asof algorithm, distributed by key;
- skewed keys are split by AQE; no driver-side state.

``pd.merge_asof`` via applyInPandas would express the same thing but moves
every row through Arrow+Python; the window formulation stays in Tungsten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.catalog import load_table


def asof_join(
    probes: DataFrame,
    quotes: DataFrame,
    probe_key: str,
    quote_key: str,
    probe_time: str,
    quote_time: str,
    value_cols: list[str],
) -> DataFrame:
    """For each probe row, attach the value columns of the latest quote row
    with the same key and quote_time <= probe_time (inclusive)."""
    q = quotes.select(
        F.col(quote_key).alias("__key"),
        F.col(quote_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__q_{c}") for c in value_cols],
    )
    p = probes.select(
        F.col(probe_key).alias("__key"),
        F.col(probe_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(q.schema[f"__q_{c}"].dataType).alias(f"__q_{c}") for c in value_cols],
        *[F.col(c) for c in probes.columns],
    )
    q_aligned = q.select(
        "__key", "__t", "__side", *[f"__q_{c}" for c in value_cols],
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in probes.columns],
    )
    merged = q_aligned.unionByName(p)
    # quotes (__side=0) sort before probes at the same instant → `<=` semantics
    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        "*",
        *[
            F.last(f"__q_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *probes.columns, *[f"asof_{c}" for c in value_cols]
    )


def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event, the customer's most recent order at or before the
    event (events ≈ camera frames, orders ≈ the slower state stream being
    fused in). Left semantics: events whose user never ordered before keep
    NULL. Quotes are pre-deduplicated to one row per (key, time) — max
    o_orderkey wins — because as-of is ill-defined under timestamp ties;
    the oracle dedups identically."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    quotes = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max_by("o_orderkey", "o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    out = asof_join(
        probes=events.select("event_id", "user_id", "ts"),
        quotes=quotes,
        probe_key="user_id",
        quote_key="o_custkey",
        probe_time="ts",
        quote_time="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("asof_o_orderkey").alias("last_orderkey"),
        # raw column passthrough — identical bits on both sides; no round()
        F.col("asof_o_totalprice").alias("last_order_price"),
    )


ORACLE_ASOF = """
WITH q AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
         max_by(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY 1, 2
)
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       q.o_orderkey AS last_orderkey,
       q.o_totalprice AS last_order_price
FROM events ASOF LEFT JOIN q
  ON user_id = q.o_custkey AND q.o_orderdate <= events.ts
"""


#: max staleness for the tolerance variant — 30 days in microseconds
ASOF_TOLERANCE_US = 30 * 24 * 3600 * 1_000_000


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with BOUNDED staleness: a match older than the tolerance
    (30 days) is discarded — the semantic real sensor fusion needs (a
    3-hour-old GPS fix must not be fused into the current frame). Same
    single-shuffle carry-forward plan; the quote TIME rides along as one
    more carried column and a final narrow projection nulls stale matches —
    tolerance costs nothing over the plain as-of."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    quotes = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max_by("o_orderkey", "o_orderkey").alias("o_orderkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
    )
    out = asof_join(
        probes=events.select("event_id", "user_id", "ts"),
        quotes=quotes,
        probe_key="user_id",
        quote_key="o_custkey",
        probe_time="ts",
        quote_time="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice", "o_orderdate"],
    )
    fresh = (
        F.unix_micros("ts") - F.unix_micros("asof_o_orderdate")
        <= ASOF_TOLERANCE_US
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(fresh, F.col("asof_o_orderkey")).alias("last_orderkey"),
        F.when(fresh, F.col("asof_o_totalprice")).alias("last_order_price"),
        F.coalesce(fresh.cast("int"), F.lit(0)).alias("within_tolerance"),
    )


ORACLE_ASOF_TOLERANCE = f"""
WITH q AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
         max_by(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY 1, 2
), m AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         q.o_orderkey, q.o_totalprice,
         epoch_us(ts) - epoch_us(q.o_orderdate) AS age_us
  FROM events ASOF LEFT JOIN q
    ON user_id = q.o_custkey AND q.o_orderdate <= events.ts
)
SELECT event_id, user_id, ts_us,
       CASE WHEN age_us <= {ASOF_TOLERANCE_US} THEN o_orderkey END
         AS last_orderkey,
       CASE WHEN age_us <= {ASOF_TOLERANCE_US} THEN o_totalprice END
         AS last_order_price,
       CAST(coalesce(age_us <= {ASOF_TOLERANCE_US}, false) AS INTEGER)
         AS within_tolerance
FROM m
"""


_HOUR_US = 3_600_000_000


def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling onto a fixed 1-hour grid with LOCF and linear
    interpolation — the gap-fill every sensor-fusion/monitoring consumer
    of the converted per-type tables needs (irregular message arrival → a
    regular grid joinable across types).

    Construction: per-entity grid rows (arithmetic ``sequence`` + explode,
    no cross join) UNION the real points; ONE shuffle on the entity key,
    then two window passes over the same partitioning (carry-back +
    carry-forward) — the exact as-of plan shape (q_asof) extended with the
    bracketing 'next' side. Interpolation is a single IEEE division times
    an exact-integer gap, so Spark and DuckDB produce bit-identical
    doubles. Tie order at a grid point that coincides with an event is
    (t, is_grid, event_id): events sort first, so the grid row reads the
    event's value (gap 0 → interp == locf == value, exactly).

    At 100 TB: grid density is per entity and bounded by its own time
    span; the two windows share one Exchange; nothing is driver-side."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.col("value").cast("double").alias("v"),
        F.col("event_id").alias("eid"),
    )
    bounds = ev.groupBy("event_type").agg(
        F.min("t_us").alias("lo"), F.max("t_us").alias("hi")
    )
    # guard ceil(lo) <= hi: Spark's sequence() RAISES on start > stop
    # (an entity whose whole span sits inside one hour without crossing a
    # boundary), where the oracle's range() just yields no rows — emit an
    # empty array for that entity instead
    ceil_lo = F.expr(f"((lo + {_HOUR_US - 1}) div {_HOUR_US}) * {_HOUR_US}")
    grid = bounds.select(
        "event_type",
        F.explode(
            F.when(
                ceil_lo <= F.col("hi"),
                F.sequence(ceil_lo, F.col("hi"), F.lit(_HOUR_US).cast("long")),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("t_us"),
    )
    tagged = grid.select(
        "event_type",
        "t_us",
        F.lit(None).cast("double").alias("v"),
        F.lit(1).alias("is_grid"),
        F.lit(-1).cast("long").alias("eid"),
    ).unionByName(ev.select("event_type", "t_us", "v", F.lit(0).alias("is_grid"), "eid"))
    order = [F.col("t_us"), F.col("is_grid"), F.col("eid")]
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the "next" side runs as a RUNNING frame over the REVERSED order:
    # Spark evaluates first()-over-unboundedFollowing by rescanning the
    # tail per row — O(n²) per partition (63 s at sf0.1, measured); the
    # descending running last() is the same value in O(n log n), and both
    # sorts share the one event_type Exchange
    w_next = (
        Window.partitionBy("event_type")
        .orderBy(*[c.desc() for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t_of_point = F.when(F.col("v").isNotNull(), F.col("t_us"))
    enriched = tagged.select(
        "event_type",
        "t_us",
        "is_grid",
        F.last("v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(t_of_point, ignorenulls=True).over(w_prev).alias("prev_t"),
        F.last("v", ignorenulls=True).over(w_next).alias("next_v"),
        F.last(t_of_point, ignorenulls=True).over(w_next).alias("next_t"),
    )
    frac = (F.col("t_us") - F.col("prev_t")).cast("double") / (
        F.col("next_t") - F.col("prev_t")
    ).cast("double")
    interp = (
        F.when(F.col("prev_t").isNull(), F.col("next_v"))
        .when(F.col("next_t").isNull(), F.col("prev_v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
    )
    return enriched.filter(F.col("is_grid") == 1).select(
        "event_type",
        F.col("t_us").alias("grid_us"),
        F.col("prev_v").alias("locf"),
        interp.alias("interp"),
    )


ORACLE_RESAMPLE = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS t_us, CAST(value AS DOUBLE) AS v,
         event_id AS eid
  FROM events
),
b AS (
  SELECT event_type,
         ((min(t_us) + {_HOUR_US - 1}) // {_HOUR_US}) * {_HOUR_US} AS lo,
         max(t_us) AS hi
  FROM ev GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(range(lo, hi + 1, {_HOUR_US})) AS t_us FROM b
),
tagged AS (
  SELECT event_type, t_us, CAST(NULL AS DOUBLE) AS v, 1 AS is_grid,
         CAST(-1 AS BIGINT) AS eid
  FROM grid
  UNION ALL
  SELECT event_type, t_us, v, 0, eid FROM ev
),
w AS (
  SELECT event_type, t_us, is_grid,
    last_value(v IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY t_us, is_grid, eid
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    last_value(CASE WHEN v IS NOT NULL THEN t_us END IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY t_us, is_grid, eid
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
    first_value(v IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY t_us, is_grid, eid
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    first_value(CASE WHEN v IS NOT NULL THEN t_us END IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY t_us, is_grid, eid
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
  FROM tagged
)
SELECT event_type, t_us AS grid_us, prev_v AS locf,
  CASE WHEN prev_t IS NULL THEN next_v
       WHEN next_t IS NULL THEN prev_v
       ELSE prev_v + (next_v - prev_v)
            * (CAST(t_us - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
  END AS interp
FROM w WHERE is_grid = 1
"""


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor time join — the either-direction variant classic
    sensor alignment wants (backward-only as-of misses a reading 1 ms
    AFTER the frame in favor of one 5 s before): for each 'error' event,
    the same user's closest 'purchase' in EITHER direction. Same
    one-shuffle union construction as ``q_resample``: quotes and probes
    union, ONE user_id Exchange, a running frame carries the latest
    quote at-or-before each probe and a REVERSED running frame carries
    the earliest strictly-after quote (Spark's unboundedFollowing is
    O(n²) — the r6 lesson, reused); the closer side wins, ties to the
    earlier quote. Left semantics: errors with no purchases keep NULLs."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        "event_id",
        "event_type",
    )
    quotes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "t", F.col("event_id").alias("q_eid"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("p_eid"),
    )
    probes = ev.filter(F.col("event_type") == "error").select(
        "user_id", "t", F.lit(None).cast("long").alias("q_eid"),
        F.lit(1).alias("is_probe"),
        F.col("event_id").alias("p_eid"),
    )
    tagged = quotes.unionByName(probes)
    order = [F.col("t"), F.col("is_probe"), F.col("q_eid")]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(*[c.desc() for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t_of_quote = F.when(F.col("q_eid").isNotNull(), F.col("t"))
    enriched = tagged.select(
        "user_id",
        "t",
        "is_probe",
        "p_eid",
        F.last("q_eid", ignorenulls=True).over(w_prev).alias("prev_eid"),
        F.last(t_of_quote, ignorenulls=True).over(w_prev).alias("prev_t"),
        F.last("q_eid", ignorenulls=True).over(w_next).alias("next_eid"),
        F.last(t_of_quote, ignorenulls=True).over(w_next).alias("next_t"),
    ).filter(F.col("is_probe") == 1)
    prev_closer = (
        F.col("next_t").isNull()
        | (
            F.col("prev_t").isNotNull()
            & ((F.col("t") - F.col("prev_t")) <= (F.col("next_t") - F.col("t")))
        )
    )
    return enriched.select(
        F.col("p_eid").alias("event_id"),
        "user_id",
        F.col("t").alias("t_us"),
        F.when(prev_closer, F.col("prev_eid"))
        .otherwise(F.col("next_eid"))
        .alias("nearest_purchase_id"),
        F.when(prev_closer, F.col("t") - F.col("prev_t"))
        .otherwise(F.col("next_t") - F.col("t"))
        .alias("dist_us"),
    )


ORACLE_ASOF_NEAREST = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, event_type FROM events
),
tagged AS (
  SELECT user_id, t, event_id AS q_eid, 0 AS is_probe,
         CAST(NULL AS BIGINT) AS p_eid
  FROM ev WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, t, NULL, 1, event_id
  FROM ev WHERE event_type = 'error'
),
w AS (
  SELECT user_id, t, is_probe, p_eid,
         last_value(q_eid IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, is_probe, q_eid
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_eid,
         last_value(CASE WHEN q_eid IS NOT NULL THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t, is_probe, q_eid
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
         last_value(q_eid IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY t DESC, is_probe DESC, q_eid DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_eid,
         last_value(CASE WHEN q_eid IS NOT NULL THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id
           ORDER BY t DESC, is_probe DESC, q_eid DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_t
  FROM tagged
)
SELECT p_eid AS event_id, user_id, t AS t_us,
       CASE WHEN next_t IS NULL
              OR (prev_t IS NOT NULL AND t - prev_t <= next_t - t)
            THEN prev_eid ELSE next_eid END AS nearest_purchase_id,
       CASE WHEN next_t IS NULL
              OR (prev_t IS NOT NULL AND t - prev_t <= next_t - t)
            THEN t - prev_t ELSE next_t - t END AS dist_us
FROM w WHERE is_probe = 1
"""


_GAP_THRESHOLD_US = 30 * 60 * 1_000_000  # 30 minutes


def q_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Message-drop / silence detection — the classic bag-health QA query
    (`rosbag info` tells you counts; operators ask "WHERE did the topic go
    quiet?"): per entity, every inter-arrival gap above a threshold, with
    its bounds and duration, plus each entity's max gap ranked. ONE
    entity-key shuffle, one lag() window — the per-type table twin would
    scan a single topic partition at 100 TB."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("t_us", "event_id")
    gaps = (
        ev.withColumn("prev_t", F.lag("t_us").over(w))
        .withColumn("prev_eid", F.lag("event_id").over(w))
        .filter(
            F.col("prev_t").isNotNull()
            & (F.col("t_us") - F.col("prev_t") > _GAP_THRESHOLD_US)
        )
    )
    return gaps.select(
        "event_type",
        F.col("prev_t").alias("gap_start_us"),
        F.col("t_us").alias("gap_end_us"),
        (F.col("t_us") - F.col("prev_t")).alias("gap_us"),
        F.col("prev_eid").alias("last_event_id"),
        F.col("event_id").alias("next_event_id"),
    )


ORACLE_GAP_DETECT = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS t_us, event_id FROM events
),
lagged AS (
  SELECT event_type, t_us, event_id,
         lag(t_us) OVER (PARTITION BY event_type
                         ORDER BY t_us, event_id) AS prev_t,
         lag(event_id) OVER (PARTITION BY event_type
                             ORDER BY t_us, event_id) AS prev_eid
  FROM ev
)
SELECT event_type, prev_t AS gap_start_us, t_us AS gap_end_us,
       t_us - prev_t AS gap_us, prev_eid AS last_event_id,
       event_id AS next_event_id
FROM lagged
WHERE prev_t IS NOT NULL AND t_us - prev_t > {_GAP_THRESHOLD_US}
"""


# ----------------------------------------------------------------- ewma

#: EWMA smoothing factor alpha = EWMA_NUM / EWMA_DEN (integer arithmetic —
#: see q_ewma)
EWMA_NUM = 1
EWMA_DEN = 4

#: the batch fold divides by EWMA_DEN via arithmetic right shift, so the
#: denominator must stay a power of two; deriving the shift here keeps the
#: three implementations (batch fold, streaming state step, DuckDB oracle)
#: locked to the SAME constants — changing alpha changes all three together
EWMA_SHIFT = EWMA_DEN.bit_length() - 1
assert EWMA_DEN == 1 << EWMA_SHIFT, "EWMA_DEN must be a power of two"

#: fixed-point scale for the double value column
EWMA_SCALE = 1_000_000


def ewma_fold_py(xs, rn: int = 0, y: "int | None" = 0):
    """The ONE integer EWMA recursion (shared kernel): batch
    ``q_ewma``'s per-group tier and the streaming state kernel
    (`streaming.stateful._update_ewma`) both call this, so stream ==
    batch is structural. Semantics are exactly the original Catalyst
    fold's: first row's y is its x verbatim (even when NULL), a NULL x
    or a NULL running y poisons the rest of the chain, otherwise
    y' = (EWMA_NUM*x + (EWMA_DEN-EWMA_NUM)*y) // EWMA_DEN (floor
    division == the fold's arithmetic shift for nonnegative signals and
    power-of-two EWMA_DEN). Returns (ys, rn, y) so a streaming caller
    can thread (rn, y) across micro-batches."""
    out = []
    for x in xs:
        if rn == 0:
            y = x
        elif x is None or y is None:
            y = None
        else:
            y = (EWMA_NUM * x + (EWMA_DEN - EWMA_NUM) * y) // EWMA_DEN
        rn += 1
        out.append(y)
    return out, rn, y


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per entity — the classic
    sensor-smoothing filter (y_t = alpha*x_t + (1-alpha)*y_{t-1}) with
    alpha = 1/4, in INTEGER-EXACT fixed-point form so the inherently
    sequential recursion value-oracles across engines: x scales by 10^6
    via floor (floor of an identical IEEE product is deterministic
    everywhere; no rounding-mode coupling), and each step is
    y' = (x + 3*y) >> 2 — for the NONNEGATIVE signals this operator is
    defined over (sensor magnitudes; the fixture's `value` is >= 0),
    arithmetic shift, truncating division, and floor division coincide,
    so the kernel's `//` and DuckDB's `//` (which the oracle unrolls as
    a recursive CTE stepping row_number) agree bit-for-bit.

    Execution: ONE user_id shuffle (``repartition(user_id)`` +
    ``sortWithinPartitions(user_id, t, eid)`` — the same exchange+sort
    the previous collect_list fold paid), then `mapInPandas` streams
    each partition's Arrow batches through the recursion in
    `ewma_fold_py` — the SAME kernel the streaming twin's state update
    calls, so the two tiers cannot drift. The kernel state (user, rn,
    y) carries across batch boundaries, so a series split across Arrow
    batches folds identically; per-row work is O(1) with no per-group
    pandas frame construction (an ``applyInPandas`` probe paid ~0.3 ms
    × |users| of per-group overhead — partition streaming beats both
    that and the r12 Catalyst ``aggregate`` fold, whose per-step
    accumulator concat was an O(n²)-per-entity interpreted loop:
    measured at sf0.1 / calib ~34 ms: fold 1.35 s, applyInPandas
    2.03 s, this 0.6 s). Per-entity series are bounded (a user's
    events, a sensor's window) — the same per-key-sequential shape
    every EWMA implementation has; entities parallelize across
    executors."""
    from typing import Iterator

    import pandas as pd

    events = load_table(spark, sf_dir, "events")
    rows = (
        events.select(
            "user_id",
            F.unix_micros("ts").alias("t"),
            F.col("event_id").alias("eid"),
            F.floor(F.col("value") * EWMA_SCALE).cast("long").alias("x"),
        )
        .repartition("user_id")
        .sortWithinPartitions("user_id", "t", "eid")
    )

    def smooth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        cur_u, rn, y = None, 0, 0
        for pdf in batches:
            uids = pdf["user_id"].to_numpy()
            out_rn = []
            out_y = []
            # contiguous same-user runs within the sorted batch; state
            # threads across batches for the run that straddles them
            start = 0
            n = len(uids)
            while start < n:
                end = start
                u = uids[start]
                while end < n and uids[end] == u:
                    end += 1
                if u != cur_u:
                    cur_u, rn, y = u, 0, 0
                xs = [
                    None if pd.isna(v) else int(v)
                    for v in pdf["x"].iloc[start:end]
                ]
                ys, rn_new, y = ewma_fold_py(xs, rn, y)
                out_rn.extend(range(rn + 1, rn_new + 1))
                rn = rn_new
                out_y.extend(ys)
                start = end
            yield pd.DataFrame(
                {
                    "user_id": uids,
                    "rn": out_rn,
                    # nullable Int64 so a propagated NULL survives Arrow
                    "y": pd.array(out_y, dtype="Int64"),
                }
            )

    return rows.mapInPandas(smooth, "user_id long, rn long, y long")


ORACLE_EWMA = f"""
WITH RECURSIVE base AS (
  SELECT user_id,
         row_number() OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS rn,
         CAST(floor(value * {EWMA_SCALE}) AS BIGINT) AS x
  FROM events
),
r AS (
  SELECT user_id, rn, x AS y FROM base WHERE rn = 1
  UNION ALL
  SELECT b.user_id, b.rn,
         ({EWMA_NUM} * b.x + {EWMA_DEN - EWMA_NUM} * r.y) // {EWMA_DEN}
  FROM base b JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1
)
SELECT user_id, CAST(rn AS BIGINT) AS rn, y FROM r
"""


QUERIES = {
    "ewma": q_ewma,
    "asof": q_asof,
    "asof-tolerance": q_asof_tolerance,
    "resample-interpolate": q_resample,
    "gap-detect": q_gap_detect,
    "asof-nearest": q_asof_nearest,
}

ORACLES = {
    "ewma": ORACLE_EWMA,
    "asof": ORACLE_ASOF,
    "asof-tolerance": ORACLE_ASOF_TOLERANCE,
    "resample-interpolate": ORACLE_RESAMPLE,
    "gap-detect": ORACLE_GAP_DETECT,
    "asof-nearest": ORACLE_ASOF_NEAREST,
}
