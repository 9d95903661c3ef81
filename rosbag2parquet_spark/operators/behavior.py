"""Event-behavior analytics — the state/journey queries a telemetry or
training-data pipeline runs over an event log beyond plain aggregation
(north-star §2d; the reference stops at per-topic stats,
rosbag_example.cpp:37-72):

- ``compact-latest``: log compaction / CDC-upsert semantics — the latest
  state per key, the materialization every incremental ingest needs.
- ``funnel``: ordered-stage conversion (view → click-after-view →
  purchase-after-that-click) — strict sequencing, not mere co-occurrence.
- ``cohort-retention``: users bucketed by first-seen week × activity-week
  offset — the classic retention triangle.

Scale design: every operator here shuffles ON ``user_id`` EXACTLY ONCE and
reuses that partitioning for all layered windows / re-aggregations (the
funnel's three window passes share one Exchange; the retention join is
co-partitioned). Week indexing is pure integer arithmetic on epoch
microseconds — identical in Spark and DuckDB, no engine date-diff
semantics in the compared output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.catalog import load_table

#: one week in epoch microseconds — week index = unix_micros(ts) div WEEK_US
_WEEK_US = 7 * 24 * 3600 * 1_000_000


# ----------------------------------------------------------- compact-latest


def latest_per_key(df: DataFrame, key_cols: list, order_cols: list) -> DataFrame:
    """Log compaction: the single latest row per key under ``order_cols``
    (descending, left-to-right tie-break). row_number = 1 plans a
    WindowGroupLimit, so each map task keeps only its local top-1 per key
    BEFORE the shuffle — the reducer sees ≤ one row per (key, input
    partition), never the full history."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def q_compact_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — the upsert view of an append-only stream,
    with a deterministic event_id tie-break."""
    events = load_table(spark, sf_dir, "events")
    return latest_per_key(events, ["user_id"], ["ts", "event_id"]).select(
        "user_id",
        F.unix_micros("ts").alias("last_ts_us"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        F.col("event_id").alias("last_event_id"),
    )


ORACLE_COMPACT_LATEST = """
SELECT user_id, epoch_us(ts) AS last_ts_us, event_type AS last_type,
       value AS last_value, event_id AS last_event_id
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


# ------------------------------------------------------------------- funnel


def funnel_counts(
    events: DataFrame, stages: tuple = ("view", "click", "purchase")
) -> DataFrame:
    """Strict ordered funnel: first ``stages[0]``, first ``stages[1]``
    AFTER it, first ``stages[2]`` after THAT — per user, then stage
    counts. The three layered window minimums all partition by user_id
    with no ordering requirement, so Catalyst plans ONE Exchange and
    evaluates the stages in sequence on the co-located rows; the per-user
    reduction that follows reuses the same partitioning (no second shuffle
    of the event stream), and only per-user partials cross the final
    1-row aggregate's exchange."""
    s1, s2, s3 = stages
    w = Window.partitionBy("user_id")
    df = events.withColumn(
        "t1", F.min(F.when(F.col("event_type") == s1, F.col("ts"))).over(w)
    )
    df = df.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == s2) & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    df = df.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == s3) & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = df.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.agg(
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_full_funnel"),
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click-after-view → purchase-after-that-click stage counts."""
    return funnel_counts(load_table(spark, sf_dir, "events"))


ORACLE_FUNNEL = """
WITH l1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
             OVER (PARTITION BY user_id) AS t1
  FROM events),
l2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                OVER (PARTITION BY user_id) AS t2
  FROM l1),
l3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                OVER (PARTITION BY user_id) AS t3
  FROM l2),
pu AS (
  SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
  FROM l3 GROUP BY user_id)
SELECT count(t1) AS n_view, count(t2) AS n_view_click,
       count(t3) AS n_full_funnel
FROM pu
"""


# --------------------------------------------------------- cohort-retention


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: cohort = week index of the user's first event
    (integer epoch-µs div — engine-neutral), activity = the DISTINCT
    (user, week) pairs, output = user counts per (cohort_week,
    week_offset). Shuffle budget: the distinct keys on (user, week) and
    the first-seen agg on user_id — both map-side partial, both shrink to
    ~|users·weeks| before moving; the join probes the compact per-user dim
    (broadcast here, AQE picks sort-merge when the user dim outgrows it),
    and the final (cohort, offset) agg's domain is weeks², not rows."""
    events = load_table(spark, sf_dir, "events")
    wk = events.select(
        "user_id", F.expr(f"unix_micros(ts) div {_WEEK_US}").alias("week")
    )
    first = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    act = wk.distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


ORACLE_COHORT_RETENTION = f"""
WITH wk AS (
  SELECT user_id, epoch_us(ts) // {_WEEK_US} AS week FROM events),
first AS (
  SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id),
act AS (
  SELECT DISTINCT user_id, week FROM wk)
SELECT cohort_week, week - cohort_week AS week_offset,
       count(*) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY 1, 2
"""


_MARKOV_SQL = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev,
         event_type AS next
  FROM events
),
m AS (
  SELECT prev, next, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE prev IS NOT NULL GROUP BY prev, next
),
v1 AS (SELECT next AS state, CAST(sum(n) AS BIGINT) AS w
       FROM m GROUP BY next),
v2 AS (SELECT m.next AS state, CAST(sum(v1.w * m.n) AS BIGINT) AS w
       FROM m JOIN v1 ON m.prev = v1.state GROUP BY m.next),
v3 AS (SELECT m.next AS state, CAST(sum(v2.w * m.n) AS BIGINT) AS w
       FROM m JOIN v2 ON m.prev = v2.state GROUP BY m.next),
states AS (SELECT DISTINCT event_type AS state FROM events)
SELECT state,
       coalesce(v1.w, 0) AS w1,
       coalesce(v2.w, 0) AS w2,
       coalesce(v3.w, 0) AS w3
FROM states
LEFT JOIN v1 USING (state)
LEFT JOIN v2 USING (state)
LEFT JOIN v3 USING (state)
"""


def q_markov_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition analysis of the event stream — user-journey
    analytics: the (prev → next) transition-count matrix from a per-user
    lag window, then THREE unrolled power-iteration steps over it (the
    dominant-eigenvector direction, i.e. long-run state importance). The
    iteration is UNNORMALIZED — v_k = 1·Mᵏ in pure integer arithmetic — so
    there is no division anywhere and the result is engine-exact (same
    trick as kmeans' decimal iterations: iterative ≠ approximate). Scale:
    ONE shuffle (the lag window on user_id); the matrix is |states|² rows,
    so every iteration is a broadcast join against a tiny table no matter
    how large the event log is."""
    from rosbag2parquet_spark.sources.catalog import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(_MARKOV_SQL)


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-table construction (SCD type-2): the event log becomes
    per-user VALIDITY INTERVALS — each state change opens a row
    [valid_from, valid_to) closed by the next change, the current state
    left open (valid_to NULL → sentinel). This is the historized dimension
    every warehouse derives from a CDC stream, and the interval form that
    makes point-in-time joins (``asof``) O(1) lookups instead of scans.

    Consecutive duplicate states collapse first (lag over the same
    user-partitioned ordering — a state 'change' to the same event_type is
    not a new version), then lead() closes each surviving interval. ONE
    shuffle on user_id; both window passes and the final projection reuse
    it. valid_to's open end ships as BIGINT -1 (not NULL: engines order
    NULLs differently, and the sentinel keeps the column NOT NULL for the
    hash)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        F.col("event_type").alias("state"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    changes = ev.withColumn("prev_state", F.lag("state").over(w)).filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state"))
    )
    w2 = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    return (
        changes.withColumn("next_t", F.lead("t_us").over(w2))
        .select(
            "user_id",
            "state",
            F.col("t_us").alias("valid_from"),
            F.coalesce(F.col("next_t"), F.lit(-1).cast("long")).alias(
                "valid_to"
            ),
            F.row_number().over(w2).alias("version"),
        )
    )


ORACLE_SCD2 = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type AS state
  FROM events
),
changes AS (
  SELECT * FROM (
    SELECT user_id, t_us, event_id, state,
           lag(state) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
             AS prev_state
    FROM ev
  ) WHERE prev_state IS NULL OR prev_state <> state
)
SELECT user_id, state, t_us AS valid_from,
       coalesce(lead(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id),
                -1) AS valid_to,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY t_us, event_id)
            AS INTEGER) AS version
FROM changes
"""


def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against the SCD2 interval table — the payoff the
    interval form exists for: "what state was the user in at time T?"
    Probes are each purchase event shifted +10 minutes, so the answer is
    genuinely time-dependent (the user's state may have changed inside the
    gap), matched to the interval with
    ``valid_from <= T AND (valid_to = -1 OR T < valid_to)``.

    Plan: NOT a range join — an equi-join on user_id with a range residual
    explodes O(events × intervals) per user. Instead the interval OPENS
    (valid_from rows, which tile each user's timeline) union the probes,
    ONE shuffle on user_id, and a running ``last(..., ignorenulls)`` window
    carries the covering interval onto every probe — per-probe O(1) in the
    ordered merge, the same co-partitioned as-of shape as ``q_asof``. At
    100 TB both sides hash-partition on user_id and nothing is quadratic.
    Ties: a probe AT valid_from belongs to the new interval (inclusive
    lower bound), so interval markers sort before probes at equal t."""
    iv = q_scd2_intervals(spark, sf_dir)
    probes = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            (F.unix_micros("ts") + 600_000_000).alias("t"),
            "event_id",
        )
    )
    markers = iv.select(
        "user_id",
        F.col("valid_from").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_probe"),
        "state",
        "version",
        "valid_from",
        "valid_to",
    )
    tagged = markers.unionByName(
        probes.select(
            "user_id",
            "t",
            "event_id",
            F.lit(1).alias("is_probe"),
            F.lit(None).cast("string").alias("state"),
            F.lit(None).cast("int").alias("version"),
            F.lit(None).cast("long").alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "user_id",
        "t",
        "event_id",
        "is_probe",
        F.last("state", ignorenulls=True).over(w).alias("state"),
        F.last("version", ignorenulls=True).over(w).alias("version"),
        F.last("valid_from", ignorenulls=True).over(w).alias("valid_from"),
        F.last("valid_to", ignorenulls=True).over(w).alias("valid_to"),
    )
    return (
        carried.filter(F.col("is_probe") == 1)
        .filter(
            F.col("valid_from").isNotNull()
            & (
                (F.col("valid_to") == -1) | (F.col("t") < F.col("valid_to"))
            )
        )
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("probe_t"),
            "state",
            "version",
            "valid_from",
            "valid_to",
        )
    )


ORACLE_SCD2_ASOF = (
    "WITH iv AS (" + ORACLE_SCD2 + "),\n"
    """probes AS (
  SELECT event_id, user_id, epoch_us(ts) + 600000000 AS probe_t
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.probe_t,
       iv.state, iv.version, iv.valid_from, iv.valid_to
FROM probes p
JOIN iv ON iv.user_id = p.user_id
       AND iv.valid_from <= p.probe_t
       AND (iv.valid_to = -1 OR p.probe_t < iv.valid_to)
"""
)


_MERGE_CUTOFF_US = 1_705_276_800_000_000  # 2024-01-15 00:00:00 UTC


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a table format — the CDC apply every
    warehouse ingest needs: a BASE snapshot (latest state per user before
    the cutoff) merged with a CHANGE SET (events after it; an 'error'
    event is the DELETE tombstone, anything else UPSERTs), keyed by
    user_id, last-writer-wins within the change set.

    Plan: the change set first reduces to its last row per key (window
    top-1 → WindowGroupLimit, ONE user_id shuffle), then FULL OUTER joins
    the base on the same key — co-partitioned, so the merge itself adds
    no extra Exchange beyond the join's. Survivor logic is a CASE over
    the join result; deletes drop rows whether or not the base had them.
    This is exactly the distributed shape Delta/Iceberg MERGE compiles
    to, expressed in plain DataFrame ops with an exact oracle."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("t_us").desc(), F.col("event_id").desc()
    )
    base = (
        ev.filter(F.col("t_us") < _MERGE_CUTOFF_US)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("value").alias("base_value"),
            F.col("t_us").alias("base_t"),
        )
    )
    last_change = (
        ev.filter(F.col("t_us") >= _MERGE_CUTOFF_US)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.when(F.col("event_type") == "error", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.col("value").alias("chg_value"),
            F.col("t_us").alias("chg_t"),
        )
    )
    merged = base.join(last_change, "user_id", "full_outer")
    return (
        merged.filter(F.col("op").isNull() | (F.col("op") == "U"))
        .select(
            "user_id",
            F.coalesce(F.col("chg_value"), F.col("base_value")).alias("value"),
            F.coalesce(F.col("chg_t"), F.col("base_t")).alias("last_t"),
            F.when(F.col("op").isNull(), F.lit("base"))
            .otherwise(F.lit("change"))
            .alias("src"),
        )
    )


ORACLE_MERGE_UPSERT = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type,
         CAST(value AS DOUBLE) AS value
  FROM events
),
base AS (
  SELECT user_id, value AS base_value, t_us AS base_t
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY t_us DESC, event_id DESC) AS rn
    FROM ev WHERE t_us < {_MERGE_CUTOFF_US}
  ) WHERE rn = 1
),
last_change AS (
  SELECT user_id,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         value AS chg_value, t_us AS chg_t
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY t_us DESC, event_id DESC) AS rn
    FROM ev WHERE t_us >= {_MERGE_CUTOFF_US}
  ) WHERE rn = 1
)
SELECT b.user_id AS bu, c.user_id AS cu,
       coalesce(b.user_id, c.user_id) AS user_id,
       coalesce(c.chg_value, b.base_value) AS value,
       coalesce(c.chg_t, b.base_t) AS last_t,
       CASE WHEN c.op IS NULL THEN 'base' ELSE 'change' END AS src
FROM base b FULL OUTER JOIN last_change c ON b.user_id = c.user_id
WHERE c.op IS NULL OR c.op = 'U'
"""
# trim the helper join keys out of the oracle projection
ORACLE_MERGE_UPSERT = f"""
SELECT user_id, value, last_t, src FROM ({ORACLE_MERGE_UPSERT})
"""


# ------------------------------------------------------------- table-diff


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, payload: list
) -> DataFrame:
    """Row-level diff of two keyed snapshots — the inverse of
    ``q_merge_upsert``: derive the CDC change set (insert/delete/update)
    that transforms ``old`` into ``new``. This is Delta's Change Data Feed
    computed from plain snapshots (no table format), the primitive behind
    incremental downstream refresh and audit diffing.

    Plan: ONE full-outer join co-partitioned on the key (each side
    shuffles once; over bucketed layouts — see ``q_bucket_join`` — even
    that Exchange disappears). Unchanged rows are dropped by a null-safe
    payload comparison (``eqNullSafe`` — a NULL payload on both sides is
    'unchanged', not 'update'), so only the change set flows out: at
    100 TB the output is proportional to the churn, not the table."""
    # presence is tracked via a sentinel column, not payload nullness
    o = old.select(
        F.col(key),
        F.lit(1).alias("__in_o"),
        *[F.col(c).alias(f"__o_{c}") for c in payload],
    )
    n = new.select(
        F.col(key),
        F.lit(1).alias("__in_n"),
        *[F.col(c).alias(f"__n_{c}") for c in payload],
    )
    j = o.join(n, key, "full_outer")
    same = None
    for c in payload:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("__in_o").isNull(), "insert")
        .when(F.col("__in_n").isNull(), "delete")
        .when(~same, "update")
    )
    out = j.withColumn("change", change).filter(F.col("change").isNotNull())
    cols = [F.col(key), F.col("change")]
    for c in payload:
        cols.append(F.col(f"__o_{c}").alias(f"old_{c}"))
        cols.append(F.col(f"__n_{c}").alias(f"new_{c}"))
    return out.select(*cols)


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot CDC extraction: two deterministic versions of a keyed table
    are derived from events (v1 drops every 97th key — rows 'inserted
    later'; v2 drops every 89th — rows 'deleted since' — and doubles
    ``value`` on every 11th — 'updated since'), and ``snapshot_diff``
    recovers exactly the insert/delete/update set. The reference has no
    table-maintenance story at all (one-shot bag → parquet,
    rosbag2parquet.cpp:1); at 100 TB this is how a downstream consumer
    refreshes incrementally from periodic full snapshots."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
    )
    v1 = ev.filter(F.col("event_id") % 97 != 0)
    v2 = ev.filter(F.col("event_id") % 89 != 0).withColumn(
        "value",
        F.when(
            F.col("event_id") % 11 == 0, F.col("value") * 2.0
        ).otherwise(F.col("value")),
    )
    return snapshot_diff(v1, v2, "event_id", ["user_id", "value"])


ORACLE_TABLE_DIFF = """
WITH ev AS (
  SELECT event_id, user_id, CAST(value AS DOUBLE) AS value FROM events
),
v1 AS (SELECT * FROM ev WHERE event_id % 97 <> 0),
v2 AS (
  SELECT event_id, user_id,
         CASE WHEN event_id % 11 = 0 THEN value * 2.0 ELSE value END AS value
  FROM ev WHERE event_id % 89 <> 0
)
SELECT coalesce(o.event_id, n.event_id) AS event_id,
       CASE WHEN o.event_id IS NULL THEN 'insert'
            WHEN n.event_id IS NULL THEN 'delete'
            ELSE 'update' END AS change,
       o.user_id AS old_user_id, n.user_id AS new_user_id,
       o.value AS old_value, n.value AS new_value
FROM v1 o FULL OUTER JOIN v2 n ON o.event_id = n.event_id
WHERE o.event_id IS NULL OR n.event_id IS NULL
   OR o.user_id IS DISTINCT FROM n.user_id
   OR o.value IS DISTINCT FROM n.value
"""


QUERIES = {
    "scd2-intervals": q_scd2_intervals,
    "scd2-asof": q_scd2_asof,
    "merge-upsert": q_merge_upsert,
    "table-diff": q_table_diff,
    "compact-latest": q_compact_latest,
    "funnel": q_funnel,
    "cohort-retention": q_cohort_retention,
    "markov-chain": q_markov_chain,
}

ORACLES = {
    "scd2-intervals": ORACLE_SCD2,
    "scd2-asof": ORACLE_SCD2_ASOF,
    "merge-upsert": ORACLE_MERGE_UPSERT,
    "table-diff": ORACLE_TABLE_DIFF,
    "compact-latest": ORACLE_COMPACT_LATEST,
    "funnel": ORACLE_FUNNEL,
    "cohort-retention": ORACLE_COHORT_RETENTION,
    "markov-chain": _MARKOV_SQL,
}
